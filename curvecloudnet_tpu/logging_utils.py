"""Observability: metric logging to stdout + JSONL (+ wandb when available).

The reference logs to Weights & Biases throughout (main.py:17-21, SURVEY.md
§5).  This environment has no wandb account; the logger keeps the same
call shape (``log(dict)``, summary-max tracking) and writes an append-only
``metrics.jsonl`` that tooling can tail, using wandb transparently if the
package+login exist.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricLogger:
    def __init__(self, outdir: Optional[str] = None, use_wandb: bool = False,
                 config: Optional[dict] = None, project: str = "curvecloudnet-tpu"):
        self.outdir = outdir
        self._fh = None
        self._wandb = None
        self.summary_max: Dict[str, float] = {}
        self._history: Dict[str, list] = {}
        if outdir:
            os.makedirs(outdir, exist_ok=True)
            self._fh = open(os.path.join(outdir, "metrics.jsonl"), "a")
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=project, config=config or {})
            except Exception as e:  # offline / not installed
                print(f"[logging] wandb unavailable ({e}); using JSONL only")
                self._wandb = None

    def reload_history(self) -> None:
        """Rebuild the in-memory metric history from this outdir's
        ``metrics.jsonl`` — auto-resumed runs otherwise compute
        run-spanning statistics (``median_top_k``, summary maxima) over
        only the post-resume entries (the reference's wandb history spans
        the whole run)."""
        path = os.path.join(self.outdir or "", "metrics.jsonl")
        if not self.outdir or not os.path.exists(path):
            return
        with open(path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                for k, v in rec.items():
                    if k in ("ts", "step") or not isinstance(v, (int, float)):
                        continue
                    self.summary_max[k] = max(
                        self.summary_max.get(k, -1e30), v)
                    self._history.setdefault(k, []).append(v)

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        rec = {"ts": time.time()}
        if step is not None:
            rec["step"] = step
        for k, v in metrics.items():
            if hasattr(v, "item"):
                v = v.item()
            rec[k] = v
            if isinstance(v, (int, float)):
                self.summary_max[k] = max(self.summary_max.get(k, -1e30), v)
                self._history.setdefault(k, []).append(v)
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self._wandb:
            self._wandb.log(metrics, step=step)

    def log_media(self, name: str, obj, step: Optional[int] = None) -> None:
        """Log a figure/image as media (reference logs plotly + Mitsuba
        figures to wandb, visualize_mitsuba.py:32,
        shapenet_classification.py:109).  Accepts a numpy HxWx3 image, a
        matplotlib figure, a plotly figure, or a file path; without wandb it
        persists under ``<outdir>/media/`` and records the path in JSONL.
        """
        import numpy as np

        if self._wandb:
            w = self._wandb
            if hasattr(obj, "to_plotly_json"):          # plotly figure
                self._wandb.log({name: w.Plotly(obj)}, step=step)
            elif isinstance(obj, np.ndarray) or hasattr(obj, "savefig") \
                    or isinstance(obj, str):
                self._wandb.log({name: w.Image(obj)}, step=step)
                if hasattr(obj, "savefig"):
                    try:
                        import matplotlib.pyplot as plt

                        plt.close(obj)
                    except Exception:  # noqa: BLE001
                        pass
            return
        if not self.outdir:
            return
        import os

        media = os.path.join(self.outdir, "media")
        os.makedirs(media, exist_ok=True)
        tag = f"{name.replace('/', '_')}" + ("" if step is None
                                             else f"_{step}")
        if hasattr(obj, "to_plotly_json"):
            path = os.path.join(media, tag + ".html")
            obj.write_html(path)
        elif hasattr(obj, "savefig"):
            path = os.path.join(media, tag + ".png")
            obj.savefig(path, dpi=150)
            # ownership transfers here: callers pass open figures (e.g.
            # plot_confusion(path=None)); without a close they accumulate
            # for the process lifetime (one leaked canvas per eval epoch)
            try:
                import matplotlib.pyplot as plt

                plt.close(obj)
            except Exception:  # noqa: BLE001 — non-matplotlib savefig duck
                pass
        elif isinstance(obj, np.ndarray):
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            path = os.path.join(media, tag + ".png")
            plt.imsave(path, np.clip(obj, 0, 1))
        elif isinstance(obj, (str, os.PathLike)) and os.path.exists(obj):
            # a figure already on disk: copy it under media/ so the run's
            # media directory is self-contained
            import shutil

            ext = os.path.splitext(str(obj))[1] or ".png"
            path = os.path.join(media, tag + ext)
            shutil.copyfile(obj, path)
        else:
            path = str(obj)
        self.log({f"media/{name}": path}, step=step)

    def median_top_k(self, key: str, k: int = 5) -> float:
        """Reference 'Median Top 5 IOU' over the run's logged values
        (nuscenes_seg.py:159-161)."""
        import numpy as np

        vals = sorted(self._history.get(key, []))[-k:]
        return float(np.median(vals)) if vals else float("nan")

    def close(self):
        if self._fh:
            self._fh.close()
        if self._wandb:
            self._wandb.finish()
