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
