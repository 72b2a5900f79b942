"""Checkpointing: orbax save/restore + torch ``.pth`` state-dict translation.

Reproduces the reference's resume contract (``src/main.py:127-141``,
``src/utils/load_utils.py:17-70``): rolling ``latest`` checkpoint with
``latest_state.json{epoch, max_score}``, periodic ``model_epoch{E}``, best
``BEST_model_epoch{E}``; auto-resume when the outdir already has a latest.

``load_torch_checkpoint`` maps the reference's PyTorch state_dict onto this
framework's parameter pytree so released checkpoints can be evaluated
(SURVEY.md §5 'checkpoint/resume').
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Orbax-backed native checkpoints
# ---------------------------------------------------------------------------

def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(outdir: str, name: str, state) -> str:
    """Save {params, batch_stats, opt_state, step} under outdir/name."""
    path = os.path.abspath(os.path.join(outdir, name))
    tree = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    _ckptr().save(path, tree, force=True)
    return path


def restore_checkpoint(outdir: str, name: str, state):
    """Restore into an existing TrainState template (shapes must match)."""
    path = os.path.abspath(os.path.join(outdir, name))
    tree = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    restored = _ckptr().restore(path, item=tree)
    return state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )


def dump_latest_state(outdir: str, epoch: int, max_score: float) -> None:
    """latest_state.json (reference main.py:139-141)."""
    with open(os.path.join(outdir, "latest_state.json"), "w") as f:
        json.dump({"epoch": epoch, "max_score": max_score}, f)


def read_latest_state(outdir: str) -> Optional[Dict[str, Any]]:
    p = os.path.join(outdir, "latest_state.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def has_latest(outdir: str) -> bool:
    return os.path.isdir(os.path.join(outdir, "latest"))


# ---------------------------------------------------------------------------
# torch .pth -> flax params translation
# ---------------------------------------------------------------------------

def _to_np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _set(tree: dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = jnp.asarray(value)


def _mlp_entries(prefix_out: Tuple[str, ...], sub: Dict[str, np.ndarray],
                 params: dict, batch_stats: dict) -> None:
    """Map one torch_geometric MLP state (lins.N / norms.N) to our MLP."""
    for key, val in sub.items():
        m = re.match(r"lins\.(\d+)\.(weight|bias)$", key)
        if m:
            i, kind = int(m.group(1)), m.group(2)
            if kind == "weight":
                _set(params, prefix_out + (f"lin_{i}", "kernel"), val.T)
            else:
                _set(params, prefix_out + (f"lin_{i}", "bias"), val)
            continue
        m = re.match(r"norms\.(\d+)\.(?:module\.)?(\w+)$", key)
        if m:
            i, kind = int(m.group(1)), m.group(2)
            dst = {
                "weight": (params, "scale"),
                "bias": (params, "bias"),
                "running_mean": (batch_stats, "mean"),
                "running_var": (batch_stats, "var"),
            }.get(kind)
            if dst is not None:
                tree, leaf = dst
                _set(tree, prefix_out + (f"norm_{i}", leaf), val)


def _collect(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    pl = len(prefix)
    return {k[pl:]: v for k, v in sd.items() if k.startswith(prefix)}


def load_torch_checkpoint(path_or_sd, spec) -> Tuple[dict, dict]:
    """Translate a reference ModelBase state_dict into (params, batch_stats).

    Name mapping (reference module tree -> ours):
      steps.{i}.conv.local_nn.*  -> step_{i}_{name}/nn          (sa, sa-geo)
      steps.{i}.conv.attend_nn.* -> step_{i}_{name}/attend_nn
      steps.{i}.nn.*             -> step_{i}_{name}/nn    (sgcnn/fp/global/skip)
      steps.{i}.attend_nn.*      -> step_{i}_{name}/attend_nn  (sgcnn)
      steps.{i}.mlp.*            -> step_{i}_{name}/mlp        (mlp step)
      steps.{i}.conv_modules.{j}.weight (O,I,H) -> conv_{j}/kernel ((H)*I,O)
      steps.{i}.norm_modules.{j}.*             -> norm_{j}
      mlp.* / lin_categorical.*  -> mlp / lin_categorical
    """
    if isinstance(path_or_sd, (str, os.PathLike)):
        import torch

        sd = torch.load(path_or_sd, map_location="cpu")
    else:
        sd = path_or_sd
    sd = {k: _to_np(v) for k, v in sd.items()}

    params: dict = {}
    batch_stats: dict = {}

    for i, step in enumerate(spec.steps):
        sname = f"step_{i}_{step.name}"
        pre = f"steps.{i}."
        sub = _collect(sd, pre)
        if not sub:
            continue
        if step.name in ("sa", "sa-geo"):
            _mlp_entries((sname, "nn"), _collect(sub, "conv.local_nn."),
                         params, batch_stats)
            _mlp_entries((sname, "attend_nn"), _collect(sub, "conv.attend_nn."),
                         params, batch_stats)
        elif step.name in ("conv1d-fast-v1", "conv1d-fast-v2"):
            for key, val in sub.items():
                m = re.match(r"conv_modules\.(\d+)\.(weight|bias)$", key)
                if m:
                    j, kind = int(m.group(1)), m.group(2)
                    if kind == "weight":
                        o, ic, h = val.shape
                        # torch taps (O, I, H) -> dense kernel (H*I, O) where
                        # row block d holds tap w_d (see SymmetricCurveConvStep)
                        k = val.transpose(2, 1, 0).reshape(h * ic, o)
                        _set(params, (sname, f"conv_{j}", "kernel"), k)
                    else:
                        _set(params, (sname, f"conv_{j}", "bias"), val)
                    continue
                m = re.match(r"norm_modules\.(\d+)\.(\w+)$", key)
                if m:
                    j, kind = int(m.group(1)), m.group(2)
                    dst = {
                        "weight": (params, "scale"),
                        "bias": (params, "bias"),
                        "running_mean": (batch_stats, "mean"),
                        "running_var": (batch_stats, "var"),
                    }.get(kind)
                    if dst is not None:
                        tree, leaf = dst
                        _set(tree, (sname, f"norm_{j}", leaf), val)
        elif step.name == "mlp":
            _mlp_entries((sname, "mlp"), _collect(sub, "mlp."),
                         params, batch_stats)
        else:  # sgcnn/dgcnn/fp/fp-geo/sa-global/skip-connect
            _mlp_entries((sname, "nn"), _collect(sub, "nn."),
                         params, batch_stats)
            att = _collect(sub, "attend_nn.")
            if att:
                _mlp_entries((sname, "attend_nn"), att, params, batch_stats)

    _mlp_entries(("mlp",), _collect(sd, "mlp."), params, batch_stats)
    cat = _collect(sd, "lin_categorical.")
    if cat:
        _mlp_entries(("lin_categorical",), cat, params, batch_stats)
    return params, batch_stats
