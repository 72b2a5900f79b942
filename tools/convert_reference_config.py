#!/usr/bin/env python3
"""Convert a reference-style (parallel-list) model YAML into the native
inline-schema YAML used by this framework.

Usage: python tools/convert_reference_config.py <ref.yaml> <out.yaml>

The reference declares per-step hyperparameters as parallel top-level lists
(knn/ratios/radii/num_skips/kernel_sizes indexed by step position); the
native schema inlines everything into each step dict, adds explicit static
``budget_ratio`` hints for data-dependent downsamplers, and keeps the same
top-level run keys.
"""

import sys

import yaml

_PARALLEL = {
    "knn": "knn",
    "ratios": "ratio",
    "radii": "radius",
    "num_skips": "num_skips",
    "kernel_sizes": "kernel_size",
}

# conservative static budgets for data-dependent downsamplers
_DEFAULT_BUDGETS = {"voxel": 0.5, "curve-fps": 0.5}


def convert_model(m: dict) -> dict:
    steps_in = m["steps"]
    out_steps = []
    for i, entry in enumerate(steps_in):
        step = dict(entry) if isinstance(entry, dict) else {"step_name": entry}
        for key, field in _PARALLEL.items():
            vals = m.get(key)
            if vals and i < len(vals) and vals[i] is not None:
                step[field] = vals[i]
        step["feat_dims"] = m["feat_dims"][i]
        name = step["step_name"]
        if "budget_ratio" not in step:
            if name == "sa" and step.get("downsample_type") in _DEFAULT_BUDGETS:
                step["budget_ratio"] = _DEFAULT_BUDGETS[step["downsample_type"]]
            elif name == "sa-geo" and step.get("use_curve_fps"):
                step["budget_ratio"] = _DEFAULT_BUDGETS["curve-fps"]
        out_steps.append(step)

    out = {k: v for k, v in m.items()
           if k not in ("steps", "feat_dims", *_PARALLEL)}
    out["steps"] = out_steps
    return out


def convert(cfg: dict) -> dict:
    out = dict(cfg)
    out["model"] = convert_model(cfg["model"])
    return out


def main():
    src, dst = sys.argv[1], sys.argv[2]
    with open(src) as f:
        cfg = yaml.safe_load(f)
    with open(dst, "w") as f:
        yaml.safe_dump(convert(cfg), f, sort_keys=False,
                       default_flow_style=None)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
