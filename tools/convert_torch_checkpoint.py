#!/usr/bin/env python3
"""Convert a reference PyTorch checkpoint into an orbax checkpoint.

Usage:
  python tools/convert_torch_checkpoint.py --config configs/nuscenes.yaml \
      --weights latest_model.pth --in-dim 4 --n-out 17 --out ./out/converted

The converted tree can be evaluated via
  python -m curvecloudnet_tpu.main --config <cfg> --only_val true \
      --weights ./out/converted/torch_import
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--weights", required=True)
    ap.add_argument("--in-dim", type=int, required=True)
    ap.add_argument("--n-out", type=int, required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from curvecloudnet_tpu.checkpoint import load_torch_checkpoint
    from curvecloudnet_tpu.config import load_config
    from curvecloudnet_tpu.models import parse_model_config

    cfg = load_config(args.config)
    spec = parse_model_config(cfg["model"], in_dim=args.in_dim,
                              n_out=args.n_out)
    params, batch_stats = load_torch_checkpoint(args.weights, spec)

    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(args.out, "torch_import"))
    ocp.PyTreeCheckpointer().save(
        path, {"params": params, "batch_stats": batch_stats}, force=True)
    import jax

    n = sum(v.size for v in jax.tree.leaves(params))
    print(f"wrote {path} ({n:,} parameters)")


if __name__ == "__main__":
    main()
