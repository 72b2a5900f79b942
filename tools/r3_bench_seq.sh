#!/bin/bash
# Round-3 TPU measurement sequence (one chip, serialized).
# Usage: bash tools/r3_bench_seq.sh [stage ...]   (default: all)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
stages="${*:-smoke knn eval train kitti}"

for s in $stages; do
  echo "=== stage: $s ($(date +%H:%M:%S)) ==="
  case $s in
    smoke) timeout 1200 python tools/tpu_smoke.py ;;
    knn)   CCN_KNN_SWEEP=v2 CCN_KNN_BIG=1 timeout 1200 python tools/knn_bench.py ;;
    eval)  timeout 1800 python bench.py ;;
    train) BENCH_MODE=train timeout 2400 python bench.py ;;
    kitti) BENCH_CONFIG=configs/kitti.yaml timeout 3600 python bench.py ;;
  esac
  echo "=== done: $s (exit $?) ==="
done
