#!/usr/bin/env bash
# Round-5 artifact reproduction sequence (run on a TPU host; each bench is
# median-of-3 with an xplane sync span).  Writes the BENCH_*_r05.json
# artifact set in the repo root.
set -e
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:$PYTHONPATH

BENCH_TRACE=1 python bench.py                          > BENCH_EVAL_r05.json
BENCH_TRACE=1 BENCH_MODE=train python bench.py         > BENCH_TRAIN_r05.json
BENCH_TRACE=1 BENCH_POINTS=131072 BENCH_CONFIG=configs/kitti.yaml \
    python bench.py                                    > BENCH_KITTI_r05.json

EVAL_PPS=$(python -c "import json;d=json.load(open('BENCH_EVAL_r05.json'));print(d['value'])")
EVAL_MS=$(python -c "import json;d=json.load(open('BENCH_EVAL_r05.json'));print(d['detail']['median_step_s']*1e3)")
DEVICE_BENCH_PPS=$EVAL_PPS DEVICE_BENCH_MS=$EVAL_MS \
    python tools/bench_production.py 16                > BENCH_PROD_r05.json

for f in BENCH_EVAL_r05 BENCH_TRAIN_r05 BENCH_KITTI_r05 BENCH_PROD_r05; do
    echo "== $f"; cat $f.json; echo
done
