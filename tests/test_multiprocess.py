"""Multi-process (multi-host-shaped) sharded-step dry run.

Wraps tools/multiproc_dryrun.py: 2 local processes x 1 CPU device each,
jax.distributed over a localhost coordinator, one DP train step of the
narrow flagship.  Pins initialize_distributed / shard_batch's
make_array_from_process_local_data path / process_shard_range lockstep
semantics (round-4 verdict #8).

Gated behind CCN_SLOW_TESTS=1 (two full CPU compiles of the 33-step graph
— minutes on a small CI box); run explicitly via
``python tools/multiproc_dryrun.py``.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

_SLOW = os.environ.get("CCN_SLOW_TESTS", "0") == "1"


@pytest.mark.skipif(not _SLOW, reason="set CCN_SLOW_TESTS=1 (2 full CPU "
                    "compiles of the flagship graph)")
def test_two_process_sharded_step():
    import multiproc_dryrun as mp

    mp.main(nprocs=2, local_devices=1, timeout=1800)
