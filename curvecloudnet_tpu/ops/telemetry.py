"""Trace-scoped overflow/truncation telemetry.

The TPU redesign replaces the reference's data-dependent shapes with static
budgets + masks (models/spec.py): voxel/curve-FPS downsampling gathers into
fixed rows, and geodesic grouping uses a static candidate window where the
reference sizes its window per curve (point_ops.py:165-167).  Each lossy
site records how much it actually dropped, so eval can surface overflow
instead of silently truncating (SURVEY §5 / round-1 verdict weak #6).

Usage (inside a jitted function):

    with telemetry.capture() as cap:
        logits = model.apply(...)
        stats = cap.current()      # dict of scalar jax values
    return logits, stats
"""

from __future__ import annotations

_REC: dict | None = None


class capture:
    """Activate recording for the enclosed trace; nests safely."""

    def __enter__(self):
        global _REC
        self._prev = _REC
        _REC = {}
        return self

    def current(self) -> dict:
        """The records so far (call before the scope closes)."""
        return dict(_REC or {})

    def __exit__(self, *exc):
        global _REC
        self.values = _REC
        _REC = self._prev
        return False


def active() -> bool:
    return _REC is not None


def record(name: str, value) -> None:
    """Record a scalar under ``name`` (suffixed when a site fires again)."""
    if _REC is None:
        return
    key, i = name, 0
    while key in _REC:
        i += 1
        key = f"{name}.{i}"
    _REC[key] = value
