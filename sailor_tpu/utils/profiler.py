"""Profiling — the Tracy-macro analog (Runtime/Core/Defines.h
SAILOR_PROFILE_*): named zones with wall-clock + optional device sync,
aggregated per frame; plus a bridge to jax.profiler traces for deep dives.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

_zones: dict[str, list[float]] = defaultdict(list)
_enabled = True


def enable(on: bool = True) -> None:
    global _enabled
    _enabled = on


@contextlib.contextmanager
def profile_scope(name: str, sync: bool = False):
    """SAILOR_PROFILE_SCOPE: time a block; sync=True blocks on device work
    so the zone reflects device time (GPU-cost counter analog)."""
    if not _enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            try:
                (jax.device_put(0) + 0).block_until_ready()
            except Exception:
                pass
        _zones[name].append((time.perf_counter() - t0) * 1e3)


def profile_function(fn):
    """SAILOR_PROFILE_FUNCTION decorator."""

    def wrapper(*a, **kw):
        with profile_scope(fn.__qualname__):
            return fn(*a, **kw)

    return wrapper


def end_frame() -> dict[str, tuple[int, float, float]]:
    """Collect zone stats for this frame: name -> (count, total_ms, max_ms).
    (Tracy end-of-frame marker.)"""
    out = {
        k: (len(v), sum(v), max(v)) for k, v in _zones.items() if v
    }
    _zones.clear()
    return out


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture an XLA device trace viewable in TensorBoard/Perfetto — the
    deep-profiling path (RenderDoc/Tracy GPU capture analog)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
