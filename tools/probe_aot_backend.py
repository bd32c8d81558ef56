"""Probe whether the current backend supports the AOT executable cache.

Compiles a tiny program, serializes it, re-loads it, and runs both —
in THIS process. On success writes ``Cache/aot/.axon_ok`` so
aot_cache.enabled() turns the cache on by default for the axon backend
(bench.py then measures warm starts). Run once per environment:

    python tools/probe_aot_backend.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sailor_tpu.assets import aot_cache


def main():
    os.environ["SAILOR_AOT_CACHE"] = "1"
    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()[0].device_kind})")
    x = jnp.ones((256, 256))

    c1 = aot_cache.load_or_compile(
        lambda a: (a @ a).sum(), (x,), logical_key="backend-probe",
        label="probe",
    )
    r1 = float(c1(x))

    aot_cache._memory.clear()
    c2 = aot_cache.load_or_compile(
        lambda a: (a @ a).sum(), (x,), logical_key="backend-probe",
        label="probe",
    )
    r2 = float(c2(x))
    assert r1 == r2, (r1, r2)

    # bench.py loads several executables per process (headline graph,
    # content graph, tracer) — probe a SECOND deserialized program too
    # (XLA:CPU breaks exactly here: generic fusion symbol collisions)
    y = jnp.ones((128, 128))
    aot_cache.load_or_compile(
        lambda a: (a * 2.0 + a @ a).mean(), (y,), logical_key="probe-2",
        label="probe2",
    )
    aot_cache._memory.clear()
    c3 = aot_cache.load_or_compile(
        lambda a: (a * 2.0 + a @ a).mean(), (y,), logical_key="probe-2",
        label="probe2",
    )
    r3 = float(c3(y))
    r2b = float(c2(x))
    assert r2b == r1, "first executable broke after loading a second"
    print(f"second program loaded + both still execute ({r3})")

    if backend == "axon":
        marker = aot_cache.cache_dir() / ".axon_ok"
        marker.parent.mkdir(parents=True, exist_ok=True)
        marker.write_text("serialize/deserialize probe passed\n")
        print(f"wrote {marker}")
    print(f"OK: store + reload + execute both paths ({r1})")


if __name__ == "__main__":
    main()
