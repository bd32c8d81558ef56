"""In-engine benchmark/sanity suites — the reference's closest thing to
unit tests (SURVEY.md §4): console commands that time an engine container
against a trusted oracle and assert identical results
(Runtime/Containers/*Benchmark.cpp, Runtime/Memory/Memory.h RunMemoryBenchmark).

Ours compare: ComponentPool vs dict-of-lists, the native arena vs malloc,
the native scheduler vs threading, BVH8 build vs the Python builder, and
device math vs numpy."""

from __future__ import annotations

import time

import numpy as np

ALL = ("memory", "pool", "scheduler", "bvh", "math")


def run(name: str) -> str:
    fn = globals()[f"bench_{name}"]
    t0 = time.perf_counter()
    ok, detail = fn()
    dt = (time.perf_counter() - t0) * 1e3
    status = "PASSED" if ok else "FAILED"
    return f"{name}.benchmark {status} in {dt:.1f}ms — {detail}"


def bench_pool():
    """ComponentPool acquire/release/iterate vs a plain dict oracle."""
    from sailor_tpu.ecs.ecs import ComponentPool

    n = 20000
    pool = ComponentPool({"value": ((3,), np.float32, 0.0)}, capacity=64)
    oracle = {}
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    handles = []
    for i in range(n):
        h = pool.acquire()
        v = rng.random(3).astype(np.float32)
        pool.value[h] = v
        oracle[h] = v
        handles.append(h)
        if i % 3 == 0 and handles:
            k = handles.pop(rng.integers(len(handles)))
            pool.release(k)
            oracle.pop(k)
    t_pool = time.perf_counter() - t0
    ok = pool.num_alive == len(oracle) and all(
        np.allclose(pool.value[h], oracle[h]) for h in handles
    )
    return ok, f"{n} ops in {t_pool*1e3:.1f}ms, {pool.num_alive} alive"


def bench_memory():
    """Native arena throughput vs Python allocation."""
    from sailor_tpu import native_bridge as nb

    lib = nb.load()
    if lib is None:
        return True, "native unavailable (skipped)"
    n = 100000
    a = lib.sailor_arena_create(1 << 20)
    t0 = time.perf_counter()
    for _ in range(n):
        lib.sailor_arena_alloc(a, 64, 16)
    t_arena = time.perf_counter() - t0
    lib.sailor_arena_destroy(a)
    t0 = time.perf_counter()
    keep = [bytearray(64) for _ in range(n)]
    t_py = time.perf_counter() - t0
    del keep
    return True, f"arena {n/t_arena/1e6:.2f}M allocs/s vs python {n/t_py/1e6:.2f}M/s"


def bench_scheduler():
    """Native scheduler fan-out correctness + throughput."""
    from sailor_tpu import native_bridge as nb

    if not nb.available():
        return True, "native unavailable (skipped)"
    s = nb.Scheduler(4)
    try:
        n = 500
        results = []
        t0 = time.perf_counter()
        for k in range(n):
            s.submit(lambda k=k: results.append(k))
        s.wait_idle()
        dt = time.perf_counter() - t0
        ok = sorted(results) == list(range(n))
        return ok, f"{n} tasks in {dt*1e3:.1f}ms"
    finally:
        s.shutdown()


def bench_bvh():
    """Native BVH8 vs Python builder: same traversal results."""
    import jax.numpy as jnp

    from sailor_tpu.assets import primitives
    from sailor_tpu.raytracing import bvh8

    m = primitives.uv_sphere(1.0, 10, 16)
    v, i = m.positions, m.indices
    v0, v1, v2 = v[i[:, 0]], v[i[:, 1]], v[i[:, 2]]
    t0 = time.perf_counter()
    bn = bvh8.build(v0, v1, v2, use_native=True)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    bp = bvh8.build(v0, v1, v2, use_native=False)
    t_python = time.perf_counter() - t0
    o = jnp.asarray([[0.0, 0.0, 3.0], [2.0, 2.0, 3.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    rn = bvh8.intersect(bn, o, d)
    rp = bvh8.intersect(bp, o, d)
    ok = bool((rn["hit"] == rp["hit"]).all())
    return ok, f"native {t_native*1e3:.1f}ms vs python {t_python*1e3:.0f}ms"


def bench_math():
    """Device math vs numpy oracle (transform chain)."""
    import jax.numpy as jnp

    from sailor_tpu.core import math3d as m3

    rng = np.random.default_rng(1)
    t = rng.normal(size=(256, 3)).astype(np.float32)
    q = rng.normal(size=(256, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    s = rng.uniform(0.5, 2.0, (256, 3)).astype(np.float32)
    t0 = time.perf_counter()
    m = np.asarray(m3.trs(jnp.asarray(t), jnp.asarray(q), jnp.asarray(s)))
    dt = time.perf_counter() - t0
    # oracle: rotate+scale a basis vector, add translation
    p = np.asarray(
        m3.quat_rotate(jnp.asarray(q), jnp.asarray(s) * np.asarray([1.0, 0, 0]))
    ) + t
    p2 = np.einsum("nij,j->ni", m[:, :3, :3], np.asarray([1.0, 0, 0])) + m[:, :3, 3]
    ok = np.allclose(p, p2, atol=1e-4)
    return ok, f"256 trs in {dt*1e3:.1f}ms"
