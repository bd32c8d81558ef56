"""Native C++ runtime: BVH builders vs Python oracles, scheduler semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from sailor_tpu import native_bridge as nb
from sailor_tpu.assets import primitives

pytestmark = pytest.mark.skipif(not nb.available(), reason="no native toolchain")


def _soup():
    m = primitives.uv_sphere(1.0, rings=12, sectors=20)
    v, i = m.positions, m.indices
    return v[i[:, 0]], v[i[:, 1]], v[i[:, 2]]


def test_native_bvh_structure():
    v0, v1, v2 = _soup()
    out = nb.bvh_build(v0, v1, v2)
    n = len(out["node_min"])
    assert n > 1
    # root bbox contains everything
    lo = np.minimum(np.minimum(v0, v1), v2).min(0)
    np.testing.assert_allclose(out["node_min"][0], lo, atol=1e-6)
    # leaves cover every triangle exactly once (as reordered indices)
    covered = np.zeros(len(v0), bool)
    for k in range(n):
        c = out["node_count"][k]
        if c > 0:
            s = out["node_start"][k]
            ids = out["order"][s : s + c]
            assert not covered[ids].any()
            covered[ids] = True
    assert covered.all()


def test_native_bvh8_matches_python_traversal():
    from sailor_tpu.raytracing import bvh8

    v0, v1, v2 = _soup()
    b_native = bvh8.build(v0, v1, v2, use_native=True)
    b_python = bvh8.build(v0, v1, v2, use_native=False)

    rng = np.random.default_rng(0)
    n = 128
    o = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), np.full(n, 3.0)], -1).astype(np.float32)
    d = np.stack([rng.uniform(-0.5, 0.5, n), rng.uniform(-0.5, 0.5, n), np.full(n, -1.0)], -1)
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    rn = bvh8.intersect(b_native, jnp.asarray(o), jnp.asarray(d))
    rp = bvh8.intersect(b_python, jnp.asarray(o), jnp.asarray(d))
    np.testing.assert_array_equal(np.asarray(rn["hit"]), np.asarray(rp["hit"]))
    hit = np.asarray(rn["hit"])
    np.testing.assert_allclose(
        np.asarray(rn["t"])[hit], np.asarray(rp["t"])[hit], rtol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(rn["tri"])[hit], np.asarray(rp["tri"])[hit]
    )


def test_scheduler_dependencies_and_results():
    s = nb.Scheduler(4)
    try:
        log = []
        a = s.submit(lambda: log.append("a") or "A")
        b = s.submit(lambda: log.append("b") or "B", deps=(a,))
        c = s.submit(lambda: log.append("c") or "C", deps=(a, b))
        assert s.wait(c) == "C"
        assert log.index("a") < log.index("b") < log.index("c")
        assert s.is_done(a) and s.is_done(b)
    finally:
        s.shutdown()


def test_scheduler_exception_propagates():
    s = nb.Scheduler(2)
    try:
        def boom():
            raise ValueError("task failed")

        t = s.submit(boom)
        with pytest.raises(ValueError, match="task failed"):
            s.wait(t)
    finally:
        s.shutdown()


def test_scheduler_wait_idle_fanout():
    s = nb.Scheduler(4)
    try:
        results = []
        for k in range(64):
            s.submit(lambda k=k: results.append(k))
        s.wait_idle()
        assert sorted(results) == list(range(64))
        assert s.num_pending == 0
    finally:
        s.shutdown()


def test_arena():
    lib = nb.load()
    import ctypes

    a = lib.sailor_arena_create(4096)
    p1 = lib.sailor_arena_alloc(a, 100, 16)
    p2 = lib.sailor_arena_alloc(a, 100, 16)
    assert p1 != p2 and p1 % 16 == 0 and p2 % 16 == 0
    big = lib.sailor_arena_alloc(a, 8192, 16)  # triggers new page
    assert big
    lib.sailor_arena_reset(a)
    p3 = lib.sailor_arena_alloc(a, 100, 16)
    assert p3 == p1  # bump pointer reset
    lib.sailor_arena_destroy(a)


def test_pool_allocator():
    """TPoolAllocator analog: distinct block pointers, free-list reuse,
    occupancy stats."""
    nb = pytest.importorskip("sailor_tpu.native_bridge")
    if not nb.available():
        pytest.skip("native library unavailable")
    p = nb.Pool(block_size=48, blocks_per_page=8)
    ptrs = [p.alloc() for _ in range(20)]  # spans 3 pages
    assert len(set(ptrs)) == 20
    s = p.stats()
    assert s["used"] == 20 and s["capacity"] >= 24 and s["pages"] >= 3
    p.free(ptrs.pop())
    assert p.stats()["used"] == 19
    again = p.alloc()
    assert again is not None
    p.destroy()


def test_multipool_allocator():
    nb = pytest.importorskip("sailor_tpu.native_bridge")
    if not nb.available():
        pytest.skip("native library unavailable")
    mp = nb.MultiPool()
    small = mp.alloc(24)       # 32B class
    big = mp.alloc(1 << 20)    # oversize -> heap
    s = mp.stats()
    assert s["used"] >= 1 and s["reserved_bytes"] > (1 << 20)
    mp.free(small, 24)
    mp.free(big, 1 << 20)
    assert mp.stats()["used"] == 0
    mp.destroy()
