"""BVH build + traversal vs brute-force oracle."""

import jax.numpy as jnp
import numpy as np

from sailor_tpu.assets import primitives
from sailor_tpu.raytracing import bvh as bvh_mod


def _soup(mesh):
    v = mesh.positions
    i = mesh.indices
    return v[i[:, 0]], v[i[:, 1]], v[i[:, 2]]


def _brute_force(v0, v1, v2, o, d):
    """Closest-hit oracle in numpy."""
    e1 = v1 - v0
    e2 = v2 - v0
    best_t = np.full(len(o), np.inf)
    best_tri = np.full(len(o), -1)
    for r in range(len(o)):
        p = np.cross(d[r], e2)
        det = np.einsum("ij,ij->i", e1, p)
        ok = np.abs(det) > 1e-7
        inv = np.where(ok, 1.0 / np.where(ok, det, 1), 0.0)
        s = o[r] - v0
        u = np.einsum("ij,ij->i", s, p) * inv
        q = np.cross(s, e1)
        v = np.einsum("ij,ij->i", np.broadcast_to(d[r], e1.shape), q) * inv
        t = np.einsum("ij,ij->i", e2, q) * inv
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4)
        if hit.any():
            cand = np.where(hit, t, np.inf)
            best_tri[r] = np.argmin(cand)
            best_t[r] = cand[best_tri[r]]
    return best_t, best_tri


def test_bvh_build_structure():
    mesh = primitives.uv_sphere(1.0, rings=8, sectors=12)
    v0, v1, v2 = _soup(mesh)
    b = bvh_mod.build(v0, v1, v2)
    nmin = np.asarray(b.node_min)
    nmax = np.asarray(b.node_max)
    assert (nmax[0] >= nmin[0]).all()
    # Root bbox contains everything
    assert np.allclose(nmin[0], np.minimum(np.minimum(v0, v1), v2).min(0), atol=1e-6)
    # Leaves cover all triangles exactly once
    count = np.asarray(b.node_count)
    start = np.asarray(b.node_start)
    covered = np.zeros(len(v0), bool)
    for n in range(len(count)):
        if count[n] > 0:
            assert not covered[start[n] : start[n] + count[n]].any()
            covered[start[n] : start[n] + count[n]] = True
    assert covered.all()


def test_bvh_matches_brute_force():
    rng = np.random.default_rng(2)
    mesh = primitives.uv_sphere(1.0, rings=10, sectors=16)
    v0, v1, v2 = _soup(mesh)
    b = bvh_mod.build(v0, v1, v2)

    n = 64
    o = np.stack([rng.uniform(-3, 3, n), rng.uniform(-3, 3, n), np.full(n, 4.0)], -1).astype(np.float32)
    d = np.stack([rng.uniform(-0.3, 0.3, n), rng.uniform(-0.3, 0.3, n), np.full(n, -1.0)], -1)
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)

    res = bvh_mod.intersect(b, jnp.asarray(o), jnp.asarray(d))
    t_oracle, tri_oracle = _brute_force(v0, v1, v2, o, d)

    hit = np.asarray(res["hit"])
    np.testing.assert_array_equal(hit, tri_oracle >= 0)
    np.testing.assert_allclose(
        np.asarray(res["t"])[hit], t_oracle[tri_oracle >= 0], rtol=1e-4
    )
    # winning triangle (map reordered index back to original id)
    got_tri = np.asarray(b.tri_index)[np.asarray(res["tri"])[hit]]
    want = tri_oracle[tri_oracle >= 0]
    # Ties (shared edges) can differ; depths must match (checked above).
    agree = (got_tri == want).mean()
    assert agree > 0.9


def test_any_hit_shadow():
    mesh = primitives.cube(2.0)
    v0, v1, v2 = _soup(mesh)
    b = bvh_mod.build(v0, v1, v2)
    o = jnp.asarray([[0.0, 0.0, 5.0], [5.0, 5.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    res = bvh_mod.intersect(b, o, d, any_hit=True)
    assert bool(res["hit"][0])
    assert not bool(res["hit"][1])


def test_t_max_limits():
    mesh = primitives.cube(2.0)
    v0, v1, v2 = _soup(mesh)
    b = bvh_mod.build(v0, v1, v2)
    o = jnp.asarray([[0.0, 0.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    res_near = bvh_mod.intersect(b, o, d, t_max=jnp.asarray([2.0]))
    res_far = bvh_mod.intersect(b, o, d, t_max=jnp.asarray([10.0]))
    assert not bool(res_near["hit"][0])  # cube front face at t=4
    assert bool(res_far["hit"][0])
    np.testing.assert_allclose(float(res_far["t"][0]), 4.0, atol=1e-4)


def test_bvh8_matches_binary():
    from sailor_tpu.raytracing import bvh8 as bvh8_mod

    rng = np.random.default_rng(4)
    mesh = primitives.uv_sphere(1.0, rings=10, sectors=16)
    v0, v1, v2 = _soup(mesh)
    b2 = bvh_mod.build(v0, v1, v2)
    b8 = bvh8_mod.build(v0, v1, v2)
    n = 128
    o = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), np.full(n, 3.0)], -1
    ).astype(np.float32)
    d = np.stack(
        [rng.uniform(-0.5, 0.5, n), rng.uniform(-0.5, 0.5, n), np.full(n, -1.0)], -1
    )
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    r2 = bvh_mod.intersect(b2, jnp.asarray(o), jnp.asarray(d))
    r8 = bvh8_mod.intersect(b8, jnp.asarray(o), jnp.asarray(d))
    np.testing.assert_array_equal(np.asarray(r2["hit"]), np.asarray(r8["hit"]))
    both = np.asarray(r2["hit"])
    np.testing.assert_allclose(
        np.asarray(r2["t"])[both], np.asarray(r8["t"])[both], rtol=1e-4
    )
    # BVH8 reports original tri ids; binary reports reordered
    orig2 = np.asarray(b2.tri_index)[np.asarray(r2["tri"])[both]]
    np.testing.assert_array_equal(orig2, np.asarray(r8["tri"])[both])
