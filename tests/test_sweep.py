"""MXU sweep tracer (raytracing/sweep.py) vs BVH8 traversal oracle."""

import jax.numpy as jnp
import numpy as np

from sailor_tpu.raytracing import bvh8, sweep


def _soup(seed=1, t=700):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-5, 5, (t, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-1, 1, (t, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-1, 1, (t, 3)).astype(np.float32)
    return v0, v1, v2


def test_sweep_matches_bvh8():
    v0, v1, v2 = _soup()
    b8 = bvh8.build(v0, v1, v2)
    sw = sweep.build(v0, v1, v2)
    rng = np.random.default_rng(2)
    r = 400
    org = rng.uniform(-8, 8, (r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    r8 = bvh8.intersect(b8, jnp.asarray(org), jnp.asarray(d))
    rs = sweep.intersect(sw, jnp.asarray(org), jnp.asarray(d))
    h8 = np.asarray(r8["hit"])
    hs = np.asarray(rs["hit"])
    assert (h8 == hs).all()
    both = h8 & hs
    np.testing.assert_allclose(
        np.asarray(r8["t"])[both], np.asarray(rs["t"])[both],
        rtol=1e-3, atol=1e-4,
    )
    assert (np.asarray(r8["tri"])[both] == np.asarray(rs["tri"])[both]).all()
    np.testing.assert_allclose(
        np.asarray(r8["u"])[both], np.asarray(rs["u"])[both], atol=2e-3
    )


def test_sweep_active_and_tmax():
    v0, v1, v2 = _soup(3)
    sw = sweep.build(v0, v1, v2)
    rng = np.random.default_rng(4)
    r = 200
    org = rng.uniform(-8, 8, (r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    act = rng.random(r) > 0.5
    ra = sweep.intersect(sw, jnp.asarray(org), jnp.asarray(d),
                         active=jnp.asarray(act))
    assert not np.asarray(ra["hit"])[~act].any()
    rt = sweep.intersect(sw, jnp.asarray(org), jnp.asarray(d), t_max=2.0)
    tt, ht = np.asarray(rt["t"]), np.asarray(rt["hit"])
    assert (tt[ht] <= 2.0 + 1e-3).all()


def test_fused_slab_entry_matches_xla():
    """_slab_entry_sub (fused VMEM kernel) == the XLA (Rp, C) slab pass."""
    import jax.numpy as jnp

    v0, v1, v2 = _soup(7, t=1500)
    sw = sweep.build(v0, v1, v2)
    rng = np.random.default_rng(9)
    rpad = sweep.RAY_BLOCK
    o = jnp.asarray(rng.uniform(-8, 8, (rpad, 3)).astype(np.float32))
    d = rng.normal(size=(rpad, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.full((rpad,), np.inf, jnp.float32)
    tmax = tmax.at[::5].set(-1.0)  # some dead rays, as the tracer sends
    z1 = jnp.zeros((rpad, 1))
    m = jnp.cross(o, d)
    feats = jnp.concatenate(
        [d, m, z1, z1, o, jnp.ones((rpad, 1)), d, z1], axis=1
    )
    got = np.asarray(sweep._slab_entry_sub(sw, feats, tmax, rpad))

    # reference: the original XLA formulation
    nc = sw.n_clusters
    inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 1e12)
    oinv = o * inv
    tn = jnp.full((rpad, nc), -jnp.inf)
    tf = jnp.full((rpad, nc), jnp.inf)
    for k in range(3):
        a = inv[:, k:k + 1] * sw.cl_min[None, :, k] - oinv[:, k:k + 1]
        b_ = inv[:, k:k + 1] * sw.cl_max[None, :, k] - oinv[:, k:k + 1]
        tn = jnp.maximum(tn, jnp.minimum(a, b_))
        tf = jnp.minimum(tf, jnp.maximum(a, b_))
    hit = (tn <= jnp.minimum(tf, tmax[:, None])) & (tf > 0.0)
    entry = jnp.where(hit, jnp.maximum(tn, 0.0), jnp.inf)
    want = np.asarray(
        jnp.min(entry.reshape(rpad // sweep.SUB, sweep.SUB, nc), axis=1)
    )
    fin = np.isfinite(want)
    assert (np.isfinite(got) == fin).all()
    np.testing.assert_allclose(got[fin], want[fin], rtol=1e-6, atol=1e-6)
