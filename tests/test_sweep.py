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
