"""Phase ablation of the path tracer's per-sample cost on the current backend.

Usage:
  python tools/profile_trace.py             # bench scene, 512x512
  python tools/profile_trace.py --small     # 256x256

Times, with forced syncs (jitted-scalar pull — block_until_ready is async
over the tunnel and identical executions are memoized, so every variant
perturbs its inputs per rep):
  - closest-hit intersect alone (sweep kernel + XLA prologue)
  - any-hit intersect alone
  - the slab/mask prologue alone (everything before the pallas_call)
  - one full sample pass (4 bounces)
  - shade-only (intersect results fixed, _shade_hit + BRDF + NEE math)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, reps=3, **kw):
    import jax
    import jax.numpy as jnp

    sumf = jax.jit(lambda t: jnp.sum(t[0] if isinstance(t, tuple) else t))

    def pull(res):
        if isinstance(res, dict):
            float(jax.jit(lambda r: r["t"].sum())(res))
        else:
            float(sumf(res))

    pull(fn(*args, **kw))  # compile
    ts = []
    for r in range(reps):
        t0 = time.time()
        pull(fn(*args, **kw, _rep=r) if "_rep" in fn.__code__.co_varnames
             else fn(*args, **kw))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--bounces", type=int, default=4)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    sys.argv = ["bench.py"]
    import bench
    from sailor_tpu.core import math3d as m3
    from sailor_tpu.raytracing import path_tracer as pt
    from sailor_tpu.raytracing import sweep as sweep_mod
    from sailor_tpu.assets import primitives

    size = 256 if args.small else 512
    meshes = [(primitives.plane(40.0), np.eye(4))]
    rng = np.random.default_rng(5)
    for i in range(8):
        t = np.eye(4)
        t[:3, 3] = [(i % 4 - 1.5) * 2.2, 0.9, (i // 4 - 0.5) * 2.4]
        meshes.append((primitives.uv_sphere(0.9, 24, 48), t))
    soup = primitives.merge(meshes)
    scene = pt.scene_from_mesh(soup)
    print(f"# {scene.num_triangles} tris, "
          f"{scene.sweep.n_clusters} clusters, {size}x{size}",
          file=sys.stderr)

    cam = jnp.asarray([0.0, 4.0, 9.0])
    view = m3.look_at(cam, jnp.asarray([0.0, 0.6, 0.0]),
                      jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 4, 1.0, 0.1, 100.0)
    o, d = pt.camera_rays(cam, view, proj, size, size, 0.5, 0.5)
    r = o.shape[0]

    # incoherent bounce-like rays: random directions from surface points
    key = jax.random.PRNGKey(3)
    db = jax.random.normal(key, (r, 3))
    db = db / jnp.linalg.norm(db, axis=1, keepdims=True)
    ob = o + d * 5.0

    def perturb(x, rep):
        return x + 1e-6 * (rep + 1)

    # closest-hit, coherent
    f = jax.jit(lambda o, d: sweep_mod.intersect(scene.sweep, o, d))
    t_cl = timed(lambda _rep=0: f(perturb(o, _rep), d))
    print(f"closest coherent:   {t_cl*1e3:7.1f} ms  "
          f"({r/t_cl/1e6:6.1f} Mrays/s)")

    t_ic = timed(lambda _rep=0: f(perturb(ob, _rep), db))
    print(f"closest incoherent: {t_ic*1e3:7.1f} ms  "
          f"({r/t_ic/1e6:6.1f} Mrays/s)")

    fa = jax.jit(lambda o, d: sweep_mod.intersect(
        scene.sweep, o, d, any_hit=True))
    t_ah = timed(lambda _rep=0: fa(perturb(o, _rep), d))
    print(f"any-hit coherent:   {t_ah*1e3:7.1f} ms  "
          f"({r/t_ah/1e6:6.1f} Mrays/s)")

    # prologue alone: slab + masks + feats (no pallas_call) — replicate
    # intersect's XLA-side work
    def prologue(o, d):
        sw = scene.sweep
        from sailor_tpu.kernels import common
        rb = sweep_mod.RAY_BLOCK
        rpad = common.round_up(max(r, rb), rb)
        nsub = rb // sweep_mod.SUB
        nb = rpad // rb
        nc = sw.n_clusters
        o_ = jnp.pad(o, ((0, rpad - r), (0, 0)))
        d_ = jnp.pad(d, ((0, rpad - r), (0, 0)), constant_values=1e-8)
        tmax = jnp.full((rpad,), jnp.inf).at[r:].set(-1.0)
        inv = jnp.where(jnp.abs(d_) > 1e-12, 1.0 / d_, 1e12)
        oinv = o_ * inv
        tn = jnp.full((rpad, nc), -jnp.inf)
        tf = jnp.full((rpad, nc), jnp.inf)
        for k in range(3):
            a = inv[:, k:k + 1] * sw.cl_min[None, :, k] - oinv[:, k:k + 1]
            b_ = inv[:, k:k + 1] * sw.cl_max[None, :, k] - oinv[:, k:k + 1]
            tn = jnp.maximum(tn, jnp.minimum(a, b_))
            tf = jnp.minimum(tf, jnp.maximum(a, b_))
        hit_c = (tn <= jnp.minimum(tf, tmax[:, None])) & (tf > 0.0)
        entry = jnp.where(hit_c, jnp.maximum(tn, 0.0), jnp.inf)
        e_sub = jnp.min(entry.reshape(nb * nsub, sweep_mod.SUB, nc), axis=1)
        e_blk = jnp.min(e_sub.reshape(nb, nsub, nc), axis=1)
        order = jnp.argsort(e_blk, axis=1).astype(jnp.int32)
        e_sub_p = jnp.take_along_axis(
            e_sub.reshape(nb, nsub, nc), order[:, None, :], axis=2)
        e_bits = jax.lax.bitcast_convert_type(e_sub_p, jnp.int32)
        m = jnp.cross(o_, d_)
        z1 = jnp.zeros((rpad, 1))
        feats = jnp.concatenate(
            [d_, m, z1, z1, o_, jnp.ones((rpad, 1)), d_, z1], axis=1)
        return e_bits.sum() + feats.sum() + order.sum()

    fp = jax.jit(prologue)
    t_pr = timed(lambda _rep=0: fp(perturb(o, _rep), d))
    print(f"prologue alone:     {t_pr*1e3:7.1f} ms")

    # full sample pass
    keys = jax.random.split(jax.random.PRNGKey(0), 5 * args.bounces)

    @jax.jit
    def sample(o, d):
        rad, cnt = pt._trace_one_sample(scene, o, d, keys, args.bounces,
                                        jnp.asarray(0.0))
        return rad
    t_s = timed(lambda _rep=0: sample(perturb(o, _rep), d))
    print(f"one sample pass:    {t_s*1e3:7.1f} ms  ({args.bounces} bounces)")

    # shade alone: fixed intersect result
    res = jax.jit(lambda o, d: sweep_mod.intersect(scene.sweep, o, d))(o, d)

    @jax.jit
    def shade(o, d, res):
        pos, n, entering, mat = pt._shade_hit(scene, res, o, d)
        return pos.sum() + n.sum() + mat["albedo"].sum()
    t_sh = timed(lambda _rep=0: shade(perturb(o, _rep), d, res))
    print(f"shade_hit alone:    {t_sh*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
