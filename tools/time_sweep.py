"""Clean marginal timing of the sweep intersector on the current backend.

Chains K dependent intersect dispatches inside ONE jit (each re-aims rays
using the previous result so nothing is memoized or dead-code-eliminated)
and reports (T(K) - T(1)) / (K - 1): per-dispatch cost free of tunnel
eager-op and transfer overhead that pollutes per-call timing.

Usage:
  python tools/time_sweep.py                 # current env knobs
  SAILOR_SWEEP_CLUSTER=512 python tools/time_sweep.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from sailor_tpu.assets import primitives
    from sailor_tpu.core import math3d as m3
    from sailor_tpu.raytracing import path_tracer as pt
    from sailor_tpu.raytracing import sweep as sweep_mod

    size = int(os.environ.get("TS_SIZE", "512"))
    K = int(os.environ.get("TS_K", "9"))
    any_hit = os.environ.get("TS_ANY_HIT", "0") == "1"
    incoherent = os.environ.get("TS_INCOHERENT", "0") == "1"

    meshes = [(primitives.plane(40.0), np.eye(4))]
    rng = np.random.default_rng(5)
    for i in range(8):
        t = np.eye(4)
        t[:3, 3] = [(i % 4 - 1.5) * 2.2, 0.9, (i // 4 - 0.5) * 2.4]
        meshes.append((primitives.uv_sphere(0.9, 24, 48), t))
    soup = primitives.merge(meshes)
    scene = pt.scene_from_mesh(soup)
    sw = scene.sweep
    print(f"# {scene.num_triangles} tris, {sw.n_clusters} clusters, "
          f"CLUSTER={sweep_mod.CLUSTER} RAY_BLOCK={sweep_mod.RAY_BLOCK} "
          f"SUB={sweep_mod.SUB} size={size} any_hit={any_hit} "
          f"incoherent={incoherent}", file=sys.stderr)

    cam = jnp.asarray([0.0, 4.0, 9.0])
    view = m3.look_at(cam, jnp.asarray([0.0, 0.6, 0.0]),
                      jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 4, 1.0, 0.1, 100.0)
    o, d = pt.camera_rays(cam, view, proj, size, size, 0.5, 0.5)
    r = o.shape[0]
    if incoherent:
        key = jax.random.PRNGKey(3)
        d = jax.random.normal(key, (r, 3))
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        o = o + 5.0

    def chain(o, d, salt, k):
        def body(i, carry):
            o_, d_, acc = carry
            res = sweep_mod.intersect(sw, o_, d_, any_hit=any_hit)
            # re-aim using the result: forces a dependency chain
            o2 = o_ + 1e-7 * res["t"][:, None] + salt
            return (o2, d_, acc + jnp.sum(res["t"]))

        return jax.lax.fori_loop(0, k, body, (o, d, jnp.float32(0.0)))[2]

    f1 = jax.jit(lambda o, d, s: chain(o, d, s, 1))
    fk = jax.jit(lambda o, d, s: chain(o, d, s, K))

    def timed(f, reps=3):
        float(f(o, d, jnp.float32(0.0)))  # compile
        best = 1e9
        for i in range(reps):
            t0 = time.time()
            float(f(o, d, jnp.float32(1e-9 * (i + 1))))
            best = min(best, time.time() - t0)
        return best

    t1 = timed(f1)
    tk = timed(fk)
    per = (tk - t1) / (K - 1)
    print(f"T(1)={t1 * 1e3:.1f} ms  T({K})={tk * 1e3:.1f} ms  "
          f"per-dispatch={per * 1e3:.2f} ms  "
          f"({r / per / 1e6:.1f} Mrays/s)")


if __name__ == "__main__":
    main()
