"""Marginal timing of the visibility raster hot path on the current backend.

Times (a) bin_sorted, (b) rasterize_stream, (c) the fused resolve_stream —
each as a K-long dependency chain inside ONE jit, reporting
(T(K) - T(1)) / (K - 1) per stage: dispatch/tunnel overhead cancels.

TILE_H is a module constant read from SAILOR_RASTER_TILE_H at import, so
sweep via subprocesses:
  for th in 8 16 32 64; do SAILOR_RASTER_TILE_H=$th python tools/time_raster.py; done
Knobs: TR_CHUNK (stream chunk, default 256), TR_W/TR_H (viewport),
TR_OBJECTS, TR_MXU=1 (MXU kernel A/B).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from sailor_tpu.kernels.common import round_up
    from sailor_tpu.raster import interpolate, setup as rsetup, tile_raster

    W = int(os.environ.get("TR_W", "1920"))
    H = int(os.environ.get("TR_H", "1088"))
    objects = int(os.environ.get("TR_OBJECTS", "96"))
    chunk = int(os.environ.get("TR_CHUNK", "256"))
    mxu = os.environ.get("TR_MXU", "0") == "1"
    worklist = os.environ.get("TR_WORKLIST", "0") == "1"
    K = int(os.environ.get("TR_K", "7"))

    scene = bench._build_scene(W, H, 8, objects)
    geo = scene.geometry
    vp = scene.frame.view_projection
    pw = round_up(W, tile_raster.TILE_W)
    ph = round_up(H, tile_raster.TILE_H)
    tiles_x, tiles_y = pw // tile_raster.TILE_W, ph // tile_raster.TILE_H
    kmax = max(1, -(-4096 // chunk))

    tri, aabb = rsetup.triangle_setup(geo, vp, width=W, height=H, cull="back")
    attrs = interpolate.pack_triangle_attributes(geo, tri.src_id,
                                                 scene.materials)
    inv_vp = jnp.linalg.inv(vp)
    cam = scene.frame.camera_position

    print(f"# tris={geo.indices.shape[0]} raster_slots={tri.valid.shape[0]} "
          f"TILE_H={tile_raster.TILE_H} chunk={chunk} kmax={kmax} "
          f"tiles={tiles_y}x{tiles_x} mxu={mxu} worklist={worklist}",
          file=sys.stderr)

    rb0 = rsetup.bin_sorted(
        tri.valid, aabb, tiles_x=tiles_x, tiles_y=tiles_y,
        tile_w=tile_raster.TILE_W, tile_h=tile_raster.TILE_H,
    )
    kmax_needed = int(jax.block_until_ready(
        ((rb0[1] % chunk + rb0[2]) + chunk - 1) // chunk
    ).max())
    print(f"# n_big={int(rb0[4])} big_overflow={int(rb0[5])} "
          f"live_keys={int((rb0[0] >= 0).sum())} "
          f"max_windows_per_tile={kmax_needed} (kmax={kmax})",
          file=sys.stderr)
    rows, big_rows, na = tile_raster.build_stream_rows(
        tri, aabb, rb0[0], rb0[3], attrs=attrs, chunk=chunk
    )

    def chain(stage, k, salt):
        def body(i, acc):
            return acc * 0.0 + stage(acc * 1e-20 + salt)

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    def t_raster(z):
        tri2 = tri.replace(zplane=tri.zplane.at[:, 2].add(z * 1e-20))
        pre = (rows.at[:, 11].add(z * 1e-20), big_rows)
        if worklist:
            d, t, _ = tile_raster.rasterize_worklist(
                tri2, aabb, *rb0[:5], tiles_y=tiles_y, tiles_x=tiles_x,
                chunk=chunk, prebuilt=pre,
            )
        else:
            d, t, _ = tile_raster.rasterize_stream(
                tri2, aabb, *rb0[:5], tiles_y=tiles_y, tiles_x=tiles_x,
                chunk=chunk, kmax=kmax, prebuilt=pre, mxu=mxu,
            )
        return d.sum() + t.sum()

    tid_const = None

    def t_resolve(z):
        if worklist:
            ps = tile_raster.resolve_worklist(
                rows.at[:, 17].add(z * 1e-20), big_rows, tid_const,
                rb0[1], rb0[2], rb0[4], inv_vp, cam,
                tiles_y=tiles_y, tiles_x=tiles_x, na=na, width=W,
                full_height=H, chunk=chunk,
            )
        else:
            ps = tile_raster.resolve_stream(
                rows.at[:, 17].add(z * 1e-20), big_rows, tid_const,
                rb0[1], rb0[2], rb0[4], inv_vp, cam,
                tiles_y=tiles_y, tiles_x=tiles_x, na=na, width=W,
                full_height=H, chunk=chunk, kmax=kmax,
            )
        return sum(p.sum() for p in ps)

    # a real tid map for the resolve
    d0, tid0, _ = tile_raster.rasterize_stream(
        tri, aabb, *rb0[:5], tiles_y=tiles_y, tiles_x=tiles_x,
        chunk=chunk, kmax=kmax, prebuilt=(rows, big_rows), mxu=mxu,
    )
    tid_const = jax.block_until_ready(tid0)

    for name, stage in (("raster", t_raster), ("resolve", t_resolve)):
        f1 = jax.jit(lambda s, _st=stage: chain(_st, 1, s))
        fk = jax.jit(lambda s, _st=stage: chain(_st, K, s))

        def timed(f, reps=3):
            float(f(jnp.float32(0.0)))
            best = 1e9
            for i in range(reps):
                t0 = time.time()
                float(f(jnp.float32(1e-9 * (i + 1))))
                best = min(best, time.time() - t0)
            return best

        t1, tk = timed(f1), timed(fk)
        per = (tk - t1) / (K - 1)
        print(f"{name:<8} per-dispatch {per * 1e3:7.2f} ms  "
              f"(T1={t1 * 1e3:.1f} TK={tk * 1e3:.1f})")


if __name__ == "__main__":
    main()
