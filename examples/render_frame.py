"""Canonical end-to-end frame: raster -> Forward+ -> post chain -> PNG.

Usage: python examples/render_frame.py [--width 640] [--height 384]
       [--lights 64] [--out /tmp/frame.png] [--tpu]

Renders cubes + spheres on a ground plane lit by colored point lights and a
directional sun, through the full pipeline: visibility raster, G-buffer
resolve, tiled light culling, PBR shading, bloom, histogram eye adaptation,
ACES tonemap.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--lights", type=int, default=64)
    ap.add_argument("--out", default="/tmp/frame.png")
    ap.add_argument("--tpu", action="store_true", help="run on TPU (default CPU)")
    ap.add_argument("--frames", type=int, default=1, help="timed frames after warmup")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    import imageio.v2 as imageio
    import jax.numpy as jnp

    from sailor_tpu.assets import primitives
    from sailor_tpu.core import math3d as m3
    from sailor_tpu.kernels import bloom, histogram, light_culling, pbr, tonemap
    from sailor_tpu.kernels.lights import DIRECTIONAL, POINT, Lights
    from sailor_tpu.raster import rasterize
    from sailor_tpu.raster.setup import Geometry

    W, H = args.width, args.height
    TILE = light_culling.TILE
    assert W % TILE == 0 and H % TILE == 0, "use multiples of 16"

    # --- scene ------------------------------------------------------------
    rng = np.random.default_rng(7)
    instances = [(primitives.plane(40.0), np.eye(4))]
    mats = [0]
    for i in range(12):
        t = np.eye(4)
        t[:3, 3] = [rng.uniform(-8, 8), 0.5, rng.uniform(-8, 8)]
        mesh = primitives.cube(1.0) if i % 2 == 0 else primitives.uv_sphere(0.6)
        instances.append((mesh, t))
        mats.append(1 + i % 3)
    soup = primitives.merge(instances, mats)
    # vertex color by material id (until the material system lands)
    palette = np.asarray(
        [[0.6, 0.6, 0.6, 1], [0.9, 0.3, 0.25, 1], [0.3, 0.8, 0.35, 1], [0.3, 0.4, 0.9, 1]]
    )
    tri_mat = soup["material_id"]
    vert_mat = np.zeros(len(soup["position"]), np.int32)
    vert_mat[soup["indices"].ravel()] = np.repeat(tri_mat, 3)
    colors = palette[vert_mat].astype(np.float32)

    geo = Geometry(
        position=jnp.asarray(soup["position"]),
        normal=jnp.asarray(soup["normal"]),
        uv=jnp.asarray(soup["uv"]),
        color=jnp.asarray(colors),
        indices=jnp.asarray(soup["indices"]),
        material_id=jnp.asarray(soup["material_id"]),
    )
    print(f"scene: {geo.position.shape[0]} verts, {geo.indices.shape[0]} tris")

    # --- camera + lights ---------------------------------------------------
    cam = jnp.asarray([10.0, 6.0, 12.0])
    view = m3.look_at(cam, jnp.asarray([0.0, 0.5, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 3, W / H, 0.1, 100.0)
    vp = proj @ view

    n = args.lights
    lp = np.stack(
        [rng.uniform(-9, 9, n), rng.uniform(0.5, 2.0, n), rng.uniform(-9, 9, n)], -1
    )
    lc = rng.uniform(0.3, 1.0, (n, 3)) * 4.0
    types = [DIRECTIONAL] + [POINT] * n
    lights = Lights.from_host(
        types=types,
        positions=np.concatenate([[[0, 0, 0]], lp]),
        directions=np.concatenate(
            [[np.asarray([-0.35, -0.8, -0.3]) / np.linalg.norm([-0.35, -0.8, -0.3])],
             np.tile([[0, -1, 0]], (n, 1))]
        ),
        intensities=np.concatenate([[[2.0, 1.9, 1.7]], lc]),
        attenuations=[[1, 0, 0.5]] * (n + 1),
        radii=[0.0] + [4.0] * n,
    )

    # --- frame function ----------------------------------------------------
    def frame(geo, lights, view, proj, cam, prev_avg_lum):
        vp = proj @ view
        gbuffer, depth, tid, stats = rasterize(
            geo, vp, width=W, height=H, capacity=512, rounds=3
        )
        # linear view-space depth for culling (reverse-Z ndc -> linear)
        znear, zfar = 0.1, 100.0
        lin = jnp.where(
            depth > 0.0, znear * zfar / (depth * (zfar - znear) + znear), zfar
        )
        idx, counts = light_culling.cull_lights(
            lights, view, jnp.linalg.inv(proj), lin,
            tiles_y=H // TILE, tiles_x=W // TILE, viewport=(W, H), max_per_tile=32,
        )
        hdr = pbr.shade_forward_plus(gbuffer, lights, idx, cam, ambient=(0.03, 0.035, 0.05))
        hdr = hdr + bloom.bloom(hdr, threshold=1.0, intensity=0.35)
        hist = histogram.luminance_histogram(hdr)
        avg = histogram.adapt_average_luminance(hist, prev_avg_lum, W * H, dt=10.0)
        ldr = tonemap.tonemap(hdr, avg, mode="aces")
        return m3.linear_to_srgb(ldr), avg, stats

    jfr = jax.jit(frame)
    t0 = time.time()
    img, avg, stats = jfr(geo, lights, view, proj, cam, jnp.asarray(0.18))
    img.block_until_ready()
    print(f"compile+first frame: {time.time()-t0:.2f}s  avg_lum={float(avg):.4f}")

    times = []
    for _ in range(args.frames):
        t0 = time.time()
        img, avg, stats = jfr(geo, lights, view, proj, cam, avg)
        img.block_until_ready()
        times.append(time.time() - t0)
    if times:
        ms = 1000 * min(times)
        print(f"frame: {ms:.2f} ms  ({1000/ms:.1f} FPS)  overflow={int(stats['bin_overflow'])}")

    imageio.imwrite(args.out, np.asarray(img * 255).astype(np.uint8))
    print("wrote", args.out)


if __name__ == "__main__":
    sys.exit(main())
