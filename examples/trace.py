"""Path tracer demo: material ball grid on a ground plane, sun + sky.

Usage: python examples/trace.py [--size 256] [--spp 16] [--bounces 4]
       [--out /tmp/trace.png] [--tpu] [--gltf path.glb]
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
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--bounces", type=int, default=4)
    ap.add_argument("--out", default="/tmp/trace.png")
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--gltf", default=None, help="render a GLTF/GLB file instead")
    # PathTracer.cpp:30-73 CLI parity: camera position/target + flat
    # ambient override + raymarched-sky toggle
    ap.add_argument("--camera", type=float, nargs=3, default=[0.0, 4.0, 9.0])
    ap.add_argument("--target", type=float, nargs=3, default=[0.0, 0.6, 0.0])
    ap.add_argument("--ambient", type=float, nargs=3, default=None,
                    help="flat ambient sky radiance (overrides gradient)")
    ap.add_argument("--sky", action="store_true",
                    help="bake the engine's raymarched SkyNode environment")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
        # single-graph process: the AOT executable cache is safe
        # on CPU here (only one deserialized program per process)
        import os as _os
        _os.environ.setdefault("SAILOR_AOT_CACHE", "1")
        from sailor_tpu.assets import shader_cache as _sc
        _sc.rescope_for_cpu()  # CPU cache entries are host-specific
    import imageio.v2 as imageio
    import jax.numpy as jnp

    from sailor_tpu.assets import primitives
    from sailor_tpu.core import math3d as m3
    from sailor_tpu.kernels import tonemap
    from sailor_tpu.raytracing import path_tracer as pt

    if args.gltf:
        from sailor_tpu.assets import gltf

        soup, materials = gltf.load_merged(args.gltf)
        print(f"gltf: {len(soup['position'])} verts, {len(soup['indices'])} tris")
    else:
        meshes = [(primitives.plane(40.0), np.eye(4))]
        mats = {"albedo": [[0.65, 0.65, 0.65]], "metallic": [0.0],
                "roughness": [0.7], "emissive": [[0, 0, 0]]}
        mat_ids = [0]
        k = 1
        for i, metallic in enumerate((0.0, 1.0)):
            for j, rough in enumerate((0.08, 0.3, 0.6, 0.9)):
                t = np.eye(4)
                t[:3, 3] = [(j - 1.5) * 2.2, 0.9, (i - 0.5) * 2.4]
                meshes.append((primitives.uv_sphere(0.9, 24, 48), t))
                mats["albedo"].append([0.8, 0.35, 0.25] if metallic < 0.5 else [0.95, 0.78, 0.45])
                mats["metallic"].append(metallic)
                mats["roughness"].append(rough)
                mats["emissive"].append([0, 0, 0])
                mat_ids.append(k)
                k += 1
        soup = primitives.merge(meshes, mat_ids)
        materials = {k2: np.asarray(v, np.float32) for k2, v in mats.items()}

    sky_kw = {}
    if args.ambient is not None:
        sky_kw = {"sky_zenith": args.ambient, "sky_horizon": args.ambient}
    if args.sky:
        from sailor_tpu.kernels.sky import SkyParams

        sky_kw["sky"] = SkyParams.default()
    t0 = time.time()
    scene = pt.scene_from_mesh(soup, materials, **sky_kw)
    print(f"BVH build: {time.time()-t0:.2f}s  ({scene.num_triangles} tris)")

    w = h = args.size
    cam = jnp.asarray(args.camera)
    view = m3.look_at(cam, jnp.asarray(args.target), jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 4, w / h, 0.1, 100.0)

    t0 = time.time()
    img, rays = pt.render_cached(
        scene, cam, view, proj, width=w, height=h, spp=args.spp,
        max_bounces=args.bounces, key=jax.random.PRNGKey(1),
    )
    img.block_until_ready()
    dt = time.time() - t0
    print(f"compile+render: {dt:.2f}s")

    t0 = time.time()
    img, rays = pt.render_cached(
        scene, cam, view, proj, width=w, height=h, spp=args.spp,
        max_bounces=args.bounces, key=jax.random.PRNGKey(2),
    )
    img.block_until_ready()
    dt = time.time() - t0
    mrays = float(rays) / dt / 1e6
    print(f"render: {dt:.2f}s  {float(rays)/1e6:.1f} Mrays  -> {mrays:.2f} Mrays/s")

    ldr = tonemap.tonemap(img, avg_luminance=float(img.mean()) * 0.6, mode="aces")
    out = np.asarray(m3.linear_to_srgb(ldr) * 255).astype(np.uint8)
    imageio.imwrite(args.out, out)
    print("wrote", args.out)


if __name__ == "__main__":
    sys.exit(main())
