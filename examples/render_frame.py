"""Canonical end-to-end frame: the FULL engine frame graph -> PNG.

Usage: python examples/render_frame.py [--width 640] [--height 384]
       [--lights 64] [--out /tmp/frame.png] [--tpu]

Renders cubes + spheres on a ground plane lit by colored point lights and
a directional sun through `content/DefaultRenderer.renderer` — the same
node pipeline the engine runs (visibility raster, Forward+ culling+shade,
CSM/EVSM, sky, HiZ, HBAO, bloom, exposure, tonemap, dither).
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
        # single-graph process: the AOT executable cache is safe
        # on CPU here (only one deserialized program per process)
        import os as _os
        _os.environ.setdefault("SAILOR_AOT_CACHE", "1")
        from sailor_tpu.assets import shader_cache as _sc
        _sc.rescope_for_cpu()  # CPU cache entries are host-specific
        from sailor_tpu import config as cfg

        cfg.interpret_pallas()

    import imageio.v2 as imageio
    import jax.numpy as jnp

    from sailor_tpu.assets import primitives
    from sailor_tpu.assets.materials import MaterialTable
    from sailor_tpu.core import math3d as m3
    from sailor_tpu.framegraph import FrameGraph, FrameGraphAsset
    from sailor_tpu.kernels.lights import DIRECTIONAL, POINT, Lights
    from sailor_tpu.kernels.sky import SkyParams
    from sailor_tpu.raster.setup import Geometry
    from sailor_tpu.rhi.scene_view import SceneView
    from sailor_tpu.rhi.types import FrameData

    W, H = args.width, args.height

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
    palette = np.asarray(
        [[0.6, 0.6, 0.6], [0.9, 0.3, 0.25], [0.3, 0.8, 0.35], [0.3, 0.4, 0.9]]
    )
    table = {
        "albedo": palette.astype(np.float32),
        "metallic": np.asarray([0.0, 0.1, 0.1, 0.4], np.float32),
        "roughness": np.asarray([0.75, 0.4, 0.5, 0.3], np.float32),
        "emissive": np.zeros((4, 3), np.float32),
    }
    materials = MaterialTable.from_host(table)

    geo = Geometry(
        position=jnp.asarray(soup["position"]),
        normal=jnp.asarray(soup["normal"]),
        uv=jnp.asarray(soup["uv"]),
        color=jnp.asarray(np.ones((len(soup["position"]), 4), np.float32)),
        indices=jnp.asarray(soup["indices"]),
        material_id=jnp.asarray(soup["material_id"]),
    )
    print(f"scene: {geo.position.shape[0]} verts, {geo.indices.shape[0]} tris")

    # --- camera + lights ---------------------------------------------------
    cam = jnp.asarray([10.0, 6.0, 12.0])
    view = m3.look_at(cam, jnp.asarray([0.0, 0.5, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 3, W / H, 0.1, 100.0)

    n = args.lights
    lp = np.stack(
        [rng.uniform(-9, 9, n), rng.uniform(0.5, 2.0, n), rng.uniform(-9, 9, n)], -1
    )
    lc = rng.uniform(0.3, 1.0, (n, 3)) * 4.0
    sun_dir = np.asarray([-0.35, -0.8, -0.3]) / np.linalg.norm([-0.35, -0.8, -0.3])
    lights = Lights.from_host(
        types=[DIRECTIONAL] + [POINT] * n,
        positions=np.concatenate([[[0, 0, 0]], lp]),
        directions=np.concatenate([[sun_dir], np.tile([[0, -1, 0]], (n, 1))]),
        intensities=np.concatenate([[[2.0, 1.9, 1.7]], lc]),
        attenuations=[[1, 0, 0.5]] * (n + 1),
        radii=[0.0] + [4.0] * n,
    )

    frame = FrameData.create(view, proj, cam, 0.1, 100.0, dt=1 / 60)
    sky = SkyParams.default(sun_direction=tuple(sun_dir))
    scene = SceneView.create(geo, lights, frame, sky=sky, materials=materials)

    # --- the engine's frame graph ------------------------------------------
    fg = FrameGraph(
        FrameGraphAsset.load(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "content/DefaultRenderer.renderer")
        ),
        W, H,
        config={"z_far": 100.0, "bin_capacity": 512, "bin_rounds": 3,
                "shadow_resolution": 512, "env_resolution": 16,
                "pallas_shading": args.tpu},
    )
    state = fg.initial_state()
    fg.prepare(scene, state)

    t0 = time.time()
    targets, state = fg.process(scene, state)
    jax.block_until_ready(targets["Final"])
    print(f"compile+first frame: {time.time()-t0:.2f}s  "
          f"avg_lum={float(state['avg_luminance']):.4f}")

    times = []
    for i in range(args.frames):
        s = scene.replace(frame=scene.frame.replace(
            delta_time=scene.frame.delta_time + 1e-6 * (i + 1)))
        t0 = time.time()
        targets, state = fg.process(s, state)
        jax.block_until_ready(targets["Final"])
        times.append(time.time() - t0)
    if times:
        ms = 1000 * min(times)
        print(f"frame: {ms:.2f} ms  ({1000/ms:.1f} FPS)  "
              f"overflow={int(targets.get('BinOverflow', 0))}")

    img = np.asarray(targets["Final"])
    imageio.imwrite(args.out, (np.clip(img, 0, 1) * 255).astype(np.uint8))
    print("wrote", args.out)


if __name__ == "__main__":
    sys.exit(main())
