"""Frame-time delta of HiZ occlusion culling on an occlusion-HEAVY scene.

The flagship bench camera overlooks a mostly-visible scene (4-6% culled,
BENCH_r03), which cannot show the feature paying for itself. This scene is
the adversarial case the reference's ComputeMeshCulling.shader targets: a
near wall hides a dense field of geometry behind it.

Usage: python tools/time_hiz.py          (1080p, ~2k cubes, 1k lights)
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
    from sailor_tpu.framegraph import FrameGraph, FrameGraphAsset
    from sailor_tpu.kernels.lights import DIRECTIONAL, POINT, Lights
    from sailor_tpu.kernels.sky import SkyParams
    from sailor_tpu.raster.setup import Geometry
    from sailor_tpu.rhi.scene_view import SceneView
    from sailor_tpu.rhi.types import FrameData

    W, H = int(os.environ.get("TH_W", "1920")), int(os.environ.get("TH_H", "1088"))
    n_cubes = int(os.environ.get("TH_CUBES", "2000"))
    n_lights = int(os.environ.get("TH_LIGHTS", "1000"))
    frames = int(os.environ.get("TH_FRAMES", "8"))

    rot = np.array(
        [[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], np.float32
    )
    t_wall = rot.copy()
    t_wall[:3, 3] = [0, 6.0, 0.0]
    items = [(primitives.plane(80.0), np.eye(4)),
             (primitives.plane(40.0), t_wall)]
    rng = np.random.default_rng(9)
    for i in range(n_cubes):
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = [rng.uniform(-15, 15), rng.uniform(0.4, 10.0),
                    rng.uniform(-25, -4)]
        items.append((primitives.cube(rng.uniform(0.5, 1.2)), t))
    soup = primitives.merge(items)
    geo = Geometry(
        position=jnp.asarray(soup["position"]),
        normal=jnp.asarray(soup["normal"]),
        uv=jnp.asarray(soup["uv"]),
        color=jnp.asarray(soup["color"]),
        indices=jnp.asarray(soup["indices"]),
        material_id=jnp.asarray(soup["material_id"]),
    )
    n = n_lights
    lp = np.stack([rng.uniform(-20, 20, n), rng.uniform(0.3, 8.0, n),
                   rng.uniform(-20, 12, n)], -1)
    lights = Lights.from_host(
        types=[DIRECTIONAL] + [POINT] * n,
        positions=np.concatenate([[[0, 0, 0]], lp]),
        directions=np.concatenate(
            [[[-0.3, -0.8, -0.3]], np.tile([[0, -1, 0]], (n, 1))]),
        intensities=np.concatenate(
            [[[3.0, 2.9, 2.6]], rng.uniform(0.3, 1, (n, 3)) * 6]),
        attenuations=[[1, 0, 0.8]] * (n + 1),
        radii=[0.0] + list(rng.uniform(2.0, 5.0, n)),
    )
    cam = jnp.asarray([0.0, 5.0, 18.0])
    view = m3.look_at(cam, jnp.asarray([0.0, 5.0, 0.0]),
                      jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 3, W / H, 0.1, 150.0)
    frame = FrameData.create(view, proj, cam, 0.1, 150.0, dt=1 / 60)
    scene = SceneView.create(
        geo, lights, frame,
        sky=SkyParams.default(sun_direction=(-0.3, -0.8, -0.3)),
    )
    print(f"# occlusion scene: {geo.indices.shape[0]} tris "
          f"({n_cubes} cubes behind a wall), {n} lights, {W}x{H}",
          file=sys.stderr)

    sumf = jax.jit(lambda x: jnp.sum(x))
    for hiz in (True, False):
        fg = FrameGraph(
            FrameGraphAsset.load(os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "content/DefaultRenderer.renderer")),
            W, H,
            config={"z_far": 150.0, "shadow_resolution": 1024,
                    "env_resolution": 32, "bin_capacity": 1024,
                    "bin_rounds": 4, "max_lights_per_tile": 128,
                    "pallas_shading": True, "fused_resolve": True,
                    "hiz_culling": hiz},
        )
        state = fg.initial_state()
        fg.prepare(scene, state)
        t0 = time.time()
        targets, state = fg.process(scene, state)
        float(sumf(targets["Final"]))
        print(f"# hiz={hiz}: compile+first {time.time()-t0:.1f}s",
              file=sys.stderr)
        times = []
        for rep in range(2):
            t0 = time.time()
            for i in range(frames):
                scene_i = scene.replace(frame=scene.frame.replace(
                    delta_time=scene.frame.delta_time
                    + 1e-6 * (rep * frames + i + 1)))
                targets, state = fg.process(scene_i, state)
            float(sumf(targets["Final"]))
            times.append((time.time() - t0) / frames)
        culled = int(targets.get("HiZCulledCount", 0))
        total = int(geo.indices.shape[0])
        print(f"hiz={int(hiz)}  frame {min(times)*1e3:.1f} ms  "
              f"({1.0/min(times):.2f} FPS)  culled {culled}/{total} "
              f"({100.0*culled/total:.1f}%)")


if __name__ == "__main__":
    main()
