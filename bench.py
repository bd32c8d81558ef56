"""Headline benchmark: Forward+ frame at 1080p with 1k point lights.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline target (BASELINE.md): >= 60 FPS at 1920x1080 Forward+ with 1k
lights on one TPU chip; vs_baseline = achieved_fps / 60.

Runs the full jitted pipeline (visibility raster -> tiled light culling ->
PBR shading -> bloom -> histogram exposure -> ACES tonemap) on a
Sponza-class procedural scene. Use --small for a quick smoke run, --trace
for the path-tracer benchmark instead (Mrays/s vs the 20 Mrays/s target).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _build_scene(width, height, num_lights, num_objects, rng_seed=11):
    import numpy as np
    import jax.numpy as jnp

    from sailor_tpu.assets import primitives
    from sailor_tpu.core import math3d as m3
    from sailor_tpu.kernels.lights import DIRECTIONAL, POINT, Lights
    from sailor_tpu.kernels.sky import SkyParams
    from sailor_tpu.raster.setup import Geometry
    from sailor_tpu.rhi.scene_view import SceneView
    from sailor_tpu.rhi.types import FrameData

    rng = np.random.default_rng(rng_seed)
    instances = [(primitives.plane(60.0), np.eye(4))]
    for i in range(num_objects):
        t = np.eye(4)
        t[:3, 3] = [rng.uniform(-20, 20), rng.uniform(0.4, 2.0), rng.uniform(-20, 20)]
        mesh = (
            primitives.cube(rng.uniform(0.8, 2.0))
            if i % 2
            else primitives.uv_sphere(rng.uniform(0.4, 1.0), 16, 32)
        )
        instances.append((mesh, t))
    soup = primitives.merge(instances)
    geo = Geometry(
        position=jnp.asarray(soup["position"]),
        normal=jnp.asarray(soup["normal"]),
        uv=jnp.asarray(soup["uv"]),
        color=jnp.asarray(soup["color"]) * jnp.asarray([0.65, 0.62, 0.6, 1.0]),
        indices=jnp.asarray(soup["indices"]),
        material_id=jnp.asarray(soup["material_id"]),
    )
    n = num_lights
    lp = np.stack(
        [rng.uniform(-22, 22, n), rng.uniform(0.3, 3.0, n), rng.uniform(-22, 22, n)],
        -1,
    )
    lights = Lights.from_host(
        types=[DIRECTIONAL] + [POINT] * n,
        positions=np.concatenate([[[0, 0, 0]], lp]),
        directions=np.concatenate([[[-0.35, -0.7, -0.3]], np.tile([[0, -1, 0]], (n, 1))]),
        intensities=np.concatenate([[[3.0, 2.9, 2.6]], rng.uniform(0.3, 1, (n, 3)) * 6]),
        attenuations=[[1, 0, 0.8]] * (n + 1),
        radii=[0.0] + list(rng.uniform(2.0, 5.0, n)),
    )
    cam = jnp.asarray([24.0, 10.0, 26.0])
    view = m3.look_at(cam, jnp.asarray([0.0, 0.5, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 3, width / height, 0.1, 150.0)
    frame = FrameData.create(view, proj, cam, 0.1, 150.0, dt=1 / 60)
    sky = SkyParams.default(sun_direction=(-0.35, -0.7, -0.3))
    print(
        f"# scene: {geo.indices.shape[0]} tris, {n} lights, {width}x{height}",
        file=sys.stderr,
    )
    return SceneView.create(geo, lights, frame, sky=sky)


DUCK_GLB = "/root/reference/Content/Models/DuckGlb/Duck.glb"


def _build_content_scene(width, height, num_lights, instances, rng_seed=13):
    """Sponza-class scene from REAL glTF content: a grid of textured Duck.glb
    instances (~4.2k tris each) over the ground plane, loaded through the
    full importer (textures + materials). Parity: the reference ships and
    renders real models (ModelImporter.cpp:382-520, Content/Models/*)."""
    import numpy as np
    import jax.numpy as jnp

    from sailor_tpu.assets import gltf, primitives
    from sailor_tpu.assets.materials import MaterialTable
    from sailor_tpu.core import math3d as m3
    from sailor_tpu.kernels.lights import DIRECTIONAL, POINT, Lights
    from sailor_tpu.kernels.sky import SkyParams
    from sailor_tpu.raster.setup import Geometry
    from sailor_tpu.rhi.scene_view import SceneView
    from sailor_tpu.rhi.types import FrameData

    soup, mats = gltf.load_merged(DUCK_GLB)
    g = gltf.GLTF.load(DUCK_GLB)
    images = g.load_texture_images()

    rng = np.random.default_rng(rng_seed)
    floor = primitives.merge([(primitives.plane(60.0), np.eye(4))])
    n_floor_mat = len(mats["albedo"])
    pos_l = [np.asarray(floor["position"], np.float32)]
    nrm_l = [np.asarray(floor["normal"], np.float32)]
    uv_l = [np.asarray(floor["uv"], np.float32)]
    col_l = [np.asarray(floor["color"], np.float32) * [0.55, 0.55, 0.58, 1.0]]
    idx_l = [np.asarray(floor["indices"], np.int32)]
    mat_l = [np.full(len(floor["indices"]), n_floor_mat, np.int32)]
    voff = len(floor["position"])
    side = int(np.ceil(np.sqrt(instances)))
    for i in range(instances):
        gx, gz = i % side, i // side
        ang = rng.uniform(0, 2 * np.pi)
        c, s = np.cos(ang), np.sin(ang)
        rot = np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        off = np.asarray(
            [(gx - side / 2) * 3.2 + rng.uniform(-0.5, 0.5), 0.0,
             (gz - side / 2) * 3.2 + rng.uniform(-0.5, 0.5)], np.float32,
        )
        pos_l.append(np.asarray(soup["position"]) @ rot.T + off)
        nrm_l.append(np.asarray(soup["normal"]) @ rot.T)
        uv_l.append(np.asarray(soup["uv"]))
        col_l.append(np.asarray(soup["color"]))
        idx_l.append(np.asarray(soup["indices"]) + voff)
        mat_l.append(np.asarray(soup["material_id"]))
        voff += len(soup["position"])
    # floor gets its own untextured material row appended to the table
    floor_row = {
        "albedo": [[0.6, 0.6, 0.62]], "metallic": [0.0], "roughness": [0.7],
        "emissive": [[0, 0, 0]], "albedo_texture": [-1],
        "normal_texture": [-1], "queue": [0], "alpha_cutoff": [0.5],
        "opacity": [1.0], "transmission": [0.0], "ior": [1.5],
        "atten_color": [[1, 1, 1]], "atten_dist": [0.0],
    }
    table = {
        k: np.concatenate(
            [np.asarray(v), np.asarray(floor_row[k], np.asarray(v).dtype)]
        )
        for k, v in mats.items() if k in floor_row
    }
    materials = MaterialTable.from_host(table, images, texture_size=256)

    geo = Geometry(
        position=jnp.asarray(np.concatenate(pos_l)),
        normal=jnp.asarray(np.concatenate(nrm_l)),
        uv=jnp.asarray(np.concatenate(uv_l)),
        color=jnp.asarray(np.concatenate(col_l)),
        indices=jnp.asarray(np.concatenate(idx_l)),
        material_id=jnp.asarray(np.concatenate(mat_l)),
    )
    n = num_lights
    lp = np.stack(
        [rng.uniform(-22, 22, n), rng.uniform(0.3, 3.0, n),
         rng.uniform(-22, 22, n)], -1,
    )
    lights = Lights.from_host(
        types=[DIRECTIONAL] + [POINT] * n,
        positions=np.concatenate([[[0, 0, 0]], lp]),
        directions=np.concatenate(
            [[[-0.35, -0.7, -0.3]], np.tile([[0, -1, 0]], (n, 1))]),
        intensities=np.concatenate(
            [[[3.0, 2.9, 2.6]], rng.uniform(0.3, 1, (n, 3)) * 6]),
        attenuations=[[1, 0, 0.8]] * (n + 1),
        radii=[0.0] + list(rng.uniform(2.0, 5.0, n)),
    )
    cam = jnp.asarray([20.0, 9.0, 22.0])
    view = m3.look_at(cam, jnp.asarray([0.0, 0.8, 0.0]),
                      jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 3, width / height, 0.1, 150.0)
    frame = FrameData.create(view, proj, cam, 0.1, 150.0, dt=1 / 60)
    sky = SkyParams.default(sun_direction=(-0.35, -0.7, -0.3))
    print(
        f"# content scene: {geo.indices.shape[0]} tris "
        f"({instances} Duck.glb instances, textured), {n} lights, "
        f"{width}x{height}", file=sys.stderr,
    )
    return SceneView.create(geo, lights, frame, sky=sky, materials=materials)


SPONZA_MTL = "/root/reference/Content/Models/Sponza/sponza.mtl"


def _build_sponza_scene(width, height, num_lights, rng_seed=17):
    """Sponza-materials atrium: the REFERENCE's actual Sponza material
    library (25 materials, ~70 real 1-2K textures: bricks/columns/fabrics/
    foliage masks/ORM maps via assets/objmtl) on a reconstructed atrium.
    The reference's sponza.obj geometry is NOT vendored (only its .asset
    sidecar ships), so the architecture is rebuilt procedurally — the
    material/texture-count axis, which is what separates Sponza-class
    scenes from single-texture content, is the real thing.
    Reference: Content/Models/Sponza/, ModelImporter.cpp:382-520."""
    import numpy as np
    import jax.numpy as jnp

    from sailor_tpu.assets import objmtl, primitives
    from sailor_tpu.assets.materials import MaterialTable
    from sailor_tpu.core import math3d as m3
    from sailor_tpu.kernels.lights import DIRECTIONAL, POINT, Lights
    from sailor_tpu.kernels.sky import SkyParams
    from sailor_tpu.raster.setup import Geometry
    from sailor_tpu.rhi.scene_view import SceneView
    from sailor_tpu.rhi.types import FrameData

    table, images, names = objmtl.load_mtl(SPONZA_MTL)
    rng = np.random.default_rng(rng_seed)

    def T(x, y, z, rx=0.0, ry=0.0, sx=1.0, sy=1.0, sz=1.0):
        c, s = np.cos(ry), np.sin(ry)
        r = np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        if rx:
            cx, sxn = np.cos(rx), np.sin(rx)
            r = r @ np.asarray(
                [[1, 0, 0], [0, cx, -sxn], [0, sxn, cx]], np.float32)
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = r @ np.diag([sx, sy, sz]).astype(np.float32)
        m[:3, 3] = [x, y, z]
        return m

    items, mids = [], []

    def add(mesh, mat_name, t):
        items.append((mesh, t))
        mids.append(names[mat_name])

    # atrium shell: floor, two long walls, ceiling strip, roof slabs
    add(primitives.plane(44.0, uv_scale=14.0), "floor", T(0, 0, 0))
    wall = primitives.cube(1.0)
    for z in (-11.0, 11.0):
        add(wall, "bricks", T(0, 2.5, z, sx=44.0, sy=5.0, sz=0.5))
    add(wall, "bricks", T(-22.0, 2.5, 0, sx=0.5, sy=5.0, sz=22.0))
    add(wall, "bricks", T(22.0, 2.5, 0, sx=0.5, sy=5.0, sz=22.0))
    # side galleries are covered; the wide nave is OPEN to the sky (the
    # real Sponza is an open courtyard — sunlight is the main illuminant)
    for z in (-9.2, 9.2):
        add(wall, "ceiling", T(0, 7.0, z, sx=44.0, sy=0.4, sz=2.6))
        add(wall, "roof", T(0, 7.5, z, sx=44.5, sy=0.3, sz=3.0))

    # two colonnades: column_a/b/c alternating, arches as lintels
    col = primitives.cylinder(0.45, 6.4, sectors=20, uv_scale=2.0)
    base = primitives.cube(1.0)
    for i in range(9):
        x = -16.0 + 4.0 * i
        for z in (-7.2, 7.2):
            kind = ("column_a", "column_b", "column_c")[i % 3]
            add(col, kind, T(x, 3.2, z))
            add(base, "details", T(x, 0.3, z, sx=1.1, sy=0.6, sz=1.1))
            add(base, "arch", T(x, 6.7, z, sx=4.2, sy=0.6, sz=1.0))

    # hanging fabrics (banners) down the nave + curtains on one wall
    fabrics = ["fabric_a", "fabric_c", "fabric_d", "fabric_e",
               "fabric_f", "fabric_g"]
    banner = primitives.quad(2.2, 3.0)
    for i, f in enumerate(fabrics):
        x = -12.5 + 5.0 * i
        add(banner, f, T(x, 5.2, -7.05))
        add(banner, fabrics[(i + 3) % 6], T(x, 5.2, 7.05))

    # foliage cards (leaf — Masked queue, real alpha mask) + vases
    leafq = primitives.quad(1.6, 1.6)
    for i in range(10):
        x = rng.uniform(-15, 15)
        z = rng.uniform(-3.5, 3.5)
        add(leafq, "leaf", T(x, rng.uniform(1.0, 2.2), z,
                             ry=rng.uniform(0, np.pi)))
    vase = primitives.uv_sphere(0.5, 12, 24)
    for i in range(6):
        add(vase, "vase_round", T(-14.0 + 5.6 * i, 0.9, 0.0, sy=1.4))
        add(vase, "vase_hanging",
            T(-14.0 + 5.6 * i, 6.0, -5.0, sx=0.5, sy=0.7, sz=0.5))
    pole = primitives.cylinder(0.07, 3.4, sectors=10)
    for i in range(6):
        add(pole, "flagpole", T(-12.5 + 5.0 * i, 6.9, -7.05, rx=0.9))

    soup = primitives.merge(items, material_ids=mids)
    materials = MaterialTable.from_host(table, images, texture_size=256)
    geo = Geometry(
        position=jnp.asarray(soup["position"]),
        normal=jnp.asarray(soup["normal"]),
        uv=jnp.asarray(soup["uv"]),
        color=jnp.asarray(soup["color"]),
        indices=jnp.asarray(soup["indices"]),
        material_id=jnp.asarray(soup["material_id"]),
    )
    n = num_lights
    lp = np.stack(
        [rng.uniform(-16, 16, n), rng.uniform(0.4, 7.0, n),
         rng.uniform(-6, 6, n)], -1,
    )
    lights = Lights.from_host(
        types=[DIRECTIONAL] + [POINT] * n,
        positions=np.concatenate([[[0, 0, 0]], lp]),
        directions=np.concatenate(
            [[[-0.2, -0.95, -0.12]], np.tile([[0, -1, 0]], (n, 1))]),
        intensities=np.concatenate(
            [[[9.0, 8.4, 7.2]], rng.uniform(0.4, 1, (n, 3)) * 9]),
        attenuations=[[1, 0, 0.9]] * (n + 1),
        radii=[0.0] + list(rng.uniform(1.5, 4.0, n)),
    )
    cam = jnp.asarray([16.0, 3.0, 0.0])
    view = m3.look_at(cam, jnp.asarray([-16.0, 1.2, -0.5]),
                      jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 3, width / height, 0.1, 150.0)
    frame = FrameData.create(view, proj, cam, 0.1, 150.0, dt=1 / 60)
    sky = SkyParams.default(sun_direction=(-0.5, -0.72, -0.3))
    print(
        f"# sponza-materials atrium: {geo.indices.shape[0]} tris, "
        f"{len(images)} real textures, {len(names)} materials, {n} lights, "
        f"{width}x{height}", file=sys.stderr,
    )
    return SceneView.create(geo, lights, frame, sky=sky, materials=materials)


def bench_forward(width, height, num_lights, num_objects, frames,
                  content=False, instances=60, sponza=False):
    import jax

    from sailor_tpu.framegraph import FrameGraph, FrameGraphAsset

    if sponza:
        scene = _build_sponza_scene(width, height, num_lights)
    elif content:
        scene = _build_content_scene(width, height, num_lights, instances)
    else:
        scene = _build_scene(width, height, num_lights, num_objects)
    fg = FrameGraph(
        FrameGraphAsset.load(
            os.path.join(os.path.dirname(__file__), "content/DefaultRenderer.renderer")
        ),
        width,
        height,
        config={
            "z_far": 150.0,
            "shadow_resolution": 1024,
            "env_resolution": 32,
            "bin_capacity": 1024,
            "bin_rounds": 4,
            "max_lights_per_tile": 128,
            "pallas_shading": True,
            # A/B knob: fused visibility resolve (resolve_gbuffer_stream)
            "fused_resolve": os.environ.get("SAILOR_FUSED_RESOLVE", "1") == "1",
            # A/B knob: MXU plane-evaluation raster kernel
            "raster_mxu": os.environ.get("SAILOR_RASTER_MXU", "0") == "1",
        },
    )
    import jax.numpy as jnp

    state = fg.initial_state()
    fg.prepare(scene, state)
    sumf = jax.jit(lambda x: jnp.sum(x))
    # first-frame phases: trace (python) vs compile-or-cache-load+execute.
    # lower=True stops after tracing+lowering, so t_trace isolates the
    # host-side graph build; the compile cache makes the remainder a
    # deserialize+upload on warm runs (log the cache size for context).
    from sailor_tpu.assets import aot_cache, shader_cache

    cs = shader_cache.stats()
    print(f"# shader cache: {cs['entries']} entries, "
          f"{cs['bytes']/1e9:.2f} GB", file=sys.stderr)
    acs = aot_cache.stats()
    print(f"# aot cache: {acs['entries']} entries, "
          f"{acs['bytes']/1e6:.0f} MB", file=sys.stderr)
    if not aot_cache.enabled():
        # phase probe only without the AOT cache — with it, process()
        # itself logs either "miss: trace+lower Xs, compile Ys" or
        # "hit: load Zs" and a separate .lower() would double-pay.
        t0 = time.time()
        try:
            if fg._jitted is None:
                fg._jitted = jax.jit(fg._run)
            fg._jitted.lower(scene, state)
            print(f"# trace+lower: {time.time()-t0:.1f}s", file=sys.stderr)
        except Exception as e:
            print(f"# trace+lower probe failed: {e}", file=sys.stderr)
    t0 = time.time()
    targets, state = fg.process(scene, state)
    float(sumf(targets["Final"]))  # block_until_ready does NOT wait on axon
    print(f"# compile+first frame: {time.time()-t0:.1f}s", file=sys.stderr)

    # Steady-state throughput: chain `frames` frames (state threaded, dt
    # varied so no execution is byte-identical/memoizable) and force one
    # real sync at the end — the scalar-pull RTT amortizes across the span.
    times = []
    for rep in range(2):
        t0 = time.time()
        for i in range(frames):
            scene_i = scene.replace(
                frame=scene.frame.replace(
                    delta_time=scene.frame.delta_time
                    + 1e-6 * (rep * frames + i + 1)
                )
            )
            targets, state = fg.process(scene_i, state)
        float(sumf(targets["Final"]))
        times.append((time.time() - t0) / frames)
    best = min(times)
    fps = 1.0 / best
    print(f"# avg frame time per {frames}-frame span (s): "
          f"{[round(t, 4) for t in times]}", file=sys.stderr)
    if "HiZCulledCount" in targets:
        # occlusion culling vs the previous frame's pyramid is on by
        # default (ComputeMeshCulling.shader analog)
        print(f"# hiz culled tris (last frame): "
              f"{int(targets['HiZCulledCount'])}", file=sys.stderr)
    try:
        _print_roofline(scene, targets, width, height, fps)
    except Exception as e:
        print(f"# roofline estimate failed: {e}", file=sys.stderr)
    tag = (" sponza-materials" if sponza
           else " textured-GLTF" if content else "")
    return {
        "metric": f"forward+{tag} FPS @{width}x{height}, {num_lights} lights",
        "value": round(fps, 2),
        "unit": "FPS",
        "vs_baseline": round(fps / 60.0, 3),
    }


def _print_roofline(scene, targets, width, height, fps):
    """Coarse per-frame FLOP estimate + achieved-vs-peak line (VERDICT r3
    #7). Counts the three compute-heavy stages from actual per-frame work
    (binned raster slots, per-tile light counts, resolve one-hot MACs);
    everything else is gather/latency-bound and contributes ~0 FLOPs.
    v5e peak: ~197 TFLOP/s bf16 MXU; the raster/shade mix runs mostly
    f32 on the VPU (~ a few TFLOP/s class), so low % of peak here means
    LATENCY/VPU-bound, not idle hardware."""
    import jax.numpy as jnp

    from sailor_tpu.kernels.common import round_up
    from sailor_tpu.raster import setup as rsetup, tile_raster

    tw, th = tile_raster.TILE_W, tile_raster.TILE_H
    tx, ty = round_up(width, tw) // tw, round_up(height, th) // th
    tri, aabb = rsetup.triangle_setup(
        scene.geometry, scene.frame.view_projection,
        width=width, height=height, cull="back",
    )
    rb = rsetup.bin_sorted(
        tri.valid, aabb, tiles_x=tx, tiles_y=ty, tile_w=tw, tile_h=th
    )
    chunk = 128
    counts = rb[2].astype(jnp.int32)
    starts = rb[1].astype(jnp.int32)
    c0 = starts // chunk
    c1 = jnp.maximum((starts + counts + chunk - 1) // chunk, c0 + 1)
    windows = float(jnp.sum(c1 - c0))
    px_tile = th * tw
    # raster: ~35 VPU flops per candidate-pixel edge/z/AABB test
    f_raster = windows * chunk * px_tile * 35.0
    # resolve: one-hot MXU accumulate, A~56 attr rows, 2 flops per MAC
    f_resolve = windows * chunk * px_tile * 56.0 * 2.0
    # shade: ~220 flops per (light, pixel) Cook-Torrance step
    if "LightCounts" in targets:
        lw = float(jnp.sum(targets["LightCounts"])) * 16 * 16
    else:
        lw = width * height * 8.0
    f_shade = lw * 220.0
    total = f_raster + f_resolve + f_shade
    ach = total * fps
    print(
        f"# roofline: ~{total/1e9:.1f} GFLOP/frame "
        f"(raster {f_raster/1e9:.1f} + resolve {f_resolve/1e9:.1f} "
        f"+ shade {f_shade/1e9:.1f}), achieved {ach/1e12:.3f} TFLOP/s "
        f"= {100*ach/197e12:.2f}% of v5e bf16 peak — the frame is "
        f"latency/VPU-bound, not MXU-bound", file=sys.stderr,
    )


def _warm_probe(width, height, num_lights, num_objects):
    """Fresh-process warm-start probe: reuse the AOT cache written by the
    timed run and report compile+first-frame (ShaderCache.h:15-91 parity
    evidence — VERDICT r3 #4)."""
    import jax
    import jax.numpy as jnp

    from sailor_tpu.framegraph import FrameGraph, FrameGraphAsset

    scene = _build_scene(width, height, num_lights, num_objects)
    fg = FrameGraph(
        FrameGraphAsset.load(
            os.path.join(os.path.dirname(__file__),
                         "content/DefaultRenderer.renderer")
        ),
        width, height,
        config={
            "z_far": 150.0, "shadow_resolution": 1024, "env_resolution": 32,
            "bin_capacity": 1024, "bin_rounds": 4, "max_lights_per_tile": 128,
            "pallas_shading": True,
            "fused_resolve": os.environ.get("SAILOR_FUSED_RESOLVE", "1") == "1",
            "raster_mxu": os.environ.get("SAILOR_RASTER_MXU", "0") == "1",
        },
    )
    state = fg.initial_state()
    fg.prepare(scene, state)
    sumf = jax.jit(lambda x: jnp.sum(x))
    t0 = time.time()
    targets, state = fg.process(scene, state)
    float(sumf(targets["Final"]))
    dt = time.time() - t0
    print(json.dumps({"warm_first_frame_s": round(dt, 2)}))


def bench_trace(size, spp, bounces):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from sailor_tpu.assets import primitives
    from sailor_tpu.core import math3d as m3
    from sailor_tpu.raytracing import path_tracer as pt

    meshes = [(primitives.plane(40.0), np.eye(4))]
    rng = np.random.default_rng(5)
    for i in range(8):
        t = np.eye(4)
        t[:3, 3] = [(i % 4 - 1.5) * 2.2, 0.9, (i // 4 - 0.5) * 2.4]
        meshes.append((primitives.uv_sphere(0.9, 24, 48), t))
    soup = primitives.merge(meshes)
    scene = pt.scene_from_mesh(soup)
    cam = jnp.asarray([0.0, 4.0, 9.0])
    view = m3.look_at(cam, jnp.asarray([0.0, 0.6, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 4, 1.0, 0.1, 100.0)
    # a recompile inside the timed loop is a bug, not noise — surface it
    jax.config.update("jax_log_compiles", True)
    t0 = time.time()
    # warm up with the EXACT argument signature of the timed reps (same
    # key= kwarg, same aval construction) so the timed loop can never see
    # a first-call trace/compile (r4: rep 0 took 416 s, 26x steady state)
    img, rays = pt.render_cached(
        scene, cam, view, proj, width=size, height=size, spp=spp,
        max_bounces=bounces, key=jax.random.PRNGKey(6),
    )
    # TIMING OVER THE TUNNEL: jax.block_until_ready does NOT wait on axon
    # async handles, and byte-identical executions are memoized server-side
    # — both make naive loops report fantasy numbers. Force real completion
    # by pulling a jitted scalar of the output, and vary the camera per rep
    # so every execution is distinct. (The ~25 ms scalar-pull round trip is
    # noise against multi-second renders.)
    sumf = jax.jit(lambda x: jnp.sum(x))
    float(sumf(img))
    print(f"# compile+render: {time.time()-t0:.1f}s", file=sys.stderr)
    times = []
    loop_t0 = time.time()
    for rep in range(3):
        cam_r = cam + 1e-5 * (rep + 1)
        view_r = m3.look_at(
            cam_r, jnp.asarray([0.0, 0.6, 0.0]), jnp.asarray([0.0, 1.0, 0.0])
        )
        t0 = time.time()
        img, rays = pt.render_cached(
            scene, cam_r, view_r, proj, width=size, height=size, spp=spp,
            max_bounces=bounces, key=jax.random.PRNGKey(7 + rep),
        )
        float(sumf(img))
        times.append(time.time() - t0)
        # a stalled rep must not eat the driver budget: min-of-times is
        # already robust to one outlier, so stop once 2 reps are in and
        # the loop has burned its wall budget
        if len(times) >= 2 and time.time() - loop_t0 > 120:
            print("# tracer rep loop over budget; stopping early",
                  file=sys.stderr)
            break
    jax.config.update("jax_log_compiles", False)
    print(f"# render times (s): {[round(t, 3) for t in times]}", file=sys.stderr)
    mrays = float(rays) / min(times) / 1e6
    return {
        "metric": f"pathtracer Mrays/s @{size}x{size} {spp}spp",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 20.0, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="quick smoke config")
    ap.add_argument("--trace", action="store_true",
                    help="path tracer benchmark only")
    ap.add_argument("--forward-only", action="store_true",
                    help="skip the path tracer benchmark")
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--warm-probe", action="store_true",
                    help="fresh-process AOT-cache warm-start probe")
    args = ap.parse_args()

    if args.warm_probe:
        if args.small:
            _warm_probe(640, 384, 128, 24)
        else:
            _warm_probe(1920, 1088, 1000, 96)
        return

    if args.trace:
        out = bench_trace(256 if args.small else 512, 4 if args.small else 64, 4)
        print(json.dumps(out))
        return

    # INCREMENTAL ARTIFACTS (VERDICT r4 #1): the driver records the LAST
    # stdout line, so the cumulative result JSON is (re)printed after
    # EVERY stage — a driver timeout then costs only the unfinished
    # stages, never the whole round. Each optional stage checks the
    # remaining wall budget (SAILOR_BENCH_BUDGET_S, default 1020 s) with
    # a per-stage cost estimate and is skipped, loudly, when it can't fit.
    t_start = time.time()
    budget = float(os.environ.get("SAILOR_BENCH_BUDGET_S", "1020"))
    extra = []

    def emit(o):
        if extra:
            o["extra"] = extra
        print(json.dumps(o), flush=True)

    def fits(stage, est_s):
        left = budget - (time.time() - t_start)
        if left >= est_s:
            return True
        print(f"# SKIP {stage}: {left:.0f}s left < est {est_s:.0f}s",
              file=sys.stderr)
        return False

    if args.small:
        out = bench_forward(640, 384, 128, 24, args.frames)
        emit(out)
    else:
        out = bench_forward(1920, 1088, 1000, 96, args.frames)
        emit(out)

    # warm-start proof (VERDICT r3 #4) runs FIRST among the extras — it
    # has failed to land for three rounds by running last: a FRESH process
    # reusing the AOT cache just written by the timed run above.
    if not args.small and fits("warm-probe", 120):
        try:
            import subprocess

            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--warm-probe"],
                capture_output=True, text=True, timeout=240,
            )
            line = (r.stdout.strip().splitlines() or [""])[-1]
            probe = json.loads(line) if line.startswith("{") else {}
            if probe:
                print(f"# warm first frame (fresh process, AOT cache): "
                      f"{probe['warm_first_frame_s']}s", file=sys.stderr)
                out["warm_first_frame_s"] = probe["warm_first_frame_s"]
                emit(out)
            else:
                print("# warm probe produced no JSON; stderr tail: "
                      + (r.stderr or "")[-400:].replace("\n", " | "),
                      file=sys.stderr)
        except Exception as e:
            print(f"# warm probe failed: {e}", file=sys.stderr)

    if not args.forward_only:
        if fits("tracer", 60 if args.small else 200):
            try:
                tr = bench_trace(256 if args.small else 512,
                                 4 if args.small else 64, 4)
                print("# tracer: " + json.dumps(tr), file=sys.stderr)
                extra.append(tr)
                emit(out)
            except Exception as e:  # must not hide the FPS metric
                print(f"# tracer benchmark failed: {e}", file=sys.stderr)
        if (os.path.exists(DUCK_GLB) and not args.small
                and fits("content", 150)):
            # Sponza-class REAL-content frame: ~250k tris of textured GLTF
            try:
                ct = bench_forward(1920, 1088, 1000, 0, args.frames,
                                   content=True, instances=60)
                print("# content: " + json.dumps(ct), file=sys.stderr)
                extra.append(ct)
                emit(out)
            except Exception as e:
                print(f"# content benchmark failed: {e}", file=sys.stderr)
        if (os.path.exists(SPONZA_MTL) and not args.small
                and fits("sponza", 120)):
            # the reference's ACTUAL Sponza material/texture library on a
            # reconstructed atrium (geometry is not vendored upstream)
            try:
                sp = bench_forward(1920, 1088, 1000, 0, args.frames,
                                   sponza=True)
                print("# sponza: " + json.dumps(sp), file=sys.stderr)
                extra.append(sp)
                emit(out)
            except Exception as e:
                print(f"# sponza benchmark failed: {e}", file=sys.stderr)
    emit(out)
    print(f"# bench total wall: {time.time() - t_start:.0f}s "
          f"(budget {budget:.0f}s)", file=sys.stderr)


if __name__ == "__main__":
    main()
