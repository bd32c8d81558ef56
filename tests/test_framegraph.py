"""Frame graph: YAML parse, node registry, full-pipeline execution."""

import numpy as np
import jax.numpy as jnp

from sailor_tpu.assets import primitives
from sailor_tpu.core import math3d as m3
from sailor_tpu.framegraph import FrameGraph, FrameGraphAsset
from sailor_tpu.framegraph.graph import node_types
from sailor_tpu.kernels.lights import DIRECTIONAL, POINT, Lights
from sailor_tpu.kernels.sky import SkyParams
from sailor_tpu.raster.setup import Geometry
from sailor_tpu.rhi.scene_view import SceneView
from sailor_tpu.rhi.types import FrameData

W, H = 128, 96


def _scene_view():
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = [0, 0.75, 0]
    soup = primitives.merge(
        [(primitives.plane(30.0), np.eye(4)), (primitives.cube(1.5), t)]
    )
    geo = Geometry(
        position=jnp.asarray(soup["position"]),
        normal=jnp.asarray(soup["normal"]),
        uv=jnp.asarray(soup["uv"]),
        color=jnp.asarray(soup["color"]) * jnp.asarray([0.7, 0.6, 0.55, 1.0]),
        indices=jnp.asarray(soup["indices"]),
        material_id=jnp.asarray(soup["material_id"]),
    )
    lights = Lights.from_host(
        types=[DIRECTIONAL, POINT],
        positions=[[0, 0, 0], [2.0, 1.0, 2.0]],
        directions=[[-0.4, -0.8, -0.3], [0, -1, 0]],
        intensities=[[3, 2.9, 2.7], [4, 1, 1]],
        radii=[0.0, 6.0],
    )
    cam = jnp.asarray([5.0, 3.0, 7.0])
    view = m3.look_at(cam, jnp.asarray([0.0, 0.5, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 3, W / H, 0.1, 100.0)
    frame = FrameData.create(view, proj, cam, 0.1, 100.0, time=0.0, dt=1 / 60)
    sky = SkyParams.default(sun_direction=(-0.4, -0.8, -0.3))
    return SceneView.create(geo, lights, frame, sky=sky)


def test_yaml_parse_and_registry():
    asset = FrameGraphAsset.load("content/DefaultRenderer.renderer")
    assert len(asset.frame) >= 10
    names = {e["name"] for e in asset.frame}
    assert names <= set(node_types().keys())
    assert asset.values["Bloom.Intensity"] == 0.35


def test_full_pipeline_runs():
    asset = FrameGraphAsset.load("content/DefaultRenderer.renderer")
    fg = FrameGraph(
        asset, W, H,
        config={"z_far": 100.0, "shadow_resolution": 128, "env_resolution": 16,
                "bin_capacity": 256, "bin_rounds": 2, "sky_clouds": False},
    )
    scene = _scene_view()
    state = fg.initial_state()
    fg.prepare(scene, state)
    targets, state = fg.process(scene, state)
    final = np.asarray(targets["Final"])
    assert final.shape == (H, W, 3)
    assert np.isfinite(final).all()
    assert final.max() <= 1.0 + 1e-5 and final.min() >= 0.0
    # scene covers part of the frame; sky elsewhere -> variance
    assert final.std() > 0.02
    # avg luminance adapted away from the initial 0.18... just finite+positive
    assert float(state["avg_luminance"]) > 0.0


def test_unknown_node_raises():
    asset = FrameGraphAsset.from_yaml("frame:\n  - name: NoSuchNode\n")
    try:
        FrameGraph(asset, 64, 64)
        raise AssertionError("expected KeyError")
    except KeyError:
        pass


def test_custom_minimal_graph():
    yaml_text = """
frame:
  - name: DepthPrepass
  - name: LinearizeDepth
  - name: LightCulling
  - name: RenderScene
  - name: EyeAdaptation
"""
    asset = FrameGraphAsset.from_yaml(yaml_text)
    fg = FrameGraph(asset, W, H, config={"bin_capacity": 256, "bin_rounds": 2})
    scene = _scene_view()
    state = fg.initial_state()
    fg.prepare(scene, state)
    targets, state, timings = fg.process_debug(scene, state)
    assert "Final" in targets
    for want in ("DepthPrepass", "RenderScene", "EyeAdaptation"):
        assert any(k.endswith(want) for k in timings), (want, timings)
    assert np.isfinite(np.asarray(targets["Final"])).all()


def test_material_table_in_raster_path():
    from sailor_tpu.assets.materials import MaterialTable

    # checkerboard texture on material 0
    tex = np.zeros((8, 8, 4), np.float32)
    tex[::2, ::2] = [1, 0, 0, 1]
    tex[1::2, 1::2] = [1, 0, 0, 1]
    tex[tex[..., 3] == 0] = [0, 0, 1, 1]
    mt = MaterialTable.from_host(
        {
            "albedo": np.ones((1, 3), np.float32),
            "metallic": np.zeros(1, np.float32),
            "roughness": np.full(1, 0.7, np.float32),
            "emissive": np.zeros((1, 3), np.float32),
            "albedo_texture": np.zeros(1, np.int32),
        },
        [tex], texture_size=8,
    )
    scene = _scene_view()
    scene = scene.replace(materials=mt)
    asset = FrameGraphAsset.from_yaml(
        "frame:\n - name: DepthPrepass\n - name: LinearizeDepth\n"
        " - name: LightCulling\n - name: RenderScene\n - name: EyeAdaptation\n"
    )
    fg = FrameGraph(asset, W, H, config={"bin_capacity": 256, "bin_rounds": 2})
    state = fg.initial_state()
    fg.prepare(scene, state)
    targets, _ = fg.process(scene, state)
    final = np.asarray(targets["Final"])
    assert np.isfinite(final).all()
    # textured surface: red and blue pixels both present on geometry
    cov = np.asarray(targets["Main"]).sum(-1) > 0
    reds = (final[..., 0] > final[..., 2]) & cov
    blues = (final[..., 2] > final[..., 0]) & cov
    assert reds.sum() > 50 and blues.sum() > 50


def test_csm_change_snapshot_cache():
    """Shadow maps re-render only when cascades/geometry change
    (LightingECS.cpp:262-371 CSMLightState caching analog)."""
    import jax.numpy as jnp
    from sailor_tpu.core import math3d as m3
    from sailor_tpu.rhi.types import FrameData

    asset = FrameGraphAsset.from_yaml(
        "frame:\n - name: DepthPrepass\n - name: LinearizeDepth\n"
        " - name: LightCulling\n - name: ShadowPrepass\n"
        " - name: RenderScene\n - name: EyeAdaptation\n"
    )
    fg = FrameGraph(asset, W, H, config={
        "bin_capacity": 256, "bin_rounds": 2, "shadow_resolution": 128,
        "z_far": 100.0,
    })
    scene = _scene_view()
    state = fg.initial_state()
    assert "csm/maps" in state and float(state["csm/maps"].max()) == 0.0
    fg.prepare(scene, state)
    t1, s1 = fg.process(scene, state)
    maps1 = np.asarray(s1["csm/maps"])
    assert maps1.max() > 0.0  # first frame rendered the cascades
    # static camera: cached maps bit-identical
    t2, s2 = fg.process(scene, s1)
    np.testing.assert_array_equal(np.asarray(s2["csm/maps"]), maps1)
    np.testing.assert_array_equal(
        np.asarray(t2["ShadowMaps"]), maps1)
    # move the camera -> cascades refit -> maps re-render (and differ)
    cam = jnp.asarray([7.0, 4.0, 5.0])
    view = m3.look_at(cam, jnp.asarray([0.0, 0.5, 0.0]),
                      jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 3, W / H, 0.1, 100.0)
    frame = FrameData.create(view, proj, cam, 0.1, 100.0, time=0.0, dt=1 / 60)
    scene3 = scene.replace(frame=frame, prev_frame=frame)
    t3, s3 = fg.process(scene3, s2)
    assert np.abs(np.asarray(s3["csm/maps"]) - maps1).max() > 0.0


def test_debug_compose_modes():
    """Debug.shader parity: AO / light-tile / cascade visualizations."""
    base = (
        "frame:\n - name: DepthPrepass\n - name: LinearizeDepth\n"
        " - name: LightCulling\n - name: ShadowPrepass\n"
        " - name: PostProcess\n   shader: HBAO\n"
        " - name: RenderScene\n - name: EyeAdaptation\n"
        " - name: PostProcess\n   shader: Debug\n   mode: {mode}\n"
    )
    scene = _scene_view()
    outs = {}
    for mode in ("none", "ao", "light_tiles", "cascades"):
        asset = FrameGraphAsset.from_yaml(base.format(mode=mode))
        fg = FrameGraph(asset, W, H, config={
            "bin_capacity": 256, "bin_rounds": 2, "shadow_resolution": 128,
            "z_far": 100.0,
        })
        state = fg.initial_state()
        fg.prepare(scene, state)
        targets, _ = fg.process(scene, state)
        outs[mode] = np.asarray(targets["Final"])
        assert np.isfinite(outs[mode]).all(), mode
    # ao mode is grayscale (all channels equal), differs from passthrough
    assert np.allclose(outs["ao"][..., 0], outs["ao"][..., 1])
    assert np.abs(outs["ao"] - outs["none"]).max() > 0.01
    # light-tile heatmap boosts r/g over b where the point light lands
    diff = outs["light_tiles"][..., 0] - outs["light_tiles"][..., 2]
    assert diff.max() > 0.04
    # cascade view recolors the frame
    assert np.abs(outs["cascades"] - outs["none"]).max() > 0.05


def test_env_incremental_face_updates():
    """SkyNode incremental env update parity: a changed sun refreshes one
    cubemap face per prepare(); the IBL maps recompute when the sweep
    completes."""
    from sailor_tpu.framegraph.nodes import EnvironmentNode
    from sailor_tpu.kernels.sky import SkyParams
    from sailor_tpu.framegraph.graph import RenderContext

    scene = _scene_view()
    node = EnvironmentNode({})
    cfg = {"env_resolution": 16, "env_incremental": True}

    def ctx_for(sky):
        s = scene.replace(sky=sky)
        return RenderContext(width=W, height=H, scene=s, state={}, config=cfg)

    ctx = ctx_for(SkyParams.default(sun_direction=(-0.4, -0.8, -0.3)))
    node.prepare(ctx)  # first bake: full
    cube0 = np.asarray(ctx.state["env/cube"])
    irr0 = np.asarray(ctx.state["env/irradiance"])

    moved = SkyParams.default(sun_direction=(0.6, -0.6, 0.1))
    for i in range(5):
        ctx = ctx_for(moved)
        node.prepare(ctx)
        # mid-sweep: irradiance still the OLD bake
        np.testing.assert_array_equal(
            np.asarray(ctx.state["env/irradiance"]), irr0)
    ctx = ctx_for(moved)
    node.prepare(ctx)  # 6th face completes the sweep -> derived maps refresh
    assert np.abs(np.asarray(ctx.state["env/cube"]) - cube0).max() > 1e-3
    assert np.abs(np.asarray(ctx.state["env/irradiance"]) - irr0).max() > 1e-4
    # stable key afterwards: no further work (cache hit path)
    ctx = ctx_for(moved)
    node.prepare(ctx)
    assert "env/cube" in ctx.state


def test_sky_change_snapshot_cache():
    """The sky buffer re-renders only when camera ORIENTATION, sun, or the
    quantized cloud time change — a translating camera reuses it (the sky
    depends on ray directions only)."""
    import jax.numpy as jnp
    from sailor_tpu.core import math3d as m3
    from sailor_tpu.rhi.types import FrameData

    asset = FrameGraphAsset.from_yaml("frame:\n - name: Sky\n")
    fg = FrameGraph(asset, W, H, config={"sky_clouds": False})
    scene = _scene_view()
    state = fg.initial_state()
    assert "sky/buf" in state
    fg.prepare(scene, state)
    t1, s1 = fg.process(scene, state)
    sky1 = np.asarray(s1["sky/buf"])
    assert sky1.max() > 0.0
    np.testing.assert_array_equal(np.asarray(t1["Sky"]), sky1)

    # pure camera translation: same ray directions -> cached, identical
    f = scene.frame
    cam2 = f.camera_position + jnp.asarray([0.5, 0.2, -0.3])
    # rebuild view with the same orientation (translate the look target too)
    view2 = f.view.at[:3, 3].add(
        -(f.view[:3, :3] @ jnp.asarray([0.5, 0.2, -0.3]))
    )
    frame2 = FrameData.create(
        view2, f.projection, cam2, 0.1, 100.0, time=0.05, dt=1 / 60
    )
    t2, s2 = fg.process(scene.replace(frame=frame2), s1)
    np.testing.assert_array_equal(np.asarray(t2["Sky"]), sky1)

    # rotation changes ray directions -> re-render, buffer differs
    cam3 = f.camera_position
    view3 = m3.look_at(cam3, cam3 + jnp.asarray([1.0, -0.1, 0.2]),
                       jnp.asarray([0.0, 1.0, 0.0]))
    frame3 = FrameData.create(
        view3, f.projection, cam3, 0.1, 100.0, time=0.1, dt=1 / 60
    )
    t3, s3 = fg.process(scene.replace(frame=frame3), s2)
    assert np.abs(np.asarray(t3["Sky"]) - sky1).max() > 0.0


def test_multi_camera_views():
    """Two cameras of ONE world render in one process with per-view
    temporal state and distinct images (RHISceneView.h:85-115 per-camera
    snapshots; RHIFrameGraph.cpp:95 one run per camera). View 2 must cost
    zero extra compiles (same executable, camera is traced data)."""
    from sailor_tpu.core import math3d as m3
    from sailor_tpu.rhi.types import FrameData

    asset = FrameGraphAsset.load("content/DefaultRenderer.renderer")
    cfg = {"z_far": 100.0, "shadow_resolution": 128, "env_resolution": 16,
           "bin_capacity": 256, "bin_rounds": 2, "sky_clouds": False}
    fg = FrameGraph(asset, W, H, config=dict(cfg))
    scene = _scene_view()

    cam2 = jnp.asarray([-6.0, 2.0, -6.0])
    view2 = m3.look_at(cam2, jnp.asarray([0.0, 0.75, 0.0]),
                       jnp.asarray([0.0, 1.0, 0.0]))
    proj2 = m3.perspective(jnp.pi / 4, W / H, 0.1, 100.0)
    frame2 = FrameData.create(view2, proj2, cam2, 0.1, 100.0, dt=1 / 60)

    states = [fg.initial_state(), fg.initial_state()]
    fg.prepare(scene, states[0])
    fg.prepare(scene.replace(frame=frame2), states[1])
    outs, states = fg.process_views(scene, states, [scene.frame, frame2])
    a = np.asarray(outs[0]["Final"])
    b = np.asarray(outs[1]["Final"])
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert a.shape == b.shape == (H, W, 3)
    # opposite sides of the cube: genuinely different views
    assert np.abs(a - b).mean() > 1e-3

    # a second frame threads each view's own temporal state
    outs2, _ = fg.process_views(scene, states, [scene.frame, frame2])
    assert np.isfinite(np.asarray(outs2[1]["Final"])).all()
