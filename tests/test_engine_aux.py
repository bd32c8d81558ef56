"""Auxiliary engine subsystems: debug draw, console, editor protocol,
in-engine benchmark suite, particles."""

import jax.numpy as jnp
import numpy as np

from sailor_tpu.core import math3d as m3
from sailor_tpu.engine import World
from sailor_tpu.engine.components import CameraComponent, MeshRendererComponent
from sailor_tpu.engine.console import Console
from sailor_tpu.engine.editor_server import EditorServer
from sailor_tpu.rhi.debug_context import DebugContext
from sailor_tpu.utils import benchmarks


def test_debug_context_draw_and_expire():
    dbg = DebugContext()
    dbg.draw_line([0, 0, -5], [1, 0, -5], duration=0.1)
    dbg.draw_aabb([-1, -1, -6], [1, 1, -4], duration=0.0)
    dbg.draw_origin(duration=1.0)
    assert dbg.has_lines
    view = m3.look_at(jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([0.0, 0.0, -1.0]),
                      jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 2, 1.0, 0.1, 100.0)
    img = jnp.zeros((64, 64, 3))
    out = np.asarray(dbg.rasterize_over(img, proj @ view))
    assert out.sum() > 0  # pixels were written
    n0 = len(dbg._lines)
    dbg.tick(0.5)  # expire the 0.1s and 0.0s lines; keep 1.0s ones
    assert len(dbg._lines) < n0


def test_console_commands():
    w = World()
    con = Console(world=w)
    out = con.execute("stats.memory")
    assert "pool" in out
    assert "unknown command" in con.execute("frobnicate")
    out = con.execute("pool.benchmark")
    assert "PASSED" in out
    # compiled-program cache observability (ShaderCache parity)
    assert "aot:" in con.execute("cache.stats")
    assert "expired" in con.execute("cache.expire 365")


def test_benchmark_suite_all_pass():
    for name in benchmarks.ALL:
        out = benchmarks.run(name)
        assert "FAILED" not in out, out


def test_editor_server_roundtrip(tmp_path):
    srv = EditorServer()
    srv.initialize("content/Editor.world")
    srv.start()
    srv.set_viewport(640, 480)
    srv.tick(1 / 60)
    # serialize -> contains the named objects
    text = srv.serialize_current_world()
    assert "Camera" in text and "instanceId" in text
    # live patch via instance id (editor inspector path)
    box = srv.world.find("Box")
    ok = srv.update_object(
        box.instance_id,
        "position: [3.0, 1.0, 2.0]\n"
        "components:\n"
        "  - typename: MeshRendererComponent\n"
        "    material_id: 7\n",
    )
    assert ok
    np.testing.assert_allclose(box.position, [3.0, 1.0, 2.0])
    assert box.get_component(MeshRendererComponent).material_id == 7
    assert not srv.update_object("nonexistent0000", "position: [0,0,0]")
    msgs = srv.get_messages()
    assert isinstance(msgs, list)
    srv.shutdown()


def test_particles_node_updates_state():
    from sailor_tpu.framegraph import FrameGraph, FrameGraphAsset
    from sailor_tpu.kernels.lights import DIRECTIONAL, Lights
    from sailor_tpu.raster.setup import Geometry
    from sailor_tpu.rhi.scene_view import SceneView
    from sailor_tpu.rhi.types import FrameData
    from sailor_tpu.assets import primitives

    soup = primitives.merge([(primitives.plane(10.0), np.eye(4))])
    geo = Geometry(
        position=jnp.asarray(soup["position"]), normal=jnp.asarray(soup["normal"]),
        uv=jnp.asarray(soup["uv"]), color=jnp.asarray(soup["color"]),
        indices=jnp.asarray(soup["indices"]), material_id=jnp.asarray(soup["material_id"]),
    )
    lights = Lights.from_host(types=[DIRECTIONAL], positions=[[0, 0, 0]],
                              directions=[[0, -1, 0]], intensities=[[1, 1, 1]])
    cam = jnp.asarray([0.0, 2.0, 5.0])
    view = m3.look_at(cam, jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 3, 1.0, 0.1, 50.0)
    frame = FrameData.create(view, proj, cam, 0.1, 50.0, dt=0.1)
    scene = SceneView.create(geo, lights, frame)
    asset = FrameGraphAsset.from_yaml(
        "frame:\n - name: DepthPrepass\n - name: LinearizeDepth\n"
        " - name: LightCulling\n - name: RenderScene\n - name: Particles\n"
        " - name: EyeAdaptation\n"
    )
    fg = FrameGraph(asset, 64, 64, config={"bin_capacity": 64, "bin_rounds": 1})
    state = fg.initial_state()
    n = 32
    state["particles/pos"] = jnp.zeros((n, 3)).at[:, 1].set(1.0)
    state["particles/vel"] = jnp.zeros((n, 3)).at[:, 1].set(2.0)
    state["particles/life"] = jnp.full((n,), 1.0)
    fg.prepare(scene, state)
    targets, state2 = fg.process(scene, state)
    assert float(state2["particles/pos"][:, 1].mean()) > 1.0  # moved up
    assert float(state2["particles/life"][0]) < 1.0
    assert np.isfinite(np.asarray(targets["Final"])).all()


def test_prefab_roundtrip(tmp_path):
    from sailor_tpu.engine import prefab

    w = World()
    root = w.instantiate("rig")
    root.position = [1, 0, 0]
    child = w.instantiate("lamp")
    child.set_parent(root)
    child.position = [0, 2, 0]
    child.add_component(
        __import__("sailor_tpu.engine.components", fromlist=["LightComponent"])
        .LightComponent(light_type=1, intensity=[5, 1, 1])
    )
    path = str(tmp_path / "rig.prefab")
    prefab.save(root, path)

    w2 = World()
    inst = prefab.instantiate(w2, path, position=[10, 0, 0])
    assert inst.name == "rig"
    np.testing.assert_allclose(inst.position, [10, 0, 0])
    lamp = w2.find("lamp")
    assert lamp is not None and lamp.parent is inst
    # two instantiations coexist with distinct instance ids
    inst2 = prefab.instantiate(w2, path, position=[-10, 0, 0])
    assert inst2.instance_id != inst.instance_id
    w2.tick(1 / 60)
    assert int(w2.lighting.snapshot.num) == 2


def test_cli_main(tmp_path):
    from sailor_tpu.__main__ import main

    out = str(tmp_path / "frame.png")
    rc = main([
        "--cpu", "--width", "128", "--height", "96", "--frames", "2",
        "--out", out, "--command", "stats.memory",
    ])
    assert rc == 0
    import imageio.v2 as imageio

    img = imageio.imread(out)
    assert img.shape == (96, 128, 3)


def test_frame_capture(tmp_path):
    """RenderDocApi analog: console `capture` arms a dump of the next
    frame's targets (PNG + manifest)."""
    import json
    import os

    from sailor_tpu.engine.app import Renderer
    from sailor_tpu.engine.console import Console
    from sailor_tpu.utils.capture import FrameCapture

    cap = FrameCapture(str(tmp_path))
    cap.trigger()
    assert cap.armed
    targets = {
        "Final": np.clip(np.random.rand(16, 16, 3), 0, 1).astype(np.float32),
        "Depth": np.random.rand(16, 16).astype(np.float32),
        "LightCounts": np.zeros((2, 2), np.int32),
        "state_out": {},
    }
    path = cap.capture(targets)
    assert not cap.armed
    man = json.load(open(os.path.join(path, "manifest.json")))
    assert "Final" in man["targets"] and man["targets"]["Final"]["file"].endswith(".png")
    assert os.path.exists(os.path.join(path, man["targets"]["Depth"]["file"]))

    class _R:
        capture = cap

    c = Console(renderer=_R())
    assert "armed" in c.execute("capture")
    assert cap.armed


def test_input_driven_editor_camera():
    """InputState (Platform/Win32/Input.h analog) drives the
    EditorComponent fly camera through EngineLoop.world.input."""
    from sailor_tpu.engine import input as ik
    from sailor_tpu.engine.components import EditorComponent
    from sailor_tpu.engine.input import InputState
    from sailor_tpu.engine.world import World

    w = World()
    go = w.instantiate("editor")
    cam = go.add_component(EditorComponent(move_speed=2.0))
    inp = InputState()
    w.input = inp

    inp.key_down(ik.KEY_W)
    assert inp.is_key_down(ik.KEY_W) and inp.is_key_pressed(ik.KEY_W)
    p0 = np.asarray(go.position)
    w.tick(0.5)
    inp.end_frame()
    assert not inp.is_key_pressed(ik.KEY_W)  # edge cleared
    p1 = np.asarray(go.position)
    assert np.linalg.norm(p1 - p0) > 0.5  # moved forward

    # right-drag look changes yaw
    inp.button_down(1)
    inp.move_cursor(0, 0)
    inp.end_frame()
    inp.move_cursor(40, 0)
    w.tick(0.1)
    assert abs(cam.yaw) > 0.05


def test_supersampled_renderer_resolves():
    """RHISurface/MSAA analog: supersample=2 renders at 2x and
    box-resolves Final to the requested viewport."""
    from sailor_tpu.engine import World
    from sailor_tpu.engine.app import EngineLoop, Renderer
    from sailor_tpu.kernels.sky import SkyParams

    world = World.load("content/Editor.world")
    r = Renderer(
        "content/DefaultRenderer.renderer", 128, 64,
        config={"bin_capacity": 256, "bin_rounds": 2, "supersample": 2,
                "shadow_resolution": 128, "env_resolution": 16,
                "sky_clouds": False},
    )
    loop = EngineLoop(world, r, sky=SkyParams.default())
    targets = loop.process_cpu_frame(1 / 60)
    assert targets["FinalSS"].shape == (128, 256, 3)
    assert targets["Final"].shape == (64, 128, 3)
    assert np.isfinite(np.asarray(targets["Final"])).all()


def test_fix_lost_device_recovers():
    """Renderer::FixLostDevice analog: a device error during dispatch
    rebuilds the frame graph and the frame retries successfully."""
    import jax

    from sailor_tpu.engine import World
    from sailor_tpu.engine.app import EngineLoop, Renderer
    from sailor_tpu.kernels.sky import SkyParams

    world = World.load("content/Editor.world")
    r = Renderer(
        "content/DefaultRenderer.renderer", 128, 64,
        config={"bin_capacity": 256, "bin_rounds": 2, "sky_clouds": False,
                "shadow_resolution": 128, "env_resolution": 16},
    )
    loop = EngineLoop(world, r, sky=SkyParams.default())

    boom = {"n": 0}
    real_process = r.frame_graph.process

    class FakeLostGraph:
        def prepare(self, scene, state):
            pass

        def process(self, scene, state):
            boom["n"] += 1
            raise jax.errors.JaxRuntimeError("UNAVAILABLE: device lost")

    r.frame_graph = FakeLostGraph()
    targets = loop.process_cpu_frame(1 / 60)  # fails once, rebuilds, retries
    assert boom["n"] == 1
    assert r.stats.get("device_losses") == 1
    assert np.isfinite(np.asarray(targets["Final"])).all()


def test_console_profile_and_hud_timings():
    """`profile` console command runs a per-node device-timing pass and
    the overlay HUD renders the entries (Tracy GPU-cost listing analog)."""
    from sailor_tpu.engine import World
    from sailor_tpu.engine.app import EngineLoop, Renderer
    from sailor_tpu.engine.console import Console
    from sailor_tpu.engine.overlay import OverlayContext, stats_hud
    from sailor_tpu.kernels.sky import SkyParams

    world = World.load("content/Editor.world")
    r = Renderer(
        "content/DefaultRenderer.renderer", 128, 64,
        config={"bin_capacity": 256, "bin_rounds": 2, "sky_clouds": False,
                "shadow_resolution": 128, "env_resolution": 16},
    )
    con = Console(world=world, renderer=r)
    assert con.execute("profile") == "no frame pushed yet"
    loop = EngineLoop(world, r, sky=SkyParams.default())
    loop.process_cpu_frame(1 / 60)
    out = con.execute("profile")
    assert "DepthPrepass" in out and "TOTAL" in out, out
    assert r.stats["node_ms"]
    ov = OverlayContext(128, 64)
    stats_hud(ov, r.stats)
    canvas = np.asarray(ov.canvas())
    assert canvas[..., 3].max() > 0  # HUD drew something
