"""World/ECS: hierarchy, systems, serialization round trip, end-to-end
render through the engine loop."""

import numpy as np
import jax.numpy as jnp

from sailor_tpu.core import math3d as m3
from sailor_tpu.engine import World
from sailor_tpu.engine.components import (
    CameraComponent, LightComponent, MeshRendererComponent, TestComponent,
)


def test_transform_hierarchy():
    w = World()
    parent = w.instantiate("parent")
    child = w.instantiate("child")
    parent.position = [5.0, 0.0, 0.0]
    child.set_parent(parent)
    child.position = [0.0, 2.0, 0.0]
    w.tick(1 / 60)
    wm = np.asarray(w.transforms.world_matrices)
    np.testing.assert_allclose(wm[child.transform][:3, 3], [5.0, 2.0, 0.0], atol=1e-5)
    # rotate parent 90deg about y: child orbits
    parent.rotation = np.asarray(
        m3.quat_from_axis_angle(jnp.asarray([0.0, 1.0, 0.0]), jnp.pi / 2)
    )
    w.tick(1 / 60)
    wm = np.asarray(w.transforms.world_matrices)
    np.testing.assert_allclose(wm[child.transform][:3, 3], [5.0, 2.0, 0.0], atol=1e-5)
    child.position = [1.0, 0.0, 0.0]
    w.tick(1 / 60)
    wm = np.asarray(w.transforms.world_matrices)
    # +x in parent space rotated 90deg about y -> -z world offset
    np.testing.assert_allclose(wm[child.transform][:3, 3], [5.0, 0.0, -1.0], atol=1e-5)


def test_world_tick_builds_snapshots():
    w = World()
    cam = w.instantiate("cam")
    cam.position = [0, 2, 8]
    cam.add_component(CameraComponent())
    sun = w.instantiate("sun")
    sun.add_component(LightComponent(light_type=0, intensity=[2, 2, 2]))
    box = w.instantiate("box")
    box.position = [0, 0.5, 0]
    box.add_component(MeshRendererComponent(mesh_asset="cube"))
    w.tick(1 / 60)
    assert w.cameras.main_frame() is not None
    assert w.lighting.snapshot is not None
    assert int(w.lighting.snapshot.num) == 1
    assert w.meshes.geometry is not None
    assert w.meshes.geometry.indices.shape[0] == 12
    sv = w.scene_view()
    assert sv.frame is not None


def test_test_component_spawns_lights():
    w = World()
    demo = w.instantiate("demo")
    demo.add_component(TestComponent(num_lights=5))
    w.tick(1 / 60)  # begin_play spawns lights
    w.tick(1 / 60)
    assert int(w.lighting.snapshot.num) == 5


def test_world_save_load_roundtrip(tmp_path):
    w = World("roundtrip")
    cam = w.instantiate("cam")
    cam.position = [1, 2, 3]
    cam.add_component(CameraComponent(fov_degrees=45.0))
    box = w.instantiate("box")
    box.add_component(MeshRendererComponent(mesh_asset="cube", material_id=3))
    box.set_parent(cam)
    path = str(tmp_path / "test.world")
    w.save(path)

    w2 = World.load(path)
    assert w2.name == "roundtrip"
    cam2 = w2.find("cam")
    assert cam2 is not None
    np.testing.assert_allclose(cam2.position, [1, 2, 3])
    assert cam2.get_component(CameraComponent).fov_degrees == 45.0
    box2 = w2.find("box")
    assert box2.parent is cam2
    assert box2.get_component(MeshRendererComponent).material_id == 3
    # instance ids preserved
    assert w2.find_by_instance_id(cam.instance_id) is cam2


def test_editor_world_renders():
    from sailor_tpu.engine.app import EngineLoop, Renderer
    from sailor_tpu.kernels.sky import SkyParams

    w = World.load("content/Editor.world")
    # shrink camera aspect to the test viewport
    renderer = Renderer(
        "content/DefaultRenderer.renderer", 128, 96,
        config={"shadow_resolution": 128, "env_resolution": 16,
                "bin_capacity": 256, "bin_rounds": 2, "sky_clouds": False},
    )
    sky = SkyParams.default(sun_direction=(-0.35, -0.7, -0.3))
    loop = EngineLoop(w, renderer, sky=sky)
    targets = loop.run(2, dt=1 / 60)
    final = np.asarray(targets["Final"])
    assert final.shape == (96, 128, 3)
    assert np.isfinite(final).all()
    assert final.std() > 0.01
    assert renderer.stats["gpu_frames"] == 2
