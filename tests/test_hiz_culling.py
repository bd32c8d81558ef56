"""HiZ occlusion culling: previous-frame pyramid culls hidden triangles
without changing the image (ComputeMeshCulling.shader consumer analog).

Scene: a big near wall occluding a dense grid of small cubes behind it.
Frame 1 renders uncullled (state pyramid = zeros); frame 2 reuses frame 1's
pyramid with an identical camera — the image must match frame 1 exactly
while a significant number of occluded triangles are culled.
"""

import numpy as np
import jax.numpy as jnp

from sailor_tpu.assets import primitives
from sailor_tpu.core import math3d as m3
from sailor_tpu.framegraph import FrameGraph, FrameGraphAsset
from sailor_tpu.kernels.lights import DIRECTIONAL, Lights
from sailor_tpu.raster.setup import Geometry
from sailor_tpu.rhi.scene_view import SceneView
from sailor_tpu.rhi.types import FrameData

W, H = 128, 96

_GRAPH = """
frame:
 - name: DepthPrepass
 - name: LinearizeDepth
 - name: LightCulling
 - name: DepthHighZ
 - name: RenderScene
 - name: EyeAdaptation
"""


def _occlusion_scene():
    # wall: a big vertical quad at z=0 facing the camera (+Z)
    rot = np.array(
        [[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], np.float32
    )
    t_wall = rot.copy()
    t_wall[:3, 3] = [0, 2.0, 0.0]
    items = [(primitives.plane(60.0), np.eye(4)), (primitives.plane(12.0), t_wall)]
    # hidden cubes behind the wall
    rng = np.random.default_rng(5)
    for i in range(24):
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = [rng.uniform(-3, 3), rng.uniform(0.5, 3.5), rng.uniform(-8, -3)]
        items.append((primitives.cube(0.8), t))
    soup = primitives.merge(items)
    geo = Geometry(
        position=jnp.asarray(soup["position"]),
        normal=jnp.asarray(soup["normal"]),
        uv=jnp.asarray(soup["uv"]),
        color=jnp.asarray(soup["color"]),
        indices=jnp.asarray(soup["indices"]),
        material_id=jnp.asarray(soup["material_id"]),
    )
    lights = Lights.from_host(
        types=[DIRECTIONAL], positions=[[0, 0, 0]],
        directions=[[0.0, -0.7, -0.7]], intensities=[[3.0, 3.0, 3.0]],
    )
    cam = jnp.asarray([0.0, 2.0, 10.0])
    view = m3.look_at(cam, jnp.asarray([0.0, 2.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 3, W / H, 0.1, 100.0)
    frame = FrameData.create(view, proj, cam, 0.1, 100.0, time=0.0, dt=1 / 60)
    return SceneView.create(geo, lights, frame)


def test_hiz_culls_hidden_triangles_identical_image():
    fg = FrameGraph(
        FrameGraphAsset.from_yaml(_GRAPH), W, H,
        config={"bin_capacity": 256, "bin_rounds": 2, "hiz_culling": True},
    )
    scene = _occlusion_scene()
    state = fg.initial_state()
    assert "hiz/mip0" in state
    fg.prepare(scene, state)
    t1, state2 = fg.process(scene, state)
    # compare pre-tonemap HDR (Final shifts with temporal eye adaptation)
    f1 = np.asarray(t1["Main"])
    assert int(t1["HiZCulledCount"]) == 0  # zero pyramid culls nothing

    t2, state3 = fg.process(scene, state2)
    f2 = np.asarray(t2["Main"])
    culled = int(t2["HiZCulledCount"])
    # the 24 cubes (12 tris each) are fully hidden behind the wall
    assert culled > 100, culled
    np.testing.assert_allclose(f2, f1, atol=1e-6)


def test_hiz_never_culls_visible_geometry():
    """Camera sees everything (wall removed): culled count stays 0."""
    scene = _occlusion_scene()
    fg = FrameGraph(
        FrameGraphAsset.from_yaml(_GRAPH), W, H,
        config={"bin_capacity": 256, "bin_rounds": 2, "hiz_culling": True},
    )
    # move the camera BEHIND the wall so the cubes are all visible
    cam = jnp.asarray([0.0, 2.0, -14.0])
    view = m3.look_at(cam, jnp.asarray([0.0, 2.0, -5.0]), jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 3, W / H, 0.1, 100.0)
    frame = FrameData.create(view, proj, cam, 0.1, 100.0, time=0.0, dt=1 / 60)
    scene = scene.replace(frame=frame, prev_frame=frame)
    state = fg.initial_state()
    fg.prepare(scene, state)
    t1, state2 = fg.process(scene, state)
    t2, _ = fg.process(scene, state2)
    f1 = np.asarray(t1["Main"])
    f2 = np.asarray(t2["Main"])
    np.testing.assert_allclose(f2, f1, atol=1e-6)
