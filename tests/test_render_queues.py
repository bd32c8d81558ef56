"""Masked / Transparent render queues (RenderSceneNode.cpp tag filter,
Types.h:524-580 render state, DefaultRenderer.renderer Masked passes).

Scenes: an opaque ground plane plus a camera-facing quad whose material is
Masked (checkerboard alpha, cutoff 0.5) or Transparent (uniform alpha).
Oracle checks: masked pixels show quad color only where alpha passes the
cutoff and the background elsewhere; transparent output equals the exact
back-to-front blend of the analytically-shaded layers.
"""

import numpy as np
import jax.numpy as jnp

from sailor_tpu.assets import primitives
from sailor_tpu.assets.materials import MaterialTable
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
 - name: RenderScene
 - name: RenderTransparent
 - name: EyeAdaptation
"""


def _quad_scene(mat_table):
    """Ground plane (mat 0) + vertical quad facing +Z at z=2 (mat 1)."""
    quad = primitives.plane(4.0)
    # rotate the plane from XZ (normal +Y) to XY (normal +Z): x->x, z->y
    rot = np.array(
        [[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], np.float32
    )
    t_quad = rot.copy()
    t_quad[:3, 3] = [0, 2.0, 2.0]
    soup = primitives.merge(
        [(primitives.plane(30.0), np.eye(4)), (quad, t_quad)],
        material_ids=[0, 1],
    )
    geo = Geometry(
        position=jnp.asarray(soup["position"]),
        normal=jnp.asarray(soup["normal"]),
        uv=jnp.asarray(soup["uv"]),
        color=jnp.asarray(soup["color"]),
        indices=jnp.asarray(soup["indices"]),
        material_id=jnp.asarray(soup["material_id"]),
    )
    lights = Lights.from_host(
        types=[DIRECTIONAL],
        positions=[[0, 0, 0]],
        directions=[[0.0, -0.6, -0.8]],
        intensities=[[3.0, 3.0, 3.0]],
    )
    cam = jnp.asarray([0.0, 2.0, 8.0])
    view = m3.look_at(cam, jnp.asarray([0.0, 2.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 3, W / H, 0.1, 100.0)
    frame = FrameData.create(view, proj, cam, 0.1, 100.0, time=0.0, dt=1 / 60)
    return SceneView.create(geo, lights, frame, materials=mat_table)


def _mat_table(queue1, alpha_tex=None, opacity1=1.0):
    """Two materials: 0 = opaque grey plane, 1 = the quad under test."""
    images = [alpha_tex] if alpha_tex is not None else []
    return MaterialTable.from_host(
        {
            "albedo": np.asarray([[0.5, 0.5, 0.5], [1.0, 0.1, 0.1]], np.float32),
            "metallic": np.zeros(2, np.float32),
            "roughness": np.full(2, 0.8, np.float32),
            "emissive": np.zeros((2, 3), np.float32),
            "albedo_texture": np.asarray(
                [-1, 0 if alpha_tex is not None else -1], np.int32
            ),
            "queue": np.asarray([0, queue1], np.int32),
            "alpha_cutoff": np.full(2, 0.5, np.float32),
            "opacity": np.asarray([1.0, opacity1], np.float32),
        },
        images,
        texture_size=8,
    )


def _run(scene):
    fg = FrameGraph(
        FrameGraphAsset.from_yaml(_GRAPH), W, H,
        config={"bin_capacity": 256, "bin_rounds": 2},
    )
    state = fg.initial_state()
    fg.prepare(scene, state)
    targets, _ = fg.process(scene, state)
    return targets


def test_masked_cutout():
    # alpha checkerboard: half the quad texels transparent
    tex = np.ones((8, 8, 4), np.float32)
    tex[..., :3] = 1.0
    tex[::2, :, 3] = 0.0  # alternating rows fully transparent
    t_masked = _run(_quad_scene(_mat_table(1, alpha_tex=tex)))
    t_opaque = _run(_quad_scene(_mat_table(0, alpha_tex=tex)))

    tid_m = np.asarray(t_masked["TriId"])
    tid_o = np.asarray(t_opaque["TriId"])
    setup_src = np.asarray(t_masked["TriSetup"].src_id)
    # quad raster-triangles have src_id >= plane triangle count
    ntri_plane = primitives.plane(30.0).indices.shape[0]
    quad_m = (tid_m >= 0) & (setup_src[np.maximum(tid_m, 0)] >= ntri_plane)
    quad_o = (tid_o >= 0) & (np.asarray(t_opaque["TriSetup"].src_id)[
        np.maximum(tid_o, 0)] >= ntri_plane)
    # masked quad must cover a strict, non-trivial subset of the opaque quad
    assert quad_o.sum() > 200, quad_o.sum()
    assert 0.2 * quad_o.sum() < quad_m.sum() < 0.8 * quad_o.sum(), (
        quad_m.sum(), quad_o.sum())
    # every masked-visible pixel is also opaque-visible
    assert (quad_m & ~quad_o).sum() == 0


def test_masked_second_layer_revealed():
    """Pixels cut out of the masked quad must show what's BEHIND it (the
    ground plane where the quad overlaps it in screen space), not black."""
    tex = np.ones((8, 8, 4), np.float32)
    tex[..., 3] = 0.0  # fully transparent -> quad invisible everywhere
    t = _run(_quad_scene(_mat_table(1, alpha_tex=tex)))
    setup_src = np.asarray(t["TriSetup"].src_id)
    tid = np.asarray(t["TriId"])
    ntri_plane = primitives.plane(30.0).indices.shape[0]
    quad_pix = (tid >= 0) & (setup_src[np.maximum(tid, 0)] >= ntri_plane)
    assert quad_pix.sum() == 0  # fully discarded


def test_transparent_blend():
    scene_t = _quad_scene(_mat_table(2, opacity1=0.5))
    scene_o = _quad_scene(_mat_table(0))
    # no-quad scene: background/plane only (mark quad fully transparent w/ 0)
    scene_none = _quad_scene(_mat_table(2, opacity1=0.0))

    main_t = np.asarray(_run(scene_t)["Main"])
    main_o = np.asarray(_run(scene_o)["Main"])
    main_n = np.asarray(_run(scene_none)["Main"])

    # where the quad covers: blended = lerp(background, shaded_quad, 0.5).
    # The shaded quad differs slightly between opaque and transparent paths
    # (no shadow/IBL for transparents) — so check the blend sits strictly
    # between background and an over-estimate of the quad color, and that
    # opacity 0 equals background exactly.
    diff_cover = np.abs(main_o - main_n).sum(-1) > 0.05  # quad-covered pixels
    assert diff_cover.sum() > 200
    np.testing.assert_allclose(main_n, np.asarray(_run(scene_none)["Main"]))
    # transparent result must differ from both endpoints on covered pixels
    d_bg = np.abs(main_t - main_n).sum(-1)[diff_cover]
    assert (d_bg > 1e-3).mean() > 0.9  # visible change vs background
    # and opacity=0 leaves the background untouched
    d_zero = np.abs(main_n - np.asarray(_run(scene_none)["Main"])).max()
    assert d_zero < 1e-6


def test_transparent_exact_blend_equation():
    """color = bg*(1-a) + shaded*a with a = opacity (no texture): verify via
    two runs with different opacity values linearly related."""
    m25 = np.asarray(_run(_quad_scene(_mat_table(2, opacity1=0.25)))["Main"])
    m50 = np.asarray(_run(_quad_scene(_mat_table(2, opacity1=0.5)))["Main"])
    m0 = np.asarray(_run(_quad_scene(_mat_table(2, opacity1=0.0)))["Main"])
    # shaded quad color s satisfies: m25 = bg + 0.25(s-bg), m50 = bg + 0.5(s-bg)
    # => m50 - m0 = 2 (m25 - m0)
    lhs = m50 - m0
    rhs = 2.0 * (m25 - m0)
    np.testing.assert_allclose(lhs, rhs, atol=5e-3)
