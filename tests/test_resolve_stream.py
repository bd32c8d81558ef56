"""Fused visibility resolve (tile_raster.resolve_stream) vs the classic
gather-based resolve_gbuffer: identical G-buffers from the same visibility
buffer, for both the plain and the materials-folded attribute tables."""

import numpy as np
import jax.numpy as jnp

from sailor_tpu.raster import interpolate, setup as rsetup, tile_raster
from tests.test_raster_oracle import W, H, _scene


def _common(materials=None):
    geo, soup, vp = _scene()
    vpj = jnp.asarray(vp, jnp.float32)
    tri, aabb = rsetup.triangle_setup(geo, vpj, width=W, height=H, cull="back")
    tw, th = tile_raster.TILE_W, tile_raster.TILE_H
    tx, ty = -(-W // tw), -(-H // th)
    order, starts, counts, big_ids, n_big, ovf = rsetup.bin_sorted(
        tri.valid, aabb, tiles_x=tx, tiles_y=ty, tile_w=tw, tile_h=th,
    )
    attrs = interpolate.pack_triangle_attributes(geo, tri.src_id, materials)
    rows, big_rows, na = tile_raster.build_stream_rows(
        tri, aabb, order, big_ids, attrs=attrs
    )
    depth, tid, ovf2 = tile_raster.rasterize_stream(
        tri, aabb, order, starts, counts, big_ids, n_big,
        tiles_y=ty, tiles_x=tx, prebuilt=(rows, big_rows),
    )
    assert int(ovf) == 0 and int(ovf2) == 0
    tid = tid[:H, :W]
    inv_vp = jnp.linalg.inv(vpj)
    cam = jnp.asarray([6.0, 5.0, 8.0])
    bins = {"rows": rows, "big_rows": big_rows, "starts": starts,
            "counts": counts, "n_big": n_big, "na": na}
    return geo, tri, tid, inv_vp, cam, bins, (ty, tx), materials


def _assert_gbuffers_match(g_ref, g_new, uv_ref, uv_new, mid_ref, mid_new):
    np.testing.assert_array_equal(
        np.asarray(g_ref.coverage), np.asarray(g_new.coverage)
    )
    for name in ("world_position", "normal", "albedo", "metallic",
                 "roughness", "emissive"):
        a = np.asarray(getattr(g_ref, name))
        b = np.asarray(getattr(g_new, name))
        # worst observed delta 1.8e-4 (one edge pixel): the expansion
        # matmul + row-layout MT solve associate f32 differently than the
        # classic gathered path
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3, err_msg=name)
    # uv/mat_id are only meaningful under coverage (the classic path
    # interpolates row 0's garbage at background pixels, the fused path
    # yields zeros there)
    cov = np.asarray(g_ref.coverage) > 0
    np.testing.assert_allclose(
        np.asarray(uv_ref)[cov], np.asarray(uv_new)[cov],
        rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_array_equal(
        np.asarray(mid_ref)[cov], np.asarray(mid_new)[cov]
    )


def test_fused_resolve_matches_classic_plain():
    geo, tri, tid, inv_vp, cam, bins, (ty, tx), mats = _common(None)
    g_ref, uv_ref, mid_ref = interpolate.resolve_gbuffer(
        geo, tri, tid, inv_vp, cam, materials=None
    )
    g_new, uv_new, mid_new = interpolate.resolve_gbuffer_stream(
        bins, tid, inv_vp, cam, materials=None,
        width=W, height=H, tiles_y=ty, tiles_x=tx,
    )
    _assert_gbuffers_match(g_ref, g_new, uv_ref, uv_new, mid_ref, mid_new)


def test_fused_resolve_matches_classic_materials():
    from sailor_tpu.assets.materials import MaterialTable

    rng = np.random.default_rng(5)
    texture = (rng.uniform(0.2, 1.0, (64, 64, 4))).astype(np.float32)
    normal_map = np.full((64, 64, 4), 0.5, np.float32)
    normal_map[..., 2] = 1.0
    normal_map[16:48, 16:48, 0] = 0.8
    table = {
        "albedo": [[1.0, 0.9, 0.8], [0.5, 0.5, 0.9]],
        "metallic": [0.1, 0.8],
        "roughness": [0.6, 0.3],
        "emissive": [[0, 0, 0], [0.2, 0.1, 0.0]],
        "albedo_texture": [0, -1],
        "normal_texture": [1, -1],
        "queue": [0, 0],
        "alpha_cutoff": [0.5, 0.5],
        "opacity": [1.0, 1.0],
    }
    mats = MaterialTable.from_host(
        table, [texture, normal_map], texture_size=64
    )
    geo, tri, tid, inv_vp, cam, bins, (ty, tx), _ = _common(mats)
    g_ref, uv_ref, mid_ref = interpolate.resolve_gbuffer(
        geo, tri, tid, inv_vp, cam, materials=mats
    )
    g_new, uv_new, mid_new = interpolate.resolve_gbuffer_stream(
        bins, tid, inv_vp, cam, materials=mats,
        width=W, height=H, tiles_y=ty, tiles_x=tx,
    )
    _assert_gbuffers_match(g_ref, g_new, uv_ref, uv_new, mid_ref, mid_new)


def test_full_graph_fused_resolve_matches():
    """End to end: the default frame graph with fused_resolve on renders
    the same image as the classic resolve (single-queue scene)."""
    from sailor_tpu.framegraph import FrameGraph, FrameGraphAsset
    from tests.test_framegraph import _scene_view, W as FW, H as FH

    cfg = {"z_far": 100.0, "shadow_resolution": 128, "env_resolution": 16,
           "bin_capacity": 256, "bin_rounds": 2, "sky_clouds": False}
    asset = FrameGraphAsset.load("content/DefaultRenderer.renderer")
    scene = _scene_view()

    fg_ref = FrameGraph(asset, FW, FH,
                        config=dict(cfg, fused_resolve=False))
    state = fg_ref.initial_state()
    fg_ref.prepare(scene, state)
    t_ref, _ = fg_ref.process(scene, state)

    fg_new = FrameGraph(
        FrameGraphAsset.load("content/DefaultRenderer.renderer"), FW, FH,
        config=dict(cfg, fused_resolve=True),
    )
    state2 = fg_new.initial_state()
    fg_new.prepare(scene, state2)
    t_new, _ = fg_new.process(scene, state2)

    a = np.asarray(t_ref["Final"])
    b = np.asarray(t_new["Final"])
    assert np.isfinite(b).all()
    # identical up to the fused path's f32 association (sub-LDR-step)
    assert np.abs(a - b).max() < 2e-3, np.abs(a - b).max()


def test_sharded_graph_fused_resolve_matches():
    """Fused resolve under the 8-shard screen-row mesh: per-shard bins +
    shard-local windows must reproduce the single-device fused render."""
    import jax

    from sailor_tpu.framegraph import FrameGraph, FrameGraphAsset
    from sailor_tpu.parallel.mesh import make_mesh
    import tests.test_parallel_graph as tp

    assert len(jax.devices()) >= 8
    scene = tp._scene()
    cfg = dict(tp._CONFIG, fused_resolve=True)

    fg1 = FrameGraph(tp._full_asset(), tp.W, tp.H, config=dict(cfg))
    state = fg1.initial_state()
    fg1.prepare(scene, state)
    t1, _ = fg1.process(scene, state)

    fg8 = FrameGraph(tp._full_asset(), tp.W, tp.H, config=dict(cfg))
    state8 = fg8.initial_state()
    fg8.prepare(scene, state8)
    t8, _ = fg8.process_sharded(scene, state8, make_mesh(8))

    a, b = np.asarray(t1["Final"]), np.asarray(t8["Final"])
    assert np.isfinite(b).all()
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_masked_scene_fused_resolve_matches():
    """Multi-queue scene: fused resolve sums the opaque + masked bin sets
    and must match the classic gathered resolve's final image."""
    from sailor_tpu.framegraph import FrameGraph, FrameGraphAsset
    import tests.test_render_queues as rq

    tex = np.ones((8, 8, 4), np.float32)
    tex[::2, :, 3] = 0.0
    scene = rq._quad_scene(rq._mat_table(1, alpha_tex=tex))

    def run(cfg):
        fg = FrameGraph(
            FrameGraphAsset.from_yaml(rq._GRAPH), rq.W, rq.H, config=cfg
        )
        state = fg.initial_state()
        fg.prepare(scene, state)
        targets, _ = fg.process(scene, state)
        return targets

    t_ref = run({"bin_capacity": 256, "bin_rounds": 2,
                 "fused_resolve": False})
    t_new = run({"bin_capacity": 256, "bin_rounds": 2,
                 "fused_resolve": True})
    a = np.asarray(t_ref["Final"])
    b = np.asarray(t_new["Final"])
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() < 2e-3, np.abs(a - b).max()


def test_transparent_scene_fused_resolve_matches():
    """Transparent queue: fused per-layer resolve (+ opacity plane) must
    match the classic path's blended image."""
    from sailor_tpu.framegraph import FrameGraph, FrameGraphAsset
    import tests.test_render_queues as rq

    scene = rq._quad_scene(rq._mat_table(2, opacity1=0.5))

    def run(cfg):
        fg = FrameGraph(
            FrameGraphAsset.from_yaml(rq._GRAPH), rq.W, rq.H, config=cfg
        )
        state = fg.initial_state()
        fg.prepare(scene, state)
        targets, _ = fg.process(scene, state)
        return targets

    t_ref = run({"bin_capacity": 256, "bin_rounds": 2,
                 "fused_resolve": False})
    t_new = run({"bin_capacity": 256, "bin_rounds": 2,
                 "fused_resolve": True})
    a = np.asarray(t_ref["Main"])
    b = np.asarray(t_new["Main"])
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() < 2e-3, np.abs(a - b).max()


def test_sharded_queues_fused_resolve_matches():
    """All three features together: masked+transparent queues, 8-shard
    mesh, fused resolve — sharded must equal single-device."""
    import jax

    from sailor_tpu.framegraph import FrameGraph, FrameGraphAsset
    from sailor_tpu.parallel.mesh import make_mesh
    import tests.test_parallel_graph as tp
    import tests.test_render_queues as rq
    from sailor_tpu.core import math3d as m3
    from sailor_tpu.rhi.types import FrameData

    assert len(jax.devices()) >= 8
    tex = np.ones((8, 8, 4), np.float32)
    tex[::2, :, 3] = 0.0
    scene = rq._quad_scene(rq._mat_table(1, alpha_tex=tex))
    cam = jnp.asarray([0.0, 2.0, 8.0])
    view = m3.look_at(cam, jnp.asarray([0.0, 2.0, 0.0]),
                      jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective(jnp.pi / 3, tp.W / tp.H, 0.1, 100.0)
    frame = FrameData.create(view, proj, cam, 0.1, 100.0, time=0.0,
                             dt=1 / 60)
    scene = scene.replace(frame=frame, prev_frame=frame)

    asset = FrameGraphAsset.from_yaml(
        "frame:\n - name: DepthPrepass\n - name: LinearizeDepth\n"
        " - name: LightCulling\n - name: RenderScene\n"
        " - name: RenderTransparent\n - name: EyeAdaptation\n"
    )
    cfg = {"bin_capacity": 256, "bin_rounds": 2, "fused_resolve": True}
    fg1 = FrameGraph(asset, tp.W, tp.H, config=dict(cfg))
    s1 = fg1.initial_state()
    fg1.prepare(scene, s1)
    t1, _ = fg1.process(scene, s1)

    fg8 = FrameGraph(asset, tp.W, tp.H, config=dict(cfg))
    s8 = fg8.initial_state()
    fg8.prepare(scene, s8)
    t8, _ = fg8.process_sharded(scene, s8, make_mesh(8))
    np.testing.assert_allclose(
        np.asarray(t8["Main"]), np.asarray(t1["Main"]), atol=1e-5, rtol=1e-5
    )
