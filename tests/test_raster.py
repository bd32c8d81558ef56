"""Rasterizer tests: coverage, depth ordering, culling, interpolation."""

import jax.numpy as jnp
import numpy as np
import pytest

from sailor_tpu.core import math3d as m3
from sailor_tpu.raster import rasterize
from sailor_tpu.raster.setup import Geometry

W, H = 128, 64  # one tile exactly (128x64 -> padded to 128x64: 2x1 tiles of 32x128)


def _geometry(positions, indices, colors=None, normals=None, uvs=None):
    v = len(positions)
    t = len(indices)
    return Geometry(
        position=jnp.asarray(positions, jnp.float32),
        normal=jnp.asarray(
            normals if normals is not None else [[0, 0, 1]] * v, jnp.float32
        ),
        uv=jnp.asarray(uvs if uvs is not None else [[0, 0]] * v, jnp.float32),
        color=jnp.asarray(
            colors if colors is not None else [[1, 1, 1, 1]] * v, jnp.float32
        ),
        indices=jnp.asarray(indices, jnp.int32),
        material_id=jnp.zeros((t,), jnp.int32),
    )


def _ortho_vp():
    # Simple view: camera at +z looking at origin, ortho-ish via perspective
    view = m3.look_at(
        jnp.asarray([0.0, 0.0, 3.0]),
        jnp.asarray([0.0, 0.0, 0.0]),
        jnp.asarray([0.0, 1.0, 0.0]),
    )
    proj = m3.perspective(jnp.pi / 2, W / H, 0.1, 100.0)
    return proj @ view


def _fullscreen_quad(z=0.0, flip=False):
    s = 8.0
    verts = [[-s, -s, z], [s, -s, z], [s, s, z], [-s, s, z]]
    idx = [[0, 1, 2], [0, 2, 3]]
    if flip:
        idx = [[0, 2, 1], [0, 3, 2]]
    return verts, idx


def test_fullscreen_quad_covers_everything():
    verts, idx = _fullscreen_quad()
    geo = _geometry(verts, idx)
    gb, depth, tid, stats = rasterize(geo, _ortho_vp(), width=W, height=H, capacity=32)
    cov = np.asarray(gb.coverage)
    assert cov.mean() > 0.999
    d = np.asarray(depth)
    assert (d > 0).all()
    assert int(stats["bin_overflow"]) == 0


def test_backface_culled():
    verts, idx = _fullscreen_quad(flip=True)
    geo = _geometry(verts, idx)
    gb, depth, tid, _ = rasterize(geo, _ortho_vp(), width=W, height=H, capacity=32)
    assert float(gb.coverage.sum()) == 0.0
    # cull="none" renders it
    gb2, *_ = rasterize(geo, _ortho_vp(), width=W, height=H, capacity=32, cull="none")
    assert float(gb2.coverage.mean()) > 0.999


def test_depth_ordering():
    # near quad (z=1, closer to camera at z=3) on the left half only
    far_v, far_i = _fullscreen_quad(z=0.0)
    near_v = [[-8.0, -8.0, 1.0], [0.0, -8.0, 1.0], [0.0, 8.0, 1.0], [-8.0, 8.0, 1.0]]
    near_i = [[4, 5, 6], [4, 6, 7]]
    geo = _geometry(
        far_v + near_v,
        far_i + near_i,
        colors=[[1, 0, 0, 1]] * 4 + [[0, 1, 0, 1]] * 4,
    )
    gb, depth, tid, _ = rasterize(geo, _ortho_vp(), width=W, height=H, capacity=32)
    alb = np.asarray(gb.albedo)
    # left half green (near quad), right half red
    assert alb[H // 2, W // 4, 1] > 0.9 and alb[H // 2, W // 4, 0] < 0.1
    assert alb[H // 2, 3 * W // 4, 0] > 0.9 and alb[H // 2, 3 * W // 4, 1] < 0.1
    d = np.asarray(depth)
    assert d[H // 2, W // 4] > d[H // 2, 3 * W // 4]  # reverse-Z: near is larger


def test_attribute_interpolation_gradient():
    verts, idx = _fullscreen_quad()
    colors = [[0, 0, 0, 1], [1, 0, 0, 1], [1, 1, 0, 1], [0, 1, 0, 1]]
    geo = _geometry(verts, idx, colors=colors)
    gb, *_ = rasterize(geo, _ortho_vp(), width=W, height=H, capacity=32)
    alb = np.asarray(gb.albedo)
    # red increases left->right; green increases top... screen y down:
    # vertex 3 (-s,+s) maps to top-left (NDC y up -> screen top), green=1 at top
    assert alb[H // 2, 8, 0] < alb[H // 2, W - 8, 0]
    assert alb[8, W // 2, 1] > alb[H - 8, W // 2, 1]
    # center ~ mean of quad corners
    np.testing.assert_allclose(alb[H // 2, W // 2, :3], [0.5, 0.5, 0.0], atol=0.06)


def test_partial_triangle_area():
    # right triangle covering the left-bottom half of a sub-square
    # (small enough to project fully on-screen so the area oracle holds)
    verts = [[-1.5, -1.5, 0.0], [1.5, -1.5, 0.0], [-1.5, 1.5, 0.0]]
    geo = _geometry(verts, [[0, 1, 2]])
    gb, depth, tid, _ = rasterize(geo, _ortho_vp(), width=W, height=H, capacity=32)
    cov = np.asarray(gb.coverage)
    # projected AABB of the 8x8 square ~ covers 1/3.3 of 90deg-fov screen at d=3
    assert 0.02 < cov.mean() < 0.5
    # triangle half of its bounding square: compare vs own AABB coverage
    ys, xs = np.nonzero(cov)
    bbox_area = (ys.max() - ys.min() + 1) * (xs.max() - xs.min() + 1)
    assert abs(cov.sum() / bbox_area - 0.5) < 0.05


def test_behind_camera_dropped():
    verts = [[-1.0, -1.0, 10.0], [1.0, -1.0, 10.0], [0.0, 1.0, 10.0]]  # behind cam z=3
    geo = _geometry(verts, [[0, 1, 2]])
    gb, *_ = rasterize(geo, _ortho_vp(), width=W, height=H, capacity=32)
    assert float(gb.coverage.sum()) == 0.0


def test_stream_matches_dense():
    """bin_sorted + rasterize_stream == bin_all + rasterize_tiles (both with
    the sliver AABB clamp), including the z-bounded peel path."""
    from sailor_tpu.raster import setup as rsetup, tile_raster

    rng = np.random.default_rng(7)
    n_tri = 60
    verts, idx = [], []
    for i in range(n_tri):
        c = rng.uniform(-6, 6, 3)
        for _ in range(3):
            verts.append(c + rng.uniform(-1.2, 1.2, 3))
        idx.append([3 * i, 3 * i + 1, 3 * i + 2])
    geo = _geometry(verts, idx)
    tri, aabb = rsetup.triangle_setup(
        geo, _ortho_vp(), width=W, height=H, cull="none"
    )
    tw, th = tile_raster.TILE_W, tile_raster.TILE_H
    tx, ty = -(-W // tw), -(-H // th)
    passes, ovf = rsetup.bin_all(
        tri.valid, aabb, tiles_x=tx, tiles_y=ty, tile_w=tw, tile_h=th,
        capacity=256, rounds=2,
    )
    d = t_ = None
    for bins, counts in passes:
        dr, tr = tile_raster.rasterize_tiles(
            tri, bins, tiles_y=ty, tiles_x=tx, counts=counts,
            screen_aabb=aabb,
        )
        if d is None:
            d, t_ = dr, tr
        else:
            take = dr > d
            d = jnp.where(take, dr, d)
            t_ = jnp.where(take, tr, t_)
    rb = rsetup.bin_sorted(
        tri.valid, aabb, tiles_x=tx, tiles_y=ty, tile_w=tw, tile_h=th
    )
    assert int(ovf) == 0 and int(rb[5]) == 0

    zlo = d * 0.5
    zhi = jnp.full(d.shape, 2.0)
    db = tb = None
    for bins, counts in passes:
        dr, tr = tile_raster.rasterize_tiles(
            tri, bins, tiles_y=ty, tiles_x=tx, counts=counts,
            z_bounds=(zlo, zhi), screen_aabb=aabb,
        )
        if db is None:
            db, tb = dr, tr
        else:
            take = dr > db
            db = jnp.where(take, dr, db)
            tb = jnp.where(take, tr, tb)

    # streaming kernel: same ragged bins, grid-(ty,tx,k) windows
    d3, t3, ov3 = tile_raster.rasterize_stream(
        tri, aabb, *rb[:5], tiles_y=ty, tiles_x=tx, chunk=64, kmax=8
    )
    assert int(ov3) == 0
    np.testing.assert_allclose(np.asarray(d), np.asarray(d3), atol=1e-6)
    assert (np.asarray(t_) == np.asarray(t3)).all()
    dc, tc, _ = tile_raster.rasterize_stream(
        tri, aabb, *rb[:5], tiles_y=ty, tiles_x=tx,
        z_bounds=(zlo, zhi), chunk=64, kmax=8,
    )
    np.testing.assert_allclose(np.asarray(dc), np.asarray(db), atol=1e-6)
    assert (np.asarray(tc) == np.asarray(tb)).all()

    # MXU kernel: same windows, planes on the systolic array (chunk must
    # be a CHUNK_MXU multiple — the guard is its own test below)
    dm, tm, ovm = tile_raster.rasterize_stream(
        tri, aabb, *rb[:5], tiles_y=ty, tiles_x=tx, chunk=128, kmax=8,
        mxu=True,
    )
    assert int(ovm) == 0
    np.testing.assert_allclose(np.asarray(d), np.asarray(dm), atol=1e-6)
    assert (np.asarray(t_) == np.asarray(tm)).all()
    dmz, tmz, _ = tile_raster.rasterize_stream(
        tri, aabb, *rb[:5], tiles_y=ty, tiles_x=tx,
        z_bounds=(zlo, zhi), chunk=128, kmax=8, mxu=True,
    )
    np.testing.assert_allclose(np.asarray(dmz), np.asarray(db), atol=1e-6)
    assert (np.asarray(tmz) == np.asarray(tb)).all()
    with pytest.raises(ValueError):
        tile_raster.rasterize_stream(
            tri, aabb, *rb[:5], tiles_y=ty, tiles_x=tx, chunk=64, kmax=8,
            mxu=True,
        )

    # manual-DMA kernel: same ragged bins, per-tile async-copy windows
    d4, t4, ov4 = tile_raster.rasterize_dma(
        tri, aabb, *rb[:5], tiles_y=ty, tiles_x=tx, dchunk=64
    )
    assert int(ov4) == 0
    np.testing.assert_allclose(np.asarray(d), np.asarray(d4), atol=1e-6)
    assert (np.asarray(t_) == np.asarray(t4)).all()
    d5, t5, _ = tile_raster.rasterize_dma(
        tri, aabb, *rb[:5], tiles_y=ty, tiles_x=tx,
        z_bounds=(zlo, zhi), dchunk=64,
    )
    np.testing.assert_allclose(np.asarray(d5), np.asarray(db), atol=1e-6)
    assert (np.asarray(t5) == np.asarray(tb)).all()
