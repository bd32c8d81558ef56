"""End-to-end raster pipeline: setup -> bin -> tile raster -> GBuffer.

The TPU analog of DepthPrepassNode + RenderSceneNode's draw path:
one call produces the visibility buffer and the resolved GBuffer for a
frame. The whole thing is jit-compatible with static (padded) shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sailor_tpu.kernels import common
from sailor_tpu.raster import interpolate, setup as rsetup, tile_raster


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "capacity", "cull", "rounds"),
)
def rasterize(
    geometry,
    view_projection,
    camera_position=None,
    *,
    width: int,
    height: int,
    capacity: int = 512,
    rounds: int = 1,
    cull: str = "back",
    materials=None,
):
    """Rasterize world-space geometry into (GBuffer, depth, tri_id, stats).

    ``width``/``height`` are padded internally to raster-tile multiples;
    outputs are cropped back. Depth is reverse-Z (0 = background).
    ``camera_position`` is needed for the world-space barycentric resolve;
    if None it is recovered from inv(view_projection).
    """
    pw = common.round_up(width, tile_raster.TILE_W)
    ph = common.round_up(height, tile_raster.TILE_H)
    tiles_x = pw // tile_raster.TILE_W
    tiles_y = ph // tile_raster.TILE_H

    inv_vp = jnp.linalg.inv(view_projection)
    if camera_position is None:
        # The eye maps to clip (0, 0, c, 0) under a perspective VP, so
        # inv_vp @ (0,0,1,0) is the homogeneous camera center.
        cam_h = inv_vp @ jnp.asarray([0.0, 0.0, 1.0, 0.0])
        camera_position = cam_h[:3] / cam_h[3]

    tri, aabb = rsetup.triangle_setup(
        geometry, view_projection, width=width, height=height, cull=cull
    )
    # Sort-based binning returns several (bins, counts) passes (rounds over
    # the small-triangle lists + one big-triangle pass); depth-max merge
    # keeps results exact under bin overflow (the "overflow passes"
    # strategy from SURVEY.md §7).
    passes, overflow = rsetup.bin_all(
        tri.valid,
        aabb,
        tiles_x=tiles_x,
        tiles_y=tiles_y,
        tile_w=tile_raster.TILE_W,
        tile_h=tile_raster.TILE_H,
        capacity=capacity,
        rounds=rounds,
    )
    depth = tid = None
    for bins, counts in passes:
        d_r, t_r = tile_raster.rasterize_tiles(
            tri, bins, tiles_y=tiles_y, tiles_x=tiles_x, counts=counts
        )
        if depth is None:
            depth, tid = d_r, t_r
        else:
            take = d_r > depth
            depth = jnp.where(take, d_r, depth)
            tid = jnp.where(take, t_r, tid)
    depth = depth[:height, :width]
    tid = tid[:height, :width]
    gbuffer, uv, mat_id = interpolate.resolve_gbuffer(
        geometry, tri, tid, inv_vp, camera_position, materials=materials
    )
    stats = {"bin_overflow": overflow, "tile_tri_counts": counts}
    return gbuffer, depth, tid, stats
