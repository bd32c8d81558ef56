"""Pallas visibility-buffer raster kernel.

Per screen tile (TILE_H x TILE_W pixels), stream the tile's binned candidate
triangles through VMEM in chunks, evaluate the three edge functions and the
reverse-Z depth plane over the whole pixel block on the VPU, and keep the
arg-max depth winner per pixel.  Replaces the hardware rasterizer behind the
reference's depth-prepass and scene draws (DepthPrepassNode/RenderSceneNode);
the (depth, triangle id) output is a visibility buffer — attributes are
resolved by raster/interpolate.py.

No atomics, no divergence: every pixel in the block does identical work, and
the sequential Pallas grid gives exclusive ownership of each tile's output.

Mosaic alignment: per-tile inputs are folded to 2D arrays whose row-blocks
are (C, k) — the last two block dims must be 8/128-divisible or equal the
full array dims, so the tile index lives in the grid, not the block shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sailor_tpu.kernels import common

# Tile shape aligned to the VPU: 8-row sublanes x 128 lanes. 64-row tiles
# halve the (tiles x capacity) slot tables behind the raster's pre-gathers
# (the dominant DepthPrepass cost: slot gathers scale with ntiles*capacity,
# dead slots included) at the price of denser per-tile candidate lists.
TILE_H = 64
TILE_W = 128
CHUNK = 32  # triangles processed per inner iteration


def _raster_kernel(count_ref, setup_ref, ids_ref, depth_ref, tid_ref,
                   *, zlo_ref=None, zhi_ref=None):
    """One program = one screen tile.

    count_ref:  (Tiles,) scalar-prefetch SMEM — live candidate count per
                tile; the chunk loop runs ceil(count/CHUNK) iterations, so
                near-empty tiles (the common case) cost almost nothing.
    setup_ref:  (C, 12) packed per-candidate setup: edge coeffs (3 edges x
                A,B,C) then the depth plane (A,B,C) — ONE gather feeds the
                kernel (two separate edge/zplane gathers cost ~9+3 ms per
                pass at 1080p; gather cost is row count, not width).
    ids_ref:    (C, 1)  global triangle ids, -1 padding
    zlo/zhi_ref: optional (TILE_H, TILE_W) per-pixel reverse-Z bounds —
                accept only zlo < z < zhi. Drives depth peeling for the
                Masked/Transparent render queues (RenderSceneNode.cpp
                tag-filtered passes): zlo = the opaque depth underneath,
                zhi = the previous peel layer.
    depth_ref:  (TILE_H, TILE_W) out, reverse-Z (0 = far/clear)
    tid_ref:    (TILE_H, TILE_W) out, int32 winning triangle id (-1 = none)
    """
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    count = count_ref[ti * pl.num_programs(1) + tj]  # scalar SMEM load
    n_chunks = (count + (CHUNK - 1)) // CHUNK

    # Pixel-center coordinates of this tile.
    oy = (ti * TILE_H).astype(jnp.float32)
    ox = (tj * TILE_W).astype(jnp.float32)
    iy = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    py = oy + iy.astype(jnp.float32) + 0.5
    px = ox + ix.astype(jnp.float32) + 0.5

    def body(k, carry):
        best_z, best_id = carry
        sl = pl.ds(k * CHUNK, CHUNK)
        s = setup_ref[sl, :]     # (CHUNK, 12)
        e = s[:, 0:9]            # edge coeffs
        zp = s[:, 9:12]          # depth plane
        ids = ids_ref[sl, 0]     # (CHUNK,)

        exp_px = px[None]  # (1, TILE_H, TILE_W)
        exp_py = py[None]

        def edge_val(j):
            a = e[:, 3 * j + 0][:, None, None]
            b = e[:, 3 * j + 1][:, None, None]
            cc = e[:, 3 * j + 2][:, None, None]
            return a * exp_px + b * exp_py + cc

        # Edge functions are normalized to pixel distance; accept a small
        # negative tolerance for watertightness across clipped shared edges.
        eps = -0.05
        inside = (
            (edge_val(0) >= eps) & (edge_val(1) >= eps) & (edge_val(2) >= eps)
        )
        z = (
            zp[:, 0][:, None, None] * exp_px
            + zp[:, 1][:, None, None] * exp_py
            + zp[:, 2][:, None, None]
        )
        live = (ids >= 0)[:, None, None]
        # Reverse-Z: nearer = larger. Also require z in (0, 1] to respect
        # the near plane (z > 1 would be in front of near).
        ok = inside & live & (z > 0.0) & (z <= 1.0)
        if zlo_ref is not None:
            ok &= (z > zlo_ref[...][None]) & (z < zhi_ref[...][None])
        zm = jnp.where(ok, z, -1.0)
        k_z = jnp.max(zm, axis=0)
        # winner id without a gather (Mosaic-friendly): masked max over the
        # chunk of ids where the depth equals the chunk max.
        k_id = jnp.max(
            jnp.where(zm == k_z[None], ids[:, None, None], -1), axis=0
        )
        take = k_z > best_z
        return (
            jnp.where(take, k_z, best_z),
            jnp.where(take, k_id, best_id),
        )

    best_z = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    best_id = jnp.full((TILE_H, TILE_W), -1, jnp.int32)
    best_z, best_id = jax.lax.fori_loop(0, n_chunks, body, (best_z, best_id))
    depth_ref[...] = best_z
    tid_ref[...] = best_id


@functools.partial(jax.jit, static_argnames=("tiles_y", "tiles_x"))
def rasterize_tiles(setup, bins, *, tiles_y: int, tiles_x: int, counts=None,
                    z_bounds=None):
    """Run the visibility raster over all tiles.

    ``setup``: TriangleSetup; ``bins``: (Ty, Tx, C) candidate ids;
    ``counts``: optional (Ty, Tx) live candidate counts (computed from the
    bins when omitted) — drives per-tile early exit.
    ``z_bounds``: optional (zlo (H, W), zhi (H, W)) reverse-Z exclusive
    bounds for depth peeling (Masked alpha-test layers / Transparent
    back-to-front layers).
    Returns (depth (H, W) reverse-Z with 0 = far, tri_id (H, W) int32).
    """
    c = bins.shape[-1]
    assert c % CHUNK == 0, "bin capacity must be a CHUNK multiple"
    safe = jnp.maximum(bins, 0)
    # Fold (Ty, Tx) into rows: per-tile data as (Ty*Tx*C, k) row blocks.
    # Pack edge+zplane so the per-candidate fetch is ONE gather.
    table = jnp.concatenate([setup.edge.reshape(-1, 9), setup.zplane], axis=1)
    rows = table[safe].reshape(-1, 12)
    ids = bins.reshape(-1, 1)
    if counts is None:
        counts = jnp.sum(bins >= 0, axis=-1, dtype=jnp.int32)
    counts = counts.reshape(-1).astype(jnp.int32)

    def row_map(i, j, s):
        return (i * tiles_x + j, 0)

    def pix_map(i, j, s):
        return (i, j)

    in_specs = [
        pl.BlockSpec((c, 12), row_map),
        pl.BlockSpec((c, 1), row_map),
    ]
    inputs = [counts, rows, ids]
    kernel = _raster_kernel
    if z_bounds is not None:
        H, W = tiles_y * TILE_H, tiles_x * TILE_W
        zlo, zhi = z_bounds
        # pad to the raster grid if callers pass viewport-sized maps
        if zlo.shape != (H, W):
            ph, pw = H - zlo.shape[0], W - zlo.shape[1]
            zlo = jnp.pad(zlo, ((0, ph), (0, pw)))
            zhi = jnp.pad(zhi, ((0, ph), (0, pw)), constant_values=2.0)
        in_specs += [
            pl.BlockSpec((TILE_H, TILE_W), pix_map),
            pl.BlockSpec((TILE_H, TILE_W), pix_map),
        ]
        inputs += [zlo, zhi]

        def kernel(count_ref, setup_ref, ids_ref, zlo_ref, zhi_ref,
                   depth_ref, tid_ref):
            return _raster_kernel(
                count_ref, setup_ref, ids_ref, depth_ref, tid_ref,
                zlo_ref=zlo_ref, zhi_ref=zhi_ref,
            )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles_y, tiles_x),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((TILE_H, TILE_W), pix_map),
            pl.BlockSpec((TILE_H, TILE_W), pix_map),
        ),
    )
    depth, tid = common.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((tiles_y * TILE_H, tiles_x * TILE_W), jnp.float32),
            jax.ShapeDtypeStruct((tiles_y * TILE_H, tiles_x * TILE_W), jnp.int32),
        ),
    )(*inputs)
    return depth, tid
