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
# were chosen to halve the (tiles x capacity) slot tables behind the old
# binned raster's pre-gathers; the streaming raster has no slot tables, so
# shorter tiles (fewer pixels tested per candidate) may now win — override
# with SAILOR_RASTER_TILE_H (8-multiple) for A/B runs.
import os as _os

TILE_H = int(_os.environ.get("SAILOR_RASTER_TILE_H", "64"))
assert TILE_H % 8 == 0, "TILE_H must be a sublane multiple"
TILE_W = 128
CHUNK = 32  # triangles processed per inner iteration


def _raster_kernel(count_ref, setup_ref, ids_ref, depth_ref, tid_ref,
                   *, with_aabb=False, zlo_ref=None, zhi_ref=None):
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
        s = setup_ref[sl, :]     # (CHUNK, 12) or (CHUNK, 16) with aabb
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
        if with_aabb:
            # sliver-coverage clamp (see _test_chunk docstring)
            inside &= (
                (exp_px >= s[:, 12][:, None, None] + eps)
                & (exp_px <= s[:, 13][:, None, None] - eps)
                & (exp_py >= s[:, 14][:, None, None] + eps)
                & (exp_py <= s[:, 15][:, None, None] - eps)
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


def _test_chunk(s, px, py, zlo, zhi):
    """Edge/depth-test one packed candidate chunk against a pixel tile.

    ``s``: (C, 17) rows — edge coeffs (9), zplane (3), screen AABB
    (xmin, xmax, ymin, ymax), float id (-1 dead).
    Returns (zm (C, TH, TW) masked reverse-Z or -1, ids (C,) int32).

    The AABB clamp matters for sub-pixel SLIVERS: edge functions are
    half-plane tests with a -0.05 px watertightness tolerance, so a
    triangle thinner than 0.1 px "covers" its entire supporting line —
    across the whole screen. Bounding coverage to the triangle's own
    screen AABB (+tolerance) kills the streak, and makes candidates from
    adjacent segments in the ragged raster's CHUNK-aligned DMA windows
    provably reject (their AABB misses this tile by construction).
    """
    e = s[:, 0:9]
    zp = s[:, 9:12]
    ids = s[:, 16].astype(jnp.int32)
    exp_px = px[None]
    exp_py = py[None]

    def edge_val(j):
        a = e[:, 3 * j + 0][:, None, None]
        b = e[:, 3 * j + 1][:, None, None]
        cc = e[:, 3 * j + 2][:, None, None]
        return a * exp_px + b * exp_py + cc

    eps = -0.05
    inside = (
        (edge_val(0) >= eps) & (edge_val(1) >= eps) & (edge_val(2) >= eps)
    )
    inside &= (
        (exp_px >= s[:, 12][:, None, None] + eps)
        & (exp_px <= s[:, 13][:, None, None] - eps)
        & (exp_py >= s[:, 14][:, None, None] + eps)
        & (exp_py <= s[:, 15][:, None, None] - eps)
    )
    z = (
        zp[:, 0][:, None, None] * exp_px
        + zp[:, 1][:, None, None] * exp_py
        + zp[:, 2][:, None, None]
    )
    ok = inside & (ids >= 0)[:, None, None] & (z > 0.0) & (z <= 1.0)
    if zlo is not None:
        ok &= (z > zlo[None]) & (z < zhi[None])
    return jnp.where(ok, z, -1.0), ids


def _merge_chunk(carry, zm, ids):
    best_z, best_id = carry
    k_z = jnp.max(zm, axis=0)
    k_id = jnp.max(jnp.where(zm == k_z[None], ids[:, None, None], -1), axis=0)
    take = k_z > best_z
    return jnp.where(take, k_z, best_z), jnp.where(take, k_id, best_id)


def _raster_kernel_stream(sc_ref, rows_ref, big_ref, depth_ref, tid_ref, *,
                          ntx: int, ntiles: int, chunk: int,
                          zlo_ref=None, zhi_ref=None):
    """Streaming ragged raster: grid (ty, tx, k) — program (i, j, k) tests
    the k-th CHUNK-aligned window of tile (i, j)'s segment of the
    tile-major sorted candidate array (bin_sorted). The rows BlockSpec
    index map (rasterize_stream) selects the window; steps past the
    segment end clamp to the last live window, so Mosaic skips the DMA
    (same block index) and ``k >= spt`` skips the compute. The output
    blocks are constant over k — the canonical revisit/accumulate pattern
    (matmul k-loop), so depth/tid stay VMEM-resident across the whole
    tile and are written back once.

    Replaces slot tables entirely: no (Tiles, C) id/row gathers on the
    XLA side (they were ~15 ms of the 1080p frame), one gather of the
    sorted rows, ONE raster pass, no per-round merge passes.

    sc_ref: scalar prefetch [c0 (ntiles,) | spt (ntiles,) | n_big].
    Boundary windows carry a few candidates of adjacent tiles — their
    screen AABB cannot overlap this tile, so the sliver/AABB clamp
    rejects them (same argument as _raster_kernel_flat).
    """
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    k = pl.program_id(2)
    t = ti * ntx + tj
    spt = sc_ref[ntiles + t]
    n_big = sc_ref[2 * ntiles]

    oy = (ti * TILE_H).astype(jnp.float32)
    ox = (tj * TILE_W).astype(jnp.float32)
    iy = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    py = oy + iy.astype(jnp.float32) + 0.5
    px = ox + ix.astype(jnp.float32) + 0.5
    zlo = zlo_ref[...] if zlo_ref is not None else None
    zhi = zhi_ref[...] if zhi_ref is not None else None

    def test_sub(ref, base, carry):
        """Test one CHUNK-row sub-window of ``ref`` starting at ``base``."""
        s = ref[pl.ds(base, CHUNK), :]
        zm, ids = _test_chunk(s, px, py, zlo, zhi)
        return _merge_chunk(carry, zm, ids)

    @pl.when(k == 0)
    def _():
        best = (
            jnp.zeros((TILE_H, TILE_W), jnp.float32),
            jnp.full((TILE_H, TILE_W), -1, jnp.int32),
        )
        nb = (n_big + (CHUNK - 1)) // CHUNK
        best = jax.lax.fori_loop(
            0, nb, lambda b, c: test_sub(big_ref, b * CHUNK, c), best
        )
        depth_ref[...] = best[0]
        tid_ref[...] = best[1]

    @pl.when((k == 0) | (k < spt))
    def _():
        best = jax.lax.fori_loop(
            0, chunk // CHUNK,
            lambda b, c: test_sub(rows_ref, b * CHUNK, c),
            (depth_ref[...], tid_ref[...]),
        )
        depth_ref[...] = best[0]
        tid_ref[...] = best[1]


@functools.partial(
    jax.jit, static_argnames=("tiles_y", "tiles_x", "chunk", "kmax")
)
def rasterize_stream(setup, screen_aabb, order, starts, counts, big_ids,
                     n_big, *, tiles_y: int, tiles_x: int, z_bounds=None,
                     chunk: int = 256, kmax: int = 16):
    """Raster from bin_sorted's ragged bins with the streaming kernel.

    ``kmax`` bounds the per-tile segment to kmax*chunk candidates (the
    analog of bin_all's capacity*rounds); overflow is returned so callers
    can surface dropped work. Returns (depth, tid, overflow).
    """
    ab = jnp.stack(screen_aabb, axis=1)
    table = jnp.concatenate(
        [setup.edge.reshape(-1, 9), setup.zplane, ab], axis=1
    )  # (R, 16)

    def packed_rows(idx):
        live = idx >= 0
        r = table[jnp.maximum(idx, 0)]
        idf = jnp.where(live, idx, -1).astype(jnp.float32)[:, None]
        return jnp.concatenate([r, idf], axis=1)  # (N, 17)

    rows = packed_rows(order)
    n = rows.shape[0]
    npad = common.round_up(n, chunk) + chunk  # windows never run off the end
    dead = jnp.zeros((npad - n, 17), jnp.float32).at[:, 16].set(-1.0)
    rows = jnp.concatenate([rows, dead])

    bpad = max(common.round_up(big_ids.shape[0], CHUNK), CHUNK)
    big_rows = packed_rows(big_ids)
    if bpad != big_rows.shape[0]:
        bdead = jnp.zeros(
            (bpad - big_rows.shape[0], 17), jnp.float32
        ).at[:, 16].set(-1.0)
        big_rows = jnp.concatenate([big_rows, bdead])

    ntiles = tiles_y * tiles_x
    starts = starts.astype(jnp.int32)
    counts = counts.astype(jnp.int32)
    ends = starts + counts
    c0 = starts // chunk
    c1 = jnp.maximum((ends + chunk - 1) // chunk, c0 + 1)
    spt = jnp.minimum(c1 - c0, kmax)
    overflow = jnp.maximum(ends - (c0 + kmax) * chunk, 0).sum()
    sc = jnp.concatenate(
        [c0, spt, n_big.astype(jnp.int32)[None]]
    )

    def rows_map(i, j, k, sc):
        t = i * tiles_x + j
        return (sc[t] + jnp.minimum(k, jnp.maximum(sc[ntiles + t] - 1, 0)), 0)

    def pix_map(i, j, k, sc):
        return (i, j)

    in_specs = [
        pl.BlockSpec((chunk, 17), rows_map),
        pl.BlockSpec((bpad, 17), lambda i, j, k, sc: (0, 0)),
    ]
    inputs = [sc, rows, big_rows]
    kernel = functools.partial(
        _raster_kernel_stream, ntx=tiles_x, ntiles=ntiles, chunk=chunk
    )
    if z_bounds is not None:
        H, W = tiles_y * TILE_H, tiles_x * TILE_W
        zlo, zhi = z_bounds
        if zlo.shape != (H, W):
            ph, pw = H - zlo.shape[0], W - zlo.shape[1]
            zlo = jnp.pad(zlo, ((0, ph), (0, pw)))
            zhi = jnp.pad(zhi, ((0, ph), (0, pw)), constant_values=2.0)
        in_specs += [
            pl.BlockSpec((TILE_H, TILE_W), pix_map),
            pl.BlockSpec((TILE_H, TILE_W), pix_map),
        ]
        inputs += [zlo, zhi]

        def kernel(sc_ref, rows_ref, big_ref, zlo_ref, zhi_ref,
                   depth_ref, tid_ref):
            return _raster_kernel_stream(
                sc_ref, rows_ref, big_ref, depth_ref, tid_ref,
                ntx=tiles_x, ntiles=ntiles, chunk=chunk,
                zlo_ref=zlo_ref, zhi_ref=zhi_ref,
            )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles_y, tiles_x, kmax),
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
            jax.ShapeDtypeStruct(
                (tiles_y * TILE_H, tiles_x * TILE_W), jnp.float32
            ),
            jax.ShapeDtypeStruct(
                (tiles_y * TILE_H, tiles_x * TILE_W), jnp.int32
            ),
        ),
    )(*inputs)
    return depth, tid, overflow

def _raster_kernel_dma(sc_ref, rows_hbm, big_ref, depth_ref, tid_ref,
                       buf, sem, *, ntx: int, ntiles: int, dchunk: int,
                       zlo_ref=None, zhi_ref=None):
    """Manual-DMA streaming raster: grid (ty, tx) — each program walks its
    tile's exact [w0, w0+nw) window span of the tile-major sorted rows
    array with a double-buffered async copy pipeline.

    vs the grid-k streaming kernel (_raster_kernel_stream): no dead grid
    steps (the window loop bound is the tile's true count, not a static
    kmax), no per-tile segment cap (overflow-free), and the window
    granularity is ``dchunk`` rows instead of 256 — boundary slop drops
    proportionally. The outputs double as VMEM accumulators (one visit
    per block), so the merge needs no carries.
    """
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    t = ti * ntx + tj
    w0 = sc_ref[t]
    nw = sc_ref[ntiles + t]
    n_big = sc_ref[2 * ntiles]

    oy = (ti * TILE_H).astype(jnp.float32)
    ox = (tj * TILE_W).astype(jnp.float32)
    iy = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    py = oy + iy.astype(jnp.float32) + 0.5
    px = ox + ix.astype(jnp.float32) + 0.5
    zlo = zlo_ref[...] if zlo_ref is not None else None
    zhi = zhi_ref[...] if zhi_ref is not None else None

    def cp(i, slot: int):
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds((w0 + i) * dchunk, dchunk), :],
            buf.at[slot], sem.at[slot],
        )

    # big triangles (tested by every tile; B is tiny) seed the outputs
    best = (
        jnp.zeros((TILE_H, TILE_W), jnp.float32),
        jnp.full((TILE_H, TILE_W), -1, jnp.int32),
    )
    nb = (n_big + (CHUNK - 1)) // CHUNK
    def big_step(b, c):
        zm, ids = _test_chunk(
            big_ref[pl.ds(b * CHUNK, CHUNK), :], px, py, zlo, zhi
        )
        return _merge_chunk(c, zm, ids)
    best = jax.lax.fori_loop(0, nb, big_step, best)
    depth_ref[...] = best[0]
    tid_ref[...] = best[1]

    @pl.when(nw > 0)
    def _():
        cp(0, 0).start()

    def window(i, _):
        even = jax.lax.rem(i, 2) == 0

        @pl.when((i + 1 < nw) & even)
        def _():
            cp(i + 1, 1).start()

        @pl.when((i + 1 < nw) & ~even)
        def _():
            cp(i + 1, 0).start()

        def run(slot: int):
            cp(i, slot).wait()
            carry = (depth_ref[...], tid_ref[...])
            for b in range(dchunk // CHUNK):
                zm, ids = _test_chunk(
                    buf[slot, pl.ds(b * CHUNK, CHUNK), :], px, py, zlo, zhi
                )
                carry = _merge_chunk(carry, zm, ids)
            depth_ref[...] = carry[0]
            tid_ref[...] = carry[1]

        @pl.when(even)
        def _():
            run(0)

        @pl.when(~even)
        def _():
            run(1)

        return 0

    jax.lax.fori_loop(0, nw, window, 0)


@functools.partial(
    jax.jit, static_argnames=("tiles_y", "tiles_x", "dchunk")
)
def rasterize_dma(setup, screen_aabb, order, starts, counts, big_ids,
                  n_big, *, tiles_y: int, tiles_x: int, z_bounds=None,
                  dchunk: int = 128):
    """Raster from bin_sorted's ragged bins with the manual-DMA kernel.

    Overflow-free (no per-tile cap). Returns (depth, tid, overflow=0) for
    interface parity with rasterize_stream.
    """
    ab = jnp.stack(screen_aabb, axis=1)
    table = jnp.concatenate(
        [setup.edge.reshape(-1, 9), setup.zplane, ab], axis=1
    )  # (R, 16)

    def packed_rows(idx):
        live = idx >= 0
        r = table[jnp.maximum(idx, 0)]
        idf = jnp.where(live, idx, -1).astype(jnp.float32)[:, None]
        return jnp.concatenate([r, idf], axis=1)  # (N, 17)

    rows = packed_rows(order)
    n = rows.shape[0]
    npad = common.round_up(n, dchunk) + dchunk
    dead = jnp.zeros((npad - n, 17), jnp.float32).at[:, 16].set(-1.0)
    rows = jnp.concatenate([rows, dead])

    bpad = max(common.round_up(big_ids.shape[0], CHUNK), CHUNK)
    big_rows = packed_rows(big_ids)
    if bpad != big_rows.shape[0]:
        bdead = jnp.zeros(
            (bpad - big_rows.shape[0], 17), jnp.float32
        ).at[:, 16].set(-1.0)
        big_rows = jnp.concatenate([big_rows, bdead])

    ntiles = tiles_y * tiles_x
    starts = starts.astype(jnp.int32)
    ends = starts + counts.astype(jnp.int32)
    w0 = starts // dchunk
    nw = jnp.where(
        counts > 0, (ends + dchunk - 1) // dchunk - w0, 0
    ).astype(jnp.int32)
    sc = jnp.concatenate([w0, nw, n_big.astype(jnp.int32)[None]])

    def pix_map(i, j, sc):
        return (i, j)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((bpad, 17), lambda i, j, sc: (0, 0)),
    ]
    inputs = [sc, rows, big_rows]
    kernel = functools.partial(
        _raster_kernel_dma, ntx=tiles_x, ntiles=ntiles, dchunk=dchunk
    )
    if z_bounds is not None:
        H, W = tiles_y * TILE_H, tiles_x * TILE_W
        zlo, zhi = z_bounds
        if zlo.shape != (H, W):
            ph, pw = H - zlo.shape[0], W - zlo.shape[1]
            zlo = jnp.pad(zlo, ((0, ph), (0, pw)))
            zhi = jnp.pad(zhi, ((0, ph), (0, pw)), constant_values=2.0)
        in_specs += [
            pl.BlockSpec((TILE_H, TILE_W), pix_map),
            pl.BlockSpec((TILE_H, TILE_W), pix_map),
        ]
        inputs += [zlo, zhi]

        def kernel(sc_ref, rows_hbm, big_ref, zlo_ref, zhi_ref,
                   depth_ref, tid_ref, buf, sem):
            return _raster_kernel_dma(
                sc_ref, rows_hbm, big_ref, depth_ref, tid_ref, buf, sem,
                ntx=tiles_x, ntiles=ntiles, dchunk=dchunk,
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
        scratch_shapes=[
            pltpu.VMEM((2, dchunk, 17), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    depth, tid = common.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(
                (tiles_y * TILE_H, tiles_x * TILE_W), jnp.float32
            ),
            jax.ShapeDtypeStruct(
                (tiles_y * TILE_H, tiles_x * TILE_W), jnp.int32
            ),
        ),
    )(*inputs)
    return depth, tid, jnp.asarray(0, jnp.int32)


@functools.partial(jax.jit, static_argnames=("tiles_y", "tiles_x"))
def rasterize_tiles(setup, bins, *, tiles_y: int, tiles_x: int, counts=None,
                    z_bounds=None, screen_aabb=None):
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
    # Pack edge+zplane (+ screen AABB for the sliver clamp) so the
    # per-candidate fetch is ONE gather.
    parts = [setup.edge.reshape(-1, 9), setup.zplane]
    if screen_aabb is not None:
        parts.append(jnp.stack(screen_aabb, axis=1))
    table = jnp.concatenate(parts, axis=1)
    width = table.shape[1]
    rows = table[safe].reshape(-1, width)
    ids = bins.reshape(-1, 1)
    if counts is None:
        counts = jnp.sum(bins >= 0, axis=-1, dtype=jnp.int32)
    counts = counts.reshape(-1).astype(jnp.int32)

    def row_map(i, j, s):
        return (i * tiles_x + j, 0)

    def pix_map(i, j, s):
        return (i, j)

    in_specs = [
        pl.BlockSpec((c, width), row_map),
        pl.BlockSpec((c, 1), row_map),
    ]
    inputs = [counts, rows, ids]
    kernel = functools.partial(_raster_kernel, with_aabb=screen_aabb is not None)
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
                with_aabb=screen_aabb is not None,
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
