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
    jax.jit, static_argnames=("tiles_y", "tiles_x", "chunk", "kmax", "mxu")
)
def rasterize_stream(setup, screen_aabb, order, starts, counts, big_ids,
                     n_big, *, tiles_y: int, tiles_x: int, z_bounds=None,
                     chunk: int = 256, kmax: int = 16, prebuilt=None,
                     mxu: bool = False):
    """Raster from bin_sorted's ragged bins with the streaming kernel.

    ``kmax`` bounds the per-tile segment to kmax*chunk candidates (the
    analog of bin_all's capacity*rounds); overflow is returned so callers
    can surface dropped work. Returns (depth, tid, overflow).

    ``prebuilt``: optional (rows, big_rows) from build_stream_rows — when
    the fused resolve runs too, ONE shared gather feeds both kernels (the
    raster reads cols 0:17 of the wider rows; extra lanes in the window
    DMA are noise next to the gather it saves).
    """
    if mxu and (chunk % CHUNK_MXU or chunk < CHUNK_MXU):
        # the MXU kernel walks chunk // CHUNK_MXU full sub-windows; a
        # non-multiple chunk would silently drop candidates (advisor r3)
        raise ValueError(
            f"mxu=True requires chunk % {CHUNK_MXU} == 0, got {chunk}"
        )
    if mxu and TILE_H % MXU_STRIP:
        raise ValueError(
            f"mxu=True requires TILE_H % {MXU_STRIP} == 0, got {TILE_H}"
        )
    if prebuilt is not None:
        rows, big_rows = prebuilt
    else:
        rows, big_rows, _ = build_stream_rows(
            setup, screen_aabb, order, big_ids, attrs=None, chunk=chunk
        )
    ncols = rows.shape[1]
    bpad = big_rows.shape[0]

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

    if mxu and bpad % CHUNK_MXU:
        extra = CHUNK_MXU - bpad % CHUNK_MXU
        dead = jnp.zeros((extra, ncols), big_rows.dtype).at[:, 16].set(-1.0)
        big_rows = jnp.concatenate([big_rows, dead])
        bpad = big_rows.shape[0]

    in_specs = [
        pl.BlockSpec((chunk, ncols), rows_map),
        pl.BlockSpec((bpad, ncols), lambda i, j, k, sc: (0, 0)),
    ]
    inputs = [sc, rows, big_rows]
    base_kernel = _raster_kernel_stream_mxu if mxu else _raster_kernel_stream
    kernel = functools.partial(
        base_kernel, ntx=tiles_x, ntiles=ntiles, chunk=chunk
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

        if mxu:
            def kernel(sc_ref, rows_ref, big_ref, zlo_ref, zhi_ref,
                       depth_ref, tid_ref, zb_ref, ib_ref):
                return _raster_kernel_stream_mxu(
                    sc_ref, rows_ref, big_ref, depth_ref, tid_ref,
                    zb_ref, ib_ref,
                    ntx=tiles_x, ntiles=ntiles, chunk=chunk,
                    zlo_ref=zlo_ref, zhi_ref=zhi_ref,
                )
        else:
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
        scratch_shapes=(
            [
                pltpu.VMEM((TILE_H * TILE_W, 1), jnp.float32),
                pltpu.VMEM((TILE_H * TILE_W, 1), jnp.float32),
            ]
            if mxu else []
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
        # the mxu variant's (PX, 1) winner scratch lane-pads to ~4 MB per
        # buffer at TILE_H=64 and brushes the 16 MB default scoped limit;
        # v5e has 128 MB physical VMEM (same override as resolve/sweep)
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20)
            if mxu else None
        ),
    )(*inputs)
    return depth, tid, overflow

def _window_worklist(starts, counts, ntiles: int, chunk: int, nw_max: int):
    """Flatten ragged per-tile window segments into per-window work arrays.

    Returns (wt, wk, wabs, b0, b1): for each of nw_max grid steps, the
    tile id, the window index within its tile (-1 for dead tail steps),
    the absolute window-block index into the sorted rows array, and the
    LIVE sub-chunk range [b0, b1) in CHUNK units within the window —
    rows outside the tile's own [start, end) segment are provably
    rejected (bin_sorted AABB guarantee), so kernels loop only b0..b1
    and skip entirely when b1 == b0. Sparse queues (e.g. a masked peel
    over a few dozen triangles) have one EMPTY window per tile; without
    the skip every such window still paid the full chunk x npix
    edge-test/MAC floor (~4.4 ms per pallas call at 1080p, measured).
    Dead steps repeat the last live entry's tile/block so Mosaic skips
    their DMA and output flush. Every tile contributes >= 1 window
    (c1 >= c0 + 1), so the work list is tile-major ascending and output
    revisits are consecutive — the ragged/grouped-matmul grid pattern.
    """
    starts = starts.astype(jnp.int32)
    counts = counts.astype(jnp.int32)
    ends = starts + counts
    c0 = starts // chunk
    c1 = jnp.maximum((ends + chunk - 1) // chunk, c0 + 1)
    spt = c1 - c0
    off = jnp.cumsum(spt)                       # (ntiles,) end offsets
    nw = off[-1]
    w = jnp.arange(nw_max, dtype=jnp.int32)
    t = jnp.searchsorted(off, w, side="right").astype(jnp.int32)
    live = w < nw
    t = jnp.where(live, jnp.minimum(t, ntiles - 1), ntiles - 1)
    base = jnp.where(t > 0, off[jnp.maximum(t - 1, 0)], 0)
    k = w - base
    wk = jnp.where(live, k, -1)
    wabs = c0[t] + jnp.where(live, k, jnp.maximum(spt[ntiles - 1] - 1, 0))
    lo = jnp.clip(starts[t] - wabs * chunk, 0, chunk)
    hi = jnp.clip(ends[t] - wabs * chunk, 0, chunk)
    b0 = jnp.where(live, lo // CHUNK, 0)
    b1 = jnp.where(live, (hi + CHUNK - 1) // CHUNK, 0)
    return t, wk, wabs, b0, b1


def _raster_kernel_worklist(sc_ref, rows_ref, big_ref, depth_ref, tid_ref,
                            *, ntx: int, nw: int, chunk: int,
                            zlo_ref=None, zhi_ref=None):
    """Work-list streaming raster: grid (nw,) — ONE program per live
    window (scalar-prefetched tile/window ids) instead of (ty, tx, kmax).

    vs _raster_kernel_stream: no dead grid steps (the (ty, tx, kmax) grid
    paid kmax steps per tile while the median tile has 1-2 live windows —
    at TILE_H=16 that overhead swamped the 4x smaller per-candidate pixel
    work), and no kmax segment cap, so overflow is structurally zero.
    Only the window's LIVE sub-chunks [b0, b1) are tested (see
    _window_worklist) — an empty window costs just its carry.
    """
    p = pl.program_id(0)
    t = sc_ref[p]
    wk = sc_ref[nw + p]
    b0 = sc_ref[3 * nw + p]
    b1 = sc_ref[4 * nw + p]
    n_big = sc_ref[5 * nw]

    ti = t // ntx
    tj = t - ti * ntx
    oy = (ti * TILE_H).astype(jnp.float32)
    ox = (tj * TILE_W).astype(jnp.float32)
    iy = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    py = oy + iy.astype(jnp.float32) + 0.5
    px = ox + ix.astype(jnp.float32) + 0.5
    zlo = zlo_ref[...] if zlo_ref is not None else None
    zhi = zhi_ref[...] if zhi_ref is not None else None

    def test_sub(ref, base, carry):
        s = ref[pl.ds(base, CHUNK), :]
        zm, ids = _test_chunk(s, px, py, zlo, zhi)
        return _merge_chunk(carry, zm, ids)

    @pl.when(wk == 0)
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

    @pl.when((wk >= 0) & (b1 > b0))
    def _():
        best = jax.lax.fori_loop(
            b0, b1,
            lambda b, c: test_sub(rows_ref, b * CHUNK, c),
            (depth_ref[...], tid_ref[...]),
        )
        depth_ref[...] = best[0]
        tid_ref[...] = best[1]


@functools.partial(
    jax.jit, static_argnames=("tiles_y", "tiles_x", "chunk")
)
def rasterize_worklist(setup, screen_aabb, order, starts, counts, big_ids,
                       n_big, *, tiles_y: int, tiles_x: int, z_bounds=None,
                       chunk: int = 128, prebuilt=None):
    """Raster from bin_sorted's ragged bins with the work-list kernel.

    Like rasterize_stream but the grid enumerates actual windows, so there
    is no kmax cap (overflow is structurally 0) and no dead grid steps.
    Returns (depth, tid, overflow=0) for drop-in compatibility.
    """
    if prebuilt is not None:
        rows, big_rows = prebuilt
    else:
        rows, big_rows, _ = build_stream_rows(
            setup, screen_aabb, order, big_ids, attrs=None, chunk=chunk
        )
    ncols = rows.shape[1]
    bpad = big_rows.shape[0]
    ntiles = tiles_y * tiles_x
    # static bound: every tile needs >= 1 window; the remainder is bounded
    # by total rows / chunk (windows never overlap across tiles)
    nw_max = ntiles + rows.shape[0] // chunk
    wt, wk, wabs, b0, b1 = _window_worklist(
        starts, counts, ntiles, chunk, nw_max)
    sc = jnp.concatenate([wt, wk, wabs, b0, b1,
                          n_big.astype(jnp.int32)[None]])

    def rows_map(p, sc):
        return (sc[2 * nw_max + p], 0)

    def pix_map(p, sc):
        return (sc[p] // tiles_x, sc[p] % tiles_x)

    in_specs = [
        pl.BlockSpec((chunk, ncols), rows_map),
        pl.BlockSpec((bpad, ncols), lambda p, sc: (0, 0)),
    ]
    inputs = [sc, rows, big_rows]
    kernel = functools.partial(
        _raster_kernel_worklist, ntx=tiles_x, nw=nw_max, chunk=chunk
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
            return _raster_kernel_worklist(
                sc_ref, rows_ref, big_ref, depth_ref, tid_ref,
                ntx=tiles_x, nw=nw_max, chunk=chunk,
                zlo_ref=zlo_ref, zhi_ref=zhi_ref,
            )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nw_max,),
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
    return depth, tid, jnp.zeros((), jnp.int32)


CHUNK_MXU = 128  # candidates per MXU test — one full lane tile


MXU_STRIP = 8  # pixel rows per MXU strip: bounds the live (SPX, 128)
               # intermediates to SPX = 8*TILE_W pixels (VMEM, advisor r3)


def _test_chunk_mxu(s, pxy1, dxs, dys, ox, oy, zlo_c, zhi_c):
    """Edge/depth-test CHUNK_MXU candidates against one MXU_STRIP-row
    pixel strip with the three edge planes + z plane evaluated ON THE MXU.

    Orientation is (pixels, candidates): ``pxy1`` is the (SPX, 3) matrix
    of TILE-LOCAL pixel coordinates [dx, dy, 1] and each linear plane is
    one skinny dot_general against a (CM, 3) coefficient block — the
    multiplies the VPU paid per pixel per candidate (the bulk of the
    classic kernel) ride the systolic array instead, with the candidate
    axis on the 128-lane dimension at full width. The AABB clamp and the
    triangle id need no matmul: they are rank-1 (pixel term + candidate
    term), evaluated as VPU broadcast compares (advisor r3 — nine dots
    blew past the 16 MB VMEM bound; four fit).

    Tile-local coordinates bound |dx| <= TILE_W and the dots run at
    Precision.HIGHEST (f32-exact bf16 emulation — Mosaic supports only
    DEFAULT/HIGHEST), so plane values match the VPU path to f32 rounding
    against the 0.05 px watertightness tolerance; the per-candidate
    constant is re-centered as c_tile = a*ox + b*oy + c on the VPU
    ((CM,)-sized, negligible).
    """
    eps = -0.05

    def dotp(a, b, c):
        m = jnp.stack([a, b, c], axis=1)  # (CM, 3)
        return jax.lax.dot_general(
            pxy1, m, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (SPX, CM)

    def plane(j):
        a, b, c = s[:, 3 * j + 0], s[:, 3 * j + 1], s[:, 3 * j + 2]
        return dotp(a, b, c + a * ox + b * oy)

    e = jnp.minimum(jnp.minimum(plane(0), plane(1)), plane(2))
    z = plane(3)  # zplane lives at cols 9:12
    # AABB as rank-1 broadcast compares: (SPX, 1) pixel coordinate against
    # (1, CM) candidate bound, identical semantics to _test_chunk's clamp.
    axs = ox + dxs
    ays = oy + dys
    inside = (
        (axs >= s[:, 12][None, :] + eps) & (axs <= s[:, 13][None, :] - eps)
        & (ays >= s[:, 14][None, :] + eps) & (ays <= s[:, 15][None, :] - eps)
    )
    idp = jnp.broadcast_to(s[:, 16][None, :], e.shape)  # float ids (VPU)
    ok = (e >= eps) & inside & (idp >= 0.0) & (z > 0.0) & (z <= 1.0)
    if zlo_c is not None:
        ok &= (z > zlo_c) & (z < zhi_c)
    return jnp.where(ok, z, -1.0), idp


def _merge_chunk_mxu(carry, zm, idp):
    bz, bid = carry  # (SPX, 1) f32
    k_z = jnp.max(zm, axis=1, keepdims=True)
    k_id = jnp.max(jnp.where(zm == k_z, idp, -1.0), axis=1, keepdims=True)
    take = k_z > bz
    return jnp.where(take, k_z, bz), jnp.where(take, k_id, bid)


def _raster_kernel_stream_mxu(sc_ref, rows_ref, big_ref, depth_ref, tid_ref,
                              zb_ref, ib_ref, *, ntx: int, ntiles: int,
                              chunk: int, zlo_ref=None, zhi_ref=None):
    """MXU variant of _raster_kernel_stream: same grid/windows, candidates
    tested CHUNK_MXU at a time in the (pixels, candidates) orientation,
    pixels walked in MXU_STRIP-row strips to bound VMEM. The running
    winner lives in (SPX, 1)-per-strip scratch across the k grid steps;
    the (TILE_H, TILE_W) outputs are written once at the last step."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    k = pl.program_id(2)
    t = ti * ntx + tj
    spt = sc_ref[ntiles + t]
    n_big = sc_ref[2 * ntiles]

    SPX = MXU_STRIP * TILE_W
    ox = (tj * TILE_W).astype(jnp.float32)
    oy = (ti * TILE_H).astype(jnp.float32)
    r = jax.lax.broadcasted_iota(jnp.int32, (SPX, 3), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (SPX, 3), 1)
    dx0 = (r % TILE_W).astype(jnp.float32) + 0.5
    dy0 = (r // TILE_W).astype(jnp.float32) + 0.5

    nstrips = TILE_H // MXU_STRIP

    def strip_consts(st):
        dy = dy0 + jnp.float32(st * MXU_STRIP)
        pxy1 = jnp.where(c == 0, dx0, jnp.where(c == 1, dy, 1.0))
        dxs = dx0[:, :1]          # (SPX, 1) tile-local pixel x
        dys = dy[:, :1]           # (SPX, 1) tile-local pixel y
        return pxy1, dxs, dys

    if zlo_ref is not None:
        zlo_full = zlo_ref[...]
        zhi_full = zhi_ref[...]

    def strip_bounds(st):
        if zlo_ref is None:
            return None, None
        sl = slice(st * MXU_STRIP, (st + 1) * MXU_STRIP)
        return (zlo_full[sl, :].reshape(SPX, 1),
                zhi_full[sl, :].reshape(SPX, 1))

    def test_sub(ref, base, carry, consts, zb):
        s = ref[pl.ds(base, CHUNK_MXU), :]
        pxy1, dxs, dys = consts
        zm, idp = _test_chunk_mxu(s, pxy1, dxs, dys, ox, oy, *zb)
        return _merge_chunk_mxu(carry, zm, idp)

    @pl.when(k == 0)
    def _():
        nb = (n_big + (CHUNK_MXU - 1)) // CHUNK_MXU
        for st in range(nstrips):
            consts = strip_consts(st)
            zb = strip_bounds(st)
            best = (
                jnp.zeros((SPX, 1), jnp.float32),
                jnp.full((SPX, 1), -1.0, jnp.float32),
            )
            best = jax.lax.fori_loop(
                0, nb,
                lambda b, cr: test_sub(big_ref, b * CHUNK_MXU, cr, consts, zb),
                best,
            )
            sl = pl.ds(st * SPX, SPX)
            zb_ref[sl, :] = best[0]
            ib_ref[sl, :] = best[1]

    @pl.when((k == 0) | (k < spt))
    def _():
        for st in range(nstrips):
            consts = strip_consts(st)
            zb = strip_bounds(st)
            sl = pl.ds(st * SPX, SPX)
            best = jax.lax.fori_loop(
                0, chunk // CHUNK_MXU,
                lambda b, cr: test_sub(rows_ref, b * CHUNK_MXU, cr,
                                       consts, zb),
                (zb_ref[sl, :], ib_ref[sl, :]),
            )
            zb_ref[sl, :] = best[0]
            ib_ref[sl, :] = best[1]

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        depth_ref[...] = zb_ref[...].reshape(TILE_H, TILE_W)
        tid_ref[...] = (
            # round before the int cast: the merge routes ids through f32
            # compares — guard the exact-integer assumption (advisor r3)
            (ib_ref[...] + jnp.where(ib_ref[...] >= 0.0, 0.5, -0.5))
            .reshape(TILE_H, TILE_W).astype(jnp.int32)
        )


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
    r_rows = setup.zplane.shape[0]
    idcol = jnp.arange(r_rows, dtype=jnp.float32)[:, None]
    table = jnp.concatenate(
        [setup.edge.reshape(-1, 9), setup.zplane, ab, idcol], axis=1
    )  # (R, 17) — id baked in; dead slots hit the sentinel row below
    table = jnp.concatenate(
        [table, jnp.zeros((1, 17), jnp.float32).at[0, 16].set(-1.0)]
    )

    def packed_rows(idx, pad_to):
        idx = jnp.concatenate(
            [idx, jnp.full((pad_to - idx.shape[0],), -1, idx.dtype)]
        ) if pad_to > idx.shape[0] else idx
        return table[jnp.where(idx >= 0, idx, r_rows)]

    n = order.shape[0]
    rows = packed_rows(order, common.round_up(n, dchunk) + dchunk)
    bpad = max(common.round_up(big_ids.shape[0], CHUNK), CHUNK)
    big_rows = packed_rows(big_ids, bpad)

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


# --------------------------------------------------------------------------
# Fused visibility resolve: per-pixel attribute expansion WITHOUT the
# (H*W)-row random gather.
#
# Reference counterpart: the fixed-function vertex-attribute interpolation
# feeding the forward pass (Runtime/FrameGraph/RenderSceneNode.cpp:109-380,
# Content/Shaders/Standard.shader `Vertex` block) — re-architected for the
# TPU visibility buffer rather than ported.
#
# resolve_gbuffer's packed[tid] gather is latency-bound at ~14 ms for a
# 1080p frame (cost = row count, not width). But each pixel's winner row
# lives in its own tile's bin_sorted segment — the SAME chunk-aligned
# windows the streaming raster DMAs sequentially. This kernel re-streams
# those windows and expands each pixel's winner row with an exact
# (attrs^T @ onehot) matmul per chunk: onehot = (row id == tid[pixel]) &
# (global row index inside the tile's true [start, end) segment — the
# range mask kills duplicate entries of the same triangle carried in from
# adjacent tiles' segments sharing a boundary chunk; bin_sorted dedups
# corner keys so a tile's own segment lists a triangle at most once).
# The Möller-Trumbore barycentric solve + attribute interpolation then run
# in a (channels, pixels) row layout so every elementwise op is wide.
# precision=HIGHEST keeps the f32 attribute bits exact through the MXU.
# --------------------------------------------------------------------------

#: attr-table column groups (see interpolate.pack_triangle_attributes)
_A_BASE = 37
_A_MAT = 49


def build_stream_rows(setup, screen_aabb, order, big_ids, attrs=None,
                      chunk: int = 256):
    """ONE (row-count-bound) gather shared by the raster and the resolve:
    cols 0:17 = edge/zplane/aabb/id (raster), 17: = packed attributes.

    Returns (rows, big_rows, n_attr_cols)."""
    ab = jnp.stack(screen_aabb, axis=1)
    r_rows = setup.zplane.shape[0]
    # The id column IS the table row index (order entries index this
    # table), so it can be baked in BEFORE the order gather; dead slots
    # (idx < 0, incl. padding) redirect to ONE sentinel row appended at
    # index R (zeros, id -1). This makes packing a single fused gather —
    # the previous post-gather id write (dynamic-update-slice over the
    # ~86 MB row table) and live/dead select were ~1.5 ms/frame at 1080p.
    idcol = jnp.arange(r_rows, dtype=jnp.float32)[:, None]
    cols = [setup.edge.reshape(-1, 9), setup.zplane, ab, idcol]
    if attrs is not None:
        cols.append(attrs)
    table = jnp.concatenate(cols, axis=1)  # (R, 17 + A)
    na = 0 if attrs is None else attrs.shape[1]
    tot = 17 + na
    dead_row = jnp.zeros((1, tot), jnp.float32).at[0, 16].set(-1.0)
    table = jnp.concatenate([table, dead_row])

    def packed_rows(idx, pad_to):
        idx = jnp.concatenate(
            [idx, jnp.full((pad_to - idx.shape[0],), -1, idx.dtype)]
        ) if pad_to > idx.shape[0] else idx
        return table[jnp.where(idx >= 0, idx, r_rows)]

    n = order.shape[0]
    rows = packed_rows(order, common.round_up(n, chunk) + chunk)
    bpad = max(common.round_up(big_ids.shape[0], CHUNK), CHUNK)
    big_rows = packed_rows(big_ids, bpad)
    return rows, big_rows, na


_RESOLVE_PRECISION = _os.environ.get("SAILOR_RESOLVE_PRECISION", "split")


# attr-column slices the depth-peel alpha test needs: v0/e1/e2 (Moller-
# Trumbore), uv0/duv1/duv2, the vertex-color ALPHA lanes of c0/dc1/dc2,
# material id, alpha cutoff — 20 of the 49 attr cols. MACing only these
# cuts the peel resolve's accumulate ~2.8x (the 5-plane emit alone kept
# paying the full-width MAC). Compact acc layout (the "alpha" emit):
# [0:9 geo | 9:15 uv interleaved | 15:18 alpha | 18 mat | 19 cutoff].
_ALPHA_COLS = ((0, 9), (18, 24), (27, 28), (31, 32), (35, 37), (48, 49))
_ALPHA_NA = sum(b - a for a, b in _ALPHA_COLS)  # 20


def _resolve_accumulate(acc_ref, rows, rowg0, tid_row, start, end,
                        use_range: bool, na: int, cols=None):
    """Accumulate rows whose id wins its pixel into acc scratch — the
    one-hot MXU selection shared by the grid-k and work-list kernels.

    Precision: the one-hot operand is EXACT in bf16, so a manual hi+lo
    bf16 split of the attrs (two native-rate MXU passes; Mosaic lowers
    only DEFAULT/HIGHEST) reconstructs the selected attr to 16 mantissa
    bits — relative error <= 2^-17, far below the u8 texture
    quantization the pipeline already accepts, at a third of HIGHEST's
    six passes. Override with SAILOR_RESOLVE_PRECISION=highest for
    exact-f32 A/Bs."""
    if cols is not None:
        s_attr = jnp.concatenate(
            [rows[:, 17 + a:17 + b] for a, b in cols], axis=1)
    else:
        s_attr = rows[:, 17:17 + na]              # (C, A)
    ids = rows[:, 16:17]                          # (C, 1) float ids
    match = (ids == tid_row) & (ids >= 0.0)       # (C, npix)
    if use_range:
        riota = jax.lax.broadcasted_iota(
            jnp.int32, (rows.shape[0], 1), 0
        ) + rowg0
        match &= (riota >= start) & (riota < end)
    dims = (((1,), (0,)), ((), ()))
    if _RESOLVE_PRECISION == "split":
        # 3-term bf16 decomposition: a = hi + mid + lo captures >= 24
        # mantissa bits, and the one-hot operand is EXACT in bf16, so
        # three native-rate MXU passes reproduce the HIGHEST (6-pass)
        # result to f32 roundoff — a 2-term split was NOT enough: its
        # 2^-17 error shifted clipped barycentrics / tangent signs on
        # single edge pixels (observed on CPU parity tests).
        ob = match.astype(jnp.bfloat16)
        hi = s_attr.astype(jnp.bfloat16)
        r1 = s_attr - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        contrib = sum(
            jax.lax.dot_general(
                part.T, ob, dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            )
            for part in (hi, mid, lo)
        )                                          # (A, npix)
    else:
        onehot = match.astype(jnp.float32)
        contrib = jax.lax.dot_general(
            s_attr.T, onehot, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                          # (A, npix)
    acc_ref[...] += contrib


def _resolve_kernel(sc_ref, rows_ref, big_ref, tid_ref, par_ref, *refs,
                    ntx: int, ntiles: int, chunk: int, kmax: int,
                    na: int, npix: int):
    """Grid (ty, tx, k). Accumulate winner rows into acc scratch (k loop),
    interpolate + write planes at the last step."""
    outs = list(refs[:-1])
    acc_ref = refs[-1]
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    k = pl.program_id(2)
    t = ti * ntx + tj
    c0 = sc_ref[t]
    spt = sc_ref[ntiles + t]
    start = sc_ref[2 * ntiles + t]
    end = sc_ref[3 * ntiles + t]

    tid_row = tid_ref[...].reshape(1, npix).astype(jnp.float32)

    def accumulate(rows, rowg0, use_range):
        _resolve_accumulate(acc_ref, rows, rowg0, tid_row, start, end,
                            use_range, na)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        accumulate(big_ref[...], 0, use_range=False)

    @pl.when((k == 0) | (k < spt))
    def _():
        accumulate(rows_ref[...], (c0 + k) * chunk, use_range=True)

    @pl.when(k == kmax - 1)
    def _():
        _resolve_emit(outs, acc_ref, par_ref, ti, tj, na=na, npix=npix)


def _resolve_emit(outs, acc_ref, par_ref, ti, tj, *, na: int, npix: int,
                  mode: str = "full"):
    """Interpolate the accumulated winner rows and write all planes —
    the final step shared by the grid-k and work-list resolve kernels.

    ``mode="alpha"``: reads the SAME full attr rows but emits only the
    5 planes the masked depth-peel alpha test needs (uv, vertex alpha,
    material, cutoff). The full resolve writes 29 full-frame planes —
    a ~5.6 ms output-DMA floor per call at 1080p — and the peel calls
    it once PER LAYER just to alpha-test, so the 5-plane emit cuts the
    peel's per-layer resolve cost ~4x with zero extra row tables."""
    if True:
        a = acc_ref[...]

        def row(i):
            return a[i:i + 1, :]                       # (1, npix)

        def rows3(i):
            return row(i), row(i + 1), row(i + 2)

        par = par_ref[...]

        def p(i):
            return par[i // 128, i % 128]

        # pixel coords -> world rays (interpolate._unproject_rays math)
        oy = (ti * TILE_H).astype(jnp.float32)
        ox = (tj * TILE_W).astype(jnp.float32)
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, npix), 1)
        pxr = ox + (idx % TILE_W).astype(jnp.float32) + 0.5
        pyr = oy + (idx // TILE_W).astype(jnp.float32) + 0.5
        # params: [0:16] inv_vp row-major, [16:19] camera, [19] 1/width,
        # [20] 1/full_height, [21] row0
        ndc_x = pxr * p(19) * 2.0 - 1.0
        ndc_y = 1.0 - (pyr + p(21)) * p(20) * 2.0

        def mv(r):
            return ((p(4 * r + 0) * ndc_x + p(4 * r + 1) * ndc_y)
                    + (p(4 * r + 2) * 0.5 + p(4 * r + 3)))

        pw = mv(3)
        inv_w = 1.0 / pw
        cx, cy, cz = p(16), p(17), p(18)
        dx = mv(0) * inv_w - cx
        dy = mv(1) * inv_w - cy
        dz = mv(2) * inv_w - cz

        v0x, v0y, v0z = rows3(0)
        e1x, e1y, e1z = rows3(3)
        e2x, e2y, e2z = rows3(6)

        # Möller-Trumbore u, v (raster already decided coverage)
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tvx = cx - v0x
        tvy = cy - v0y
        tvz = cz - v0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        u = jnp.clip(u, 0.0, 1.0)
        v = jnp.clip(v, 0.0, 1.0 - u)

        def lerp3(b0, b1, b2):
            return row(b0) + row(b1) * u + row(b2) * v

        def w(i, val):
            outs[i][...] = val.reshape(TILE_H, TILE_W)

        if mode == "alpha":
            # compact acc layout from _ALPHA_COLS (geo rows 0:9 feed the
            # shared Moller-Trumbore above)
            w(0, lerp3(9, 11, 13))    # uv.x
            w(1, lerp3(10, 12, 14))   # uv.y
            w(2, lerp3(15, 16, 17))   # vertex-color alpha
            w(3, row(18))             # material id (f32)
            w(4, row(19))             # alpha cutoff (Masked)
            return

        w(0, v0x + e1x * u + e2x * v)
        w(1, v0y + e1y * u + e2y * v)
        w(2, v0z + e1z * u + e2z * v)
        for c in range(3):   # normal
            w(3 + c, lerp3(9 + c, 12 + c, 15 + c))
        for c in range(2):   # uv
            w(6 + c, lerp3(18 + c, 20 + c, 22 + c))
        for c in range(4):   # vertex color
            w(8 + c, lerp3(24 + c, 28 + c, 32 + c))
        w(12, row(36))       # material id (f32)
        if na >= _A_MAT:
            for c in range(3):
                w(13 + c, row(37 + c))          # albedo
            w(16, row(40))                      # metallic
            w(17, row(41))                      # roughness
            for c in range(3):
                w(18 + c, row(42 + c))          # emissive
            w(21, row(45))                      # albedo layer
            w(22, row(46))                      # normal layer
            # tangent-frame seeds for normal mapping (done in XLA):
            # t_raw = e1 * duv2.y - e2 * duv1.y, plus the uv determinant
            duv1y = row(21)
            duv2y = row(23)
            w(23, e1x * duv2y - e2x * duv1y)
            w(24, e1y * duv2y - e2y * duv1y)
            w(25, e1z * duv2y - e2z * duv1y)
            w(26, row(20) * row(23) - row(22) * row(21))  # duv determinant
            w(27, row(48))                      # alpha cutoff (Masked)
            w(28, row(47))                      # opacity (Transparent)


def _resolve_kernel_worklist(sc_ref, rows_ref, big_ref, tid_ref, par_ref,
                             *refs, ntx: int, ntiles: int, nw: int,
                             chunk: int, na: int, npix: int,
                             mode: str = "full"):
    """Work-list resolve: grid (nw,) — one program per live window (see
    _raster_kernel_worklist); emits planes at each tile's LAST window."""
    outs = list(refs[:-1])
    acc_ref = refs[-1]
    p = pl.program_id(0)
    t = sc_ref[p]
    wk = sc_ref[nw + p]
    wabs = sc_ref[2 * nw + p]
    wlast = sc_ref[3 * nw + p]
    start = sc_ref[4 * nw + t]
    end = sc_ref[4 * nw + ntiles + t]
    ti = t // ntx
    tj = t - ti * ntx

    tid_row = tid_ref[...].reshape(1, npix).astype(jnp.float32)
    cols = _ALPHA_COLS if mode == "alpha" else None

    @pl.when(wk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        _resolve_accumulate(acc_ref, big_ref[...], 0, tid_row, start, end,
                            use_range=False, na=na, cols=cols)

    # skip the window MAC when no row of this window lies in the tile's
    # own [start, end) segment — such rows can't match any winner (the
    # one-hot would be all-zero); sparse queues are mostly empty windows
    live = (jnp.minimum(end, wabs * chunk + chunk)
            > jnp.maximum(start, wabs * chunk))

    @pl.when((wk >= 0) & live)
    def _():
        _resolve_accumulate(acc_ref, rows_ref[...], wabs * chunk, tid_row,
                            start, end, use_range=True, na=na, cols=cols)

    @pl.when(wlast == 1)
    def _():
        _resolve_emit(outs, acc_ref, par_ref, ti, tj, na=na, npix=npix,
                      mode=mode)


@functools.partial(
    jax.jit,
    static_argnames=("tiles_y", "tiles_x", "chunk", "na", "mode"),
)
def resolve_worklist(rows, big_rows, tid, starts, counts, n_big,
                     inv_vp, camera_position, *, tiles_y: int, tiles_x: int,
                     na: int, width: int, full_height: int, row0=0,
                     chunk: int = 128, mode: str = "full"):
    """resolve_stream over the work-list grid: no kmax cap, no dead grid
    steps. Returns the same plane dict (see _resolve_kernel write order)."""
    ntiles = tiles_y * tiles_x
    npix = TILE_H * TILE_W
    starts = starts.astype(jnp.int32)
    counts = counts.astype(jnp.int32)
    nw_max = ntiles + rows.shape[0] // chunk
    wt, wk, wabs, _b0, _b1 = _window_worklist(
        starts, counts, ntiles, chunk, nw_max)
    # last-window flag: next entry belongs to a different tile (or is the
    # final live entry). Dead tail entries carry wk=-1 so they never match.
    nxt = jnp.concatenate([wt[1:], jnp.full((1,), -1, jnp.int32)])
    nxt_wk = jnp.concatenate([wk[1:], jnp.full((1,), -1, jnp.int32)])
    wlast = ((wk >= 0) & ((nxt != wt) | (nxt_wk < 0))).astype(jnp.int32)
    sc = jnp.concatenate([wt, wk, wabs, wlast, starts, starts + counts])

    par = jnp.zeros((8, 128), jnp.float32)
    par = par.at[0, 0:16].set(jnp.asarray(inv_vp, jnp.float32).reshape(16))
    par = par.at[0, 16:19].set(jnp.asarray(camera_position, jnp.float32))
    par = par.at[0, 19].set(1.0 / width)
    par = par.at[0, 20].set(1.0 / full_height)
    par = par.at[0, 21].set(jnp.asarray(row0, jnp.float32))

    def rows_map(p, sc):
        return (sc[2 * nw_max + p], 0)

    def pix_map(p, sc):
        return (sc[p] // tiles_x, sc[p] % tiles_x)

    n_out = 5 if mode == "alpha" else (29 if na >= _A_MAT else 13)
    apad = common.round_up(na, 8)
    if rows.shape[1] < 17 + apad:
        rows = jnp.pad(rows, ((0, 0), (0, 17 + apad - rows.shape[1])))
        big_rows = jnp.pad(
            big_rows, ((0, 0), (0, 17 + apad - big_rows.shape[1]))
        )

    H, W = tiles_y * TILE_H, tiles_x * TILE_W
    if tid.shape != (H, W):
        tid = jnp.pad(tid, ((0, H - tid.shape[0]), (0, W - tid.shape[1])),
                      constant_values=-1)

    kernel = functools.partial(
        _resolve_kernel_worklist, ntx=tiles_x, ntiles=ntiles, nw=nw_max,
        chunk=chunk, na=apad, npix=npix, mode=mode,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nw_max,),
        in_specs=[
            pl.BlockSpec((chunk, 17 + apad), rows_map),
            pl.BlockSpec((big_rows.shape[0], 17 + apad),
                         lambda p, sc: (0, 0)),
            pl.BlockSpec((TILE_H, TILE_W), pix_map),
            pl.BlockSpec((8, 128), lambda p, sc: (0, 0)),
        ],
        out_specs=tuple(
            pl.BlockSpec((TILE_H, TILE_W), pix_map) for _ in range(n_out)
        ),
        scratch_shapes=[pltpu.VMEM(
            (_ALPHA_NA if mode == "alpha" else apad, npix), jnp.float32)],
    )
    outs = common.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((H, W), jnp.float32) for _ in range(n_out)
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(sc, rows, big_rows, tid, par)
    return outs


@functools.partial(
    jax.jit,
    static_argnames=("tiles_y", "tiles_x", "chunk", "kmax", "na"),
)
def resolve_stream(rows, big_rows, tid, starts, counts, n_big,
                   inv_vp, camera_position, *, tiles_y: int, tiles_x: int,
                   na: int, width: int, full_height: int, row0=0,
                   chunk: int = 256, kmax: int = 16):
    """Expand each pixel's winning triangle row and interpolate — returns
    a dict of (H, W) planes (see _resolve_kernel write order)."""
    ntiles = tiles_y * tiles_x
    npix = TILE_H * TILE_W
    starts = starts.astype(jnp.int32)
    counts = counts.astype(jnp.int32)
    ends = starts + counts
    c0 = starts // chunk
    c1 = jnp.maximum((ends + chunk - 1) // chunk, c0 + 1)
    spt = jnp.minimum(c1 - c0, kmax)
    sc = jnp.concatenate([c0, spt, starts, ends])

    par = jnp.zeros((8, 128), jnp.float32)
    par = par.at[0, 0:16].set(jnp.asarray(inv_vp, jnp.float32).reshape(16))
    par = par.at[0, 16:19].set(jnp.asarray(camera_position, jnp.float32))
    par = par.at[0, 19].set(1.0 / width)
    par = par.at[0, 20].set(1.0 / full_height)
    par = par.at[0, 21].set(jnp.asarray(row0, jnp.float32))

    def rows_map(i, j, k, sc):
        t = i * tiles_x + j
        return (sc[t] + jnp.minimum(k, jnp.maximum(sc[ntiles + t] - 1, 0)), 0)

    def pix_map(i, j, k, sc):
        return (i, j)

    n_out = 29 if na >= _A_MAT else 13
    apad = common.round_up(na, 8)
    if rows.shape[1] < 17 + apad:
        rows = jnp.pad(rows, ((0, 0), (0, 17 + apad - rows.shape[1])))
        big_rows = jnp.pad(
            big_rows, ((0, 0), (0, 17 + apad - big_rows.shape[1]))
        )

    H, W = tiles_y * TILE_H, tiles_x * TILE_W
    if tid.shape != (H, W):
        tid = jnp.pad(tid, ((0, H - tid.shape[0]), (0, W - tid.shape[1])),
                      constant_values=-1)

    kernel = functools.partial(
        _resolve_kernel, ntx=tiles_x, ntiles=ntiles, chunk=chunk,
        kmax=kmax, na=apad, npix=npix,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles_y, tiles_x, kmax),
        in_specs=[
            pl.BlockSpec((chunk, 17 + apad), rows_map),
            pl.BlockSpec((big_rows.shape[0], 17 + apad),
                         lambda i, j, k, sc: (0, 0)),
            pl.BlockSpec((TILE_H, TILE_W), pix_map),
            pl.BlockSpec((8, 128), lambda i, j, k, sc: (0, 0)),
        ],
        out_specs=tuple(
            pl.BlockSpec((TILE_H, TILE_W), pix_map) for _ in range(n_out)
        ),
        scratch_shapes=[pltpu.VMEM((apad, npix), jnp.float32)],
    )
    outs = common.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((H, W), jnp.float32) for _ in range(n_out)
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(sc, rows, big_rows, tid, par)
    return outs
