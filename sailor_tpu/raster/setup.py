"""Vertex transform, triangle setup, and tile binning.

TPU-native replacement for the vertex-shader + primitive-assembly +
binning work the reference's GPU does implicitly in its draw calls
(RenderSceneNode.cpp / DepthPrepassNode.cpp record DrawIndexedIndirect;
the hardware rasterizer bins). Everything here is dense, static-shape
jnp — one batched matmul for all vertices, broadcasted interval tests +
cumsum + searchsorted for binning (no sort, no scatter).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from sailor_tpu.core import math3d as m3


@struct.dataclass
class Geometry:
    """World-space scene geometry, SoA, merged over meshes/instances."""

    position: jnp.ndarray     # (V, 3) world space
    normal: jnp.ndarray       # (V, 3) world space
    uv: jnp.ndarray           # (V, 2)
    color: jnp.ndarray        # (V, 4)
    indices: jnp.ndarray      # (T, 3) int32
    material_id: jnp.ndarray  # (T,) int32


@struct.dataclass
class TriangleSetup:
    """Per-triangle screen-space rasterization data.

    Raster triangles are the *near-clipped* set: 2 slots per source
    triangle; ``src_id`` maps back to Geometry.indices rows for attribute
    interpolation (world-space ray barycentrics, see raster/interpolate.py).
    """

    edge: jnp.ndarray    # (2T, 3, 3) edge coeffs: E_j = A x + B y + C; inside => all >= 0
    zplane: jnp.ndarray  # (2T, 3) reverse-Z depth plane: z = A x + B y + C
    valid: jnp.ndarray   # (2T,) live (on-screen, front-facing) triangles
    src_id: jnp.ndarray  # (2T,) source triangle index
    zmax: jnp.ndarray    # (2T,) EXACT max vertex reverse-Z — z is affine
                         # in screen space, so the triangle max is at a
                         # vertex; HiZ culling needs this (plane-over-AABB
                         # extrapolation was too loose in the far field,
                         # where reverse-Z margins are ~1e-3)


def transform_vertices(positions, normals, model, view_projection):
    """World + clip transform for one instance batch.

    ``positions``: (V, 3); ``model``: (4, 4) or (I, 4, 4) for instancing
    (reference PerInstanceData.model, Standard.shader vertex main).
    Returns (world_pos, world_normal, clip) with leading instance dim if
    model is batched.
    """
    wp = m3.transform_point(model[..., None, :, :] if model.ndim == 3 else model,
                            positions)
    wn = m3.transform_vector(model[..., None, :, :] if model.ndim == 3 else model,
                             normals)
    clip = m3.transform_point_h(view_projection, wp)
    return wp, wn, clip


def _edge_coeffs(xa, ya, xb, yb):
    """Coefficients of E(x,y) = (x-xa)(yb-ya) - (y-ya)(xb-xa)."""
    a = yb - ya
    b = -(xb - xa)
    c = -(xa * a + ya * b)
    return a, b, c


_EPS_W = 1e-4  # near-plane clip epsilon in clip-space w


def _near_clip(clip_tri):
    """Clip (T, 3, 4) clip-space triangles against w > _EPS_W.

    Static-shape clipper: every input triangle yields exactly two output
    slots (T, 2, 3, 4) + a validity mask (T, 2). Cases by inside count:
    3 -> (tri, invalid); 2 -> two clipped tris; 1 -> (clipped tri,
    invalid); 0 -> both invalid. Vertex order is rotated canonically so
    winding is preserved.
    """
    w = clip_tri[..., 3]  # (T, 3)
    inside = w > _EPS_W
    n_in = inside.sum(axis=-1)  # (T,)

    idx_out = jnp.argmax(~inside, axis=-1)  # first outside vertex
    idx_in = jnp.argmax(inside, axis=-1)    # first inside vertex
    rot = jnp.where(n_in == 2, (idx_out + 1) % 3, jnp.where(n_in == 1, idx_in, 0))
    # rot has only 3 values: rotate by static roll + 3-way select instead
    # of take_along_axis (the (T, 3, 4) gather measured ~1.5 ms at 1080p;
    # the dense selects are noise)
    r1 = jnp.concatenate([clip_tri[:, 1:], clip_tri[:, :1]], axis=1)
    r2 = jnp.concatenate([clip_tri[:, 2:], clip_tri[:, :2]], axis=1)
    rc = rot[:, None, None]
    v = jnp.where(rc == 0, clip_tri, jnp.where(rc == 1, r1, r2))  # rotated
    a, b, c = v[:, 0], v[:, 1], v[:, 2]
    wa, wb, wc = a[..., 3], b[..., 3], c[..., 3]

    def lerp_to_plane(p, q, wp, wq):
        t = (_EPS_W - wp) / jnp.where(jnp.abs(wq - wp) > 1e-12, wq - wp, 1e-12)
        t = jnp.clip(t, 0.0, 1.0)[..., None]
        return p + (q - p) * t

    ab = lerp_to_plane(a, b, wa, wb)
    ac = lerp_to_plane(a, c, wa, wc)
    bc = lerp_to_plane(b, c, wb, wc)

    # case 2 (a, b inside; c out): T1=(a, b, bc), T2=(a, bc, ac)
    # case 1 (a inside; b, c out): T1=(a, ab, ac), T2 invalid
    # case 3: T1=(a, b, c), T2 invalid
    case2 = (n_in == 2)[:, None, None]
    case1 = (n_in == 1)[:, None, None]
    t1 = jnp.where(case2, jnp.stack([a, b, bc], axis=1),
                   jnp.where(case1, jnp.stack([a, ab, ac], axis=1),
                             jnp.stack([a, b, c], axis=1)))
    t2 = jnp.stack([a, bc, ac], axis=1)
    out = jnp.stack([t1, t2], axis=1)  # (T, 2, 3, 4)
    valid = jnp.stack([n_in >= 1, n_in == 2], axis=1)  # (T, 2)
    return out, valid


@functools.partial(jax.jit, static_argnames=("width", "height", "cull",
                                             "clip"))
def triangle_setup(
    geometry: Geometry,
    view_projection,
    *,
    width: int,
    height: int,
    cull: str = "back",
    clip: bool = True,
):
    """Project triangles to screen space and build raster coefficients.

    Convention: pixel (0,0) top-left, sample points at pixel centers
    (x+0.5, y+0.5); NDC y up -> screen y flipped; reverse-Z depth in [0,1]
    (bigger = closer). Triangles crossing the near plane are clipped into
    up to two sub-triangles (static 2x slot allocation); the returned
    ``src_id`` maps each raster triangle back to its source triangle for
    attribute interpolation.
    """
    clip_pos = m3.transform_point_h(view_projection, geometry.position)  # (V, 4)
    tri = geometry.indices  # (T, 3)
    clip_tri = clip_pos[tri]    # (T, 3, 4)
    if clip:
        clipped, clip_valid = _near_clip(clip_tri)  # (T, 2, 3, 4), (T, 2)
        t2 = clipped.reshape(-1, 3, 4)              # (2T, 3, 4)
        src_id = jnp.repeat(jnp.arange(tri.shape[0], dtype=jnp.int32), 2)
        tw_ok = clip_valid.reshape(-1)
    else:
        # Orthographic projections (shadow cascades) have w == 1 for every
        # vertex — skip the near clipper entirely: T slots instead of 2T
        # and none of the rotate/lerp work (it was ~1/3 of ShadowPrepass).
        t2 = clip_tri
        src_id = jnp.arange(tri.shape[0], dtype=jnp.int32)
        tw_ok = jnp.all(clip_tri[..., 3] > _EPS_W, axis=-1)

    w = t2[..., 3]
    inv_w = jnp.where(w > 1e-12, 1.0 / w, 0.0)
    ndc = t2[..., :3] * inv_w[..., None]
    tx = (ndc[..., 0] * 0.5 + 0.5) * width   # (2T, 3)
    ty = (0.5 - ndc[..., 1] * 0.5) * height
    tz = ndc[..., 2]

    # Signed area (positive = CCW in y-down screen space after our flip).
    area2 = (tx[:, 1] - tx[:, 0]) * (ty[:, 2] - ty[:, 0]) - (
        ty[:, 1] - ty[:, 0]
    ) * (tx[:, 2] - tx[:, 0])
    # GLTF front faces are CCW in y-up NDC; with the screen y-flip the
    # area formula above yields area2 < 0 for them.
    if cull == "back":
        facing = area2 < 0.0
    elif cull == "front":
        facing = area2 > 0.0
    else:  # "none": accept both orientations
        facing = jnp.abs(area2) > 0.0
    # Orient all edge functions so inside => E >= 0 regardless of winding.
    orient = jnp.where(area2 < 0.0, 1.0, -1.0)

    def edges_for(i, j):
        # Canonicalize endpoint order (lexicographic) so the SAME edge
        # shared by two adjacent triangles produces bit-identical E values
        # in both — otherwise fp rounding can make E slightly negative for
        # both triangles and pixels on the shared edge drop out (visible
        # as dotted seams). The swap flips E's sign, compensated here.
        xa, ya, xb, yb = tx[:, i], ty[:, i], tx[:, j], ty[:, j]
        swap = (xa > xb) | ((xa == xb) & (ya > yb))
        x0 = jnp.where(swap, xb, xa)
        y0 = jnp.where(swap, yb, ya)
        x1 = jnp.where(swap, xa, xb)
        y1 = jnp.where(swap, ya, yb)
        a, b, c = _edge_coeffs(x0, y0, x1, y1)
        s = jnp.where(swap, -1.0, 1.0)
        return jnp.stack([a * s, b * s, c * s], axis=-1)

    # Edge k is opposite vertex k (edge from v_{k+1} to v_{k+2}).
    e0 = edges_for(1, 2)
    e1 = edges_for(2, 0)
    e2 = edges_for(0, 1)
    edge = jnp.stack([e0, e1, e2], axis=1) * orient[:, None, None]  # (T,3,3)
    # Normalize each edge function to signed PIXEL distance so the raster
    # kernel can apply a uniform sub-pixel tolerance (watertightness: clipped
    # sub-triangles cannot share bit-identical edges, so exact >= 0 tests
    # leave dotted seams; a -1/20 px conservative test closes them with at
    # most 0.05 px of double coverage, resolved by the depth test).
    escale = jax.lax.rsqrt(
        edge[..., 0] ** 2 + edge[..., 1] ** 2 + 1e-20
    )
    edge = edge * escale[..., None]

    # Reverse-Z depth plane via Cramer's rule on [[x0,y0,1]...][A,B,C]^T=z.
    x0, x1, x2 = tx[:, 0], tx[:, 1], tx[:, 2]
    y0, y1, y2 = ty[:, 0], ty[:, 1], ty[:, 2]
    det = x0 * (y1 - y2) - y0 * (x1 - x2) + (x1 * y2 - x2 * y1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    z0, z1, z2 = tz[:, 0], tz[:, 1], tz[:, 2]
    za = (z0 * (y1 - y2) + z1 * (y2 - y0) + z2 * (y0 - y1)) * inv_det
    zb = (z0 * (x2 - x1) + z1 * (x0 - x2) + z2 * (x1 - x0)) * inv_det
    zc = (
        z0 * (x1 * y2 - x2 * y1)
        + z1 * (x2 * y0 - x0 * y2)
        + z2 * (x0 * y1 - x1 * y0)
    ) * inv_det
    zplane = jnp.stack([za, zb, zc], axis=-1)

    # Screen AABB, clamped; off-screen triangles invalidated.
    xmin = jnp.min(tx, axis=-1)
    xmax = jnp.max(tx, axis=-1)
    ymin = jnp.min(ty, axis=-1)
    ymax = jnp.max(ty, axis=-1)
    on_screen = (xmax >= 0) & (xmin < width) & (ymax >= 0) & (ymin < height)
    degenerate = jnp.abs(area2) < 1e-10
    valid = tw_ok & facing & on_screen & ~degenerate

    return TriangleSetup(
        edge=edge,
        zplane=zplane,
        valid=valid,
        src_id=src_id,
        zmax=jnp.clip(jnp.max(tz, axis=-1), 0.0, 1.0),
    ), (xmin, xmax, ymin, ymax)


def shift_viewport_rows(tri: "TriangleSetup", row0):
    """Re-express a TriangleSetup in the local coordinates of a viewport
    slice starting at global row ``row0``: with y_global = y_local + row0,
    E_local(x, y') = E_global(x, y' + row0), so only the constant terms
    change (C += B * row0) — per-shard viewports are free (multi-chip
    screen sharding, parallel/mesh.py)."""
    off = jnp.asarray(row0, jnp.float32)
    edge = tri.edge.at[..., 2].add(tri.edge[..., 1] * off)
    zplane = tri.zplane.at[..., 2].add(tri.zplane[..., 1] * off)
    return tri.replace(edge=edge, zplane=zplane)


@functools.partial(
    jax.jit,
    static_argnames=(
        "tiles_x", "tiles_y", "tile_w", "tile_h", "capacity", "rounds",
        "big_capacity",
    ),
)
def bin_all(
    valid,
    screen_aabb,
    *,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int,
    capacity: int,
    rounds: int = 1,
    big_capacity: int = 64,
):
    """Sort-based tile binning. Returns a list of (bins, counts) passes to
    rasterize + merge (depth max), plus an overflow counter.

    Design (the fast path on TPU): ~all triangles span at most 2x2 tiles, so
    each emits its <=4 corner-tile keys packed as tile_id * T + tri_id; one
    jnp.sort groups them tile-major, and per-tile ranges come from a binary
    search over the SMALL (4T,) sorted array — every gather touches a
    VMEM-stageable table. (The previous dense (Tiles, T) cumsum approach
    probed a table of hundreds of MB; random HBM gathers at ~20ns/element
    made binning the whole frame's bottleneck.) Triangles spanning more
    than 2x2 tiles (large walls/floors) are few: they take a dense
    (Tiles, big_capacity) test in a separate pass.
    """
    xmin, xmax, ymin, ymax = screen_aabb
    t = valid.shape[0]
    ntiles = tiles_y * tiles_x
    # sort keys are tile * t + tri_id packed into int32 (sentinel ntiles*t);
    # fail loudly instead of silently mis-binning huge scenes.
    if (ntiles + 1) * t >= 2**31:
        raise ValueError(
            f"bin_all: {t} raster triangles x {ntiles} tiles overflows the "
            "int32 sort key — split the scene or raster in slices"
        )
    tx0 = jnp.clip(jnp.floor(xmin / tile_w).astype(jnp.int32), 0, tiles_x - 1)
    tx1 = jnp.clip(jnp.floor(xmax / tile_w).astype(jnp.int32), 0, tiles_x - 1)
    ty0 = jnp.clip(jnp.floor(ymin / tile_h).astype(jnp.int32), 0, tiles_y - 1)
    ty1 = jnp.clip(jnp.floor(ymax / tile_h).astype(jnp.int32), 0, tiles_y - 1)
    small = valid & (tx1 - tx0 <= 1) & (ty1 - ty0 <= 1)
    big = valid & ~small

    # ---- small triangles: 4 corner keys, sort, range lookup ----------------
    tri_ids = jnp.arange(t, dtype=jnp.int32)
    corners = [
        (ty0, tx0),
        (ty0, tx1),
        (ty1, tx0),
        (ty1, tx1),
    ]
    keys = []
    seen = []
    for (cy, cx) in corners:
        tile = cy * tiles_x + cx
        dup = jnp.zeros((t,), bool)
        for p in seen:
            dup = dup | (p == tile)
        k = jnp.where(small & ~dup, tile * t + tri_ids, ntiles * t)
        seen.append(tile)
        keys.append(k)
    keys = jnp.concatenate(keys)              # (4T,)
    skeys = jnp.sort(keys)
    s_tile = skeys // t
    s_tri = jnp.where(s_tile < ntiles, skeys - s_tile * t, -1)

    # per-tile [start, end) via fixed-step binary search over the small array
    n4 = skeys.shape[0]
    steps = max(1, n4.bit_length())  # hi starts EXCLUSIVE (= n4)

    def lower_bound(targets):
        lo = jnp.zeros(targets.shape, jnp.int32)
        hi = jnp.full(targets.shape, n4, jnp.int32)
        for _ in range(steps):
            mid = (lo + hi) >> 1
            v = s_tile[jnp.minimum(mid, n4 - 1)]
            ge = v >= targets
            hi = jnp.where(ge, mid, hi)
            lo = jnp.where(ge, lo, mid + 1)
        return lo

    tile_ids = jnp.arange(ntiles, dtype=jnp.int32)
    starts = lower_bound(tile_ids)
    ends = lower_bound(tile_ids + 1)
    counts = ends - starts

    passes = []
    slots = jnp.arange(capacity, dtype=jnp.int32)
    for r in range(rounds):
        off = r * capacity
        idx = starts[:, None] + off + slots[None, :]
        ok = (off + slots[None, :]) < counts[:, None]
        # dead slots gather POSITION 0, not a clamped in-bounds position:
        # gather cost tracks unique rows touched, so pointing every dead
        # slot at one cached row makes overflow rounds nearly free
        # (measured: a mostly-dead round dropped 3.7 -> ~0.9 ms at 1080p)
        bins = jnp.where(ok, s_tri[jnp.where(ok, idx, 0)], -1)
        passes.append(
            (bins.reshape(tiles_y, tiles_x, capacity),
             jnp.clip(counts - off, 0, capacity).reshape(tiles_y, tiles_x))
        )
    overflow = jnp.maximum(counts - rounds * capacity, 0).sum()

    # ---- big triangles: dense test against a small compacted list ---------
    bcount = jnp.cumsum(big.astype(jnp.int32))
    n_big = bcount[-1]
    bsteps = max(1, (t - 1).bit_length())
    bslots = jnp.arange(big_capacity, dtype=jnp.int32)
    lo = jnp.zeros((big_capacity,), jnp.int32)
    hi = jnp.full((big_capacity,), t - 1, jnp.int32)
    for _ in range(bsteps):
        mid = (lo + hi) >> 1
        ge = bcount[mid] >= bslots + 1
        hi = jnp.where(ge, mid, hi)
        lo = jnp.where(ge, lo, jnp.minimum(mid + 1, t - 1))
    big_ids = jnp.where(bslots < n_big, hi, -1)          # (B,)
    safe_big = jnp.maximum(big_ids, 0)
    cy = jnp.arange(tiles_y, dtype=jnp.int32)
    cx = jnp.arange(tiles_x, dtype=jnp.int32)
    ov = (
        (cy[:, None, None] >= ty0[safe_big][None, None, :])
        & (cy[:, None, None] <= ty1[safe_big][None, None, :])
        & (cx[None, :, None] >= tx0[safe_big][None, None, :])
        & (cx[None, :, None] <= tx1[safe_big][None, None, :])
        & (big_ids >= 0)[None, None, :]
    )  # (Ty, Tx, B)
    big_bins = jnp.where(ov, safe_big[None, None, :], -1)
    # pack live entries first per tile (no need: kernel masks -1 per chunk,
    # but the count-based early exit needs them contiguous — sort descending
    # validity stable by slot).
    order = jnp.argsort(~ov, axis=-1, stable=True)
    big_bins = jnp.take_along_axis(big_bins, order, axis=-1)
    big_counts = ov.sum(axis=-1)
    overflow = overflow + jnp.maximum(n_big - big_capacity, 0)
    passes.append((big_bins, big_counts))
    return passes, overflow


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tiles_y", "tile_w", "tile_h", "big_capacity"),
)
def bin_sorted(
    valid,
    screen_aabb,
    *,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int,
    big_capacity: int = 64,
):
    """Ragged sort-based binning: the sorted candidate array IS the bin.

    Same key construction as bin_all (<=4 corner-tile keys per small
    triangle, one sort), but instead of materializing fixed-capacity
    (Tiles, C) slot tables per round — whose (Tiles*C*rounds)-row gathers
    dominated DepthPrepass at 1080p — the tile-major sorted order is
    consumed directly by tile_raster.rasterize_stream, which DMA-streams
    each tile's chunk-aligned [start, start+count) window span from HBM.
    No slot tables, no per-round merge, ONE raster pass.

    Returns (order, starts, counts, big_ids, n_big, overflow):
      order   (4T,) int32 — tile-major candidate triangle ids, -1 sentinel
      starts  (Tiles,) int32 — segment start per tile
      counts  (Tiles,) int32 — segment length per tile
      big_ids (big_capacity,) int32 — compacted >2x2-tile triangles, -1 pad
      n_big   () int32 — live big count (clamped to capacity)
      overflow () int32 — big triangles beyond capacity (small never drop)
    """
    xmin, xmax, ymin, ymax = screen_aabb
    t = valid.shape[0]
    ntiles = tiles_y * tiles_x
    if (ntiles + 1) * t >= 2**31:
        raise ValueError(
            f"bin_sorted: {t} raster triangles x {ntiles} tiles overflows "
            "the int32 sort key"
        )
    tx0 = jnp.clip(jnp.floor(xmin / tile_w).astype(jnp.int32), 0, tiles_x - 1)
    tx1 = jnp.clip(jnp.floor(xmax / tile_w).astype(jnp.int32), 0, tiles_x - 1)
    ty0 = jnp.clip(jnp.floor(ymin / tile_h).astype(jnp.int32), 0, tiles_y - 1)
    ty1 = jnp.clip(jnp.floor(ymax / tile_h).astype(jnp.int32), 0, tiles_y - 1)
    small = valid & (tx1 - tx0 <= 1) & (ty1 - ty0 <= 1)
    big = valid & ~small

    tri_ids = jnp.arange(t, dtype=jnp.int32)
    corners = [(ty0, tx0), (ty0, tx1), (ty1, tx0), (ty1, tx1)]
    keys = []
    seen = []
    for (cy, cx) in corners:
        tile = cy * tiles_x + cx
        dup = jnp.zeros((t,), bool)
        for p in seen:
            dup = dup | (p == tile)
        k = jnp.where(small & ~dup, tile * t + tri_ids, ntiles * t)
        seen.append(tile)
        keys.append(k)
    keys = jnp.concatenate(keys)              # (4T,)
    skeys = jnp.sort(keys)
    s_tile = skeys // t
    order = jnp.where(s_tile < ntiles, skeys - s_tile * t, -1)

    n4 = skeys.shape[0]
    steps = max(1, n4.bit_length())

    def lower_bound(targets):
        lo = jnp.zeros(targets.shape, jnp.int32)
        hi = jnp.full(targets.shape, n4, jnp.int32)
        for _ in range(steps):
            mid = (lo + hi) >> 1
            v = s_tile[jnp.minimum(mid, n4 - 1)]
            ge = v >= targets
            hi = jnp.where(ge, mid, hi)
            lo = jnp.where(ge, lo, mid + 1)
        return lo

    tile_ids = jnp.arange(ntiles, dtype=jnp.int32)
    starts = lower_bound(tile_ids)
    counts = lower_bound(tile_ids + 1) - starts

    # big triangles: compact ids (every tile tests all of them — B is tiny)
    bcount = jnp.cumsum(big.astype(jnp.int32))
    n_big_raw = bcount[-1]
    bsteps = max(1, (t - 1).bit_length())
    bslots = jnp.arange(big_capacity, dtype=jnp.int32)
    lo = jnp.zeros((big_capacity,), jnp.int32)
    hi = jnp.full((big_capacity,), t - 1, jnp.int32)
    for _ in range(bsteps):
        mid = (lo + hi) >> 1
        ge = bcount[mid] >= bslots + 1
        hi = jnp.where(ge, mid, hi)
        lo = jnp.where(ge, lo, jnp.minimum(mid + 1, t - 1))
    big_ids = jnp.where(bslots < n_big_raw, hi, -1)
    n_big = jnp.minimum(n_big_raw, big_capacity)
    overflow = jnp.maximum(n_big_raw - big_capacity, 0)
    return order, starts, counts, big_ids, n_big, overflow


@functools.partial(
    jax.jit, static_argnames=("tiles_x", "tiles_y", "tile_w", "tile_h", "capacity")
)
def bin_triangles(
    valid,
    screen_aabb,
    *,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int,
    capacity: int,
    slot_offset: int = 0,
):
    """Build per-tile candidate triangle lists.

    Returns (bins (Ty, Tx, C) int32 id or -1, counts (Ty, Tx), overflow).

    Method: overlap[tile, tri] = interval test on the triangle's tile-space
    AABB; running count via cumsum along triangles; slot s of a tile found
    by searchsorted(cumsum_row, s+1) — compaction *by gather*, which XLA
    lowers to dense vector code (a scatter-free replacement for the GPU's
    atomicAdd compaction; see ComputeLightCulling.shader for the pattern
    being replaced).
    """
    xmin, xmax, ymin, ymax = screen_aabb
    tx0 = jnp.clip(jnp.floor(xmin / tile_w).astype(jnp.int32), 0, tiles_x - 1)
    tx1 = jnp.clip(jnp.floor(xmax / tile_w).astype(jnp.int32), 0, tiles_x - 1)
    ty0 = jnp.clip(jnp.floor(ymin / tile_h).astype(jnp.int32), 0, tiles_y - 1)
    ty1 = jnp.clip(jnp.floor(ymax / tile_h).astype(jnp.int32), 0, tiles_y - 1)

    ntiles = tiles_y * tiles_x
    cy = jnp.arange(tiles_y, dtype=jnp.int32)
    cx = jnp.arange(tiles_x, dtype=jnp.int32)
    # (Ty, Tx, T) overlap — chunked over tiles_y via scan to bound memory.
    overlap = (
        (cy[:, None, None] >= ty0[None, None, :])
        & (cy[:, None, None] <= ty1[None, None, :])
        & (cx[None, :, None] >= tx0[None, None, :])
        & (cx[None, :, None] <= tx1[None, None, :])
        & valid[None, None, :]
    )
    overlap = overlap.reshape(ntiles, -1)
    csum = jnp.cumsum(overlap.astype(jnp.int32), axis=-1)  # (Tiles, T)
    counts = csum[:, -1]
    slots = jnp.arange(capacity, dtype=jnp.int32) + slot_offset
    # First index where csum == s+1, via a hand-vectorized fixed-step binary
    # search: 2^ceil(log2 T) halvings of dense (Tiles, C) probes. This is
    # ~10x faster on TPU than jnp.searchsorted's while-loop lowering
    # (measured: the vmapped searchsorted dominated the whole raster pass).
    t = csum.shape[1]
    steps = max(1, (t - 1).bit_length())
    target = (slots + 1)[None, :]  # (1, C)
    lo = jnp.zeros((csum.shape[0], capacity), jnp.int32)
    hi = jnp.full((csum.shape[0], capacity), t - 1, jnp.int32)
    csum_flat = csum.reshape(-1)  # flat 1-D gathers: 2-D take_along_axis
    row_base = (jnp.arange(csum.shape[0], dtype=jnp.int32) * t)[:, None]
    for _ in range(steps):  # hits a ~15x slower TPU gather path (measured)
        mid = (lo + hi) >> 1
        v = csum_flat[row_base + mid]
        ge = v >= target
        hi = jnp.where(ge, mid, hi)
        lo = jnp.where(ge, lo, jnp.minimum(mid + 1, t - 1))
    found = hi
    in_range = slots[None, :] < counts[:, None]
    bins = jnp.where(in_range, found.astype(jnp.int32), -1)
    overflow = jnp.maximum(counts - (slot_offset + capacity), 0).sum()
    round_counts = jnp.clip(counts - slot_offset, 0, capacity)
    return (
        bins.reshape(tiles_y, tiles_x, capacity),
        round_counts.reshape(tiles_y, tiles_x),
        overflow,
    )
