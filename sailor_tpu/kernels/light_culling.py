"""Tiled Forward+ light culling — TPU-native ComputeLightCulling.shader.

The GLSL kernel builds per-16x16-tile view frustums in shared memory, does
atomic depth min/max, and compacts light indices with atomicAdd into a global
list.  The TPU redesign removes every atomic:

1. tile depth bounds  -> reshape (H, W) -> (Ty, 16, Tx, 16) + min/max reduce
2. tile frustum       -> 4 side planes per tile computed vectorized for ALL
                         tiles at once (planes through the eye, so they are
                         direction-only and depend just on tile corner rays)
3. light test         -> one (Tiles, L) broadcasted sphere/frustum test
4. compaction + sort  -> top_k over the masked impact score, giving each tile
                         its <=LIGHTS_PER_TILE nearest lights — replaces the
                         atomicAdd compaction + bubble sort

Output is a dense (Ty, Tx, K) int32 index grid with -1 padding (the
reference's culledLights list + lightsGrid offsets collapse into one array).

Directional lights are always included (reference adds them with impact 0 but
its final copy is reversed, so they effectively rank last; here they rank
first — shading sums commute).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sailor_tpu import config
from sailor_tpu.core import math3d as m3
from sailor_tpu.kernels.lights import DIRECTIONAL, Lights

TILE = config.LIGHTS_CULLING_TILE_SIZE


def tile_depth_bounds(linear_depth, tiles_y: int, tiles_x: int):
    """Per-tile (min, max) of linear view-space depth. Input (H, W) with
    +depth into the screen; H, W padded to tile multiples by caller."""
    t = linear_depth.reshape(tiles_y, TILE, tiles_x, TILE)
    return t.min(axis=(1, 3)), t.max(axis=(1, 3))


def _tile_side_planes(tiles_y: int, tiles_x: int, viewport, inv_projection,
                      row0=0, scale: int = 1):
    """View-space side planes for every tile: (Ty, Tx, 4, 4).

    All four planes pass through the eye (origin), so each is defined purely
    by its normal: n = normalize(cross(edge_dir_a, edge_dir_b)) with corner
    rays unprojected from the tile's screen-space corners
    (ComputeLightCulling.shader CreateFrustum, vectorized over tiles).
    ``row0``: global pixel row of the first local tile row (screen-sharded).
    ``scale``: tile edge in units of TILE (supertiles for the coarse pass).
    """
    vw, vh = viewport
    xs = jnp.arange(tiles_x + 1, dtype=jnp.float32) * (TILE * scale)
    ys = jnp.arange(tiles_y + 1, dtype=jnp.float32) * (TILE * scale) + row0
    # Screen -> NDC (y down in screen, up in NDC)
    ndc_x = xs / vw * 2.0 - 1.0
    ndc_y = 1.0 - ys / vh * 2.0
    gx, gy = jnp.meshgrid(ndc_x, ndc_y, indexing="xy")  # (Ty+1, Tx+1)
    # Unproject corner rays at an arbitrary depth; direction through eye.
    corners = jnp.stack([gx, gy, jnp.ones_like(gx) * 0.5, jnp.ones_like(gx)], -1)
    v = jnp.einsum("ij,abj->abi", inv_projection, corners)
    rays = v[..., :3] / v[..., 3:4]  # (Ty+1, Tx+1, 3) view-space corner dirs

    tl = rays[:-1, :-1]
    tr = rays[:-1, 1:]
    bl = rays[1:, :-1]
    br = rays[1:, 1:]

    def plane(a, b):
        n = m3.normalize(jnp.cross(a, b))
        return jnp.concatenate([n, jnp.zeros_like(n[..., :1])], axis=-1)

    # Normals point into the tile frustum (matching ComputePlane(eye, p1, p2)
    # winding in the reference).
    left = plane(bl, tl)
    right = plane(tr, br)
    top = plane(tl, tr)
    bottom = plane(br, bl)
    return jnp.stack([left, right, top, bottom], axis=-2)  # (Ty, Tx, 4, 4)


SUPER = 4  # tiles per supertile edge for the two-level cull


@functools.partial(
    jax.jit,
    static_argnames=("tiles_y", "tiles_x", "viewport", "max_per_tile",
                     "coarse_capacity"),
)
def cull_lights(
    lights: Lights,
    view,
    inv_projection,
    linear_depth,
    *,
    tiles_y: int,
    tiles_x: int,
    viewport: tuple[int, int],
    max_per_tile: int = config.LIGHTS_PER_TILE,
    row0=0,
    coarse_capacity: int | None = None,
):
    """Returns (indices (Ty, Tx, K) int32 with -1 padding, counts (Ty, Tx)).

    ``linear_depth``: (Ty*TILE, Tx*TILE) positive view-space depth.
    ``viewport`` is always the FULL (w, h); ``row0`` shifts tile rows for
    a screen-sharded slice.

    ``coarse_capacity``: when set (and < light count), a SUPERxSUPER-tile
    coarse pass shortlists that many nearest-ranked lights per 64x64-px
    supertile first, and the per-tile sort runs over the shortlist only —
    the (Tiles, L) sort is the node's dominant cost at 1k lights and the
    shortlist cuts its width ~4-8x. Conservative: the supertile frustum
    and depth slab contain every member tile's, so a tile's hit set is a
    subset of its supertile's; lights can only be lost if a single
    supertile legitimately intersects more than ``coarse_capacity``
    lights, in which case the FARTHEST drop first — the same overflow
    policy as the per-tile budget (reference ComputeLightCulling.shader
    drops by list order at its 128 budget).
    """
    planes = _tile_side_planes(tiles_y, tiles_x, viewport, inv_projection,
                               row0)
    zmin, zmax = tile_depth_bounds(linear_depth, tiles_y, tiles_x)
    # Reference widens the depth slab by its own extent on both sides
    # (ComputeLightCulling.shader: zFar -= diff; zNear += diff — note the
    # reference swaps near/far by widening; we replicate the conservative
    # slab [zmin - diff, zmax + diff]).
    diff = zmax - zmin
    z0 = zmin - diff
    z1 = zmax + diff

    # Lights to raw view space (-z forward, same space the planes live in).
    pos_vs = m3.transform_point(view, lights.position)
    is_dir = lights.type == DIRECTIONAL
    z = -pos_vs[..., 2]

    # Global camera-distance rank (directional lights rank first, matching
    # LightingECS.cpp:209-260's distance sort); (rank, id) packed into ONE
    # uint32 sort key — rank in the high bits, id in the low bits — so
    # decoding an id after the sort is a mask, not a gather. uint32: with
    # L up to 65,535 (LightingSystem.MAX_LIGHTS) and id_bits=16, rank<<16
    # and the L<<16 empty sentinel exceed int31 and would wrap negative,
    # corrupting the sort (advisor r2).
    k = min(max_per_tile, lights.capacity)
    ntiles = tiles_y * tiles_x
    L = pos_vs.shape[0]
    dist = jnp.linalg.norm(pos_vs, axis=-1)
    order = jnp.argsort(jnp.where(is_dir, -1.0, dist))   # (L,) rank -> light
    rank = jnp.argsort(order).astype(jnp.int32)          # (L,) light -> rank
    id_bits = max(1, (L - 1).bit_length())
    assert id_bits + L.bit_length() <= 32, "light count overflows sort key"
    id_mask = (1 << id_bits) - 1
    sentinel = jnp.uint32(L) << id_bits
    lid = jnp.arange(L, dtype=jnp.uint32)
    packed_key = (rank.astype(jnp.uint32) << id_bits) | lid  # (L,)

    if coarse_capacity and coarse_capacity < L:
        # ---- coarse pass: SUPERxSUPER-tile shortlist ----
        cc = int(coarse_capacity)
        sy = -(-tiles_y // SUPER)
        sx = -(-tiles_x // SUPER)
        splanes = _tile_side_planes(sy, sx, viewport, inv_projection,
                                    row0, scale=SUPER)
        # supertile slab = union of member-tile slabs (pad with an empty
        # slab so edge supertiles ignore the padding)
        pz0 = jnp.pad(z0, ((0, sy * SUPER - tiles_y),
                           (0, sx * SUPER - tiles_x)),
                      constant_values=jnp.inf)
        pz1 = jnp.pad(z1, ((0, sy * SUPER - tiles_y),
                           (0, sx * SUPER - tiles_x)),
                      constant_values=-jnp.inf)
        sz0 = pz0.reshape(sy, SUPER, sx, SUPER).min(axis=(1, 3))
        sz1 = pz1.reshape(sy, SUPER, sx, SUPER).max(axis=(1, 3))

        sside = jnp.einsum("abpk,lk->abpl", splanes[..., :3], pos_vs)
        s_in = jnp.all(sside >= -lights.radius[None, None, None, :], axis=2)
        s_in &= (
            (z[None, None, :] + lights.radius >= sz0[..., None])
            & (z[None, None, :] - lights.radius <= sz1[..., None])
        )
        s_hit = (s_in | is_dir[None, None, :]) & lights.valid_mask[None, None, :]
        ckeys = jnp.where(s_hit.reshape(sy * sx, L), packed_key[None, :],
                          sentinel)
        short = jax.lax.sort(ckeys, dimension=-1)[:, :cc]   # (Sy*Sx, cc)
        short = short.reshape(sy, sx, cc)
        sl_id = (short & id_mask).astype(jnp.int32)
        sl_live = (short >> id_bits) < L

        # ---- fine pass over the shortlist only ----
        # Gather light data ONCE at SUPERTILE granularity ((Sy*Sx*cc)-row
        # packed gather — per-TILE gathers would be 16x the rows, ~14 ms
        # of pure HBM latency at 1080p/1k lights), then broadcast to
        # member tiles densely through reshape (no data movement).
        ldata = jnp.concatenate(
            [pos_vs, lights.radius[:, None], z[:, None],
             is_dir.astype(jnp.float32)[:, None]], axis=1,
        )  # (L, 6)
        sl = ldata[sl_id]                                   # (Sy, Sx, cc, 6)
        p_sl, r_sl = sl[..., 0:3], sl[..., 3]
        z_sl, dir_sl = sl[..., 4], sl[..., 5] > 0.5

        # tile planes grouped by supertile: (Sy, S, Sx, S, 4, 3)
        pp = jnp.pad(planes[..., :3],
                     ((0, sy * SUPER - tiles_y), (0, sx * SUPER - tiles_x),
                      (0, 0), (0, 0)))
        pp = pp.reshape(sy, SUPER, sx, SUPER, 4, 3)
        side = jnp.einsum("aAbBpk,abck->aAbBpc", pp, p_sl)
        in_sides = jnp.all(
            side >= -r_sl[:, None, :, None, None, :], axis=4
        )                                                   # (Sy,S,Sx,S,cc)
        zp0 = jnp.pad(z0, ((0, sy * SUPER - tiles_y),
                           (0, sx * SUPER - tiles_x)),
                      constant_values=jnp.inf)
        zp1 = jnp.pad(z1, ((0, sy * SUPER - tiles_y),
                           (0, sx * SUPER - tiles_x)),
                      constant_values=-jnp.inf)
        zp0 = zp0.reshape(sy, SUPER, sx, SUPER)
        zp1 = zp1.reshape(sy, SUPER, sx, SUPER)
        in_depth = (
            (z_sl[:, None, :, None] + r_sl[:, None, :, None]
             >= zp0[..., None])
            & (z_sl[:, None, :, None] - r_sl[:, None, :, None]
               <= zp1[..., None])
        )
        hit = ((in_sides & in_depth) | dir_sl[:, None, :, None]) \
            & sl_live[:, None, :, None]
        keys = jnp.where(hit, short[:, None, :, None], sentinel)
        # back to (Ty*Tx, cc), dropping the supertile padding
        keys = keys.transpose(0, 1, 2, 3, 4).reshape(
            sy * SUPER, sx * SUPER, cc
        )[:tiles_y, :tiles_x].reshape(ntiles, cc)
    else:
        # ---- single-level: (Ty, Tx, 4, L) signed distances ----
        side = jnp.einsum("abpk,lk->abpl", planes[..., :3], pos_vs)
        in_sides = jnp.all(side >= -lights.radius[None, None, None, :],
                           axis=2)
        # Depth slab uses +z into the screen (linear depth convention).
        in_depth = (
            (z[None, None, :] + lights.radius >= z0[..., None])
            & (z[None, None, :] - lights.radius <= z1[..., None])
        )
        hit = (in_sides & in_depth) | is_dir[None, None, :]
        hit = hit & lights.valid_mask[None, None, :]
        keys = jnp.where(
            hit.reshape(ntiles, L), packed_key[None, :], sentinel
        )

    # Compact + impact-sort in ONE jnp.sort over (Tiles, C): each tile
    # sorts {packed key if hit else BIG} and the first K slots are the K
    # nearest hit lights — when a tile overflows its budget the farthest
    # drop, never the nearest. Replaces the previous chunked per-slot
    # binary search (~80 small gather ops); also beats lax.top_k, which
    # lowers to ~k serial passes at k=128 (measured ~30x slower).
    skeys = jax.lax.sort(keys, dimension=-1)[:, :k]      # (Tiles, K) packed
    counts = jnp.sum(keys < sentinel, axis=-1, dtype=jnp.int32)
    indices = jnp.where(
        (skeys >> id_bits) < L,
        (skeys & id_mask).astype(jnp.int32),
        -1,
    )
    if k < max_per_tile:
        indices = jnp.pad(
            indices, ((0, 0), (0, max_per_tile - k)), constant_values=-1
        )
    return (
        indices.reshape(tiles_y, tiles_x, max_per_tile),
        jnp.minimum(counts, k).reshape(tiles_y, tiles_x),
    )
