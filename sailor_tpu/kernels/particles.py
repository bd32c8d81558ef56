"""Tile-binned particle splatting — scatter-free GPU particles.

The reference (Runtime/FrameGraph/ParticlesNode.cpp, experimental) renders
baked particle animations as instanced quads with a compute-interpolated
per-frame state. On TPU, scattered quad draws are the wrong shape: the
idiomatic path is the same one the raster and Forward+ lighting already
use — bin the particles to 16x16-pixel screen tiles with one sort
(raster/setup.bin_all), then accumulate every tile's particles densely
per pixel (chunked slot loop, all VPU-friendly (H, W) planes):

  project -> screen AABB per particle -> bin_all (4-corner sort keys,
  big-particle dense pass) -> per-slot chunked soft-disc accumulation
  with reverse-Z soft depth test -> additive HDR splat buffer.

No atomics, no scatters, static shapes throughout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sailor_tpu import config as cfg
from sailor_tpu.raster.setup import bin_all

TILE = cfg.LIGHTS_CULLING_TILE_SIZE  # 16 px, shared with light culling


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "full_height", "capacity"),
)
def splat_particles(
    positions,        # (N, 3) world
    radii,            # (N,) world-space radius
    colors,           # (N, 4) HDR rgb + alpha
    view_projection,  # (4, 4)
    projection,       # (4, 4)
    depth_rev,        # (H, W) reverse-Z scene depth (0 = background)
    *,
    width: int,
    height: int,          # LOCAL rows (== full_height when unsharded)
    full_height: int | None = None,
    row0=0,
    capacity: int = 64,
    soft_depth: float = 0.35,
):
    """Additive soft-particle splat buffer (H, W, 3). One sort + dense
    per-tile accumulation; `capacity` slots per 16px tile, extra-large
    particles ride bin_all's dense big pass."""
    fh = full_height if full_height is not None else height
    n = positions.shape[0]

    p4 = jnp.concatenate([positions, jnp.ones((n, 1))], -1)
    clip = p4 @ view_projection.T
    w = clip[:, 3]
    in_front = w > 1e-4
    safe_w = jnp.where(in_front, w, 1.0)
    ndc = clip[:, :3] / safe_w[:, None]
    sx = (ndc[:, 0] * 0.5 + 0.5) * width
    sy = (0.5 - ndc[:, 1] * 0.5) * fh - row0          # local rows
    px_scale = 0.5 * fh * projection[1, 1] / safe_w
    r_px = jnp.clip(radii * px_scale, 0.75, 4.0 * TILE)
    z_rev = ndc[:, 2]                                  # reverse-Z in [0,1]
    valid = in_front & (z_rev > 0.0) & (z_rev <= 1.0) & (colors[:, 3] > 0.0)
    # cull off-slice particles (their AABB misses every local tile)
    valid = valid & (sx + r_px > 0) & (sx - r_px < width) \
        & (sy + r_px > 0) & (sy - r_px < height)

    # round the tile grid UP and pad the pixel planes to match (viewports
    # like 1080 rows are not multiples of 16); crop the splat at the end
    pw = -(-width // TILE) * TILE
    ph = -(-height // TILE) * TILE
    tiles_x = pw // TILE
    tiles_y = ph // TILE
    passes, _overflow = bin_all(
        valid,
        (sx - r_px, sx + r_px, sy - r_px, sy + r_px),
        tiles_x=tiles_x, tiles_y=tiles_y, tile_w=TILE, tile_h=TILE,
        capacity=capacity, rounds=1, big_capacity=16,
    )

    # packed per-particle params: sx, sy, r_px, z_rev, r, g, b, a
    packed = jnp.stack(
        [sx, sy, r_px, z_rev,
         colors[:, 0], colors[:, 1], colors[:, 2], colors[:, 3]], axis=1
    )  # (N, 8)

    ys = jnp.arange(ph, dtype=jnp.float32) + 0.5
    xs = jnp.arange(pw, dtype=jnp.float32) + 0.5
    pix_x, pix_y = jnp.meshgrid(xs, ys, indexing="xy")  # (PH, PW)

    depth_p = jnp.pad(depth_rev, ((0, ph - height), (0, pw - width)),
                      constant_values=1.0)  # padded rows: nearest -> no splat
    acc = jnp.zeros((ph, pw, 3))
    bg = depth_p <= 0.0
    for bins, counts in passes:
        c = bins.shape[-1]
        live = bins >= 0                       # (Ty, Tx, C)
        prm = packed[jnp.maximum(bins, 0)]     # (Ty, Tx, C, 8) — one gather
        prm = jnp.where(live[..., None], prm, 0.0)
        prm_t = prm.transpose(2, 3, 0, 1)      # (C, 8, Ty, Tx)
        # slots are compacted per tile, so looping to the frame's max live
        # count covers every particle (dynamic fori bound, Forward+ style)
        n_loop = jnp.minimum(jnp.max(counts), c)

        def slot_step(i, acc):
            row = jax.lax.dynamic_index_in_dim(
                prm_t, i, axis=0, keepdims=False
            )  # (8, Ty, Tx)

            def up(f):  # per-tile plane -> per-pixel plane (16x repeat)
                return jnp.repeat(jnp.repeat(f, TILE, 0), TILE, 1)

            cx_p, cy_p = up(row[0]), up(row[1])
            r_p, z_p, a_p = up(row[2]), up(row[3]), up(row[7])
            d2 = (pix_x - cx_p) ** 2 + (pix_y - cy_p) ** 2
            r2 = jnp.maximum(r_p * r_p, 1e-6)
            # soft disc falloff, zero outside the radius
            fall = jnp.maximum(1.0 - d2 / r2, 0.0) ** 2
            # soft depth: fade where geometry is closer (higher reverse-Z);
            # background (depth 0) never occludes
            fade = jnp.clip((z_p - depth_p) / soft_depth + 1.0, 0.0, 1.0)
            wgt = fall * jnp.where(bg, 1.0, fade) * a_p
            return acc + wgt[..., None] * jnp.stack(
                [up(row[4]), up(row[5]), up(row[6])], axis=-1
            )

        acc = jax.lax.fori_loop(0, n_loop, slot_step, acc)
    return acc[:height, :width]
