"""Screen-space post passes: linearize depth, HBAO, motion blur, chromatic
aberration, debug compose — TPU-native LinearizeDepth.shader, HBAO.shader,
HBAO_Blur.shader, MotionBlur.shader, ChromaticAberation.shader and the
PostProcessNode parameterization (Runtime/FrameGraph/PostProcessNode.cpp).

All passes are dense per-pixel math over whole images; samples along
screen-space directions become shifted bilinear fetches that XLA turns
into strided loads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from sailor_tpu.core import math3d as m3
from sailor_tpu.kernels import sampling

# HBAO direction set (8 directions, HBAO.shader Directions)
_DIRS = np.asarray(
    [
        [0.0, 1.0], [1.0, 0.0], [0.0, -1.0], [-1.0, 0.0],
        [-0.7071069, 0.7071068], [0.7071068, 0.7071069],
        [0.7071069, -0.7071068], [-0.7071068, -0.7071069],
    ],
    np.float32,
)


def linearize_depth(depth_rev, z_near: float, z_far: float):
    """Reverse-Z ndc depth -> positive view-space distance
    (LinearizeDepth.shader). Background (0) maps to z_far."""
    return jnp.where(
        depth_rev > 0.0,
        z_near * z_far / (depth_rev * (z_far - z_near) + z_near),
        z_far,
    )


def reconstruct_view_pos(linear_depth, inv_projection, height: int, width: int,
                         row0=0, full_height: int | None = None,
                         clamp_rows: bool = False):
    """View-space position per pixel from linear depth.

    ``clamp_rows``: clamp global rows into [0, fh) — halo rows past the
    global viewport reproduce the edge-clamped coordinates the full-frame
    pass would use (screen-sharded HBAO exactness).
    """
    fh = full_height if full_height is not None else height
    rows = jnp.arange(height, dtype=jnp.float32) + row0
    if clamp_rows:
        rows = jnp.clip(rows, 0.0, fh - 1.0)
    ys = (rows + 0.5) / fh
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    u, v = jnp.meshgrid(xs, ys, indexing="xy")
    ndc = jnp.stack([u * 2 - 1, 1 - 2 * v, jnp.full_like(u, 0.5), jnp.ones_like(u)], -1)
    p = jnp.einsum("ij,hwj->hwi", inv_projection, ndc)
    dir_vs = p[..., :3] / p[..., 3:4]
    dir_vs = dir_vs / jnp.maximum(-dir_vs[..., 2:3], 1e-6)  # scale so z = -1
    return dir_vs * linear_depth[..., None]


@functools.partial(
    jax.jit,
    static_argnames=("num_samples", "height", "width", "full_height",
                     "clamp_rows"),
)
def hbao(
    linear_depth,
    inv_projection,
    *,
    height: int,
    width: int,
    radius: float = 0.5,
    power: float = 1.5,
    bias: float = 0.1,
    num_samples: int = 4,
    row0=0,
    full_height: int | None = None,
    clamp_rows: bool = False,
):
    """Horizon-based ambient occlusion over the linear-depth buffer.

    For each of 8 screen directions, march a few steps, track the max
    horizon angle of the view-space vector from the center point, and
    accumulate occlusion (HBAO.shader main loop, vectorized over pixels).

    TPU redesign: the march uses STATIC power-of-two pixel offsets
    (1, 2, 4, 8... texels) so every tap is a pad+slice shift that XLA fuses
    — the depth-proportional radius of the original becomes a world-space
    attenuation term instead (measured ~40x faster than per-pixel-offset
    bilinear gathers at equal visual quality).

    Returns (H, W) AO in [0,1] (1 = unoccluded).
    """
    p = reconstruct_view_pos(linear_depth, inv_projection, height, width,
                             row0, full_height, clamp_rows)
    # Screen-space normal from depth differences.
    dzdx = _shift(p, 1, 1) - p
    dzdy = _shift(p, 0, 1) - p
    n = m3.normalize(jnp.cross(dzdy, dzdx))
    n = jnp.where(n[..., 2:3] < 0, -n, n)

    occlusion = jnp.zeros((height, width))
    for d8 in _DIRS:
        max_sin = jnp.zeros((height, width))
        for s in range(num_samples):
            step = 2 << s  # 2, 4, 8, 16 texels
            du = int(round(float(d8[0]) * step))
            dv = int(round(float(d8[1]) * step))
            ps = _shift(_shift(p, 0, dv), 1, du)
            diff = ps - p
            dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
            sin_h = jnp.sum(diff * n, axis=-1) / jnp.maximum(dist, 1e-6)
            atten = jnp.clip(1.0 - dist / radius, 0.0, 1.0)
            cand = (sin_h - bias) * atten
            max_sin = jnp.maximum(max_sin, cand)
        occlusion = occlusion + jnp.clip(max_sin, 0.0, 1.0)
    ao = 1.0 - occlusion / len(_DIRS)
    return jnp.clip(ao, 0.0, 1.0) ** power


_HBAO_HALO = 17  # max vertical reach: 16-texel march step + 1-row normal


def exchange_row_halo(img, r: int, axis_name: str, n_shards: int):
    """Extend a row-sharded image with r true neighbor rows on each side
    (ppermute); edge shards replicate their own edge row (matching the
    full-frame edge clamp). Returns (ext (h+2r, ...),)."""
    idx = jax.lax.axis_index(axis_name)
    top, bot = img[:r], img[-r:]
    fwd = [(i, i + 1) for i in range(n_shards - 1)]
    bwd = [(i + 1, i) for i in range(n_shards - 1)]
    prev = jax.lax.ppermute(bot, axis_name, fwd)
    nxt = jax.lax.ppermute(top, axis_name, bwd)
    edge_top = jnp.repeat(img[:1], r, axis=0)
    edge_bot = jnp.repeat(img[-1:], r, axis=0)
    prev = jnp.where(idx == 0, edge_top, prev)
    nxt = jnp.where(idx == n_shards - 1, edge_bot, nxt)
    return jnp.concatenate([prev, img, nxt], axis=0)


def hbao_sharded(linear_depth, inv_projection, *, height, width, radius,
                 power, axis_name, n_shards, row0, full_height):
    """HBAO for a row slice, bit-matching the full-frame pass: the march
    reads up to 16 rows past the slice, so exchange a 17-row halo, run the
    kernel on the extended window with globally-clamped row coordinates,
    and crop the center."""
    r = _HBAO_HALO
    ext = exchange_row_halo(linear_depth, r, axis_name, n_shards)
    ao = hbao(
        ext, inv_projection, height=height + 2 * r, width=width,
        radius=radius, power=power, row0=row0 - r, full_height=full_height,
        clamp_rows=True,
    )
    return ao[r:-r]


def _shift(img, axis: int, d: int):
    if d == 0:
        return img
    pads = [(0, 0)] * img.ndim
    pads[axis] = (max(-d, 0), max(d, 0))
    padded = jnp.pad(img, pads, mode="edge")
    start = [0] * img.ndim
    start[axis] = max(d, 0)
    return jax.lax.dynamic_slice(padded, start, img.shape)


def _sample_shift(img, du, dv, height, width):
    """Bilinear fetch at per-pixel offsets (du, dv) in pixels."""
    ys = jnp.arange(height, dtype=jnp.float32)[:, None] + dv + 0.5
    xs = jnp.arange(width, dtype=jnp.float32)[None, :] + du + 0.5
    uv = jnp.stack(
        [jnp.broadcast_to(xs, (height, width)) / width,
         jnp.broadcast_to(ys, (height, width)) / height],
        axis=-1,
    )
    return sampling.sample_bilinear(img, uv)


def downsample_quarter(color):
    """4x box downsample (the motion-blur tap table).

    reduce_window instead of reshape(h/4,4,w/4,4,-1).mean: the reshape
    forces a layout transpose of the full-res plane ({1,0,2} -> major
    split), measured ~2.3 ms at 1080p; the windowed sum is ~0.1 ms."""
    h, w = color.shape[:2]
    q = 4
    he, we = (h // q) * q, (w // q) * q
    s = jax.lax.reduce_window(
        color[:he, :we], 0.0, jax.lax.add,
        (q, q, 1), (q, q, 1), "valid",
    )
    return s * (1.0 / (q * q))


@functools.partial(
    jax.jit,
    static_argnames=("num_samples", "full_height", "axis_name", "n_shards"),
)
def motion_blur(
    color,
    depth_rev,
    prev_view_proj,
    inv_view_proj,
    *,
    intensity: float = 1.0,
    num_samples: int = 8,
    row0=0,
    full_height: int | None = None,
    quarter_full=None,
    axis_name: str | None = None,
    n_shards: int = 1,
):
    """Camera motion blur: reproject each pixel into the previous frame and
    average samples along the screen-space velocity (MotionBlur.shader).

    ``depth_rev``: the raster's reverse-Z NDC depth buffer — unprojecting
    (ndc_xy, depth) through inv(view_proj) reconstructs world exactly.
    ``quarter_full``: optional full-frame 4x-downsampled tap table (screen
    sharding passes the all_gathered quarter so taps can cross slices).
    """
    h, w = color.shape[:2]
    fh = full_height if full_height is not None else h
    # The WHOLE velocity pipeline runs at QUARTER resolution: the blur taps
    # were already quarter-res (gather cost is row-count latency — ~0.9 ms
    # per quarter tap vs ~3.5 ms half-res at 1080p measured), and velocity
    # is smooth away from depth edges, so unprojecting 16x fewer pixels
    # drops ~6 full-res reprojection passes from the frame for free.
    q = 4
    he, we = (h // q) * q, (w // q) * q
    ys = (jnp.arange(he // q, dtype=jnp.float32) * q + 0.5 + row0) / fh
    xs = (jnp.arange(we // q, dtype=jnp.float32) * q + 0.5) / w
    u, v = jnp.meshgrid(xs, ys, indexing="xy")
    depth_q = depth_rev[:he:q, :we:q]
    ndc = jnp.stack(
        [u * 2 - 1, 1 - 2 * v, jnp.maximum(depth_q, 1e-6), jnp.ones_like(u)], -1
    )
    world = m3.homogenize(jnp.einsum("ij,hwj->hwi", inv_view_proj, ndc))
    prev_clip = m3.transform_point_h(prev_view_proj, world)
    prev_ndc = prev_clip[..., :2] / jnp.maximum(jnp.abs(prev_clip[..., 3:4]), 1e-6)
    prev_uv = jnp.stack(
        [prev_ndc[..., 0] * 0.5 + 0.5, 0.5 - prev_ndc[..., 1] * 0.5], axis=-1
    )
    vel_h = (jnp.stack([u, v], -1) - prev_uv) * intensity
    uv_h = jnp.stack([u, v], -1)
    quarter = quarter_full if quarter_full is not None else downsample_quarter(color)
    acc_h = jnp.zeros((he // q, we // q, color.shape[-1]), color.dtype)
    # nearest taps: 1 gather per sample (vs 4 for bilinear) — the blur
    # direction averaging already low-passes the result
    for s in range(1, num_samples):
        t = s / num_samples
        acc_h = acc_h + sampling.sample_nearest(quarter, uv_h - vel_h * t)
    if axis_name is not None:
        acc = sampling.upsample_bilinear_pow2_sharded(
            acc_h, (h, w), axis_name, n_shards
        )
    else:
        acc = sampling.upsample_bilinear_pow2(acc_h, (h, w))
    return (color + acc) / num_samples


@functools.partial(
    jax.jit,
    static_argnames=("num_samples", "full_height", "axis_name", "n_shards"),
)
def sun_shafts(
    color,
    depth_rev,
    view_projection,
    sun_direction,
    sun_intensity,
    *,
    intensity: float = 0.45,
    num_samples: int = 24,
    row0=0,
    full_height: int | None = None,
    axis_name: str | None = None,
    n_shards: int = 1,
):
    """Screen-space god rays (SunShafts.shader, SkyNode.h:66-67).

    The reference radially blurs the cloud/sky buffer toward the sun's
    screen position (60 taps full-res); here the light-source mask is the
    sky-visibility buffer (background pixels) at QUARTER res and the blur
    takes ``num_samples`` taps — gathers are row-count bound so the small
    mask makes the whole pass ~1 ms at 1080p.
    """
    h, w = color.shape[:2]
    fh = full_height if full_height is not None else h

    # sun position on screen (direction TO the sun, w=0 projection)
    to_sun = -sun_direction
    clip = view_projection[:3, :3] @ to_sun
    wclip = view_projection[3, :3] @ to_sun
    behind = wclip <= 1e-4
    ndc = clip[:2] / jnp.where(behind, 1.0, wclip)
    uv_sun = jnp.stack([ndc[0] * 0.5 + 0.5, 0.5 - ndc[1] * 0.5])
    # fade out as the sun leaves the screen (reference border 0.51)
    border = 0.51
    off = jnp.maximum(
        jnp.maximum(uv_sun - 1.0, -uv_sun), 0.0
    ).max()
    fade = jnp.where(behind, 0.0, jnp.clip(1.0 - off / border, 0.0, 1.0))

    # quarter-res sky-visibility mask (1 = background/sky)
    q = 4
    he, we = (h // q) * q, (w // q) * q
    sky = (depth_rev[:he, :we] <= 0.0).astype(jnp.float32)
    mask = jax.lax.reduce_window(
        sky, 0.0, jax.lax.add, (q, q), (q, q), "valid"
    ) * (1.0 / (q * q))
    if axis_name is not None:
        mask = jax.lax.all_gather(mask, axis_name, axis=0, tiled=True)

    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5 + row0) / fh
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    u, v = jnp.meshgrid(xs, ys, indexing="xy")
    uv0 = jnp.stack([u, v], -1)[: he : q, : we : q]

    # Radial blur as a POLAR SCAN instead of N per-pixel taps: N gathers
    # of Hq*Wq rows each were ~21 ms at 1080p (gather cost = row count;
    # the arithmetic is irrelevant). Resample the mask onto an (A, R)
    # polar grid centered at the sun (ONE gather), run a first-order IIR
    # (exponential decay) along the radius via associative_scan — the
    # continuous version of the reference's 60-tap loop — and sample the
    # result back per pixel (ONE gather + a dense 3x3 blur to hide polar
    # banding). ~2 gathers total, everything else VPU-dense.
    A, R = 384, max(64, num_samples * 8)
    corners = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    rmax = jnp.sqrt(((corners - uv_sun) ** 2).sum(-1)).max() + 1e-4
    ang = (jnp.arange(A) + 0.5) * (2.0 * jnp.pi / A)
    rad = (jnp.arange(R) + 0.5) * (rmax / R)
    dirs = jnp.stack([jnp.cos(ang), jnp.sin(ang)], -1)          # (A, 2)
    uv_grid = uv_sun + dirs[:, None, :] * rad[None, :, None]    # (A, R, 2)
    polar = sampling.sample_nearest(mask[..., None], uv_grid)[..., 0]
    # outside-screen samples contribute nothing
    inside = ((uv_grid >= 0.0) & (uv_grid <= 1.0)).all(-1)
    polar = jnp.where(inside, polar, 0.0)

    d = 0.5 ** (4.0 / R)  # half-life = R/4 radial steps

    def iir(c1, c2):
        a1, b1 = c1
        a2, b2 = c2
        return a1 * a2, b1 * a2 + b2

    ones = jnp.full_like(polar, d)
    _, ema = jax.lax.associative_scan(iir, (ones, polar), axis=1)
    polar_shaft = ema * (1.0 - d)                               # (A, R)

    rel = uv0 - uv_sun
    r_pix = jnp.sqrt((rel ** 2).sum(-1))
    a_pix = jnp.arctan2(rel[..., 1], rel[..., 0]) % (2.0 * jnp.pi)
    ia = jnp.clip((a_pix * (A / (2.0 * jnp.pi))).astype(jnp.int32), 0, A - 1)
    ir = jnp.clip((r_pix * (R / rmax)).astype(jnp.int32), 0, R - 1)
    shaft_q = polar_shaft.reshape(-1)[ia * R + ir]
    # 3x3 box blur (dense pad+slice) softens angular banding
    pad = jnp.pad(shaft_q, 1, mode="edge")
    shaft_q = sum(
        pad[dy:dy + shaft_q.shape[0], dx:dx + shaft_q.shape[1]]
        for dy in range(3) for dx in range(3)
    ) / 9.0
    if axis_name is not None:
        shaft = sampling.upsample_bilinear_pow2_sharded(
            shaft_q[..., None], (h, w), axis_name, n_shards
        )[..., 0]
    else:
        shaft = sampling.upsample_bilinear_pow2(shaft_q[..., None], (h, w))[..., 0]
    glow = (shaft * fade * intensity)[..., None] * sun_intensity
    return color + glow


def chromatic_aberration(color, strength: float = 0.003):
    """Radial RGB split (ChromaticAberation.shader)."""
    h, w = color.shape[:2]
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    u, v = jnp.meshgrid(xs, ys, indexing="xy")
    uv = jnp.stack([u, v], -1)
    off = (uv - 0.5) * strength
    r = sampling.sample_bilinear(color[..., 0:1], uv + off)[..., 0]
    g = color[..., 1]
    b = sampling.sample_bilinear(color[..., 2:3], uv - off)[..., 0]
    return jnp.stack([r, g, b], axis=-1)
