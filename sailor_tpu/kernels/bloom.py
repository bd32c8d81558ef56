"""Bloom mip-chain — TPU-native ComputeBloomDownscale/Upscale.shader.

The reference implements [Jimenez14]-style bloom (via RapidGL): a 13-tap
downsample with Karis average + quadratic threshold on the first mip, then a
3x3 tent upsample accumulated back up the chain with lens-dirt on mip 1.

On TPU the workgroup shared-memory tile dance disappears: the taps become
shifted adds over whole images, which XLA fuses into a handful of
VPU-saturating loops; the mip chain is a host-side Python loop over static
shapes (unrolled into the jitted graph).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp


@functools.lru_cache(maxsize=4)
def lens_dirt(height: int, width: int, seed: int = 7):
    """Procedural lens-dirt texture (BloomNode.cpp:20-70 loads one from
    disk; we bake an equivalent: soft smudge blobs + bokeh rings). Cached
    per resolution; becomes a jit constant."""
    import numpy as np

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    d = np.zeros((height, width), np.float32)
    diag = float(np.hypot(height, width))
    for _ in range(60):  # smudges
        cy, cx = rng.uniform(0, height), rng.uniform(0, width)
        r = rng.uniform(0.01, 0.05) * diag
        a = rng.uniform(0.1, 0.5)
        d += a * np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * r * r)))
    for _ in range(14):  # bokeh rings
        cy, cx = rng.uniform(0, height), rng.uniform(0, width)
        r0 = rng.uniform(0.02, 0.08) * diag
        t = rng.uniform(0.08, 0.25) * r0
        a = rng.uniform(0.2, 0.7)
        rr = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        d += a * np.exp(-((rr - r0) ** 2) / (2 * t * t))
    d = d / max(d.max(), 1e-6)
    # return NUMPY: this function runs (and caches) under jit tracing —
    # caching any jax array here leaks a tracer across traces; callers
    # consume the numpy constant fresh per trace
    return (d[..., None] ** 1.5).astype(np.float32)


def _luma(rgb):
    return (
        rgb[..., 0] * 0.2126729 + rgb[..., 1] * 0.7151522 + rgb[..., 2] * 0.0721750
    )


def _karis_avg(c):
    return c / (1.0 + _luma(c))[..., None]


def quadratic_threshold(color, threshold: float, knee: float):
    """Soft knee: curve = (threshold - knee, 2*knee, 0.25/knee)."""
    br = jnp.max(color, axis=-1)
    rq = jnp.clip(br - (threshold - knee), 0.0, 2.0 * knee)
    rq = (0.25 / max(knee, 1e-4)) * rq * rq
    scale = jnp.maximum(rq, br - threshold) / jnp.maximum(br, 1e-4)
    return color * scale[..., None]


def _stride2(img):
    """Even-texel extraction via a strided 1x1 reduce_window — guaranteed
    dense lowering. A plain ``img[::2, ::2]`` in this fusion context
    lowered to a per-pixel index gather (~3.6 ms at 1080p, profiled);
    reduce_window cannot become a gather."""
    import jax

    h2, w2 = img.shape[0] // 2, img.shape[1] // 2
    win = (1, 1) + (1,) * (img.ndim - 2)
    stride = (2, 2) + (1,) * (img.ndim - 2)
    out = jax.lax.reduce_window(
        img[: h2 * 2, : w2 * 2], 0.0, jax.lax.add, win, stride, "VALID"
    )
    return out


def _sample_at(img, dy: int, dx: int):
    """img shifted by (dy, dx) texels with clamp-to-edge (pad+slice: fuses
    on TPU where index-take gathers do not)."""
    import jax

    if dy == 0 and dx == 0:
        return img
    pads = [(max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0))] + [(0, 0)] * (
        img.ndim - 2
    )
    padded = jnp.pad(img, pads, mode="edge")
    start = [max(dy, 0), max(dx, 0)] + [0] * (img.ndim - 2)
    return jax.lax.dynamic_slice(padded, start, img.shape)


def downsample_13tap(img, *, use_threshold=False, threshold=1.0, knee=0.5):
    """Half-res downsample with the Jimenez14 13-tap partial Karis average.

    ``img``: (H, W, 3). Returns (H//2, W//2, 3).
    """
    # Full-res taps A..M live on the even-coordinate grid around each output
    # texel; D/E/I/J are the 2x2 averages between them (Jimenez14 layout).
    full = _stride2(img)

    def g(dy, dx):
        return _sample_at(full, dy, dx)

    A, B, C = g(-1, -1), g(-1, 0), g(-1, 1)
    F, G, H = g(0, -1), g(0, 0), g(0, 1)
    K, L, M = g(1, -1), g(1, 0), g(1, 1)
    D = (A + B + G + F) * 0.25
    E = (B + C + H + G) * 0.25
    I = (F + G + L + K) * 0.25  # noqa: E741
    J = (G + H + M + L) * 0.25
    c = _karis_avg((D + E + I + J) * 0.125)
    c = c + _karis_avg((A + B + G + F) * 0.03125)
    c = c + _karis_avg((B + C + H + G) * 0.03125)
    c = c + _karis_avg((F + G + L + K) * 0.03125)
    c = c + _karis_avg((G + H + M + L) * 0.03125)
    if use_threshold:
        c = quadratic_threshold(c, threshold, knee)
    return c


def upsample_tent(img, out_hw):
    """3x3 tent-filtered 2x upsample to ``out_hw`` (bilinear + tent)."""
    h, w = out_hw

    def s(dy, dx):
        return _sample_at(img, dy, dx)

    tent = (
        s(-1, -1) + 2 * s(-1, 0) + s(-1, 1)
        + 2 * s(0, -1) + 4 * s(0, 0) + 2 * s(0, 1)
        + s(1, -1) + 2 * s(1, 0) + s(1, 1)
    ) * (1.0 / 16.0)
    # nearest 2x upscale then crop/pad (tent already smoothed the signal;
    # odd-sized mips pad with the edge row/column)
    up = jnp.repeat(jnp.repeat(tent, 2, axis=0), 2, axis=1)
    ph = max(0, h - up.shape[0])
    pw = max(0, w - up.shape[1])
    if ph or pw:
        up = jnp.pad(up, ((0, ph), (0, pw), (0, 0)), mode="edge")
    return up[:h, :w]


def bloom(
    img,
    *,
    num_mips: int = 6,
    threshold: float = 1.0,
    knee: float = 0.5,
    intensity: float = 1.0,
    dirt=None,
    dirt_intensity: float = 0.0,
):
    """Full bloom pass (BloomNode.cpp behavior): threshold+downsample chain,
    tent-upsample accumulation, optional lens dirt at the last upsample.

    Returns the bloom contribution image at input resolution (caller adds it).
    """
    mips = []
    cur = downsample_13tap(img, use_threshold=True, threshold=threshold, knee=knee)
    mips.append(cur)
    for _ in range(1, num_mips):
        if min(cur.shape[0], cur.shape[1]) < 4:
            break
        cur = downsample_13tap(cur)
        mips.append(cur)

    acc = mips[-1]
    for m in reversed(range(len(mips) - 1)):
        acc = mips[m] + upsample_tent(acc, mips[m].shape[:2]) * intensity
    out = upsample_tent(acc, img.shape[:2]) * intensity
    if dirt is not None and dirt_intensity > 0.0:
        out = out + dirt * (dirt_intensity * out)
    return out
