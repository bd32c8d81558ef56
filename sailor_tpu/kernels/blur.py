"""Separable Gaussian blurs — TPU-native Blur.shader / HBAO_Blur.shader and
the EVSM shadow blur (Lighting.glsl GaussianBlur / GaussianBlur_Evsm).

The reference carries 12x12 precomputed half-kernel weight tables; here the
weights are generated (normalized half-Gaussian, sigma ~ radius/2) and the
blur is expressed as shifted adds over the whole image so XLA fuses both
passes into bandwidth-bound loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MAX_RADIUS = 12  # reference stepCount


@functools.cache
def half_gaussian_weights(radius: int) -> tuple[float, ...]:
    """Half-kernel weights w[0..radius-1]; w[0] counts once, others twice."""
    radius = max(1, min(int(radius), MAX_RADIUS))
    sigma = max(radius / 2.0, 0.75)
    x = np.arange(radius, dtype=np.float64)
    w = np.exp(-0.5 * (x / sigma) ** 2)
    norm = w[0] + 2.0 * w[1:].sum()
    return tuple((w / norm).tolist())


def _shift(img, d: int, axis: int):
    """Shift with clamp-to-edge along axis (texture clamp sampling).

    Implemented as pad+slice (pure data movement XLA fuses into the
    surrounding loop) — measured much faster than index-take gathers on TPU.
    """
    if d == 0:
        return img
    pads = [(0, 0)] * img.ndim
    pads[axis] = (max(-d, 0), max(d, 0))
    padded = jnp.pad(img, pads, mode="edge")
    start = [0] * img.ndim
    start[axis] = max(d, 0)
    return jax.lax.dynamic_slice(padded, start, img.shape)


def blur_1d(img, radius: int, axis: int):
    """One separable Gaussian pass along ``axis`` (0=vertical, 1=horizontal)."""
    w = half_gaussian_weights(radius)
    out = img * w[0]
    for i in range(1, len(w)):
        out = out + (_shift(img, i, axis) + _shift(img, -i, axis)) * w[i]
    return out


def blur_rows_sharded(img, radius: int, axis_name: str, n_shards: int):
    """Vertical blur_1d for a row-sharded image, bit-matching the
    full-frame pass: exchange `radius` halo rows, blur the extended
    window (its edge-clamped reads land only in the discarded halo),
    crop the center."""
    from sailor_tpu.kernels.postprocess import exchange_row_halo

    r = max(1, min(int(radius), MAX_RADIUS))
    ext = exchange_row_halo(img, r, axis_name, n_shards)
    return blur_1d(ext, radius, 0)[r:-r]


def gaussian_blur(img, radius: int):
    """Full separable blur (vertical then horizontal, Blur.shader usage)."""
    return blur_1d(blur_1d(img, radius, 0), radius, 1)


def evsm_blur(moments, radius_pos: int, radius_neg: int, axis: int):
    """EVSM moment blur with independent radii for the positive (xy) and
    negative (zw) moment pairs (Lighting.glsl GaussianBlur_Evsm).

    ``moments``: (H, W, 4) EVSM moments.
    """
    pos = blur_1d(moments[..., :2], radius_pos, axis)
    neg = blur_1d(moments[..., 2:], radius_neg, axis)
    return jnp.concatenate([pos, neg], axis=-1)
