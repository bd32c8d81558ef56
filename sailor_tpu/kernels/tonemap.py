"""Tone mapping operators — TPU-native Tonemapping.shader.

Reference: Content/Shaders/Tonemapping.shader (ACES fit by Stephen Hill via
MJP's Baking Lab; Uncharted2 filmic from filmicworlds.com; LUMINANCE mode
tonemaps only Y of Yxy).  Pure elementwise math -> expressed as jnp so XLA
fuses it into the surrounding frame graph; no Pallas needed for
speed-of-light here (HBM-bandwidth bound, one read + one write).
"""

from __future__ import annotations

import jax.numpy as jnp

from sailor_tpu.core import math3d as m3

# sRGB => XYZ => D65_2_D60 => AP1 => RRT_SAT (column-major in GLSL source,
# transposed here for row-vector einsum).
_ACES_INPUT = jnp.asarray(
    [
        [0.59719, 0.35458, 0.04823],
        [0.07600, 0.90834, 0.01566],
        [0.02840, 0.13383, 0.83777],
    ]
)
# ODT_SAT => XYZ => D60_2_D65 => sRGB
_ACES_OUTPUT = jnp.asarray(
    [
        [1.60475, -0.53108, -0.07367],
        [-0.10208, 1.10813, -0.00605],
        [-0.00327, -0.07276, 1.07602],
    ]
)


def aces(color):
    """ACES RRT+ODT fit; input linear HDR RGB, output [0,1]."""
    c = jnp.einsum("ij,...j->...i", _ACES_INPUT, color)
    a = c * (c + 0.0245786) - 0.000090537
    b = c * (0.983729 * c + 0.4329510) + 0.238081
    c = a / b
    c = jnp.einsum("ij,...j->...i", _ACES_OUTPUT, c)
    return jnp.clip(c, 0.0, 1.0)


def _uncharted2_partial(x):
    A, B, C, D, E, F = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
    return ((x * (A * x + C * B) + D * E) / (x * (A * x + B) + D * F)) - E / F


def uncharted2(color, white_point, exposure):
    curr = _uncharted2_partial(color * exposure)
    white_scale = 1.0 / _uncharted2_partial(jnp.asarray(white_point))
    return curr * white_scale


def reinhard(color):
    return color / (1.0 + color)


def tonemap(
    color,
    avg_luminance,
    *,
    mode: str = "aces",
    luminance_only: bool = False,
    white_point=(4.0, 4.0, 4.0),
    exposure: float = 1.0,
):
    """Full Tonemapping.shader main(): exposure by adapted avg luminance,
    optional luminance-only (Yxy) pathway, then the selected operator.

    ``color``: (..., 3) linear HDR. ``avg_luminance``: scalar adapted
    average luminance (from the eye-adaptation pass).
    """
    key = 9.6 * avg_luminance + 1e-4
    exposed = color / key

    if luminance_only:
        yxy = m3.rgb_to_yxy(color)
        lp = yxy[..., 0] / key
        c = jnp.stack([lp, lp, lp], axis=-1)
    else:
        c = exposed

    if mode == "aces":
        c = aces(c)
    elif mode == "uncharted2":
        c = uncharted2(c, white_point, exposure)
    elif mode == "reinhard":
        c = reinhard(c)
    elif mode != "none":
        raise ValueError(f"unknown tonemap mode: {mode}")

    if luminance_only:
        out = m3.yxy_to_rgb(jnp.stack([c[..., 0], yxy[..., 1], yxy[..., 2]], axis=-1))
    else:
        out = c
    return out
