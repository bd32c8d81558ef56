"""Luminance histogram + eye adaptation — TPU-native ComputeHistogram.shader
and ComputeAverageLuminance.shader (both following Bruneton-style exposure,
https://bruop.github.io/exposure/, like the reference).

The GLSL version builds a 256-bin histogram with workgroup-shared atomics.
On TPU there are no atomics; instead each pixel's bin id is compared against
a broadcast iota of all 256 bins and reduced — a (chunk, 256) compare+sum
that XLA fuses into a single VPU reduction loop (no scatter, no atomics).
Chunking via lax.scan bounds the broadcast intermediate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sailor_tpu import config

NUM_BINS = 256
_EPS = 0.005  # ComputeHistogram.shader EPSILON
_CHUNK = 131072


def _luminance(rgb):
    return (
        rgb[..., 0] * config.RGB_TO_LUM[0]
        + rgb[..., 1] * config.RGB_TO_LUM[1]
        + rgb[..., 2] * config.RGB_TO_LUM[2]
    )


@functools.partial(jax.jit, static_argnames=("min_log_lum", "log_lum_range"))
def luminance_histogram(hdr, min_log_lum: float = -10.0, log_lum_range: float = 12.0):
    """256-bin log-luminance histogram of an (H, W, 3) HDR image.

    Returns float32 (256,) counts. Bin 0 = pixels with luminance < EPS.
    """
    lum = _luminance(hdr).reshape(-1)
    log_lum = jnp.clip(
        (jnp.log2(jnp.maximum(lum, 1e-12)) - min_log_lum) / log_lum_range,
        0.0,
        1.0,
    )
    # Map [0,1] -> [1,255]; bin 0 collects near-black pixels.
    bins = jnp.where(lum < _EPS, 0, (log_lum * 254.0 + 1.0).astype(jnp.int32))
    n = bins.shape[0]
    pad = (-n) % _CHUNK
    if pad:
        bins = jnp.concatenate([bins, jnp.full((pad,), -1, jnp.int32)])
    chunks = bins.reshape(-1, _CHUNK)
    bin_ids = jnp.arange(NUM_BINS, dtype=jnp.int32)

    def step(acc, chunk):
        oh = chunk[:, None] == bin_ids[None, :]
        return acc + jnp.sum(oh, axis=0).astype(jnp.float32), None

    hist, _ = jax.lax.scan(step, jnp.zeros((NUM_BINS,), jnp.float32), chunks)
    return hist


def adapt_average_luminance(
    hist,
    prev_avg_lum,
    num_pixels: float,
    dt,
    *,
    min_log_lum: float = -10.0,
    log_lum_range: float = 12.0,
    tau: float = 1.1,
):
    """Weighted-average luminance with temporal adaptation
    (ComputeAverageLuminance.shader main()).

    ``tau`` controls eye-adaptation speed; timeCoeff = 1 - exp(-dt * tau).
    Returns the new adapted average luminance (scalar).
    """
    weights = jnp.arange(NUM_BINS, dtype=jnp.float32)
    weighted_sum = jnp.sum(hist * weights)
    black = hist[0]
    weighted_log_avg = weighted_sum / jnp.maximum(num_pixels - black, 1.0) - 1.0
    avg_lum = jnp.exp2((weighted_log_avg / 254.0) * log_lum_range + min_log_lum)
    time_coeff = 1.0 - jnp.exp(-jnp.asarray(dt) * tau)
    return prev_avg_lum + (avg_lum - prev_avg_lum) * time_coeff
