"""Luminance histogram + eye adaptation — TPU-native ComputeHistogram.shader
and ComputeAverageLuminance.shader (both following Bruneton-style exposure,
https://bruop.github.io/exposure/, like the reference).

The GLSL version builds a 256-bin histogram with workgroup-shared atomics.
On TPU there are no atomics; the Pallas kernel instead compares each pixel's
bin id against a broadcast iota and accumulates per-block partial histograms
across the sequential grid — the accumulation rides VMEM, and only the final
256-bin vector hits HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sailor_tpu import config
from sailor_tpu.kernels import common

NUM_BINS = 256
_EPS = 0.005  # ComputeHistogram.shader EPSILON


def _luminance(rgb):
    return (
        rgb[..., 0] * config.RGB_TO_LUM[0]
        + rgb[..., 1] * config.RGB_TO_LUM[1]
        + rgb[..., 2] * config.RGB_TO_LUM[2]
    )


def _hist_kernel(lum_ref, out_ref, *, min_log_lum, inv_log_lum_range):
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    lum = lum_ref[...]  # (TH, TW)
    log_lum = jnp.clip(
        (jnp.log2(jnp.maximum(lum, 1e-12)) - min_log_lum) * inv_log_lum_range,
        0.0,
        1.0,
    )
    # Map [0,1] -> [1,255]; bin 0 collects near-black pixels.
    bins = jnp.where(lum < _EPS, 0, (log_lum * 254.0 + 1.0).astype(jnp.int32))
    flat = bins.reshape(-1, 1)  # (P, 1)
    bin_ids = jax.lax.broadcasted_iota(jnp.int32, (1, NUM_BINS), 1)
    onehot = (flat == bin_ids).astype(jnp.float32)  # (P, 256)
    counts = jnp.sum(onehot, axis=0, keepdims=True)  # (1, 256)

    @pl.when(step == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += counts


@functools.partial(jax.jit, static_argnames=("min_log_lum", "log_lum_range"))
def luminance_histogram(hdr, min_log_lum: float = -10.0, log_lum_range: float = 12.0):
    """256-bin log-luminance histogram of an (H, W, 3) HDR image.

    Returns float32 (256,) counts. Bin 0 = pixels with luminance < EPS.
    """
    lum = _luminance(hdr)
    # Pad to block multiples with -1 (lands in bin 0; subtracted below).
    TH, TW = 8, 512
    lum, h = common.pad_axis(lum, 0, TH, value=0.0)
    lum, w = common.pad_axis(lum, 1, TW, value=0.0)
    H, W = lum.shape
    n_pad = H * W - h * w

    kern = functools.partial(
        _hist_kernel,
        min_log_lum=min_log_lum,
        inv_log_lum_range=1.0 / log_lum_range,
    )
    hist = common.pallas_call(
        kern,
        grid=(H // TH, W // TW),
        in_specs=[
            pl.BlockSpec((TH, TW), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NUM_BINS), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, NUM_BINS), jnp.float32),
    )(lum)[0]
    # Padding pixels counted in bin 0 — remove them.
    return hist.at[0].add(-float(n_pad))


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
