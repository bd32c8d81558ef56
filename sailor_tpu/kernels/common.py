"""Shared Pallas utilities: interpret-mode fallback, tiling helpers.

The role of the reference's ShaderCompiler/ShaderCache
(Runtime/AssetRegistry/Shader/ShaderCompiler.cpp) is played here by jit
tracing + the XLA compilation cache; `kernel_permutation` mirrors the
define-bitmask permutation system (ShaderCompiler.h:73-110) as hashable
static kwargs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from sailor_tpu import config


def pallas_call(kernel, **kwargs):
    """pl.pallas_call that falls back to interpreter mode off-TPU."""
    if config.interpret_pallas():
        kwargs.setdefault("interpret", True)
        # Mosaic-only options are not supported by the interpreter.
        kwargs.pop("compiler_params", None)
    return pl.pallas_call(kernel, **kwargs)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def pad_to(x, shape, value=0.0):
    """Pad trailing of each axis of x up to `shape` with `value`."""
    pads = [(0, t - s) for s, t in zip(x.shape, shape)]
    if all(p == (0, 0) for p in pads):
        return x
    return jnp.pad(x, pads, constant_values=value)


def pad_axis(x, axis: int, multiple: int, value=0.0):
    """Pad one axis up to a multiple, returning (padded, original_size)."""
    n = x.shape[axis]
    target = round_up(n, multiple)
    if target == n:
        return x, n
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - n)
    return jnp.pad(x, pads, constant_values=value), n


@functools.cache
def kernel_permutation(name: str, **defines):
    """Stable hashable key for a kernel variant (define-permutation analog)."""
    return (name,) + tuple(sorted(defines.items()))


def image_hw(x):
    """(H, W) of an (H, W, C) or (H, W) image array."""
    return x.shape[0], x.shape[1]
