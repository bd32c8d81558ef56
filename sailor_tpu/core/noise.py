"""Procedural value noise + FBM — counterpart of Content/Shaders/Noise.glsl
and Runtime/Math/Noise.cpp, as dense jnp (hash-based, derivative-free).
Used by the sky's cloud raymarcher."""

from __future__ import annotations

import jax.numpy as jnp


def _hash3(p):
    """Spatial hash -> [0,1). p: (..., 3) INTEGER-VALUED lattice coords.

    Integer mix hash, two reasons over the GLSL sin/fract style:
    - speed: sin() is a precise transcendental per lattice corner — at
      8 corners x 5 octaves x 2 density taps x 12 march steps the cloud
      pass burned ~20 ms at 1080p in sin() alone; int ops are plain lanes.
    - determinism: float fract-hashes are chaotic in the last ulp, so the
      same ray evaluated in two fusion contexts (single-device vs sharded
      graph) can produce visibly different clouds. Integer ops have no
      rounding: lattice corners hash bit-identically everywhere.
    """
    i = p.astype(jnp.int32)
    h = (
        i[..., 0] * jnp.int32(374761393)
        + i[..., 1] * jnp.int32(668265263)
        + i[..., 2] * jnp.int32(1103515245)
    )
    h = (h ^ (h >> 13)) * jnp.int32(1274126177)
    h = h ^ (h >> 16)
    return (h & 0x7FFFFF).astype(p.dtype) * (1.0 / float(0x800000))


def value_noise3(p):
    """Trilinear value noise in [0,1). p: (..., 3)."""
    i = jnp.floor(p)
    f = p - i
    u = f * f * (3.0 - 2.0 * f)  # smoothstep fade

    def corner(dx, dy, dz):
        return _hash3(i + jnp.asarray([dx, dy, dz], p.dtype))

    c000 = corner(0, 0, 0)
    c100 = corner(1, 0, 0)
    c010 = corner(0, 1, 0)
    c110 = corner(1, 1, 0)
    c001 = corner(0, 0, 1)
    c101 = corner(1, 0, 1)
    c011 = corner(0, 1, 1)
    c111 = corner(1, 1, 1)
    x00 = c000 + (c100 - c000) * u[..., 0]
    x10 = c010 + (c110 - c010) * u[..., 0]
    x01 = c001 + (c101 - c001) * u[..., 0]
    x11 = c011 + (c111 - c011) * u[..., 0]
    y0 = x00 + (x10 - x00) * u[..., 1]
    y1 = x01 + (x11 - x01) * u[..., 1]
    return y0 + (y1 - y0) * u[..., 2]


def fbm3(p, octaves: int = 5, gain: float = 0.5, lacunarity: float = 2.0):
    """Fractal brownian motion over value noise; output ~[0,1]."""
    amp = 0.5
    acc = jnp.zeros(p.shape[:-1], p.dtype)
    norm = 0.0
    q = p
    for _ in range(octaves):
        acc = acc + amp * value_noise3(q)
        norm += amp
        amp *= gain
        q = q * lacunarity + 19.19
    return acc / norm
