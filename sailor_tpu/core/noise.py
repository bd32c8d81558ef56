"""Procedural value noise + FBM — counterpart of Content/Shaders/Noise.glsl
and Runtime/Math/Noise.cpp, as dense jnp (hash-based, derivative-free).
Used by the sky's cloud raymarcher."""

from __future__ import annotations

import jax.numpy as jnp


def _hash3(p):
    """Cheap spatial hash -> [0,1). p: (..., 3) float lattice coords.

    Sinless fract-hash (Dave Hoskins style): the sin() variant costs a
    precise transcendental per lattice corner — at 8 corners x 5 octaves x
    2 density taps x 12 march steps the cloud pass burned ~20 ms at 1080p
    in sin() alone. Mul/add/floor hashes run on plain VPU lanes.
    """
    q = p * 0.1031
    q = q - jnp.floor(q)
    d = q[..., 0] * (q[..., 1] + 33.33) + q[..., 1] * (q[..., 2] + 33.33) \
        + q[..., 2] * (q[..., 0] + 33.33)
    q0 = q[..., 0] + d
    q1 = q[..., 1] + d
    q2 = q[..., 2] + d
    h = (q0 + q1) * q2 * 97.73
    return h - jnp.floor(h)


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
