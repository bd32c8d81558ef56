"""Procedural sky: Rayleigh/Mie atmosphere + raymarched clouds + stars +
sun — TPU-native SkyNode (Content/Shaders/Sky.shader, SkyNode.cpp).

The reference renders the sky half-res with nested scattering integrals
(INTEGRAL_STEPS=8 x 128) and raymarched clouds, plus a star pass from the
Yale Bright Star Catalogue.  Here the whole evaluation is a dense function
of view direction, so it vectorizes over every pixel at once:

- single-scattering Rayleigh + Mie with a fixed-step transmittance march
  (lax.scan over steps, all pixels advancing together — no divergence),
- FBM value-noise cloud slab with Henyey-Greenstein phase,
- analytic sun disc, and a star field (assets/stars.py supplies positions/
  colors either from a BSC5 catalog file or a procedural fallback).

Parameters mirror the reference's SkyParams push constants
(Sky.shader Constants: clouds*, phase*, eccentrisy*, fog, sunIntensity,
ambient, scattering*).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from sailor_tpu.core import math3d as m3
from sailor_tpu.core.noise import fbm3

EARTH_R = 6371e3
ATMOSPHERE_H = 100e3
CLOUD_START = 1500.0
CLOUD_END = 4000.0
SUN_ANGULAR_R = 0.00952  # ~0.545 deg in radians

# Rayleigh/Mie coefficients at sea level (per meter)
BETA_R = jnp.asarray([5.802e-6, 13.558e-6, 33.1e-6])
BETA_M = jnp.asarray([3.996e-6, 3.996e-6, 3.996e-6])
H_R = 8500.0
H_M = 1200.0


@struct.dataclass
class SkyParams:
    """Parity with Sky.shader push constants (defaults tuned to match)."""

    sun_direction: jnp.ndarray       # (3,) from sun toward scene
    sun_intensity: jnp.ndarray       # scalar multiplier
    clouds_coverage: jnp.ndarray     # [0,1]
    clouds_density: jnp.ndarray
    clouds_attenuation1: jnp.ndarray
    clouds_attenuation2: jnp.ndarray
    phase_influence1: jnp.ndarray
    phase_influence2: jnp.ndarray
    eccentricity1: jnp.ndarray
    eccentricity2: jnp.ndarray
    fog: jnp.ndarray
    ambient: jnp.ndarray

    @classmethod
    def default(cls, sun_direction=(-0.3, -0.4, -0.5), sun_intensity=20.0,
                clouds_coverage=0.3, clouds_density=0.6):
        # HOST (numpy) leaves on purpose: EnvironmentNode.prepare reads
        # these to build its bake cache key, and ANY device->host pull of
        # a freshly-uploaded buffer can stall forever over the axon
        # tunnel (three rounds of warm-probe hangs traced to exactly
        # this). numpy leaves trace into jit identically; the arrays are
        # a dozen scalars, so per-call re-hashing is noise.
        import numpy as _np
        f = lambda v: _np.float32(v)  # noqa: E731
        sd = _np.asarray(sun_direction, _np.float32)
        return cls(
            sun_direction=sd / _np.linalg.norm(sd),
            sun_intensity=f(sun_intensity),
            clouds_coverage=f(clouds_coverage),
            clouds_density=f(clouds_density),
            clouds_attenuation1=f(0.3),
            clouds_attenuation2=f(0.2),
            phase_influence1=f(0.6),
            phase_influence2=f(0.4),
            eccentricity1=f(0.6),
            eccentricity2=f(-0.2),
            fog=f(0.0),
            ambient=f(0.25),
        )


def phase_rayleigh(cos_t):
    return 3.0 / (16.0 * jnp.pi) * (1.0 + cos_t * cos_t)


def phase_hg(cos_t, g):
    """Henyey-Greenstein (Sky.shader PhaseHenyeyGreenstein)."""
    g2 = g * g
    return (1.0 - g2) / (4.0 * jnp.pi * (1.0 + g2 - 2.0 * g * cos_t) ** 1.5)


_CENTER_OFF = jnp.asarray([0.0, EARTH_R, 0.0])  # scene origin sits on the surface


def _ray_sphere_exit(p_pc, d, radius):
    """Distance to exit a sphere of `radius` around the planet center from
    planet-centered position ``p_pc`` along direction ``d``."""
    b = jnp.sum(p_pc * d, axis=-1)
    c = jnp.sum(p_pc * p_pc, axis=-1) - radius**2
    disc = jnp.maximum(b * b - c, 0.0)
    return -b + jnp.sqrt(disc)


@functools.partial(jax.jit, static_argnames=("steps", "light_steps"))
def atmosphere(d, sun_dir, sun_intensity, *, steps: int = 16, light_steps: int = 4):
    """Single-scattered sky radiance for directions d (..., 3).

    Fixed-step march from the ground to the top of the atmosphere with a
    nested transmittance march toward the sun (the reference's
    INTEGRAL_STEPS / INTEGRAL_STEPS_2 pair, at vectorized-friendly counts).
    """
    d = m3.normalize(d)
    to_sun = -sun_dir
    cos_t = m3.dot(d, to_sun)

    cam_pc = _CENTER_OFF + jnp.asarray([0.0, 1.0, 0.0])
    t_exit = _ray_sphere_exit(cam_pc, d, EARTH_R + ATMOSPHERE_H)
    seg = t_exit / steps

    def optical_to_sun(p):
        p_pc = p + _CENTER_OFF
        te = _ray_sphere_exit(p_pc, jnp.broadcast_to(to_sun, p.shape),
                              EARTH_R + ATMOSPHERE_H)
        ls = te / light_steps
        dr = jnp.zeros(p.shape[:-1])
        dm = jnp.zeros(p.shape[:-1])
        for i in range(light_steps):
            q_pc = p_pc + to_sun * ((i + 0.5) * ls)[..., None]
            hq = m3.length(q_pc) - EARTH_R
            dr = dr + jnp.exp(-jnp.maximum(hq, 0.0) / H_R) * ls
            dm = dm + jnp.exp(-jnp.maximum(hq, 0.0) / H_M) * ls
        return dr, dm

    # UNROLLED march (python loop, steps is static): a lax.scan here writes
    # + re-reads the four (H, W[, 3]) carries from HBM every step (~67 MB x
    # 16 steps of pure traffic); unrolled, XLA fuses the whole march into
    # one elementwise kernel that reads `d` once (measured ~10x).
    acc_r = jnp.zeros(d.shape[:-1] + (3,))
    acc_m = jnp.zeros(d.shape[:-1] + (3,))
    od_r = jnp.zeros(d.shape[:-1])
    od_m = jnp.zeros(d.shape[:-1])
    for i in range(steps):
        t = (i + 0.5) * seg
        p = d * t[..., None]
        h = m3.length(p + _CENTER_OFF) - EARTH_R
        rho_r = jnp.exp(-jnp.maximum(h, 0.0) / H_R)
        rho_m = jnp.exp(-jnp.maximum(h, 0.0) / H_M)
        od_r = od_r + rho_r * seg
        od_m = od_m + rho_m * seg
        sr, sm = optical_to_sun(p)
        tau = (
            BETA_R * (od_r + sr)[..., None]
            + BETA_M * 1.1 * (od_m + sm)[..., None]
        )
        attn = jnp.exp(-tau)
        acc_r = acc_r + attn * (rho_r * seg)[..., None]
        acc_m = acc_m + attn * (rho_m * seg)[..., None]
    color = sun_intensity * (
        acc_r * BETA_R * phase_rayleigh(cos_t)[..., None]
        + acc_m * BETA_M * phase_hg(cos_t, 0.76)[..., None]
    )
    return color, jnp.exp(-(BETA_R * od_r[..., None] + BETA_M * od_m[..., None]))


def clouds(d, params: SkyParams, time=0.0, *, steps: int = 12):
    """Raymarched FBM cloud slab between CLOUD_START and CLOUD_END.

    Returns (cloud_color (..., 3), transmittance (...,)).
    """
    d = m3.normalize(d)
    up = jnp.maximum(d[..., 1], 1e-3)
    t0 = CLOUD_START / up
    t1 = CLOUD_END / up
    seg = (t1 - t0) / steps
    to_sun = -params.sun_direction
    cos_t = m3.dot(d, to_sun)
    phase = (
        params.phase_influence1 * phase_hg(cos_t, params.eccentricity1)
        + params.phase_influence2 * phase_hg(cos_t, params.eccentricity2)
    )

    def density(p, octaves: int = 5):
        q = p * 2.5e-4 + jnp.asarray([time * 0.005, 0.0, 0.0])
        base = fbm3(q, octaves=octaves)
        cov = jnp.clip(base - (1.0 - params.clouds_coverage), 0.0, 1.0)
        return cov * params.clouds_density

    # fori_loop, not unrolled: the two FBM taps per step trace to ~800
    # equations each (8 hashed corners x 5+3 octaves), so 12 unrolled
    # steps put ~19k equations into every graph containing the sky —
    # half the whole 1080p frame's trace/compile time. The loop carries
    # are two half-res planes (~2 MB of HBM traffic per step), noise
    # against the march's transcendental math; the sky node is also
    # change-snapshot cached, so steady-state frames skip it entirely.
    def march(i, carry):
        trans, light = carry
        p = d * (t0 + (i.astype(jnp.float32) + 0.5) * seg)[..., None]
        rho = density(p)
        a = jnp.exp(-rho * seg * params.clouds_attenuation1 * 1e-2)
        # cheap secondary attenuation toward the sun (one tap above);
        # 3 octaves: the sun-shadowing term is low-frequency, and the
        # full 5-octave FBM here was ~35% of the whole cloud pass
        rho_up = density(p + to_sun * 600.0, octaves=3)
        sun_t = jnp.exp(-rho_up * params.clouds_attenuation2 * 10.0)
        light = light + trans * (1.0 - a) * sun_t
        trans = trans * a
        return trans, light

    trans, light = jax.lax.fori_loop(
        0, steps, march,
        (jnp.ones(d.shape[:-1]), jnp.zeros(d.shape[:-1])),
    )
    cloud_col = (light * phase * 15.0 + (1.0 - trans) * params.ambient * 0.5)[
        ..., None
    ] * jnp.asarray([1.0, 1.0, 1.0])
    # horizon fade: clouds vanish at grazing angles
    fade = jnp.clip(d[..., 1] * 5.0, 0.0, 1.0)
    return cloud_col * fade[..., None], 1.0 - (1.0 - trans) * fade


def sun_disc(d, params: SkyParams, transmittance):
    to_sun = -params.sun_direction
    cos_t = m3.dot(m3.normalize(d), to_sun)
    disc = jnp.clip(
        (cos_t - jnp.cos(SUN_ANGULAR_R)) / (1.0 - jnp.cos(SUN_ANGULAR_R)), 0.0, 1.0
    )
    limb = jnp.sqrt(disc)  # soft limb darkening
    return (limb * params.sun_intensity * 50.0)[..., None] * transmittance


def stars(d, star_dirs, star_colors, transmittance, *, sharpness: float = 8000.0):
    """Star field: sum of narrow gaussian splats around catalog directions.

    ``star_dirs`` (S, 3), ``star_colors`` (S, 3) from assets/stars.py
    (BSC5 Yale catalog parser or procedural fallback, SkyNode.h:20-44).
    Evaluated as one (pixels, stars) matmul -> MXU.
    """
    d = m3.normalize(d)
    shape = d.shape[:-1]
    flat = d.reshape(-1, 3)
    cos = flat @ star_dirs.T  # (P, S) — MXU
    w = jnp.exp((cos - 1.0) * sharpness)
    col = w @ star_colors  # (P, 3)
    return col.reshape(shape + (3,)) * transmittance


@functools.partial(
    jax.jit,
    static_argnames=("with_clouds", "with_stars", "with_sun", "cloud_stride"),
)
def sky_radiance(
    d,
    params: SkyParams,
    time=0.0,
    star_dirs=None,
    star_colors=None,
    *,
    with_clouds: bool = True,
    with_stars: bool = False,
    with_sun: bool = True,
    cloud_stride: int = 1,
    cloud_override=None,
):
    """Full sky: atmosphere + clouds + sun + stars, for directions d.

    ``cloud_stride``: march the FBM cloud slab every Nth ray and upsample —
    clouds are the lowest-frequency term and by far the costliest (the
    reference renders the whole sky half-res, SkyNode.cpp; we march clouds
    at a further 1/stride of that). ``cloud_override``: precomputed
    (cloud_color, cloud_transmittance) at d's resolution (the SkyNode
    computes clouds externally so sharded upsampling stays boundary-exact).
    """
    atm, trans = atmosphere(d, params.sun_direction, params.sun_intensity)
    color = atm
    cloud_t = jnp.ones(d.shape[:-1])
    if cloud_override is not None:
        cl, cloud_t = cloud_override
        color = color * cloud_t[..., None] + cl
    elif with_clouds:
        if cloud_stride > 1 and d.ndim == 3:
            from sailor_tpu.kernels import sampling as _samp

            cl_q, ct_q = clouds(d[::cloud_stride, ::cloud_stride], params, time)
            cl = _samp.upsample_bilinear_pow2(cl_q, d.shape[:2])
            cloud_t = _samp.upsample_bilinear_pow2(
                ct_q[..., None], d.shape[:2]
            )[..., 0]
        else:
            cl, cloud_t = clouds(d, params, time)
        color = color * cloud_t[..., None] + cl
    if with_sun:
        # the path tracer bakes the env WITHOUT the disc — its NEE shadow
        # rays already estimate direct sun; the disc would double-count
        color = color + sun_disc(d, params, trans) * cloud_t[..., None]
    if with_stars and star_dirs is not None:
        night = jnp.clip(params.sun_direction[1] * 2.0, 0.0, 1.0)  # sun below horizon
        color = color + stars(d, star_dirs, star_colors, trans) * night * cloud_t[..., None]
    # ground fade below horizon
    below = jnp.clip(-d[..., 1] * 10.0, 0.0, 1.0)[..., None]
    color = color * (1.0 - below) + below * params.ambient * jnp.asarray(
        [0.2, 0.18, 0.16]
    )
    return color
