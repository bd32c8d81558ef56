"""Sampling + BSDF evaluation for the path tracer.

Counterpart of Runtime/Raytracing/LightingModel.{h,cpp}: GGX & Beckmann
NDFs, Schlick Fresnel, Smith geometry, cosine/GGX importance sampling, the
power heuristic for MIS, and a thin-film-free glTF metal-rough BRDF.
Everything broadcasts over ray batches; no per-ray branching — lobes are
selected by masks.
"""

from __future__ import annotations

import jax.numpy as jnp

from sailor_tpu.core import math3d as m3
from sailor_tpu.kernels.pbr import fresnel_schlick, geometry_smith_ibl, ndf_ggx


def power_heuristic(pdf_a, pdf_b, beta: float = 2.0):
    """MIS power heuristic w_a = pdf_a^b / (pdf_a^b + pdf_b^b)."""
    a = pdf_a**beta
    return a / jnp.maximum(a + pdf_b**beta, 1e-12)


def tangent_basis(n):
    """Branchless orthonormal basis around normals (Duff et al. 2017)."""
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + s * n[..., 0] ** 2 * a, s * b, -s * n[..., 0]], axis=-1
    )
    bt = jnp.stack([b, s + n[..., 1] ** 2 * a, -n[..., 1]], axis=-1)
    return t, bt


def to_world(n, local):
    t, b = tangent_basis(n)
    return (
        t * local[..., 0:1] + b * local[..., 1:2] + n * local[..., 2:3]
    )


def sample_cosine_hemisphere(n, u1, u2):
    """Cosine-weighted direction about n; returns (dir, pdf)."""
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    local = jnp.stack(
        [r * jnp.cos(phi), r * jnp.sin(phi), jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))],
        axis=-1,
    )
    d = to_world(n, local)
    pdf = jnp.maximum(local[..., 2], 1e-6) / jnp.pi
    return d, pdf


def sample_ggx_half(n, roughness, u1, u2):
    """GGX NDF-importance-sampled half vector about n (LightingModel
    SampleGGX parity: alpha = roughness^2)."""
    alpha = jnp.maximum(roughness * roughness, 1e-4)
    cos_t = jnp.sqrt((1.0 - u2) / (1.0 + (alpha * alpha - 1.0) * u2))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * jnp.pi * u1
    local = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)
    return to_world(n, local)


def ggx_pdf(n, h, wo, roughness):
    """pdf of the reflected direction under GGX half-vector sampling."""
    cos_nh = jnp.maximum(m3.dot(n, h), 0.0)
    d = ndf_ggx(cos_nh, roughness)
    denom = 4.0 * jnp.maximum(jnp.abs(m3.dot(wo, h)), 1e-6)
    return jnp.maximum(d * cos_nh / denom, 1e-8)


def ndf_beckmann(cos_h, roughness):
    """Beckmann microfacet NDF (LightingModel::DistributionBeckmann,
    LightingModel.h:44): D = exp((c2-1)/(a2 c2)) / (pi a2 c2^2)."""
    a2 = jnp.maximum(roughness * roughness, 1e-4) ** 2
    c2 = jnp.maximum(cos_h * cos_h, 1e-6)
    return jnp.exp((c2 - 1.0) / (a2 * c2)) / (jnp.pi * a2 * c2 * c2)


def sample_beckmann_half(n, roughness, u1, u2):
    """Beckmann NDF-importance-sampled half vector about n
    (LightingModel::ImportanceSampleBeckmann, LightingModel.h:51):
    tan^2(theta) = -a^2 ln(1 - u)."""
    a2 = jnp.maximum(roughness * roughness, 1e-4) ** 2
    tan2 = -a2 * jnp.log(jnp.maximum(1.0 - u2, 1e-9))
    cos_t = 1.0 / jnp.sqrt(1.0 + tan2)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * jnp.pi * u1
    local = jnp.stack(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1
    )
    return to_world(n, local)


def beckmann_pdf(n, h, wo, roughness):
    """pdf of the reflected direction under Beckmann half-vector sampling
    (LightingModel::Beckmann_PDF, LightingModel.h:54)."""
    cos_nh = jnp.maximum(m3.dot(n, h), 0.0)
    d = ndf_beckmann(cos_nh, roughness)
    denom = 4.0 * jnp.maximum(jnp.abs(m3.dot(wo, h)), 1e-6)
    return jnp.maximum(d * cos_nh / denom, 1e-8)


def refract(d, n, eta):
    """Snell refraction of incident ``d`` (pointing INTO the surface)
    through normal ``n`` (facing against d). ``eta`` = n_from / n_to.
    Returns (refracted dir, total_internal_reflection mask)
    (LightingModel.cpp Refract parity)."""
    eta = jnp.asarray(eta)
    if eta.ndim == d.ndim - 1:
        eta = eta[..., None]
    cos_i = jnp.maximum(-m3.dot(n, d, keepdims=True), 0.0)
    sin2_t = eta * eta * jnp.maximum(1.0 - cos_i * cos_i, 0.0)
    tir = sin2_t[..., 0] > 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    t = eta * d + (eta * cos_i - cos_t) * n
    return m3.normalize(t), tir


def fresnel_dielectric(cos_i, ior_ratio):
    """Schlick Fresnel for a dielectric boundary with relative IOR
    (n_to / n_from); cos_i = |cos| of the incident angle."""
    f0 = ((ior_ratio - 1.0) / (ior_ratio + 1.0)) ** 2
    return f0 + (1.0 - f0) * jnp.clip(1.0 - cos_i, 0.0, 1.0) ** 5


def hg_phase(cos_t, g):
    """Henyey-Greenstein phase function (LightingModel.h HG phase)."""
    g2 = g * g
    denom = jnp.maximum(1.0 + g2 - 2.0 * g * cos_t, 1e-6)
    return (1.0 - g2) / (4.0 * jnp.pi * denom * jnp.sqrt(denom))


def sample_hg(d, g, u1, u2):
    """Sample a scattering direction about ``d`` from the HG phase.
    ``g`` in (-1, 1); g ~ 0 falls back to uniform-sphere sampling."""
    g_safe = jnp.where(jnp.abs(g) < 1e-3, 1e-3, g)
    sq = (1.0 - g_safe * g_safe) / (1.0 + g_safe * (2.0 * u1 - 1.0))
    cos_hg = (1.0 + g_safe * g_safe - sq * sq) / (2.0 * g_safe)
    cos_t = jnp.where(jnp.abs(g) < 1e-3, 1.0 - 2.0 * u1, cos_hg)
    cos_t = jnp.clip(cos_t, -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * jnp.pi * u2
    local = jnp.stack(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1
    )
    return to_world(m3.normalize(d), local)


# Below this roughness the reference switches the specular lobe from GGX
# to Beckmann sampling (LightingModel.cpp:314 bSpecularBeckman).
BECKMANN_ROUGHNESS = 0.2


def sample_spec_half(n, roughness, u1, u2):
    """Specular half-vector with the reference's NDF switch
    (LightingModel.cpp:314-325): Beckmann importance sampling when
    roughness < 0.2, GGX otherwise. Masked lane select, no branching."""
    h_g = sample_ggx_half(n, roughness, u1, u2)
    h_b = sample_beckmann_half(n, roughness, u1, u2)
    beck = (roughness < BECKMANN_ROUGHNESS)[..., None]
    return jnp.where(beck, h_b, h_g)


def eval_brdf(n, wo, wi, albedo, metallic, roughness):
    """glTF metal-rough BRDF (diffuse + GGX specular), matching the
    realtime path (Standard.shader CalculateLighting) so path-traced and
    rasterized images converge to the same response.

    Returns (f, pdf_cos, pdf_spec): BRDF value and the pdfs of the two
    sampling lobes for MIS. pdf_spec follows the reference's NDF switch
    (Beckmann_PDF below roughness 0.2, GGX_PDF above;
    LightingModel.cpp:353-355).
    """
    h = m3.normalize(wo + wi)
    cos_i = jnp.maximum(m3.dot(n, wi, keepdims=True), 0.0)
    cos_o = jnp.maximum(m3.dot(n, wo, keepdims=True), 0.0)
    cos_h = jnp.maximum(m3.dot(n, h, keepdims=True), 0.0)

    f0 = 0.04 + (albedo - 0.04) * metallic[..., None]
    f = fresnel_schlick(f0, jnp.maximum(m3.dot(h, wo, keepdims=True), 0.0))
    d = ndf_ggx(cos_h, roughness[..., None])
    g = geometry_smith_ibl(cos_i, cos_o, roughness[..., None])
    spec = f * d * g / jnp.maximum(4.0 * cos_i * cos_o, 1e-6)
    kd = (1.0 - f) * (1.0 - metallic[..., None])
    diff = kd * albedo / jnp.pi

    pdf_cos = jnp.maximum(cos_i[..., 0], 1e-6) / jnp.pi
    pdf_spec = jnp.where(
        roughness < BECKMANN_ROUGHNESS,
        beckmann_pdf(n, h, wo, roughness),
        ggx_pdf(n, h, wo, roughness),
    )
    return diff + spec, pdf_cos, pdf_spec
