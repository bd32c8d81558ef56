"""IBL precompute — TPU-native EnvironmentNode
(ComputeIrradianceMap.shader, ComputeEnvMap_IBL.shader,
ComputeBrdfLut.shader) and the AmbientLighting path of Standard.shader.

The reference dispatches compute shaders per face/mip; here each bake is a
dense Monte-Carlo estimate vectorized over all output texels at once (one
big (texels, samples) einsum-friendly reduction -> MXU/VPU saturating).
Bakes are cached per SkyParams hash by the frame graph (EnvironmentNode
caching semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from sailor_tpu.core import math3d as m3
from sailor_tpu.kernels import cubemap as cm
from sailor_tpu.kernels.pbr import fresnel_schlick_roughness, geometry_smith_ibl
from sailor_tpu.raytracing import lighting_model as lm


def _hammersley(n: int) -> np.ndarray:
    """Low-discrepancy 2D sequence (host-side constant)."""
    i = np.arange(n)
    bits = i.astype(np.uint32)
    bits = (bits << np.uint32(16)) | (bits >> np.uint32(16))
    bits = ((bits & np.uint32(0x55555555)) << np.uint32(1)) | (
        (bits & np.uint32(0xAAAAAAAA)) >> np.uint32(1)
    )
    bits = ((bits & np.uint32(0x33333333)) << np.uint32(2)) | (
        (bits & np.uint32(0xCCCCCCCC)) >> np.uint32(2)
    )
    bits = ((bits & np.uint32(0x0F0F0F0F)) << np.uint32(4)) | (
        (bits & np.uint32(0xF0F0F0F0)) >> np.uint32(4)
    )
    bits = ((bits & np.uint32(0x00FF00FF)) << np.uint32(8)) | (
        (bits & np.uint32(0xFF00FF00)) >> np.uint32(8)
    )
    return np.stack([i / n, bits.astype(np.float64) * 2.3283064365386963e-10], -1).astype(
        np.float32
    )


@functools.partial(jax.jit, static_argnames=("resolution", "samples"))
def irradiance_map(env_cube, resolution: int = 32, samples: int = 256):
    """Cosine-convolved irradiance cubemap (ComputeIrradianceMap.shader)."""
    d = cm.face_directions(resolution)  # (6, R, R, 3)
    ham = jnp.asarray(_hammersley(samples))

    def one_sample(acc, uv):
        u1, u2 = uv[0], uv[1]
        wi, _ = lm.sample_cosine_hemisphere(d, u1, u2)
        # cosine-weighted sampling of Lambert: E = pi * mean(L)
        return acc + cm.sample_cubemap(env_cube, wi), None

    acc, _ = jax.lax.scan(one_sample, jnp.zeros(d.shape[:-1] + (3,)), ham)
    return acc / samples


@functools.partial(jax.jit, static_argnames=("roughness", "resolution", "samples"))
def prefilter_env_mip(env_cube, roughness: float, resolution: int, samples: int = 64):
    """One GGX-prefiltered specular mip (ComputeEnvMap_IBL.shader)."""
    d = cm.face_directions(resolution)
    ham = jnp.asarray(_hammersley(samples))
    rough = jnp.full(d.shape[:-1], max(roughness, 0.02))

    def one_sample(carry, uv):
        acc, wsum = carry
        h = lm.sample_ggx_half(d, rough, uv[0], uv[1])
        wi = m3.reflect(-d, h)
        w = jnp.maximum(m3.dot(d, wi), 0.0)
        s = cm.sample_cubemap(env_cube, wi)
        return (acc + s * w[..., None], wsum + w), None

    (acc, wsum), _ = jax.lax.scan(
        one_sample, (jnp.zeros(d.shape[:-1] + (3,)), jnp.zeros(d.shape[:-1])), ham
    )
    return acc / jnp.maximum(wsum, 1e-4)[..., None]


def prefiltered_env_mips(env_cube, num_mips: int = 6, samples: int = 64):
    """Full specular mip chain; mip m has roughness m/(num_mips-1)."""
    mips = []
    cube = env_cube
    for m in range(num_mips):
        res = cube.shape[1]
        rough = m / max(num_mips - 1, 1)
        mips.append(prefilter_env_mip(cube, rough, res, samples))
        if m + 1 < num_mips and res > 4:
            cube = cm.downsample_cubemap(cube)
    return mips


@functools.partial(jax.jit, static_argnames=("resolution", "samples"))
def brdf_lut(resolution: int = 256, samples: int = 256):
    """Split-sum BRDF LUT over (cos_v, roughness) (ComputeBrdfLut.shader)."""
    nv = (jnp.arange(resolution) + 0.5) / resolution
    rg = (jnp.arange(resolution) + 0.5) / resolution
    cos_v, rough = jnp.meshgrid(nv, rg, indexing="xy")  # (R, R): x=cosV, y=rough
    v = jnp.stack(
        [jnp.sqrt(1.0 - cos_v**2), jnp.zeros_like(cos_v), cos_v], axis=-1
    )
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), v.shape)
    ham = jnp.asarray(_hammersley(samples))

    def one_sample(carry, uv):
        a, b = carry
        h = lm.sample_ggx_half(n, rough, uv[0], uv[1])
        wi = m3.reflect(-v, h)
        cos_l = wi[..., 2]
        ok = cos_l > 0
        cos_h = jnp.maximum(h[..., 2], 0.0)
        voh = jnp.maximum(m3.dot(v, h), 1e-4)
        g = geometry_smith_ibl(
            jnp.maximum(cos_l, 1e-4)[..., None], cos_v[..., None], rough[..., None]
        )[..., 0]
        g_vis = g * voh / jnp.maximum(cos_h * cos_v, 1e-4)
        fc = (1.0 - voh) ** 5
        a = a + jnp.where(ok, (1.0 - fc) * g_vis, 0.0)
        b = b + jnp.where(ok, fc * g_vis, 0.0)
        return (a, b), None

    (a, b), _ = jax.lax.scan(
        one_sample, (jnp.zeros(cos_v.shape), jnp.zeros(cos_v.shape)), ham
    )
    return jnp.stack([a / samples, b / samples], axis=-1)  # (R, R, 2)


def env_brdf_approx(f0, roughness, cos_v):
    """Analytic split-sum env BRDF (Karis/Lazarov mobile approximation) —
    replaces the 4 LUT gathers of sampling ComputeBrdfLut.shader's table
    with pure ALU (max error ~0.005 vs the Monte-Carlo LUT)."""
    r4 = roughness[..., None] * jnp.asarray([-1.0, -0.0275, -0.572, 0.022]) \
        + jnp.asarray([1.0, 0.0425, 1.04, -0.04])
    a004 = (
        jnp.minimum(r4[..., 0] * r4[..., 0], jnp.exp2(-9.28 * cos_v))
        * r4[..., 0] + r4[..., 1]
    )
    a = -1.04 * a004 + r4[..., 2]
    b = 1.04 * a004 + r4[..., 3]
    return f0 * a[..., None] + b[..., None]


def ambient_ibl_packed(
    albedo, metallic, roughness, ao, normal, view_dir,
    irradiance_cube, spec_stack, irradiance_sh=None,
):
    """Fast AmbientLighting: packed-mip specular (8 gathers) + analytic
    env BRDF (0 gathers) + irradiance as SH9 (0 gathers, preferred) or an
    irradiance cube (4 gathers). The list-of-mips path costs 24
    gathers/pixel — at quarter res that was ~26 ms of the 1080p frame
    (gathers are HBM-latency bound)."""
    cos_lo = jnp.maximum(m3.dot(normal, -view_dir, keepdims=True), 0.0)
    lr = m3.reflect(view_dir, normal)
    f0 = 0.04 + (albedo[..., :3] - 0.04) * metallic[..., None]

    if irradiance_sh is not None:
        irr = sh9_irradiance(irradiance_sh, normal)
    else:
        irr = cm.sample_cubemap(irradiance_cube, normal)
    f = fresnel_schlick_roughness(f0, cos_lo, roughness[..., None])
    kd = (1.0 - f) * (1.0 - metallic[..., None])
    diffuse = kd * albedo[..., :3] * irr

    lod = roughness * (spec_stack.shape[0] - 1)
    spec_irr = cm.sample_cubemap_lod_stack(spec_stack, lr, lod)
    spec = env_brdf_approx(f0, roughness, cos_lo[..., 0]) * spec_irr
    return ao[..., None] * (diffuse + spec)


def ambient_ibl(
    albedo, metallic, roughness, ao, normal, view_dir,
    irradiance_cube, env_mips, lut,
):
    """AmbientLighting (Standard.shader): diffuse irradiance + split-sum
    specular. ``view_dir`` points from camera to surface."""
    cos_lo = jnp.maximum(m3.dot(normal, -view_dir, keepdims=True), 0.0)
    lr = m3.reflect(view_dir, normal)
    f0 = 0.04 + (albedo[..., :3] - 0.04) * metallic[..., None]

    irr = cm.sample_cubemap(irradiance_cube, normal)
    f = fresnel_schlick_roughness(f0, cos_lo, roughness[..., None])
    kd = (1.0 - f) * (1.0 - metallic[..., None])
    diffuse = kd * albedo[..., :3] * irr

    lod = roughness * (len(env_mips) - 1)
    spec_irr = cm.sample_cubemap_lod(env_mips, lr, lod)
    from sailor_tpu.kernels import sampling

    uv = jnp.stack([cos_lo[..., 0], roughness], axis=-1)
    ab = sampling.sample_bilinear(lut, uv)
    spec = (f0 * ab[..., 0:1] + ab[..., 1:2]) * spec_irr
    return ao[..., None] * (diffuse + spec)


def sh9_project(env_cube):
    """Project an environment cube onto 9 RGB spherical harmonics.

    TPU-native replacement for the irradiance cube TEXTURE: diffuse
    irradiance becomes 9 FMAs per pixel (sh9_irradiance) instead of 4
    row gathers — gathers are the dominant ambient cost at 1080p.
    Ramamoorthi & Hanrahan 2001 ("An Efficient Representation for
    Irradiance Environment Maps"); matches the reference's irradiance
    convolution (ComputeIrradiance.shader) in the l<=2 band limit.
    Returns (9, 3) radiance coefficients L_lm.
    """
    res = env_cube.shape[1]
    from sailor_tpu.kernels import cubemap as _cm

    d = _cm.face_directions(res)                       # (6, R, R, 3)
    # cube texel solid angle: dw = 4 / (res^2 * (u^2+v^2+1)^(3/2))
    a = (jnp.arange(res) + 0.5) / res * 2.0 - 1.0
    u, v = jnp.meshgrid(a, a, indexing="xy")
    dw = 4.0 / (res * res) / (u * u + v * v + 1.0) ** 1.5  # (R, R)
    dw = jnp.broadcast_to(dw, (6, res, res))
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    basis = jnp.stack([
        jnp.full_like(x, 0.282095),
        0.488603 * y, 0.488603 * z, 0.488603 * x,
        1.092548 * x * y, 1.092548 * y * z,
        0.315392 * (3.0 * z * z - 1.0),
        1.092548 * x * z,
        0.546274 * (x * x - y * y),
    ])                                                  # (9, 6, R, R)
    w = basis * dw[None]
    return jnp.einsum("kfij,fijc->kc", w, env_cube)


def sh9_irradiance(sh, normal):
    """Analytic irradiance E(n)/pi from SH9 radiance coefficients —
    zero gathers. ``sh`` (9, 3), ``normal`` (..., 3); returns (..., 3)
    already divided by pi (the Lambert BRDF fold the irradiance-map
    sampler also bakes in)."""
    x = normal[..., 0:1]
    y = normal[..., 1:2]
    z = normal[..., 2:3]
    c1, c2, c3, c4, c5 = 0.429043, 0.511664, 0.743125, 0.886227, 0.247708
    e = (
        c4 * sh[0]
        + 2.0 * c2 * (sh[3] * x + sh[1] * y + sh[2] * z)
        + c1 * sh[8] * (x * x - y * y)
        + c3 * sh[6] * z * z - c5 * sh[6]
        + 2.0 * c1 * (sh[4] * x * y + sh[5] * y * z + sh[7] * x * z)
    )
    return jnp.maximum(e, 0.0) / jnp.pi
