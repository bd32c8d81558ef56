"""Cook-Torrance PBR shading + tiled Forward+ resolve — TPU-native
Standard.shader (fragment main + CalculateLighting + AmbientLighting) and
Lighting.glsl BRDF terms.

The per-fragment light loop (Standard.shader:422-435) becomes a lax.scan
over the per-tile top-K light slots produced by light_culling: step k
gathers light k's parameters for every tile at once (a (Ty,Tx) gather),
broadcasts over the 16x16 pixels of each tile, and accumulates radiance.
All arithmetic is vectorized over the full frame -> VPU-saturating, no
divergence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from sailor_tpu import config
from sailor_tpu.core import math3d as m3
from sailor_tpu.kernels.lights import DIRECTIONAL, POINT, SPOT, Lights

TILE = config.LIGHTS_CULLING_TILE_SIZE
_EPS = 1e-5
_F_DIELECTRIC = 0.04


# ---------------------------------------------------------------------------
# BRDF terms (Lighting.glsl parity)
# ---------------------------------------------------------------------------


def ndf_ggx(cos_lh, roughness):
    """GGX/Trowbridge-Reitz NDF with Disney alpha = roughness^2."""
    alpha = roughness * roughness
    alpha_sq = alpha * alpha
    denom = (cos_lh * cos_lh) * (alpha_sq - 1.0) + 1.0
    return alpha_sq / (jnp.pi * denom * denom)


def _g1(cos_theta, k):
    return cos_theta / (cos_theta * (1.0 - k) + k)


def geometry_smith(cos_li, cos_lo, roughness):
    """Schlick-GGX Smith geometry, analytic-light k remap ((r+1)^2/8)."""
    r = roughness + 1.0
    k = (r * r) / 8.0
    return _g1(cos_li, k) * _g1(cos_lo, k)


def geometry_smith_ibl(cos_li, cos_lo, roughness):
    """IBL k remap (r^2/2)."""
    k = (roughness * roughness) / 2.0
    return _g1(cos_li, k) * _g1(cos_lo, k)


def fresnel_schlick(f0, cos_theta):
    return f0 + (1.0 - f0) * jnp.clip(1.0 - cos_theta, 0.0, 1.0) ** 5


def fresnel_schlick_roughness(f0, cos_theta, roughness):
    return f0 + (jnp.maximum(1.0 - roughness, f0) - f0) * jnp.clip(
        1.0 - cos_theta, 0.0, 1.0
    ) ** 5


# ---------------------------------------------------------------------------
# G-buffer
# ---------------------------------------------------------------------------


@struct.dataclass
class GBuffer:
    """Screen-space surface attributes produced by the rasterizer.

    The reference shades forward (attributes live in registers between VS and
    FS); on TPU the raster pass materializes them — they stay in HBM and the
    shading pass streams them once.
    """

    world_position: jnp.ndarray  # (H, W, 3)
    normal: jnp.ndarray          # (H, W, 3) normalized
    albedo: jnp.ndarray          # (H, W, 4) linear rgba
    metallic: jnp.ndarray        # (H, W)
    roughness: jnp.ndarray       # (H, W)
    ao: jnp.ndarray              # (H, W)
    emissive: jnp.ndarray        # (H, W, 3)
    coverage: jnp.ndarray        # (H, W) 1 where geometry was rasterized


# ---------------------------------------------------------------------------
# Direct lighting for one light over a pixel field
# ---------------------------------------------------------------------------


def direct_lighting(
    l_type, l_pos, l_dir, l_intensity, l_atten, l_cutoff, l_radius,
    albedo, metallic, roughness, f0,
    normal, world_pos, to_camera, cos_lo, shadow,
):
    """Radiance from one light (broadcast shapes) — CalculateLighting parity.

    ``to_camera`` = Lo = normalized (camera - point). ``shadow`` in [0,1].
    Directional lights use l_dir as the constant incident direction; point
    and spot lights use it only for the cone term.
    """
    to_light = l_pos - world_pos
    dist = jnp.sqrt(jnp.maximum(jnp.sum(to_light * to_light, axis=-1, keepdims=True), 1e-12))
    point_dir = to_light / dist

    is_dir = (l_type == DIRECTIONAL)[..., None]
    is_point = (l_type == POINT)[..., None]
    is_spot = (l_type == SPOT)[..., None]

    # NOTE (reference parity): Standard.shader computes Li = -light.direction
    # for ALL light types — point/spot attenuation is positional but the
    # incident direction used in the BRDF is the light's direction field.
    # We use the physically-correct positional direction for point/spot
    # (renders the same scenes correctly; differs only for the reference's
    # odd point-light BRDF direction).
    li = jnp.where(is_dir, -l_dir, point_dir)

    # Distance attenuation (constant/linear/quadratic) + range falloff.
    att = 1.0 / (
        l_atten[..., 0:1]
        + l_atten[..., 1:2] * dist
        + l_atten[..., 2:3] * dist * dist
    )
    range_fall = 1.0 - jnp.clip(dist / jnp.maximum(l_radius[..., None], 1e-6), 0.0, 1.0) ** 2
    point_falloff = att * range_fall

    # Spot cone: smooth between cos outer (cutoff.y) and cos inner (cutoff.x).
    cos_theta = jnp.sum(point_dir * (-l_dir), axis=-1, keepdims=True)
    denom = jnp.maximum(l_cutoff[..., 0:1] - l_cutoff[..., 1:2], 1e-6)
    cone = jnp.clip((cos_theta - l_cutoff[..., 1:2]) / denom, 0.0, 1.0)
    spot_falloff = att * cone

    falloff = jnp.where(is_dir, 1.0, jnp.where(is_point, point_falloff, spot_falloff))

    # Cook-Torrance
    lh = m3.normalize(li + to_camera)
    cos_li = jnp.maximum(jnp.sum(normal * li, axis=-1, keepdims=True), 0.0)
    cos_lh = jnp.maximum(jnp.sum(normal * lh, axis=-1, keepdims=True), 0.0)
    f = fresnel_schlick(f0, jnp.maximum(jnp.sum(lh * to_camera, axis=-1, keepdims=True), 0.0))
    d = ndf_ggx(cos_lh, roughness[..., None])
    g = geometry_smith(cos_li, cos_lo, roughness[..., None])

    kd = (1.0 - f) * (1.0 - metallic[..., None])
    diffuse = kd * albedo[..., :3]
    specular = (f * d * g) / jnp.maximum(_EPS, 4.0 * cos_li * cos_lo)

    return shadow * (diffuse + specular) * l_intensity * cos_li * falloff


def ambient_constant(albedo, metallic, roughness, ao, normal, cos_lo, ambient_color):
    """Flat ambient fallback when no IBL is bound: hemisphere-ish term."""
    f0 = jnp.where(
        metallic[..., None] > 0.0,
        _F_DIELECTRIC + (albedo[..., :3] - _F_DIELECTRIC) * metallic[..., None],
        jnp.full_like(albedo[..., :3], _F_DIELECTRIC),
    )
    f = fresnel_schlick_roughness(f0, cos_lo, roughness[..., None])
    kd = (1.0 - f) * (1.0 - metallic[..., None])
    return ao[..., None] * (kd * albedo[..., :3] + f * 0.2) * jnp.asarray(ambient_color)


# ---------------------------------------------------------------------------
# Tiled Forward+ resolve
# ---------------------------------------------------------------------------


def _to_tiles(img, ty, tx):
    c = img.shape[2:]
    return img.reshape(ty, TILE, tx, TILE, *c).transpose(0, 2, 1, 3, *range(4, 4 + len(c)))


def _from_tiles(tiles):
    ty, tx = tiles.shape[0], tiles.shape[1]
    c = tiles.shape[4:]
    return tiles.transpose(0, 2, 1, 3, *range(4, 4 + len(c))).reshape(
        ty * TILE, tx * TILE, *c
    )


@functools.partial(jax.jit, static_argnames=("ambient",))
def shade_forward_plus(
    gbuffer: GBuffer,
    lights: Lights,
    tile_light_indices,  # (Ty, Tx, K) int32, -1 padded
    camera_position,     # (3,)
    shadow_factors=None,  # optional (H, W) or (H, W, Lk) shadow term for dir lights
    ibl_ambient=None,     # optional precomputed (H, W, 3) ambient (IBL pass)
    ambient: tuple = (0.03, 0.03, 0.03),
):
    """Shade a frame: per-tile top-K light loop + ambient + emissive.

    Returns (H, W, 3) linear HDR radiance.
    """
    H, W = gbuffer.normal.shape[:2]
    ty, tx = H // TILE, W // TILE
    K = tile_light_indices.shape[-1]

    to_cam = m3.normalize(camera_position - gbuffer.world_position)
    cos_lo = jnp.maximum(m3.dot(gbuffer.normal, to_cam, keepdims=True), 0.0)
    f0 = _F_DIELECTRIC + (gbuffer.albedo[..., :3] - _F_DIELECTRIC) * gbuffer.metallic[..., None]

    # Tile-major layout: (Ty, Tx, TILE, TILE, C)
    t_norm = _to_tiles(gbuffer.normal, ty, tx)
    t_wpos = _to_tiles(gbuffer.world_position, ty, tx)
    t_alb = _to_tiles(gbuffer.albedo, ty, tx)
    t_met = _to_tiles(gbuffer.metallic[..., None], ty, tx)[..., 0]
    t_rough = _to_tiles(gbuffer.roughness[..., None], ty, tx)[..., 0]
    t_tocam = _to_tiles(to_cam, ty, tx)
    t_coslo = _to_tiles(cos_lo, ty, tx)
    t_f0 = _to_tiles(f0, ty, tx)
    t_shadow = (
        _to_tiles(shadow_factors[..., None], ty, tx)[..., 0]
        if shadow_factors is not None
        else None
    )

    # Pre-gather every per-tile light parameter with ONE packed gather
    # (separate field gathers cost ~4.5 ms each on TPU at (Ty*Tx*K) rows;
    # gather cost is row count, not width — same packing as pbr_pallas).
    safe_all = jnp.maximum(tile_light_indices, 0)     # (Ty, Tx, K)
    valid_all = tile_light_indices >= 0
    packed = jnp.concatenate(
        [
            lights.type.astype(jnp.float32)[:, None],
            lights.position, lights.direction, lights.intensity,
            lights.attenuation, lights.cutoff, lights.radius[:, None],
        ],
        axis=1,
    )  # (L, 16)
    g = packed[safe_all]                               # (Ty, Tx, K, 16)
    lp = {
        "type": g[..., 0].astype(jnp.int32),
        "position": g[..., 1:4],
        "direction": g[..., 4:7],
        "intensity": g[..., 7:10],
        "attenuation": g[..., 10:13],
        "cutoff": g[..., 13:15],
        "radius": g[..., 15],
    }

    # Light-chunked scan: CL lights per step share one read of the tile
    # attribute arrays (bandwidth-bound otherwise — 128 single-light steps
    # re-reading the G-buffer measured ~50x slower than 8 chunked steps).
    CL = min(16, K)
    assert K % CL == 0
    # pixel attribute arrays gain a broadcast lights axis: (Ty,Tx,1,16,16,C)
    pa = {
        "alb": t_alb[:, :, None], "met": t_met[:, :, None],
        "rough": t_rough[:, :, None], "f0": t_f0[:, :, None],
        "norm": t_norm[:, :, None], "wpos": t_wpos[:, :, None],
        "tocam": t_tocam[:, :, None], "coslo": t_coslo[:, :, None],
    }
    t_shadow_b = t_shadow[:, :, None] if t_shadow is not None else None

    def body(acc, c0):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, c0, CL, axis=2)  # noqa: E731
        valid = sl(valid_all[..., None, None, None])  # (Ty,Tx,CL,1,1,1)
        l_type = sl(lp["type"][..., None, None, None])

        def g(field):
            return sl(lp[field][..., None, None, :])  # (Ty,Tx,CL,1,1,C)

        shadow = 1.0
        if t_shadow_b is not None:
            # CSM shadow applies to directional lights only (reference
            # CalculateLighting applies its shadow term for type==0).
            shadow = jnp.where(l_type == DIRECTIONAL, t_shadow_b[..., None], 1.0)
        contrib = direct_lighting(
            l_type[..., 0],
            g("position"), g("direction"), g("intensity"),
            g("attenuation"), g("cutoff"),
            sl(lp["radius"][..., None, None]),
            pa["alb"], pa["met"], pa["rough"], pa["f0"],
            pa["norm"], pa["wpos"], pa["tocam"], pa["coslo"],
            shadow,
        )
        contrib = jnp.sum(jnp.where(valid, contrib, 0.0), axis=2)  # (Ty,Tx,16,16,3)
        return acc + contrib, None

    acc0 = jnp.zeros_like(t_norm)
    acc, _ = jax.lax.scan(body, acc0, jnp.arange(0, K, CL))
    color = _from_tiles(acc)

    if ibl_ambient is not None:
        amb = ibl_ambient
    else:
        amb = ambient_constant(
            gbuffer.albedo, gbuffer.metallic, gbuffer.roughness, gbuffer.ao,
            gbuffer.normal, cos_lo, ambient,
        )
    color = color + amb + gbuffer.emissive
    return color * gbuffer.coverage[..., None]
