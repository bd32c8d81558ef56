"""Cascaded shadow maps (CSM) + EVSM — TPU-native ShadowPrepassNode and the
shadow sampling half of Lighting.glsl (ShadowCalculation_Pcf / _Evsm,
SelectCascade, Chebyshev).

Pipeline per directional light:
1. cascade_matrices: fit NUM_CSM_CASCADES ortho light projections to the
   camera-frustum slices (reference
   ShadowPrepassNode::CalculateLightProjectionForCascades).
2. The caller rasterizes depth-only shadow maps with those matrices (the
   same visibility raster as the main view — rasterize(..) keeping depth).
3. EVSM: cascade 0's depth map is warped to (e^{c1 z}, e^{2 c1 z},
   -e^{-c2 z}, e^{-2 c2 z}) moments and blurred separably (kernels/blur).
4. shadow_factor: per-pixel cascade select + PCF (Poisson disk) or EVSM
   Chebyshev lookup, vectorized over the frame.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from sailor_tpu import config
from sailor_tpu.core import math3d as m3
from sailor_tpu.kernels import sampling

# Poisson disk from the reference's ManualPCF (a standard published set).
_POISSON = np.asarray(
    [
        [-0.94201624, -0.39906216], [0.94558609, -0.76890725],
        [-0.094184101, -0.92938870], [0.34495938, 0.29387760],
        [-0.91588581, 0.45771432], [-0.81544232, -0.87912464],
        [-0.38277543, 0.27676845], [0.97484398, 0.75648379],
        [0.44323325, -0.97511554], [0.53742981, -0.47373420],
        [-0.26496911, -0.41893023], [0.79197514, 0.19090188],
        [-0.24188840, 0.99706507], [-0.81409955, 0.91437590],
        [0.19984126, 0.78641367], [0.14383161, -0.14100790],
    ],
    np.float32,
)


def cascade_splits(z_near: float, z_far: float):
    """Cascade far-plane distances (fractions of zFar from engine constants)."""
    return [z_far * f for f in config.SHADOW_CASCADE_LEVELS]


def frustum_slice_corners(inv_view_proj, z0_ndc, z1_ndc):
    """8 world-space corners of a camera-frustum slice given NDC depth range
    (reverse-Z: near has larger ndc z)."""
    corners = []
    for z in (z0_ndc, z1_ndc):
        for y in (-1.0, 1.0):
            for x in (-1.0, 1.0):
                corners.append([x, y, z, 1.0])
    c = jnp.einsum("ij,kj->ki", inv_view_proj, jnp.asarray(corners))
    return c[:, :3] / c[:, 3:4]


def cascade_matrices(
    view, proj, light_dir, z_near: float, z_far: float, *, extrude: float = 50.0
):
    """Fit an ortho light view-projection per cascade.

    Returns (NUM_CSM_CASCADES, 4, 4) light view-proj matrices (depth [0,1],
    forward Z). Matches CalculateLightProjectionForCascades: slice the view
    frustum at the cascade split depths, bound the slice in light space,
    extrude the near plane toward the light for out-of-frustum casters.
    """
    inv_vp = jnp.linalg.inv(proj @ view)
    splits = [z_near] + cascade_splits(z_near, z_far)
    light_dir = m3.normalize(jnp.asarray(light_dir))
    up = jnp.where(
        jnp.abs(light_dir[1]) > 0.95,
        jnp.asarray([1.0, 0.0, 0.0]),
        jnp.asarray([0.0, 1.0, 0.0]),
    )

    def ndc_z(dist):
        # view-space depth -> reverse-Z NDC via the projection
        p = proj @ jnp.asarray([0.0, 0.0, -dist, 1.0])
        return p[2] / p[3]

    mats = []
    for i in range(config.NUM_CSM_CASCADES):
        corners = frustum_slice_corners(inv_vp, ndc_z(splits[i]), ndc_z(splits[i + 1]))
        center = corners.mean(axis=0)
        lview = m3.look_at(center - light_dir, center, up)
        lc = m3.transform_point(lview, corners)
        lo = lc.min(axis=0)
        hi = lc.max(axis=0)
        # extrude toward the light so casters behind the slice still occlude;
        # reverse-Z so the shadow raster (which keeps max depth) keeps the
        # caster closest to the light.
        lproj = m3.ortho(
            lo[0], hi[0], lo[1], hi[1],
            -(hi[2] + extrude), -lo[2] + extrude,
            reverse_z=True,
        )
        mats.append(lproj @ lview)
    return jnp.stack(mats)


def select_cascade(view, world_pos, z_far: float):
    """Per-pixel cascade index (Lighting.glsl SelectCascade)."""
    vs = m3.transform_point(view, world_pos)
    depth = jnp.abs(vs[..., 2])
    layer = jnp.full(depth.shape, config.NUM_CSM_CASCADES - 1, jnp.int32)
    for i in reversed(range(config.NUM_CSM_CASCADES)):
        layer = jnp.where(
            depth < z_far * config.SHADOW_CASCADE_LEVELS[i], i, layer
        )
    return layer


# ---------------------------------------------------------------------------
# EVSM moments
# ---------------------------------------------------------------------------


def evsm_warp(depth01_rev):
    """Reverse-Z shadow depth [0,1] -> 4 EVSM moments.

    Internally converts to standard depth (0 = near light) so moments grow
    with distance; background (rev 0) maps to the far plane.
    """
    z = 1.0 - depth01_rev
    p = jnp.exp(config.EVSM_C1 * z)
    n = -jnp.exp(-config.EVSM_C2 * z)
    return jnp.stack([p, p * p, n, n * n], axis=-1)


def _linstep(lo, hi, v):
    return jnp.clip((v - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 1.0)


def chebyshev(mean, second, value, min_variance, light_bleed: float):
    d = value - mean
    variance = jnp.maximum(second - mean * mean, min_variance)
    p_max = variance / (variance + d * d)
    p_max = _linstep(light_bleed, 1.0, p_max)
    return jnp.where(d < 0.0, 1.0, p_max)


# ---------------------------------------------------------------------------
# Shadow factor sampling
# ---------------------------------------------------------------------------


def _project_to_shadow(light_mat, world_pos):
    """World -> shadow-map UV + depth. Returns (uv, z01, in_bounds)."""
    p = m3.transform_point_h(light_mat, world_pos)
    ndc = p[..., :3] / jnp.maximum(jnp.abs(p[..., 3:4]), 1e-12) * jnp.sign(
        p[..., 3:4]
    )
    uv = jnp.stack(
        [ndc[..., 0] * 0.5 + 0.5, 0.5 - ndc[..., 1] * 0.5], axis=-1
    )
    z = ndc[..., 2]
    ok = (
        (uv[..., 0] >= 0.0) & (uv[..., 0] <= 1.0)
        & (uv[..., 1] >= 0.0) & (uv[..., 1] <= 1.0)
        & (z >= 0.0) & (z <= 1.0)
    )
    return uv, z, ok


def shadow_pcf(shadow_map, light_mat, world_pos, normal, light_dir,
               radius: float = 2.0, num_taps: int = 8):
    """Poisson-disk PCF shadow factor in [0,1] (1 = lit).

    ``shadow_map``: (S, S) reverse-Z depth with 0 = no occluder. Taps use
    nearest fetches (1 gather each vs 4 for bilinear) — the Poisson spread
    already provides the filtering, matching the reference's visual result
    at 1/4 the gather cost.
    """
    uv, z_rev, ok = _project_to_shadow(light_mat, world_pos)
    z = 1.0 - z_rev  # standard depth: larger = farther from light
    s = shadow_map.shape[0]
    bias = jnp.maximum(
        0.002 * (1.0 - m3.dot(normal, -light_dir)), 0.0005
    )
    texel = radius / s
    occl = jnp.zeros(z.shape)
    for k in range(num_taps):
        off = jnp.asarray(_POISSON[k]) * texel
        d_rev = sampling.sample_nearest(shadow_map, uv + off)
        d = 1.0 - d_rev  # background (rev 0) -> far plane 1.0 -> lit
        occl = occl + jnp.where(z - bias > d, 1.0, 0.0)
    occl = occl / num_taps
    lit = 1.0 - occl
    return jnp.where(ok, lit, 1.0)


def shadow_evsm(evsm_map, light_mat, world_pos, *, light_bleed: float = 0.2):
    """EVSM shadow factor using blurred moments (ShadowCalculation_Evsm)."""
    uv, z_rev, ok = _project_to_shadow(light_mat, world_pos)
    z = 1.0 - z_rev - 0.002  # receiver nudged TOWARD the light: the
    # exp warp amplifies depth bias multiplicatively, so a positive bias
    # self-shadows every lit surface once local variance is small
    # nearest tap: the moments map is already Gaussian-blurred, so the
    # bilinear filter adds 3 extra 16MB-table gathers for no visible gain
    moments = sampling.sample_nearest(evsm_map, uv)  # (..., 4)
    pz = jnp.exp(config.EVSM_C1 * z)
    nz = -jnp.exp(-config.EVSM_C2 * z)
    lit_p = chebyshev(moments[..., 0], moments[..., 1], pz, 0.01, light_bleed)
    lit_n = chebyshev(moments[..., 2], moments[..., 3], nz, 1e-5, light_bleed)
    lit = jnp.minimum(lit_p, lit_n)
    return jnp.where(ok, lit, 1.0)


def _pcf_stacked(maps_flat, s: int, cascade: int, light_mat, world_pos,
                 normal, light_dir, radius: float = 2.0, num_taps: int = 8):
    """PCF against a pre-flattened (C*S*S,) shadow-map stack.

    Indexing a SLICE of a stacked array composes into a 2-D gather on TPU
    (slow path); folding the cascade offset into one flat index keeps every
    tap a fast 1-D gather (measured ~15ms -> ~1ms per tap at 1080p).
    """
    uv, z_rev, ok = _project_to_shadow(light_mat, world_pos)
    z = 1.0 - z_rev
    bias = jnp.maximum(0.002 * (1.0 - m3.dot(normal, -light_dir)), 0.0005)
    texel = radius / s
    base = cascade * s * s
    occl = jnp.zeros(z.shape)
    for k in range(num_taps):
        off = jnp.asarray(_POISSON[k]) * texel
        uvk = uv + off
        x = jnp.clip(jnp.floor(uvk[..., 0] * s).astype(jnp.int32), 0, s - 1)
        y = jnp.clip(jnp.floor(uvk[..., 1] * s).astype(jnp.int32), 0, s - 1)
        d = 1.0 - maps_flat[base + y * s + x]
        occl = occl + jnp.where(z - bias > d, 1.0, 0.0)
    lit = 1.0 - occl / num_taps
    return jnp.where(ok, lit, 1.0)


@functools.partial(jax.jit, static_argnames=())
def csm_shadow_factor_evsm(
    world_pos,            # (H, W, 3)
    normal,               # (H, W, 3) (unused; EVSM needs no slope bias)
    view,
    light_dir,
    light_mats,           # (C, 4, 4)
    evsm_maps,            # (C, S, S, 4) blurred moments, ALL cascades
    z_far: float = 100.0,
    light_bleed: float = 0.2,
):
    """CSM factor with EVSM moments for EVERY cascade: ONE moment gather
    per pixel (flat layer-offset index) + Chebyshev math.

    The reference uses EVSM for cascade 0 and PCF for the rest
    (LightingECS.cpp EVSM cascade, Lighting.glsl ShadowCalculation_Pcf);
    on TPU the 8 Poisson PCF taps are 8 HBM-latency gathers (~28 ms at
    1080p/half-res) while EVSM is 1 gather + ALU — so all cascades get
    pre-blurred moments (prepass-side cost: sequential blur traffic, ~2 ms).
    """
    layer = select_cascade(view, world_pos, z_far)
    s = evsm_maps.shape[1]
    flat = evsm_maps.reshape(-1, 4)

    # Per-pixel cascade select via where-chains: take_along_axis lowers to
    # per-pixel gathers on TPU (~20 ms at half-res 1080p measured); four
    # dense selects are ~free on the VPU.
    uv = z_rev = ok = None
    for c in range(config.NUM_CSM_CASCADES):
        uv_c, z_c, ok_c = _project_to_shadow(light_mats[c], world_pos)
        if uv is None:
            uv, z_rev, ok = uv_c, z_c, ok_c
        else:
            sel = layer == c
            uv = jnp.where(sel[..., None], uv_c, uv)
            z_rev = jnp.where(sel, z_c, z_rev)
            ok = jnp.where(sel, ok_c, ok)

    z = 1.0 - z_rev - 0.002  # receiver toward the light (see shadow_evsm)
    x = jnp.clip(jnp.floor(uv[..., 0] * s).astype(jnp.int32), 0, s - 1)
    y = jnp.clip(jnp.floor(uv[..., 1] * s).astype(jnp.int32), 0, s - 1)
    moments = flat[layer * (s * s) + y * s + x]  # (..., 4) — THE gather
    pz = jnp.exp(config.EVSM_C1 * z)
    nz = -jnp.exp(-config.EVSM_C2 * z)
    lit_p = chebyshev(moments[..., 0], moments[..., 1], pz, 0.01, light_bleed)
    lit_n = chebyshev(moments[..., 2], moments[..., 3], nz, 1e-5, light_bleed)
    lit = jnp.minimum(lit_p, lit_n)
    return jnp.where(ok, lit, 1.0)


@functools.partial(jax.jit, static_argnames=("use_evsm",))
def csm_shadow_factor(
    world_pos,            # (H, W, 3)
    normal,               # (H, W, 3)
    view,
    light_dir,
    light_mats,           # (C, 4, 4)
    shadow_maps,          # (C, S, S) depth [0,1]
    evsm_map=None,        # (S', S', 4) blurred moments for cascade 0
    z_far: float = 100.0,
    use_evsm: bool = True,
):
    """Full CSM factor per pixel: cascade select + per-cascade lookup.

    All cascades are evaluated vectorized and the selected one is gathered
    (branchless; 4 cascades of dense math beat a data-dependent gather of
    texture layers on TPU).
    """
    layer = select_cascade(view, world_pos, z_far)
    s = shadow_maps.shape[-1]
    maps_flat = shadow_maps.reshape(-1)

    # Project through ALL cascade matrices (dense math, cheap) and select
    # the chosen cascade's uv/z per pixel BEFORE sampling — the taps then
    # index the stacked maps with a layer-offset flat index, so the whole
    # CSM factor costs one 8-tap PCF (+ one EVSM lookup) instead of
    # NUM_CASCADES of them (shadow sampling was the #1 frame cost).
    uvs, zs, oks = [], [], []
    for c in range(config.NUM_CSM_CASCADES):
        uv_c, z_c, ok_c = _project_to_shadow(light_mats[c], world_pos)
        uvs.append(uv_c)
        zs.append(z_c)
        oks.append(ok_c)
    uvs = jnp.stack(uvs, axis=-2)   # (..., C, 2)
    zs = jnp.stack(zs, axis=-1)     # (..., C)
    oks = jnp.stack(oks, axis=-1)
    lsel = layer[..., None]
    uv = jnp.take_along_axis(uvs, lsel[..., None], axis=-2)[..., 0, :]
    z_rev = jnp.take_along_axis(zs, lsel, axis=-1)[..., 0]
    ok = jnp.take_along_axis(oks, lsel, axis=-1)[..., 0]

    z = 1.0 - z_rev
    bias = jnp.maximum(0.002 * (1.0 - m3.dot(normal, -light_dir)), 0.0005)
    texel = 2.0 / s
    base = layer * (s * s)
    occl = jnp.zeros(z.shape)
    for k in range(8):
        off = jnp.asarray(_POISSON[k]) * texel
        uvk = uv + off
        x = jnp.clip(jnp.floor(uvk[..., 0] * s).astype(jnp.int32), 0, s - 1)
        y = jnp.clip(jnp.floor(uvk[..., 1] * s).astype(jnp.int32), 0, s - 1)
        d = 1.0 - maps_flat[base + y * s + x]
        occl = occl + jnp.where(z - bias > d, 1.0, 0.0)
    pcf = jnp.where(ok, 1.0 - occl / 8.0, 1.0)

    if use_evsm and evsm_map is not None:
        ev = shadow_evsm(evsm_map, light_mats[0], world_pos)
        return jnp.where(layer == 0, ev, pcf)
    return pcf
