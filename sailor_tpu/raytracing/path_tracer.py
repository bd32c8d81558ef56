"""Batched megakernel path tracer.

Counterpart of Runtime/Raytracing/PathTracer.cpp: the reference recurses
per pixel on CPU workers (32x32 tiles, Raytrace() with GGX importance
sampling + MIS + shadow rays).  The TPU redesign traces *all* pixels of a
sample in one batch: a fixed-depth bounce loop where every iteration does
one BVH closest-hit pass, one shadow any-hit pass, vectorized GGX/cosine
lobe sampling with MIS between the two, and Russian-roulette-free masked
termination (static shapes; dead rays idle).

Samples-per-pixel accumulate through a lax.scan so the whole render is one
jit; rays/sec scales with how many lanes stay live.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from sailor_tpu.core import math3d as m3
from sailor_tpu.raytracing import bvh8 as bvh_mod
from sailor_tpu.raytracing import lighting_model as lm
from sailor_tpu.raytracing import sweep as sweep_mod


@struct.dataclass
class TraceScene:
    bvh: bvh_mod.BVH8
    # Per-vertex attributes, indexed by ORIGINAL triangle id (BVH8 reports originals):
    normals: jnp.ndarray      # (T, 3, 3) per-corner normals
    uvs: jnp.ndarray          # (T, 3, 2)
    # Material table + per-triangle id:
    tri_mat: jnp.ndarray      # (T,) int32
    mat_albedo: jnp.ndarray   # (M, 3)
    mat_metallic: jnp.ndarray  # (M,)
    mat_roughness: jnp.ndarray  # (M,)
    mat_emissive: jnp.ndarray  # (M, 3)
    # Transmission / volumes (PathTracer.cpp:622-900, LightingModel.h BTDF;
    # glTF KHR_materials_transmission / _ior / _volume):
    mat_transmission: jnp.ndarray  # (M,) [0,1] transmit probability
    mat_ior: jnp.ndarray           # (M,) index of refraction
    mat_atten_color: jnp.ndarray   # (M, 3) Beer-Lambert tint at atten_dist
    mat_atten_dist: jnp.ndarray    # (M,) distance for atten_color (<=0: none)
    mat_scatter: jnp.ndarray       # (M,) volume scatter coeff sigma_s
    mat_hg_g: jnp.ndarray          # (M,) HG phase anisotropy
    # Textures at hit points (MaterialUtils.h CombinedSampler2D analog —
    # the same bindless-style stack as the raster MaterialTable):
    mat_albedo_tex: jnp.ndarray    # (M,) int32 layer into textures, -1 = none
    textures: jnp.ndarray          # (N, S, S, 4)
    # Lighting environment:
    sun_direction: jnp.ndarray  # (3,) pointing from sun toward scene
    sun_intensity: jnp.ndarray  # (3,)
    sky_zenith: jnp.ndarray     # (3,)
    sky_horizon: jnp.ndarray    # (3,)
    # Static flags (set at build): scenes without transmissive materials /
    # textures skip those code paths entirely at trace time.
    has_volumes: bool = struct.field(pytree_node=False, default=False)
    has_textures: bool = struct.field(pytree_node=False, default=False)
    # Optional MXU sweep intersector (sweep.py): replaces BVH8 traversal
    # when set (moderate scenes; see scene_from_mesh tracer=).
    sweep: sweep_mod.SweepScene | None = None
    # ALL per-hit shading attributes packed into one (T, 48) row table so
    # _shade_hit is a single R-row gather (gather cost scales with row
    # count, not row width; the unpacked form was ~14 gathers = ~25 ms per
    # bounce at 262k rays). Material columns are pre-expanded per triangle.
    # Layout: 0:9 corner normals | 9:12 albedo | 12 metallic |
    # 13 roughness | 14:17 emissive | 17 transmission | 18 ior |
    # 19:22 atten_color | 22 atten_dist | 23 scatter | 24 hg_g |
    # 25:31 corner uvs | 31 albedo_tex layer (float, -1 = none) |
    # 32:35 face tangent (uv-aligned) | 35 bitangent handedness sign |
    # 36 normal_tex | 37 orm_tex | 38 emissive_tex | 39:48 pad
    tri_pack: jnp.ndarray | None = None
    # Baked sun-less lat-long environment map (TraceSky analog,
    # PathTracer.cpp:577-620): the engine's raymarched SkyNode radiance
    # evaluated once per scene on a (He, We) grid instead of per miss ray —
    # a miss costs one bilinear fetch, and NEE keeps owning direct sun.
    env_map: jnp.ndarray | None = None
    # Per-map static flags so untextured scenes trace zero texture code:
    has_normal_maps: bool = struct.field(pytree_node=False, default=False)
    has_orm_maps: bool = struct.field(pytree_node=False, default=False)
    has_emissive_maps: bool = struct.field(pytree_node=False, default=False)
    # Packed mip pyramid for ray-cone texture LOD at hit points (the
    # tracer-side consumer of TextureImporter.cpp:247's chains; cone
    # width tracked per ray, per-tri texel density in tri_pack col 39):
    tex_lod: jnp.ndarray | None = None    # (N * TPL, 4) flat mips
    mip_sizes: tuple = struct.field(pytree_node=False, default=())
    # Combined per-material quad rows (assets/materials.py
    # build_quad_stack_blocks): ONE row carries the 2x2 bilinear footprint
    # of EVERY map the material has (albedo[+normal+orm+emissive]), so a
    # full trilinear material fetch at a hit point is 2 row gathers
    # instead of up to 32. Group id rides in tri_pack col 40.
    tex_quad: jnp.ndarray | None = None   # (G * TPL, C)
    quad_blocks: tuple = struct.field(pytree_node=False, default=())
    # ((name, off, nch), ...) in row order

    @property
    def num_triangles(self) -> int:
        return self.tri_mat.shape[0]


def _isect(scene: "TraceScene", origin, direction, t_max=None, *,
           any_hit: bool = False, active=None):
    """Closest/any-hit dispatch: MXU sweep when built, else BVH8.

    The sweep's per-(sub-block, cluster) entry table is a scalar-prefetch
    array living in SMEM (~1 MB budget on v5e, measured round 2); when a
    (ray count x cluster count) combination would blow it, fall back to
    the BVH8 megakernel — shapes are static at trace time so the choice
    costs nothing."""
    if scene.sweep is not None and sweep_mod.scalar_bytes(
        scene.sweep, origin.shape[0]
    ) <= sweep_mod.SMEM_BUDGET:
        import os

        # A/B knob (campaign): ray sort pays off only when sub-blocks get
        # selective — e.g. large sample_batch pools (see sweep.intersect)
        sort = os.environ.get("SAILOR_SWEEP_SORT", "0") == "1"
        return sweep_mod.intersect(
            scene.sweep, origin, direction, t_max,
            any_hit=any_hit, active=active, sort_rays=sort,
        )
    return bvh_mod.intersect(
        scene.bvh, origin, direction, t_max, any_hit=any_hit, active=active,
    )


def sky_radiance(scene: TraceScene, direction, include_sun: bool = True):
    """Environment radiance for miss rays (reference TraceSky,
    PathTracer.cpp:577-620).

    With ``scene.env_map`` set (scene_from_mesh ``sky=SkyParams``), this
    bilinearly samples the baked sun-less lat-long map of the engine's
    raymarched SkyNode — raster and traced images see the same sky.
    Otherwise a cheap analytic gradient stands in (benchmarks default to
    it: an env fetch costs 4 row gathers per miss ray).

    ``include_sun=False`` for post-NEE bounce rays: the sun's direct
    contribution is already accounted for by the shadow-ray estimator, so
    counting the disc again would double-count (and throw fireflies when a
    low-pdf specular bounce hits it).
    """
    if scene.env_map is not None:
        he, we = scene.env_map.shape[:2]
        flat = scene.env_map.reshape(he * we, 3)
        d = direction
        # lat-long: u from atan2(z, x), v from polar angle off +Y — must
        # match the bake grid in scene_from_mesh
        u = (jnp.arctan2(d[..., 2], d[..., 0]) + jnp.pi) / (2.0 * jnp.pi)
        v = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0)) / jnp.pi
        fy = jnp.clip(v * he - 0.5, 0.0, he - 1.0)
        fx = u * we - 0.5
        y0 = jnp.floor(fy).astype(jnp.int32)
        x0f = jnp.floor(fx)
        x0 = x0f.astype(jnp.int32) % we          # wrap in azimuth
        y1 = jnp.minimum(y0 + 1, he - 1)
        x1 = (x0 + 1) % we
        wy = (fy - y0.astype(jnp.float32))[..., None]
        wx = (fx - x0f)[..., None]
        c00 = flat[y0 * we + x0]
        c01 = flat[y0 * we + x1]
        c10 = flat[y1 * we + x0]
        c11 = flat[y1 * we + x1]
        base = (
            (c00 * (1 - wx) + c01 * wx) * (1 - wy)
            + (c10 * (1 - wx) + c11 * wx) * wy
        )
    else:
        t = jnp.clip(direction[..., 1] * 0.5 + 0.5, 0.0, 1.0)[..., None]
        base = scene.sky_horizon * (1.0 - t) + scene.sky_zenith * t
    if include_sun:
        cos_sun = m3.dot(direction, -scene.sun_direction, keepdims=True)
        base = base + jnp.where(
            cos_sun > 0.9995, scene.sun_intensity * 50.0, 0.0
        )
    return base


@functools.lru_cache(maxsize=8)
def _swizzle_maps(height: int, width: int, ray_block: int, sub: int):
    """Static pixel->slot permutation that makes every sweep ray block a
    spatially TIGHT supertile instead of a thin scanline strip.

    Scanline order hands the sweep intersector (sweep.py) ray blocks that
    span the full image width (e.g. 512x4 px for RAY_BLOCK=2048) — each
    block's frustum crosses most clusters, so the per-(sub-block, cluster)
    liveness masks stay dense (measured 0.62 vs 0.04 per-ray density).
    This order packs each SUB-ray sub-block into a ~square pixel subtile
    (16x16 for SUB=256) and each ray block into a supertile of those
    (32x64 px for RAY_BLOCK=2048), so sub-block masks approach per-ray
    selectivity — and it costs nothing per dispatch: rays are GENERATED
    in swizzled order and the image is unswizzled once per render.
    Bounce-ray origins inherit the locality (they are the hit points of a
    compact pixel tile).

    Returns (perm, inv, r_sw): ``perm[slot] = clamped scanline pixel id``
    (the ray each slot traces), ``inv[pixel] = slot`` (for the final
    unswizzle gather), ``r_sw >= H*W`` the padded ray count.
    """
    import numpy as np

    nsub = max(ray_block // sub, 1)
    m = sub.bit_length() - 1
    th = 1 << (m // 2)            # subtile height (16 for SUB=256)
    tw = sub // th
    k = nsub.bit_length() - 1
    sh = 1 << (k // 2)            # subtiles per supertile, vertical
    sw = nsub // sh
    H2 = -(-height // (th * sh)) * (th * sh)
    W2 = -(-width // (tw * sw)) * (tw * sw)
    Y, X = np.meshgrid(np.arange(H2), np.arange(W2), indexing="ij")
    sty, stx = Y // (th * sh), X // (tw * sw)
    suy, sux = (Y % (th * sh)) // th, (X % (tw * sw)) // tw
    iy, ix = Y % th, X % tw
    n_stx = W2 // (tw * sw)
    slot = (
        (((sty * n_stx + stx) * sh + suy) * sw + sux) * th + iy
    ) * tw + ix
    pix = np.minimum(Y, height - 1) * width + np.minimum(X, width - 1)
    perm = np.empty(H2 * W2, np.int32)
    perm[slot.reshape(-1)] = pix.reshape(-1)
    inv = np.empty(height * width, np.int32)
    real = ((Y < height) & (X < width)).reshape(-1)
    inv[pix.reshape(-1)[real]] = slot.reshape(-1)[real]
    return perm, inv, H2 * W2


def camera_rays_flat(camera_pos, view, proj, width, height, px, py,
                     u_jitter, v_jitter):
    """Primary rays through explicit (possibly swizzled) pixel coords:
    ``px``/``py`` are static per-ray pixel indices, jitters are per-ray."""
    inv_vp = jnp.linalg.inv(proj @ view)
    xs = (px.astype(jnp.float32) + u_jitter) / width
    ys = (py.astype(jnp.float32) + v_jitter) / height
    ndc = jnp.stack(
        [xs * 2.0 - 1.0, 1.0 - 2.0 * ys,
         jnp.full_like(xs, 0.5), jnp.ones_like(xs)],
        axis=-1,
    )
    p = m3.homogenize(ndc @ inv_vp.T)
    d = m3.normalize(p - camera_pos)
    o = jnp.broadcast_to(camera_pos, d.shape)
    return o, d


def camera_rays(camera_pos, view, proj, width, height, u_jitter, v_jitter):
    """Primary rays through jittered pixel positions."""
    inv_vp = jnp.linalg.inv(proj @ view)
    ys = (jnp.arange(height, dtype=jnp.float32)[:, None] + v_jitter) / height
    xs = (jnp.arange(width, dtype=jnp.float32)[None, :] + u_jitter) / width
    ndc = jnp.stack(
        [
            xs * 2.0 - 1.0 * jnp.ones((height, width)),
            1.0 - 2.0 * ys * jnp.ones((height, width)),
            jnp.full((height, width), 0.5),
            jnp.ones((height, width)),
        ],
        axis=-1,
    )
    p = m3.homogenize(jnp.einsum("ij,hwj->hwi", inv_vp, ndc))
    d = m3.normalize(p - camera_pos)
    o = jnp.broadcast_to(camera_pos, d.shape)
    return o.reshape(-1, 3), d.reshape(-1, 3)


def _shade_hit(scene, res, origin, direction, cone_width=None):
    """Gather hit-point attributes: position, shading normal, material.

    Returns (pos, n_faceforward, entering, mat dict). ``entering`` is True
    where the ray crosses from outside into the surface (interpolated
    normal against the ray) — drives the refraction eta and medium state.

    ``cone_width``: optional (R,) ray-cone footprint at the hit (world
    units) — selects the texture mip level via the per-triangle texel
    density packed at col 39 (isotropic ray-cone LOD; the tracer analog
    of the raster path's screen-derivative LOD).
    """
    tri = jnp.maximum(res["tri"], 0)
    u = res["u"][:, None]
    v = res["v"][:, None]
    w0 = 1.0 - u - v
    row = scene.tri_pack[tri]            # ONE (R, 48) gather — see layout
    n = row[:, 0:3] * w0 + row[:, 3:6] * u + row[:, 6:9] * v
    n = m3.normalize(n)
    entering = m3.dot(n, direction) < 0.0
    # Face-forward: flip shading normal against the incoming ray.
    n = jnp.where(entering[:, None], n, -n)
    pos = origin + direction * res["t"][:, None]
    albedo = row[:, 9:12]
    metallic = row[:, 12]
    roughness = row[:, 13]
    emissive = row[:, 14:17]
    if scene.has_textures:
        from sailor_tpu.assets.materials import (
            _sample_texture_stack, sample_quad_blocks, sample_texture_lod,
        )

        uvp = (
            row[:, 25:27] * w0 + row[:, 27:29] * u + row[:, 29:31] * v
        )
        use_lod = (cone_width is not None and scene.tex_lod is not None
                   and len(scene.mip_sizes) > 1)
        if use_lod:
            s0 = scene.mip_sizes[0]
            cosr = jnp.maximum(jnp.abs(m3.dot(n, direction)), 0.08)
            lod = (jnp.log2(s0 * jnp.maximum(cone_width, 1e-8) / cosr)
                   + row[:, 39])

            def sample_tex(layer, uvp):
                return sample_texture_lod(
                    scene.tex_lod, scene.textures.shape[0],
                    scene.mip_sizes, layer, uvp, lod,
                )
        else:
            def sample_tex(layer, uvp):
                return _sample_texture_stack(scene.textures, layer, uvp)

        if use_lod and scene.tex_quad is not None:
            # combined quad stack: 2 row gathers fetch EVERY map
            group = row[:, 40].astype(jnp.int32)
            blocks = sample_quad_blocks(
                scene.tex_quad, scene.mip_sizes,
                tuple((off, nch) for _, off, nch in scene.quad_blocks),
                group, uvp, lod,
                wrapc=jnp.zeros(group.shape, bool),
                nearest=jnp.zeros(group.shape, bool),
            )
            bmap = {nm: b for (nm, _, _), b in zip(scene.quad_blocks, blocks)}
            if "albedo" in bmap:
                albedo = albedo * bmap["albedo"][..., :3]
            if "normal" in bmap:
                n_ts = bmap["normal"] * 2.0 - 1.0
                nl = row[:, 36].astype(jnp.int32)
                t = row[:, 32:35]
                t = m3.normalize(t - n * m3.dot(n, t, keepdims=True))
                b = jnp.cross(n, t) * row[:, 35:36]
                n_mapped = m3.normalize(
                    t * n_ts[:, 0:1] + b * n_ts[:, 1:2] + n * n_ts[:, 2:3]
                )
                n = jnp.where((nl >= 0)[:, None], n_mapped, n)
            if "orm" in bmap:
                roughness = roughness * bmap["orm"][..., 1]
                metallic = metallic * bmap["orm"][..., 2]
            if "emissive" in bmap:
                emissive = emissive * bmap["emissive"]
            return pos, n, entering, {
                "albedo": albedo,
                "metallic": metallic,
                "roughness": roughness,
                "emissive": emissive,
                "transmission": row[:, 17],
                "ior": row[:, 18],
                "atten_color": row[:, 19:22],
                "atten_dist": row[:, 22],
                "scatter": row[:, 23],
                "hg_g": row[:, 24],
            }

        layer = row[:, 31].astype(jnp.int32)
        tex = sample_tex(layer, uvp)
        albedo = albedo * jnp.where((layer >= 0)[:, None], tex[..., :3], 1.0)
        if scene.has_normal_maps:
            # Tangent-space normal map about the face-forward shading
            # normal (MaterialUtils.h:23-42 decode): Gram-Schmidt the
            # packed uv-aligned face tangent against the interpolated n,
            # bitangent from the packed handedness sign.
            nl = row[:, 36].astype(jnp.int32)
            ntex = sample_tex(nl, uvp)
            n_ts = ntex[..., :3] * 2.0 - 1.0
            t = row[:, 32:35]
            t = m3.normalize(t - n * m3.dot(n, t, keepdims=True))
            b = jnp.cross(n, t) * row[:, 35:36]
            n_mapped = m3.normalize(
                t * n_ts[:, 0:1] + b * n_ts[:, 1:2] + n * n_ts[:, 2:3]
            )
            n = jnp.where((nl >= 0)[:, None], n_mapped, n)
        if scene.has_orm_maps:
            # glTF metallicRoughness: G = roughness, B = metallic,
            # multiplied into the factors (MaterialUtils.h:44-60). The
            # R/occlusion channel is ignored: path tracing computes
            # indirect visibility exactly, baked AO would double-darken.
            ol = row[:, 37].astype(jnp.int32)
            otex = sample_tex(ol, uvp)
            has_o = ol >= 0
            roughness = jnp.where(has_o, roughness * otex[..., 1], roughness)
            metallic = jnp.where(has_o, metallic * otex[..., 2], metallic)
        if scene.has_emissive_maps:
            el = row[:, 38].astype(jnp.int32)
            etex = sample_tex(el, uvp)
            emissive = jnp.where(
                (el >= 0)[:, None], emissive * etex[..., :3], emissive
            )
    return pos, n, entering, {
        "albedo": albedo,
        "metallic": metallic,
        "roughness": roughness,
        "emissive": emissive,
        "transmission": row[:, 17],
        "ior": row[:, 18],
        "atten_color": row[:, 19:22],
        "atten_dist": row[:, 22],
        "scatter": row[:, 23],
        "hg_g": row[:, 24],
    }


def _morton10(x):
    """Spread 10 bits of x so they occupy every 3rd bit (Morton encode)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _bounce_sort_key(scene, origin, direction, live):
    """Wavefront coherence key: Morton cell of the ray origin (5 bits per
    axis over the scene bounds) + quantized direction octant bits, dead
    rays last. Origins of bounce rays ARE the previous hit points, so
    sorting by them lands rays that need the same sweep clusters in the
    same sub-blocks — without paying an extra slab pass for the exact
    first-cluster key (sweep.intersect's sort_rays measured (fc, dir16)
    densities 0.24 vs 0.42 fc-only; origin-morton+dir approximates fc)."""
    lo = jnp.min(scene.sweep.cl_min, axis=0)
    hi = jnp.max(scene.sweep.cl_max, axis=0)
    g = jnp.clip(
        ((origin - lo) / jnp.maximum(hi - lo, 1e-6) * 32.0).astype(jnp.int32),
        0, 31,
    )
    cell = (_morton10(g[:, 0]) << 2) | (_morton10(g[:, 1]) << 1) \
        | _morton10(g[:, 2])
    qd = jnp.clip(((direction + 1.0) * 2.0).astype(jnp.int32), 0, 3)
    dq = (qd[:, 0] * 4 + qd[:, 1]) * 4 + qd[:, 2]
    key = (cell << 6) | dq
    return jnp.where(live, key, jnp.int32(2 ** 30))


def _trace_one_sample(scene, origin, direction, keys, max_bounces, ray_count,
                      sort_bounces: bool = False, cone_spread=None):
    """Trace one radiance sample for a fixed set of primary rays.

    Shared by render() (jittered camera rays per spp) and trace_rays()
    (caller-provided rays, e.g. the sharded multi-chip path).

    With ``scene.has_volumes``, the kernel adds the reference tracer's
    transmission path (PathTracer.cpp:622-900): Fresnel-weighted
    refraction through dielectric boundaries, Beer-Lambert attenuation
    while inside a medium, and Henyey-Greenstein single scattering for
    media with a scatter coefficient — all as masked lanes of the same
    megakernel (no divergence).

    ``sort_bounces``: between bounces, permute the WHOLE wavefront state
    by a spatial+directional coherence key (dead rays tail-packed). ONE
    sort then serves both the next bounce's closest-hit and its shadow
    any-hit — unlike sweep.intersect's internal sort_rays which pays per
    dispatch. Radiance rides permuted and is restored once at the end.

    ``cone_spread``: per-pixel angular footprint (scalar or (R,)) for
    isotropic ray-cone texture LOD — the cone width at a hit is the total
    path distance times this spread (Ray Cones, constant-spread variant).
    """
    r = origin.shape[0]
    radiance = jnp.zeros((r, 3))
    throughput = jnp.ones((r, 3))
    live = jnp.ones((r,), bool)
    use_cone = (cone_spread is not None and scene.tex_lod is not None
                and len(scene.mip_sizes) > 1)
    if use_cone:
        dist = jnp.zeros((r,))
    sort_bounces = sort_bounces and scene.sweep is not None
    if sort_bounces:
        orig_idx = jnp.arange(r, dtype=jnp.int32)
    volumes = scene.has_volumes
    if volumes:
        med_absorb = jnp.zeros((r, 3))   # Beer-Lambert sigma_a (per channel)
        med_scatter = jnp.zeros((r,))    # sigma_s
        med_g = jnp.zeros((r,))          # HG anisotropy
        in_medium = jnp.zeros((r,), bool)

    for bounce in range(max_bounces):
        res = _isect(scene, origin, direction,
                     active=None if bounce == 0 else live)
        ray_count = ray_count + jnp.sum(live).astype(jnp.float32)
        hit = live & res["hit"]

        scattered = jnp.zeros((r,), bool)
        if volumes:
            # volume events along the segment [origin, hit point]
            k_s0 = keys[5 * bounce + 3]
            k_s1 = keys[5 * bounce + 4]
            u_s = jax.random.uniform(k_s0, (r,))
            t_hit = jnp.where(res["hit"], res["t"], 1e9)
            t_sc = -jnp.log(jnp.maximum(1.0 - u_s, 1e-9)) / jnp.maximum(
                med_scatter, 1e-9
            )
            scattered = live & in_medium & (med_scatter > 1e-6) & (t_sc < t_hit)
            seg = jnp.where(scattered, t_sc, jnp.minimum(t_hit, 1e9))
            att = jnp.exp(-med_absorb * jnp.where(
                (live & in_medium)[:, None], seg[:, None], 0.0
            ))
            throughput = throughput * att
            # HG scatter: new direction about the current one, stay inside
            su1 = jax.random.uniform(k_s1, (r,))
            su2 = u_s  # reuse (independent enough for single scattering)
            d_sc = lm.sample_hg(direction, med_g, su1, su2)
            sc_pos = origin + direction * t_sc[:, None]
            origin = jnp.where(scattered[:, None], sc_pos, origin)
            direction = jnp.where(scattered[:, None], d_sc, direction)
            hit = hit & ~scattered

        miss = live & ~res["hit"] & ~scattered
        radiance = radiance + jnp.where(
            miss[:, None],
            throughput * sky_radiance(scene, direction, include_sun=(bounce == 0)),
            0.0,
        )
        live = live & (res["hit"] | scattered)

        cone_w = None
        if use_cone:
            hit_dist = dist + jnp.clip(res["t"], 0.0, 1e8)
            cone_w = hit_dist * cone_spread

        pos, n, entering, mat = _shade_hit(scene, res, origin, direction,
                                           cone_width=cone_w)
        wo = -direction

        radiance = radiance + jnp.where(
            hit[:, None], throughput * mat["emissive"], 0.0
        )

        # next-event estimation: sun shadow ray — only for surface hits
        # whose surface faces the sun (half the lanes retire immediately)
        wi_sun = -scene.sun_direction
        cos_sun = jnp.maximum(m3.dot(n, wi_sun, keepdims=True), 0.0)
        shadow_o = pos + n * 1e-3
        facing = hit & (cos_sun[:, 0] > 0.0)
        sres = _isect(
            scene, shadow_o, jnp.broadcast_to(wi_sun, shadow_o.shape),
            any_hit=True, active=facing,
        )
        ray_count = ray_count + jnp.sum(facing).astype(jnp.float32)
        lit = facing & ~sres["hit"]
        f_sun, _, _ = lm.eval_brdf(
            n, wo, jnp.broadcast_to(wi_sun, n.shape),
            mat["albedo"], mat["metallic"], mat["roughness"],
        )
        nee = throughput * f_sun * scene.sun_intensity * cos_sun
        if volumes:
            # a transmissive surface reflects only the non-transmitted
            # fraction — glass must not pick up a diffuse sun term
            nee = nee * (1.0 - mat["transmission"])[:, None]
        radiance = radiance + jnp.where(lit[:, None], nee, 0.0)

        # BRDF-sampled bounce (one-sample MIS between cosine + GGX lobes)
        k0 = keys[5 * bounce]
        k1 = keys[5 * bounce + 1]
        k2 = keys[5 * bounce + 2]
        u1 = jax.random.uniform(k0, (r,))
        u2 = jax.random.uniform(k1, (r,))
        u_lobe = jax.random.uniform(k2, (r,))
        p_spec = 0.2 + 0.6 * mat["metallic"]
        pick_spec = u_lobe < p_spec
        d_cos, _ = lm.sample_cosine_hemisphere(n, u1, u2)
        h = lm.sample_spec_half(n, mat["roughness"], u1, u2)
        d_spec = m3.reflect(direction, h)
        wi = m3.normalize(jnp.where(pick_spec[:, None], d_spec, d_cos))
        above = m3.dot(n, wi) > 1e-4

        f, pdf_cos, pdf_ggx = lm.eval_brdf(
            n, wo, wi, mat["albedo"], mat["metallic"], mat["roughness"]
        )
        pdf = pdf_cos * (1.0 - p_spec) + pdf_ggx * p_spec
        cos_i = jnp.maximum(m3.dot(n, wi), 0.0)
        weight = jnp.where(
            (pdf > 1e-8) & above, cos_i / jnp.maximum(pdf, 1e-8), 0.0
        )
        new_tp = throughput * f * weight[:, None]
        surf_live = hit & above & (jnp.max(new_tp, axis=-1) > 1e-4)
        new_origin = pos + n * 1e-3
        new_dir = wi

        if volumes:
            # transmission lobe: with probability transmission x (1 - F)
            # the ray refracts through the boundary instead of reflecting
            # (Fresnel-weighted; TIR reflects). Beer-Lambert state updates
            # on the crossing. Reference: PathTracer.cpp refraction path.
            ior = jnp.maximum(mat["ior"], 1.0001)
            eta = jnp.where(entering, 1.0 / ior, ior)
            cos_in = jnp.maximum(-m3.dot(n, direction), 0.0)
            fres = lm.fresnel_dielectric(cos_in, jnp.where(
                entering, ior, 1.0 / ior
            ))
            d_refr, tir = lm.refract(direction, n, eta)
            # P(transmit) = (1 - F) * transmission; the remaining
            # probability mass reflects/diffuses through the BRDF lobes
            transmit = (
                hit
                & (mat["transmission"] > 0.0)
                & (u_lobe >= 1.0 - (1.0 - fres) * mat["transmission"])
            )
            # refracted continuation (TIR keeps reflecting via d_spec path)
            goes_through = transmit & ~tir
            tint = jnp.where(
                goes_through[:, None], mat["albedo"], jnp.ones(3)
            )
            new_dir = jnp.where(
                transmit[:, None],
                jnp.where(tir[:, None], m3.reflect(direction, n), d_refr),
                new_dir,
            )
            new_origin = jnp.where(
                goes_through[:, None], pos - n * 1e-3, new_origin
            )
            # transmitted rays keep full throughput x tint (lobe already
            # chosen by probability — no pdf weight needed for a delta lobe)
            new_tp = jnp.where(transmit[:, None], throughput * tint, new_tp)
            surf_live = jnp.where(transmit, hit, surf_live)

            # medium bookkeeping: entering a volume loads its coefficients,
            # exiting clears them (nested volumes unsupported, as reference)
            enters_medium = goes_through & entering
            exits_medium = goes_through & ~entering
            sigma_a = -jnp.log(
                jnp.clip(mat["atten_color"], 1e-4, 1.0)
            ) / jnp.maximum(mat["atten_dist"], 1e-4)[:, None]
            sigma_a = jnp.where(
                (mat["atten_dist"] > 0.0)[:, None], sigma_a, 0.0
            )
            med_absorb = jnp.where(
                enters_medium[:, None], sigma_a,
                jnp.where(exits_medium[:, None], 0.0, med_absorb),
            )
            med_scatter = jnp.where(
                enters_medium, mat["scatter"],
                jnp.where(exits_medium, 0.0, med_scatter),
            )
            med_g = jnp.where(
                enters_medium, mat["hg_g"],
                jnp.where(exits_medium, 0.0, med_g),
            )
            in_medium = jnp.where(
                enters_medium, True, jnp.where(exits_medium, False, in_medium)
            )

        live = jnp.where(scattered, live, surf_live)
        origin = jnp.where(scattered[:, None], origin, new_origin)
        direction = jnp.where(scattered[:, None], direction, new_dir)
        throughput = jnp.where(scattered[:, None], throughput, new_tp)
        if use_cone:
            # accumulate path length: surface hits advance to the hit,
            # volume scatters advance by the sampled free-flight distance
            dist = jnp.where(hit, hit_dist, dist)
            if volumes:
                dist = jnp.where(scattered, dist + t_sc, dist)

        if sort_bounces and bounce < max_bounces - 1:
            # permute the WHOLE wavefront for the next bounce: one sort
            # serves its closest-hit AND shadow dispatch; dead rays pack
            # to the tail where whole sub-blocks go dark in the sweep.
            # State is PACKED into one (R, C) matrix first: TPU gathers
            # are row-count bound, so one wide permute costs what one
            # narrow column did — the previous 10-14 per-column gathers
            # were ~80% of the sort's cost.
            skey = _bounce_sort_key(scene, origin, direction, live)
            iota = jnp.arange(r, dtype=jnp.int32)
            _, perm = jax.lax.sort_key_val(skey, iota)
            cols = [origin, direction, throughput, radiance,
                    live.astype(jnp.float32)[:, None],
                    jax.lax.bitcast_convert_type(
                        orig_idx, jnp.float32)[:, None]]
            if volumes:
                cols += [med_absorb, med_scatter[:, None], med_g[:, None],
                         in_medium.astype(jnp.float32)[:, None]]
            if use_cone:
                cols.append(dist[:, None])
            packed_state = jnp.concatenate(cols, axis=1)[perm]
            origin = packed_state[:, 0:3]
            direction = packed_state[:, 3:6]
            throughput = packed_state[:, 6:9]
            radiance = packed_state[:, 9:12]
            live = packed_state[:, 12] > 0.5
            orig_idx = jax.lax.bitcast_convert_type(
                packed_state[:, 13], jnp.int32
            )
            o = 14
            if volumes:
                med_absorb = packed_state[:, o:o + 3]
                med_scatter = packed_state[:, o + 3]
                med_g = packed_state[:, o + 4]
                in_medium = packed_state[:, o + 5] > 0.5
                o += 6
            if use_cone:
                dist = packed_state[:, o]

        # SCHEDULING BARRIER: the next bounce's closest-hit pass is data-
        # independent of this bounce's shadow pass, and XLA schedules such
        # sibling intersects' prologues together — measured 3x slower per
        # intersect (65 vs 22 ms at 262k rays on v5e) than a serial chain.
        # Tying the ray state to the shadow result forces serial order.
        origin, direction, _ = jax.lax.optimization_barrier(
            (origin, direction, sres["hit"])
        )

    if sort_bounces:
        # undo the composed permutation once: sorting (orig_idx, iota)
        # yields, per original slot, the current row holding its ray
        # (a sort + gather beats a row scatter on TPU)
        _, src = jax.lax.sort_key_val(
            orig_idx, jnp.arange(r, dtype=jnp.int32)
        )
        radiance = radiance[src]
    return radiance, ray_count


@functools.partial(
    jax.jit, static_argnames=("spp", "max_bounces", "sort_bounces")
)
def trace_rays(scene, origin, direction, *, spp: int = 4,
               max_bounces: int = 3, key=None, sort_bounces: bool = False,
               cone_spread=None):
    """Trace given primary rays; average spp independent samples.

    ``cone_spread``: optional per-ray angular footprint enabling ray-cone
    texture LOD (see _trace_one_sample). Returns ((R, 3) radiance,
    rays traced)."""
    if key is None:
        key = jax.random.PRNGKey(0)

    def one(carry, k):
        acc, rays = carry
        keys = jax.random.split(k, 5 * max_bounces)
        rad, rays = _trace_one_sample(
            scene, origin, direction, keys, max_bounces, rays,
            sort_bounces=sort_bounces, cone_spread=cone_spread,
        )
        return (acc + rad, rays), None

    (acc, rays), _ = jax.lax.scan(
        one, (jnp.zeros(origin.shape[:1] + (3,)), jnp.asarray(0.0)),
        jax.random.split(key, spp),
    )
    return acc / spp, rays


def render(scene, camera_pos, view, proj, *, width, height, spp=16,
           max_bounces=4, key=None, sample_batch=1, sort_bounces=False,
           swizzle=None):
    """Render (H, W, 3) linear HDR. Also returns rays-traced count.

    ``swizzle`` (default: on when the sweep intersector is active,
    ``SAILOR_TRACE_SWIZZLE=0`` to disable) must be resolved OUTSIDE the
    jitted body: jit caches on static args, so an env read inside the
    trace would make A/B flips silently reuse the other variant."""
    if swizzle is None:
        import os as _os

        swizzle = (
            scene.sweep is not None
            and _os.environ.get("SAILOR_TRACE_SWIZZLE", "1") == "1"
        )
    return _render(scene, camera_pos, view, proj, width=width, height=height,
                   spp=spp, max_bounces=max_bounces, key=key,
                   sample_batch=sample_batch, sort_bounces=sort_bounces,
                   swizzle=bool(swizzle))


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "max_bounces", "sample_batch",
                     "sort_bounces", "swizzle"),
)
def _render(
    scene: TraceScene,
    camera_pos,
    view,
    proj,
    *,
    width: int,
    height: int,
    spp: int = 16,
    max_bounces: int = 4,
    key=None,
    sample_batch: int = 1,
    sort_bounces: bool = False,
    swizzle: bool = False,
):
    """Render (H, W, 3) linear HDR. Also returns rays-traced count.

    ``sample_batch`` traces that many spp per megakernel dispatch
    (rays from the batch are concatenated sample-major): spp/sb scan
    steps instead of spp, amortizing per-dispatch fixed cost; block
    coherence within each sample is preserved.  Default 1 keeps the
    historical sample/RNG stream (and the goldens)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    if spp % sample_batch != 0:
        raise ValueError(f"spp {spp} not divisible by sample_batch "
                         f"{sample_batch}")
    import numpy as np

    # Tile-swizzled ray order (see _swizzle_maps): every sweep ray block is
    # a compact pixel supertile, not a scanline strip. Static permutation —
    # the only runtime cost is one unswizzle gather at the very end.
    if swizzle:
        perm, inv, r = _swizzle_maps(
            height, width, sweep_mod.RAY_BLOCK, sweep_mod.SUB
        )
    else:
        r = width * height
        perm = np.arange(r, dtype=np.int32)
        inv = None
    px = jnp.asarray(perm % width)
    py = jnp.asarray(perm // width)

    # Per-pixel blue-noise camera jitter with a per-sample R2 rotation
    # (PathTracer.cpp:1004-1060 BlueNoiseData analog): neighbor pixels get
    # maximally different jitters, so aliasing noise is high-frequency and
    # spp converges visibly faster than the previous shared-scalar jitter.
    from sailor_tpu.raytracing import bluenoise

    bn_u, bn_v = bluenoise.pixel_jitter(height, width)
    bn_u = jnp.asarray(bn_u.reshape(-1)[perm])
    bn_v = jnp.asarray(bn_v.reshape(-1)[perm])

    # Pixel angular footprint for ray-cone texture LOD: the vertical FOV
    # spans ``height`` pixels, proj[1,1] = 1/tan(fov_y/2).
    cone_spread = None
    if scene.tex_lod is not None and len(scene.mip_sizes) > 1:
        cone_spread = 2.0 / (height * proj[1, 1])

    sb = sample_batch

    def sample_pass(acc_and_rays, per_sample):
        sample_key, sample_idx = per_sample   # (sb, 2) keys, (sb,) idx
        acc, ray_count = acc_and_rays
        os_, ds_ = [], []
        for j in range(sb):
            ju, jv = bluenoise.rotate((bn_u, bn_v), sample_idx[j])
            o, d = camera_rays_flat(
                camera_pos, view, proj, width, height, px, py, ju, jv
            )
            os_.append(o)
            ds_.append(d)
        origin = os_[0] if sb == 1 else jnp.concatenate(os_)
        direction = ds_[0] if sb == 1 else jnp.concatenate(ds_)
        keys = jax.random.split(sample_key[0], 5 * max_bounces)
        radiance, ray_count = _trace_one_sample(
            scene, origin, direction, keys, max_bounces, ray_count,
            sort_bounces=sort_bounces, cone_spread=cone_spread,
        )
        if sb > 1:
            radiance = radiance.reshape(sb, r, 3).sum(axis=0)
        return (acc + radiance, ray_count), None

    acc0 = jnp.zeros((r, 3))
    # float32 ray counter: large renders exceed int32 (64spp @ 512^2 with
    # shadow rays is ~4e9 rays).
    (acc, rays), _ = jax.lax.scan(
        sample_pass, (acc0, jnp.asarray(0.0, jnp.float32)),
        (jax.random.split(key, spp).reshape(spp // sb, sb, -1),
         jnp.arange(spp, dtype=jnp.float32).reshape(spp // sb, sb)),
    )
    acc = acc / spp
    if swizzle:
        acc = acc[jnp.asarray(inv)]
    img = acc.reshape(height, width, 3)
    return img, rays


def render_cached(scene, camera_pos, view, proj, *, width: int, height: int,
                  spp: int = 16, max_bounces: int = 4, key=None,
                  sample_batch: int | None = None,
                  sort_bounces: bool | None = None,
                  swizzle: bool | None = None):
    """``render`` resolved through the AOT executable cache: a warm
    process skips the tracer's Python trace + XLA compile entirely
    (assets/aot_cache.py; ShaderCache precompiled-binary analog)."""
    import os

    from sailor_tpu.assets import aot_cache

    if key is None:
        key = jax.random.PRNGKey(0)
    if sample_batch is None:
        sample_batch = int(os.environ.get("SAILOR_TRACE_SAMPLE_BATCH", "1"))
    if sort_bounces is None:
        # default ON with the sweep intersector: one wavefront sort serves
        # the next bounce's closest-hit AND shadow dispatch — driver-
        # measured 2.54 -> 2.87 Mrays/s on the 512^2/64spp bench (r4);
        # sample_batch pooling measured WORSE (1.6-1.9) and stays off.
        sort_bounces = (
            scene.sweep is not None
            and os.environ.get("SAILOR_TRACE_BOUNCE_SORT", "1") == "1"
        )
    if swizzle is None:
        swizzle = (
            scene.sweep is not None
            and os.environ.get("SAILOR_TRACE_SWIZZLE", "1") == "1"
        )
    kw = dict(width=width, height=height, spp=spp, max_bounces=max_bounces,
              sample_batch=sample_batch, sort_bounces=sort_bounces,
              swizzle=bool(swizzle))
    if not aot_cache.enabled():
        return render(scene, camera_pos, view, proj, key=key, **kw)

    def fn(scene, camera_pos, view, proj, key):
        return render(scene, camera_pos, view, proj, key=key, **kw)

    compiled = aot_cache.load_or_compile(
        fn, (scene, camera_pos, view, proj, key),
        logical_key=f"tracer:{width}x{height}:spp{spp}:b{max_bounces}"
                    f":sb{sample_batch}:srt{int(sort_bounces)}"
                    f":sw{int(kw['swizzle'])}",
        label="tracer",
    )
    try:
        return compiled(scene, camera_pos, view, proj, key)
    except TypeError:
        return render(scene, camera_pos, view, proj, key=key, **kw)


def scene_from_mesh(
    soup: dict,
    materials: dict | None = None,
    *,
    sun_direction=(-0.4, -0.8, -0.45),
    sun_intensity=(4.0, 3.8, 3.5),
    sky_zenith=(0.25, 0.45, 0.85),
    sky_horizon=(0.8, 0.85, 0.95),
    tracer: str = "auto",
    sky=None,
    env_size=(128, 256),
) -> TraceScene:
    """Build a TraceScene from a merged primitive soup (host).

    ``sky``: a ``kernels.sky.SkyParams`` — bakes the engine's raymarched
    sky (sun-less) into a lat-long env map sampled on miss rays, so the
    tracer and the raster pipeline agree on the environment (reference
    TraceSky, PathTracer.cpp:577-620). None keeps the cheap analytic
    gradient."""
    import numpy as np

    pos = np.asarray(soup["position"], np.float32)
    idx = np.asarray(soup["indices"], np.int32)
    nrm = np.asarray(soup["normal"], np.float32)
    uv = np.asarray(soup["uv"], np.float32)
    mat = np.asarray(soup["material_id"], np.int32)
    v0, v1, v2 = pos[idx[:, 0]], pos[idx[:, 1]], pos[idx[:, 2]]
    b = bvh_mod.build(v0, v1, v2)
    # MXU sweep intersector for moderate scenes ("auto"): cluster-culled
    # dense tests beat divergent traversal until triangle count makes the
    # per-sweep cost (~ rays x surviving clusters) dominate.
    sweep_scene = None
    if tracer == "sweep" or (tracer == "auto" and len(idx) <= 262144):
        sweep_scene = sweep_mod.build(v0, v1, v2)
    order = np.arange(len(idx))  # BVH8 reports ORIGINAL triangle ids
    tri_n = np.stack([nrm[idx[:, 0]], nrm[idx[:, 1]], nrm[idx[:, 2]]], axis=1)
    tri_uv = np.stack([uv[idx[:, 0]], uv[idx[:, 1]], uv[idx[:, 2]]], axis=1)

    if materials is None:
        materials = {
            "albedo": np.asarray([[0.75, 0.75, 0.75]], np.float32),
            "metallic": np.asarray([0.0], np.float32),
            "roughness": np.asarray([0.6], np.float32),
            "emissive": np.zeros((1, 3), np.float32),
        }
    m = len(materials["albedo"])
    transmission = np.asarray(
        materials.get("transmission", np.zeros(m)), np.float32
    )
    images = materials.get("images", [])
    albedo_tex = np.asarray(
        materials.get("albedo_texture", np.full(m, -1, np.int32)), np.int32
    )
    from sailor_tpu.assets.materials import build_mip_stack, stack_textures

    textures = stack_textures(
        list(images), int(materials.get("texture_size", 256))
    )
    # Packed mip pyramid for ray-cone texture LOD (the tracer-side consumer
    # of TextureImporter.cpp:247's import-time chains). SAILOR_TRACE_MIPS=0
    # keeps the old single-level gathers for A/B.
    import os as _os

    tex_lod = None
    mip_sizes = ()
    if textures.shape[0] and _os.environ.get("SAILOR_TRACE_MIPS", "1") == "1":
        tex_lod, mip_sizes = build_mip_stack(np.asarray(textures))

    sun = np.asarray(sun_direction, np.float32)
    sun = sun / np.linalg.norm(sun)

    normal_tex = np.asarray(
        materials.get("normal_texture", np.full(m, -1, np.int32)), np.int32
    )
    orm_tex = np.asarray(
        materials.get("orm_texture", np.full(m, -1, np.int32)), np.int32
    )
    emissive_tex = np.asarray(
        materials.get("emissive_texture", np.full(m, -1, np.int32)), np.int32
    )

    # single-gather shading table (see TraceScene.tri_pack layout)
    t_n = len(idx)
    mt = mat[order]
    matf = lambda k, dflt: np.asarray(
        materials.get(k, dflt), np.float32
    )[mt]
    pack = np.zeros((t_n, 48), np.float32)
    pack[:, 0:9] = tri_n[order].reshape(t_n, 9)
    pack[:, 9:12] = np.asarray(materials["albedo"], np.float32)[mt]
    pack[:, 12] = np.asarray(materials["metallic"], np.float32)[mt]
    pack[:, 13] = np.asarray(materials["roughness"], np.float32)[mt]
    pack[:, 14:17] = np.asarray(materials["emissive"], np.float32)[mt]
    pack[:, 17] = transmission[mt]
    pack[:, 18] = matf("ior", np.full(m, 1.5))
    pack[:, 19:22] = matf("atten_color", np.ones((m, 3)))
    pack[:, 22] = matf("atten_dist", np.zeros(m))
    pack[:, 23] = matf("scatter", np.zeros(m))
    pack[:, 24] = matf("hg_g", np.zeros(m))
    pack[:, 25:31] = tri_uv[order].reshape(t_n, 6)
    pack[:, 31] = albedo_tex[mt].astype(np.float32)

    # uv-aligned face tangent + bitangent handedness for normal mapping
    # (standard uv-delta construction; degenerate uvs fall back to e1)
    p0, p1, p2 = v0[order], v1[order], v2[order]
    e1, e2 = p1 - p0, p2 - p0
    uvt = tri_uv[order]
    du1 = uvt[:, 1] - uvt[:, 0]
    du2 = uvt[:, 2] - uvt[:, 0]
    det = du1[:, 0] * du2[:, 1] - du2[:, 0] * du1[:, 1]
    inv_det = np.where(np.abs(det) > 1e-12, 1.0 / np.where(det == 0, 1, det), 0.0)
    tang = (du2[:, 1:2] * e1 - du1[:, 1:2] * e2) * inv_det[:, None]
    tlen = np.linalg.norm(tang, axis=1, keepdims=True)
    e1len = np.maximum(np.linalg.norm(e1, axis=1, keepdims=True), 1e-12)
    tang = np.where(tlen > 1e-8, tang / np.maximum(tlen, 1e-12), e1 / e1len)
    bitan = (du1[:, 0:1] * e2 - du2[:, 0:1] * e1) * inv_det[:, None]
    gn = np.cross(e1, e2)
    hand = np.where(
        np.sum(np.cross(gn, tang) * bitan, axis=1) >= 0.0, 1.0, -1.0
    )
    pack[:, 32:35] = tang
    pack[:, 35] = hand
    pack[:, 36] = normal_tex[mt].astype(np.float32)
    pack[:, 37] = orm_tex[mt].astype(np.float32)
    pack[:, 38] = emissive_tex[mt].astype(np.float32)
    # col 39: per-triangle texel-density term for ray-cone LOD —
    # 0.5*log2(uv_area/world_area). Multiplying the cone's world-space
    # footprint by sqrt(uv_area/world_area) converts it to UV units, so
    # the shade-time LOD is log2(mip0_size * cone_w / cos) + this column.
    world_a = np.maximum(np.linalg.norm(gn, axis=1), 1e-20)
    uv_a = np.maximum(np.abs(det), 1e-20)
    pack[:, 39] = np.clip(0.5 * np.log2(uv_a / world_a), -24.0, 24.0)

    # combined quad stack: one row per (material-group, level, texel)
    # packing every map's 2x2 footprint; group id -> tri_pack col 40
    tex_quad = None
    quad_blocks = ()
    if tex_lod is not None and len(mip_sizes) > 1:
        from sailor_tpu.assets.materials import build_quad_stack_blocks

        cand = [("albedo", albedo_tex, 4, (1.0, 1.0, 1.0, 1.0)),
                ("normal", normal_tex, 3, (0.5, 0.5, 1.0)),
                ("orm", orm_tex, 3, (1.0, 1.0, 1.0)),
                ("emissive", emissive_tex, 3, (1.0, 1.0, 1.0))]
        live = [(nm, ls, nch, neu) for nm, ls, nch, neu in cand
                if bool((ls >= 0).any())]
        if live:
            tq, qgroup, _qw, _qf, qoffs, _qsz = build_quad_stack_blocks(
                np.asarray(textures),
                [(ls, nch, neu) for _, ls, nch, neu in live],
                np.zeros(textures.shape[0], np.int32),
                np.zeros(textures.shape[0], np.int32),
            )
            tex_quad = tq
            quad_blocks = tuple(
                (nm, off, nch)
                for (nm, _, _, _), (off, nch) in zip(live, qoffs)
            )
            pack[:, 40] = np.asarray(qgroup)[mt].astype(np.float32)

    env_map = None
    if sky is not None:
        from sailor_tpu.kernels import sky as sky_mod

        he, we = env_size
        th = (np.arange(he, dtype=np.float32) + 0.5) / he * np.pi
        ph = (np.arange(we, dtype=np.float32) + 0.5) / we * 2.0 * np.pi - np.pi
        st, ct = np.sin(th)[:, None], np.cos(th)[:, None]
        dgrid = np.stack(
            [
                np.broadcast_to(st * np.cos(ph)[None, :], (he, we)),
                np.broadcast_to(ct, (he, we)),
                np.broadcast_to(st * np.sin(ph)[None, :], (he, we)),
            ],
            axis=-1,
        ).astype(np.float32)
        env_map = sky_mod.sky_radiance(
            jnp.asarray(dgrid), sky, with_sun=False, cloud_stride=1
        )

    return TraceScene(
        env_map=env_map,
        tex_lod=tex_lod,
        tex_quad=tex_quad,
        quad_blocks=quad_blocks,
        mip_sizes=tuple(mip_sizes),
        has_normal_maps=bool((normal_tex >= 0).any()),
        has_orm_maps=bool((orm_tex >= 0).any()),
        has_emissive_maps=bool((emissive_tex >= 0).any()),
        tri_pack=jnp.asarray(pack),
        bvh=b,
        normals=jnp.asarray(tri_n[order]),
        uvs=jnp.asarray(tri_uv[order]),
        tri_mat=jnp.asarray(mat[order]),
        mat_albedo=jnp.asarray(materials["albedo"]),
        mat_metallic=jnp.asarray(materials["metallic"]),
        mat_roughness=jnp.asarray(materials["roughness"]),
        mat_emissive=jnp.asarray(materials["emissive"]),
        mat_transmission=jnp.asarray(transmission),
        mat_ior=jnp.asarray(materials.get("ior", np.full(m, 1.5)), jnp.float32),
        mat_atten_color=jnp.asarray(
            materials.get("atten_color", np.ones((m, 3))), jnp.float32
        ),
        mat_atten_dist=jnp.asarray(
            materials.get("atten_dist", np.zeros(m)), jnp.float32
        ),
        mat_scatter=jnp.asarray(
            materials.get("scatter", np.zeros(m)), jnp.float32
        ),
        mat_hg_g=jnp.asarray(materials.get("hg_g", np.zeros(m)), jnp.float32),
        mat_albedo_tex=jnp.asarray(albedo_tex),
        textures=textures,
        sun_direction=jnp.asarray(sun),
        sun_intensity=jnp.asarray(sun_intensity, jnp.float32),
        sky_zenith=jnp.asarray(sky_zenith, jnp.float32),
        sky_horizon=jnp.asarray(sky_horizon, jnp.float32),
        has_volumes=bool(transmission.max() > 0.0) if m else False,
        has_textures=bool(
            (albedo_tex >= 0).any() or (normal_tex >= 0).any()
            or (orm_tex >= 0).any() or (emissive_tex >= 0).any()
        ),
        sweep=sweep_scene,
    )
