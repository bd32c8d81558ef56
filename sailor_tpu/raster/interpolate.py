"""Visibility-buffer resolve: per-pixel attribute interpolation -> GBuffer.

The reference interpolates vertex attributes in fixed-function hardware
between its vertex and fragment stages (Standard.shader `Vertex` block).
Here the winning triangle id per pixel (from tile_raster) drives a gather of
the three source vertices and a *world-space ray* barycentric solve
(Möller–Trumbore u,v against the original triangle): this is inherently
perspective-correct and — unlike screen-space edge math — works unchanged
for near-clipped sub-triangles, since they map back to their source
triangle via TriangleSetup.src_id.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sailor_tpu.core import math3d as m3
from sailor_tpu.kernels.pbr import GBuffer


def _unproject_rays(inv_vp, camera_position, u, v):
    """Unproject NDC (u up-is-flipped-later) with FIXED-ORDER arithmetic.

    einsum/dot lowering for the tiny 4-contraction is fusion-context
    dependent (different shapes -> different reduction order -> ~1e-7 ray
    noise); the sky's FBM clouds amplify that by ~1e4, which broke the
    sharded == single-device bit-match. Explicit ((a+b)+(c+d)) ordering is
    stable elementwise code in every context.
    """
    ndc_x = u * 2.0 - 1.0
    ndc_y = 1.0 - v * 2.0
    m = inv_vp

    def mv(r):
        return (m[r, 0] * ndc_x + m[r, 1] * ndc_y) + (m[r, 2] * 0.5 + m[r, 3])

    px, py, pz, pw = mv(0), mv(1), mv(2), mv(3)
    inv_w = 1.0 / pw
    p = jnp.stack([px * inv_w, py * inv_w, pz * inv_w], axis=-1)
    return p - camera_position


@functools.partial(jax.jit, static_argnums=(2, 3, 5))
def pixel_rays(inv_view_projection, camera_position, height: int, width: int,
               row0=0, full_height: int | None = None):
    """Per-pixel world-space ray directions (not normalized).

    ``row0``/``full_height``: global viewport mapping for a row slice
    (multi-chip screen sharding) — local row y maps to (y + row0 + .5)/fh.
    """
    fh = full_height if full_height is not None else height
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5 + row0) / fh
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    u, v = jnp.meshgrid(xs, ys, indexing="xy")
    return _unproject_rays(inv_view_projection, camera_position, u, v)


def pack_triangle_attributes(geometry, src_id, materials=None):
    """Per-RASTER-triangle packed attribute table (R, 37 | 49).

    Column layout: v0(3) e1(3) e2(3) n0(3) dn1(3) dn2(3) uv0(2) duv1(2)
    duv2(2) c0(4) dc1(4) dc2(4) mat_id(1). Deltas make per-pixel interp a
    2-FMA: a(u,v) = a0 + u*da1 + v*da2.

    With ``materials`` the MATERIAL row is pre-expanded per triangle too:
    albedo(3) metallic roughness emissive(3) albedo_layer normal_layer
    opacity — material data is constant per triangle, so folding it here
    turns the resolve's ~6 per-pixel MaterialTable gathers into T-row
    gathers at pack time (texture fetches stay per-pixel: they depend on
    the interpolated uv).

    Packing costs a handful of gathers over R ~ 1e5 rows (trivial); the
    per-PIXEL resolve then needs exactly ONE (H*W)-row gather instead of
    ~14 — on TPU each 2M-row gather is latency-bound at ~14 ms regardless
    of row width (measured), so gather COUNT is the cost model.
    """
    vidx = geometry.indices[src_id]                 # (R, 3)
    p0 = geometry.position[vidx[:, 0]]
    p1 = geometry.position[vidx[:, 1]]
    p2 = geometry.position[vidx[:, 2]]
    n0 = geometry.normal[vidx[:, 0]]
    n1 = geometry.normal[vidx[:, 1]]
    n2 = geometry.normal[vidx[:, 2]]
    t0 = geometry.uv[vidx[:, 0]]
    t1 = geometry.uv[vidx[:, 1]]
    t2 = geometry.uv[vidx[:, 2]]
    c0 = geometry.color[vidx[:, 0]]
    c1 = geometry.color[vidx[:, 1]]
    c2 = geometry.color[vidx[:, 2]]
    mid = geometry.material_id[src_id]
    mat = mid.astype(jnp.float32)[:, None]
    cols = [p0, p1 - p0, p2 - p0,
            n0, n1 - n0, n2 - n0,
            t0, t1 - t0, t2 - t0,
            c0, c1 - c0, c2 - c0,
            mat]
    if materials is not None:
        cols += [
            materials.albedo[mid],
            materials.metallic[mid][:, None],
            materials.roughness[mid][:, None],
            materials.emissive[mid],
            materials.albedo_texture[mid].astype(jnp.float32)[:, None],
            materials.normal_texture[mid].astype(jnp.float32)[:, None],
            materials.opacity[mid][:, None],
            materials.alpha_cutoff[mid][:, None],
        ]
    return jnp.concatenate(cols, axis=1)


def pack_source_attributes(geometry, materials=None):
    """pack_triangle_attributes over the ORIGINAL triangle list.

    Every column of the packed table is per-SOURCE-triangle data (the
    resolve solves barycentrics against the source triangle even for
    near-clipped fragments), so the table is camera-independent: build it
    ONCE per scene/topology change, and the per-frame path reduces to one
    (R,)-row gather ``table[tri.src_id]`` instead of ~15 per-frame
    gathers + concats (~2 ms at 49k tris, ~10 ms at 252k, measured)."""
    t = geometry.indices.shape[0]
    return pack_triangle_attributes(
        geometry, jnp.arange(t, dtype=jnp.int32), materials
    )


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 6))
def pixel_rays_strided(inv_view_projection, camera_position, height: int,
                       width: int, stride: int, row0=0,
                       full_height: int | None = None):
    """Rays for every `stride`-th pixel (matches ``x[::stride]`` sampling
    of a full-res grid: positions 0.5, stride+0.5, ... in pixel units)."""
    fh = full_height if full_height is not None else height
    hq, wq = -(-height // stride), -(-width // stride)
    ys = (jnp.arange(hq, dtype=jnp.float32) * stride + 0.5 + row0) / fh
    xs = (jnp.arange(wq, dtype=jnp.float32) * stride + 0.5) / width
    u, v = jnp.meshgrid(xs, ys, indexing="xy")
    return _unproject_rays(inv_view_projection, camera_position, u, v)


def uv_screen_lod(uv, base_size: int, valid=None):
    """Per-pixel mip level from hardware-style 2x2 QUAD derivatives.

    Exactly the GPU sampler scheme: each aligned 2x2 pixel quad shares one
    (ddx, ddy) pair computed INSIDE the quad, wrap-folded to [-0.5, 0.5)
    so repeat seams (0.99 -> 0.01) don't blow the footprint; lod is log2
    of the larger axis footprint in texels. Quad-local deltas make the
    result independent of screen sharding (row slices are TILE_H-aligned,
    hence quad-aligned) and of anything outside the quad — forward
    differences coupled neighbor rows across shard boundaries and
    diverged from the single-device frame.

    ``valid``: optional (H, W) coverage mask — a delta crossing a
    background pixel is dropped (background uv is implementation-defined:
    the classic resolve gathers triangle 0's attributes there, the fused
    kernel emits zeros). A quad with no valid partner samples mip 0.
    """
    def fold(d):
        return d - jnp.round(d)

    h, w = uv.shape[:2]
    he, we = h - (h % 2), w - (w % 2)
    uq = uv[:he, :we]

    def quad(d, axis):
        # pairwise delta shared by both pixels of the pair along `axis`
        if axis == 1:
            d = d[:, 1::2] - d[:, ::2]
            return jnp.repeat(d, 2, axis=1)
        d = d[1::2] - d[::2]
        return jnp.repeat(d, 2, axis=0)

    dx = fold(quad(uq, 1))
    dy = fold(quad(uq, 0))
    rx = dx[..., 0] ** 2 + dx[..., 1] ** 2
    ry = dy[..., 0] ** 2 + dy[..., 1] ** 2
    if valid is not None:
        vq = valid[:he, :we]
        vx = jnp.repeat(vq[:, 1::2] & vq[:, ::2], 2, axis=1)
        vy = jnp.repeat(vq[1::2] & vq[::2], 2, axis=0)
        rx = jnp.where(vx, rx, 0.0)
        ry = jnp.where(vy, ry, 0.0)
    rho = jnp.maximum(rx, ry) * (base_size * base_size)
    lod = 0.5 * jnp.log2(jnp.maximum(rho, 1e-12))
    if (he, we) != (h, w):
        lod = jnp.pad(lod, ((0, h - he), (0, w - we)), mode="edge")
    return lod


@functools.partial(jax.jit, static_argnums=(7,))
def resolve_alpha(
    geometry,
    tri_setup,
    tri_id,            # (H, W) int32 raster-triangle id from a peel layer
    inv_view_projection,
    camera_position,
    materials,
    row0=0,
    full_height: int | None = None,
):
    """Per-pixel albedo alpha for one visibility layer (Masked queue).

    The alpha-test analog of the reference's `discard` in the Masked
    fragment pass (RenderSceneNode.cpp tag filter + Standard.shader alpha
    cutoff): interpolate UV on the winning triangle, sample the material's
    albedo alpha, and return (alpha (H, W), cutoff (H, W)).
    """
    H, W = tri_id.shape
    rid = jnp.maximum(tri_id, 0)
    packed = pack_triangle_attributes(geometry, tri_setup.src_id)
    px = packed[rid]
    v0, e1, e2 = px[..., 0:3], px[..., 3:6], px[..., 6:9]

    d = pixel_rays(inv_view_projection, camera_position, H, W, row0,
                   full_height)
    pvec = jnp.cross(d, e2)
    det = m3.dot(e1, pvec, keepdims=True)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = camera_position - v0
    u = jnp.clip(m3.dot(tvec, pvec, keepdims=True) * inv_det, 0.0, 1.0)
    v = m3.dot(d, jnp.cross(tvec, e1), keepdims=True) * inv_det
    v = jnp.clip(v, 0.0, 1.0 - u)
    uv = px[..., 18:20] + px[..., 20:22] * u + px[..., 22:24] * v
    mat_id = px[..., 36].astype(jnp.int32)
    lod = (uv_screen_lod(uv, materials.textures.shape[1], tri_id >= 0)
           if materials.has_mips else None)
    if materials.has_quad and lod is not None:
        alpha = materials.sample_alpha(mat_id, uv, lod)
    else:
        albedo, _, _, _ = materials.sample(mat_id, uv, lod)
        alpha = albedo[..., 3]
    # vertex-color alpha modulates too (color columns 24:28 etc.)
    ca = px[..., 27] + px[..., 31] * u[..., 0] + px[..., 35] * v[..., 0]
    return alpha * ca, materials.alpha_cutoff[mat_id]


@functools.partial(jax.jit, static_argnums=(6,))
def resolve_gbuffer(
    geometry,
    tri_setup,
    tri_id,            # (H, W) int32 raster-triangle id, -1 = background
    inv_view_projection,
    camera_position,
    materials=None,
    full_height: int | None = None,
    row0=0,
):
    """Build a GBuffer from the visibility buffer (one gather per pixel)."""
    H, W = tri_id.shape
    valid = tri_id >= 0
    rid = jnp.maximum(tri_id, 0)

    packed = pack_triangle_attributes(geometry, tri_setup.src_id, materials)
    px = packed[rid]                     # (H, W, 37|48) — THE per-pixel gather
    v0 = px[..., 0:3]
    e1 = px[..., 3:6]
    e2 = px[..., 6:9]

    # Möller–Trumbore barycentrics along the pixel ray.
    d = pixel_rays(inv_view_projection, camera_position, H, W, row0,
                   full_height)
    pvec = jnp.cross(d, e2)
    det = m3.dot(e1, pvec, keepdims=True)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = camera_position - v0
    u = m3.dot(tvec, pvec, keepdims=True) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = m3.dot(d, qvec, keepdims=True) * inv_det
    # Raster already decided coverage; clamp to the triangle for robustness
    # at edges (matches hardware attribute clamping behavior closely enough).
    u = jnp.clip(u, 0.0, 1.0)
    v = jnp.clip(v, 0.0, 1.0 - u)

    wpos = v0 + e1 * u + e2 * v
    normal = m3.normalize(px[..., 9:12] + px[..., 12:15] * u + px[..., 15:18] * v)
    uv = px[..., 18:20] + px[..., 20:22] * u + px[..., 22:24] * v
    color = px[..., 24:28] + px[..., 28:32] * u + px[..., 32:36] * v
    mat_id = px[..., 36].astype(jnp.int32)

    if materials is not None:
        # Material columns ride in the packed triangle row (constant per
        # triangle) — no per-pixel MaterialTable gathers. Only the
        # uv-dependent texture fetches stay per-pixel.
        alb = px[..., 37:40]
        metallic = px[..., 40]
        roughness = px[..., 41]
        emissive = px[..., 42:45]
        lod = (uv_screen_lod(uv, materials.textures.shape[1],
                              tri_id >= 0)
               if materials.has_mips else None)
        n_ts_q = has_map_q = None
        if materials.has_quad and lod is not None:
            tex, n_ts_q, has_map_q = materials.sample_combined(
                mat_id, uv, lod)
            alb = alb * tex[..., :3]
            alpha = tex[..., 3]
        elif materials.textures.shape[0] > 0:
            a_layer = px[..., 45].astype(jnp.int32)
            tex = materials.sample_texture(a_layer, uv, lod)
            alb = alb * jnp.where((a_layer >= 0)[..., None], tex[..., :3], 1.0)
            alpha = jnp.where(a_layer >= 0, tex[..., 3], 1.0)
        else:
            alpha = jnp.ones_like(metallic)
        albedo = jnp.concatenate([alb, alpha[..., None]], axis=-1) * color
        if materials.textures.shape[0] > 0 and not (
                materials.has_quad and lod is not None
                and not materials.quad_has_normal):
            # Tangent-space normal mapping (Standard.shader tangentBasis):
            # the tangent frame derives per face from the triangle's
            # positions and UVs — no stored tangents needed with a
            # visibility buffer (the packed row carries all three verts).
            if n_ts_q is not None:
                n_ts, has_map = n_ts_q, has_map_q
            else:
                n_layer = px[..., 46].astype(jnp.int32)
                ntex = materials.sample_texture(n_layer, uv, lod)
                n_ts = ntex[..., :3] * 2.0 - 1.0
                has_map = n_layer >= 0
            duv1 = px[..., 20:22]
            duv2 = px[..., 22:24]
            denom = duv1[..., 0] * duv2[..., 1] - duv2[..., 0] * duv1[..., 1]
            inv = jnp.where(jnp.abs(denom) > 1e-12, 1.0 / denom, 0.0)[..., None]
            t_raw = (e1 * duv2[..., 1:2] - e2 * duv1[..., 1:2]) * inv
            # Gram-Schmidt against the shading normal
            t_ortho = m3.normalize(
                t_raw - normal * m3.dot(normal, t_raw, keepdims=True)
            )
            b = jnp.cross(normal, t_ortho) * jnp.sign(denom)[..., None]
            n_mapped = m3.normalize(
                t_ortho * n_ts[..., 0:1] + b * n_ts[..., 1:2]
                + normal * n_ts[..., 2:3]
            )
            normal = jnp.where(
                (has_map & (jnp.abs(denom) > 1e-12))[..., None],
                n_mapped, normal,
            )
    else:
        albedo = color
        metallic = jnp.zeros((H, W))
        roughness = jnp.full((H, W), 0.5)
        emissive = jnp.zeros((H, W, 3))

    cov = valid.astype(jnp.float32)
    return GBuffer(
        world_position=wpos * cov[..., None],
        normal=jnp.where(valid[..., None], normal, jnp.asarray([0.0, 0.0, 1.0])),
        albedo=albedo * cov[..., None],
        metallic=metallic * cov,
        roughness=jnp.where(valid, roughness, 1.0),
        ao=jnp.ones((H, W)),
        emissive=emissive * cov[..., None],
        coverage=cov,
    ), uv, mat_id


def _resolve_planes(sb, tri_id, inv_view_projection, camera_position, *,
                    tiles_y, tiles_x, width, full_height, row0,
                    mode: str = "full"):
    """Dispatch one bin set through the fused resolve — the work-list grid
    when the bins were built for it, the grid-k kernel otherwise.

    ``mode="alpha"`` (work-list only): emit just the 5 depth-peel planes
    [uv.x, uv.y, vertex alpha, mat id, cutoff] instead of all 29."""
    from sailor_tpu.raster import tile_raster

    common = dict(
        tiles_y=tiles_y, tiles_x=tiles_x, na=int(sb["na"]),
        width=width, full_height=full_height, row0=row0,
    )
    if "worklist_grid" in sb:
        return tile_raster.resolve_worklist(
            sb["rows"], sb["big_rows"], tri_id,
            sb["starts"], sb["counts"], sb["n_big"],
            inv_view_projection, camera_position,
            chunk=int(sb.get("chunk", 128)), mode=mode, **common,
        )
    return tile_raster.resolve_stream(
        sb["rows"], sb["big_rows"], tri_id,
        sb["starts"], sb["counts"], sb["n_big"],
        inv_view_projection, camera_position,
        chunk=int(sb.get("chunk", 256)), kmax=int(sb.get("kmax", 16)),
        **common,
    )


def resolve_gbuffer_stream(
    stream_bins,
    tri_id,
    inv_view_projection,
    camera_position,
    materials=None,
    *,
    width: int,
    height: int,
    tiles_y: int,
    tiles_x: int,
    full_height: int | None = None,
    row0=0,
    return_extras: bool = False,
):
    """resolve_gbuffer without the (H*W)-row random gather: the fused
    Pallas kernel (tile_raster.resolve_stream) re-streams each tile's
    bin_sorted candidate window and expands winner rows in VMEM, so the
    per-pixel attribute fetch rides sequential DMA instead of 2M
    latency-bound gather rows (~14 ms at 1080p, the resolve's dominant
    cost). Texture fetches (uv-dependent) stay out here in XLA.

    ``stream_bins``: dict from DepthPrepass with rows/big_rows/starts/
    counts/n_big/na (build_stream_rows over pack_triangle_attributes).
    Returns (GBuffer, uv, mat_id) — same contract as resolve_gbuffer.
    """
    from sailor_tpu.raster import tile_raster

    H, W = tri_id.shape
    valid = tri_id >= 0
    fh = full_height if full_height is not None else H

    # one bin set per render queue that can win the visibility buffer
    # (opaque always; masked when depth-peel layers merged in). A pixel's
    # winner id matches in exactly one set, the rest contribute zeros, so
    # the expanded planes simply SUM.
    bin_sets = (stream_bins if isinstance(stream_bins, (list, tuple))
                else [stream_bins])
    planes = None
    for sb in bin_sets:
        ps = _resolve_planes(sb, tri_id, inv_view_projection,
                             camera_position, tiles_y=tiles_y,
                             tiles_x=tiles_x, width=W, full_height=fh,
                             row0=row0)
        planes = ps if planes is None else [a + b for a, b in zip(planes, ps)]
    planes = [p[:H, :W] for p in planes]
    wpos = jnp.stack(planes[0:3], axis=-1)
    normal = m3.normalize(jnp.stack(planes[3:6], axis=-1))
    uv = jnp.stack(planes[6:8], axis=-1)
    color = jnp.stack(planes[8:12], axis=-1)
    mat_id = planes[12].astype(jnp.int32)

    if materials is not None:
        alb = jnp.stack(planes[13:16], axis=-1)
        metallic = planes[16]
        roughness = planes[17]
        emissive = jnp.stack(planes[18:21], axis=-1)
        lod = (uv_screen_lod(uv, materials.textures.shape[1], valid)
               if materials.has_mips else None)
        n_ts = has_map = None
        if materials.has_quad and lod is not None:
            # combined quad stack: ONE gather per mip level covers albedo
            # AND the normal map (missing maps are neutral-filled)
            tex, n_ts, has_map = materials.sample_combined(mat_id, uv, lod)
            alb = alb * tex[..., :3]
            alpha = tex[..., 3]
        elif materials.textures.shape[0] > 0:
            a_layer = planes[21].astype(jnp.int32)
            tex = materials.sample_texture(a_layer, uv, lod)
            alb = alb * jnp.where((a_layer >= 0)[..., None], tex[..., :3], 1.0)
            alpha = jnp.where(a_layer >= 0, tex[..., 3], 1.0)
        else:
            alpha = jnp.ones_like(metallic)
        albedo = jnp.concatenate([alb, alpha[..., None]], axis=-1) * color
        # combined path with no normal block => NO material has a normal
        # map (static fact) — skip the mapping math entirely
        if materials.textures.shape[0] > 0 and not (
                materials.has_quad and lod is not None
                and not materials.quad_has_normal):
            if n_ts is None:
                n_layer = planes[22].astype(jnp.int32)
                ntex = materials.sample_texture(n_layer, uv, lod)
                n_ts = ntex[..., :3] * 2.0 - 1.0
                has_map = n_layer >= 0
            denom = planes[26]
            # the kernel emits t_raw WITHOUT the classic path's 1/denom
            # factor — normalization absorbs the magnitude but the SIGN
            # must be restored or the tangent flips on mirrored UVs
            t_raw = jnp.stack(planes[23:26], axis=-1) \
                * jnp.sign(denom)[..., None]
            t_ortho = m3.normalize(
                t_raw - normal * m3.dot(normal, t_raw, keepdims=True)
            )
            b = jnp.cross(normal, t_ortho) * jnp.sign(denom)[..., None]
            n_mapped = m3.normalize(
                t_ortho * n_ts[..., 0:1] + b * n_ts[..., 1:2]
                + normal * n_ts[..., 2:3]
            )
            normal = jnp.where(
                (has_map & (jnp.abs(denom) > 1e-12))[..., None],
                n_mapped, normal,
            )
    else:
        albedo = color
        metallic = jnp.zeros((H, W))
        roughness = jnp.full((H, W), 0.5)
        emissive = jnp.zeros((H, W, 3))

    cov = valid.astype(jnp.float32)
    gb = GBuffer(
        world_position=wpos * cov[..., None],
        normal=jnp.where(valid[..., None], normal, jnp.asarray([0.0, 0.0, 1.0])),
        albedo=albedo * cov[..., None],
        metallic=metallic * cov,
        roughness=jnp.where(valid, roughness, 1.0),
        ao=jnp.ones((H, W)),
        emissive=emissive * cov[..., None],
        coverage=cov,
    )
    if return_extras:
        extras = {}
        if materials is not None and len(planes) >= 29:
            extras["cutoff"] = planes[27]
            extras["opacity"] = planes[28]
        return gb, uv, mat_id, extras
    return gb, uv, mat_id


def resolve_alpha_stream(
    stream_bins,
    tri_id,
    inv_view_projection,
    camera_position,
    materials,
    *,
    width: int,
    height: int,
    tiles_y: int,
    tiles_x: int,
    full_height: int | None = None,
    row0=0,
):
    """resolve_alpha without the per-layer (H*W)-row gather: the fused
    kernel expands uv / vertex-color alpha / texture layer / cutoff from
    the MASKED queue's bin windows. On the work-list grid it uses the
    5-plane ``mode="alpha"`` emit (the peel only alpha-tests; skipping
    the other 24 full-frame plane writes cuts the per-layer floor ~4x).
    Returns (alpha (H, W), cutoff)."""
    H, W = tri_id.shape
    fh = full_height if full_height is not None else H
    slim = "worklist_grid" in stream_bins
    planes = _resolve_planes(stream_bins, tri_id, inv_view_projection,
                             camera_position, tiles_y=tiles_y,
                             tiles_x=tiles_x, width=W, full_height=fh,
                             row0=row0, mode="alpha" if slim else "full")
    planes = [p[:H, :W] for p in planes]
    if slim:
        uv = jnp.stack(planes[0:2], axis=-1)
        color_a = planes[2]
        mat_f = planes[3]
        cutoff = planes[4]
    else:
        uv = jnp.stack(planes[6:8], axis=-1)
        color_a = planes[11]
        mat_f = planes[12]
        cutoff = planes[27]
    if materials.textures.shape[0] > 0:
        lod = (uv_screen_lod(uv, materials.textures.shape[1], tri_id >= 0)
               if materials.has_mips else None)
        if materials.has_quad and lod is not None:
            # narrow alpha-quad table: the peel only alpha-tests, so it
            # skips the combined table's wide-row gathers
            mat_id = mat_f.astype(jnp.int32)
            alpha = materials.sample_alpha(mat_id, uv, lod)
        elif not slim:
            a_layer = planes[21].astype(jnp.int32)
            tex = materials.sample_texture(a_layer, uv, lod)
            alpha = jnp.where(a_layer >= 0, tex[..., 3], 1.0)
        else:
            # slim emit carries mat id, not the albedo layer — route
            # through the material table's albedo_texture indirection
            a_layer = materials.albedo_texture[mat_f.astype(jnp.int32)]
            tex = materials.sample_texture(a_layer, uv, lod)
            alpha = jnp.where(a_layer >= 0, tex[..., 3], 1.0)
    else:
        alpha = jnp.ones_like(color_a)
    return alpha * color_a, cutoff
