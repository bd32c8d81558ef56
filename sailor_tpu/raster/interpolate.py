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


@functools.partial(jax.jit, static_argnums=(2, 3))
def pixel_rays(inv_view_projection, camera_position, height: int, width: int):
    """Per-pixel world-space ray directions (not normalized)."""
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    u, v = jnp.meshgrid(xs, ys, indexing="xy")
    ndc = jnp.stack(
        [u * 2.0 - 1.0, 1.0 - v * 2.0, jnp.full_like(u, 0.5), jnp.ones_like(u)],
        axis=-1,
    )
    p = m3.homogenize(jnp.einsum("ij,hwj->hwi", inv_view_projection, ndc))
    return p - camera_position


@jax.jit
def resolve_gbuffer(
    geometry,
    tri_setup,
    tri_id,            # (H, W) int32 raster-triangle id, -1 = background
    inv_view_projection,
    camera_position,
    materials=None,
):
    """Build a GBuffer from the visibility buffer."""
    H, W = tri_id.shape
    valid = tri_id >= 0
    rid = jnp.maximum(tri_id, 0)
    sid = tri_setup.src_id[rid]          # (H, W) source triangle
    vidx = geometry.indices[sid]         # (H, W, 3)

    v0 = geometry.position[vidx[..., 0]]  # (H, W, 3)
    v1 = geometry.position[vidx[..., 1]]
    v2 = geometry.position[vidx[..., 2]]

    # Möller–Trumbore barycentrics along the pixel ray.
    d = pixel_rays(inv_view_projection, camera_position, H, W)
    e1 = v1 - v0
    e2 = v2 - v0
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
    wgt = jnp.concatenate([1.0 - u - v, u, v], axis=-1)  # (H, W, 3)

    def interp(attr):
        vals = attr[vidx]                # (H, W, 3, C)
        return jnp.sum(vals * wgt[..., None], axis=-2)

    wpos = interp(geometry.position)
    normal = m3.normalize(interp(geometry.normal))
    uv = interp(geometry.uv)
    color = interp(geometry.color)
    mat_id = geometry.material_id[sid]   # (H, W)

    if materials is not None:
        albedo, metallic, roughness, emissive = materials.sample(mat_id, uv)
        albedo = albedo * color
        # Tangent-space normal mapping (Standard.shader tangentBasis):
        # the tangent frame derives per face from the triangle's positions
        # and UVs — no stored tangents needed with a visibility buffer,
        # since all three vertices are already gathered here.
        n_ts, has_map = materials.sample_normal(mat_id, uv)
        uv0 = geometry.uv[vidx[..., 0]]
        duv1 = geometry.uv[vidx[..., 1]] - uv0
        duv2 = geometry.uv[vidx[..., 2]] - uv0
        denom = duv1[..., 0] * duv2[..., 1] - duv2[..., 0] * duv1[..., 1]
        inv = jnp.where(jnp.abs(denom) > 1e-12, 1.0 / denom, 0.0)[..., None]
        t_raw = (e1 * duv2[..., 1:2] - e2 * duv1[..., 1:2]) * inv
        # Gram-Schmidt against the shading normal
        t_ortho = m3.normalize(
            t_raw - normal * m3.dot(normal, t_raw, keepdims=True)
        )
        b = jnp.cross(normal, t_ortho) * jnp.sign(denom)[..., None]
        n_mapped = m3.normalize(
            t_ortho * n_ts[..., 0:1] + b * n_ts[..., 1:2] + normal * n_ts[..., 2:3]
        )
        normal = jnp.where(
            (has_map & (jnp.abs(denom) > 1e-12))[..., None], n_mapped, normal
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
