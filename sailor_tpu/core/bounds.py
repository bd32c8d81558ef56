"""Bounding volumes, frustum tests, ray intersections — batched jnp.

TPU-native counterpart of Runtime/Math/Bounds.h: AABB/Sphere/Plane/Frustum
with batched (SIMD-friendly in the reference, vmapped/vectorized here)
overlap tests, plus Möller–Trumbore ray-triangle intersection used by the
path tracer (reference Raytracing/BVH.cpp traversal).

Shapes: points (..., 3); AABBs as (min, max) pairs of (..., 3); spheres as
(..., 4) = (center, radius); planes as (..., 4) with n·x + d = 0 and the
normal pointing inside for frustum planes.
"""

from __future__ import annotations

import jax.numpy as jnp

from sailor_tpu.core import math3d as m3


# ---------------------------------------------------------------------------
# Planes & frustum
# ---------------------------------------------------------------------------


def plane_from_points(p0, p1, p2):
    """Plane through three points; normal = normalize(cross(p1-p0, p2-p0)).

    Matches ComputePlane in the reference's light-culling shader
    (Content/Shaders/ComputeLightCulling.shader CreateFrustum).
    """
    n = m3.normalize(jnp.cross(p1 - p0, p2 - p0))
    d = -m3.dot(n, p0)
    return jnp.concatenate([n, d[..., None]], axis=-1)


def normalize_plane(p):
    inv = jnp.reciprocal(jnp.maximum(m3.length(p[..., :3], keepdims=True), 1e-12))
    return p * inv


def extract_frustum_planes(view_proj):
    """Extract 6 normalized frustum planes from a view-projection matrix.

    Gribb–Hartmann extraction (reference
    Runtime/Math/Bounds.h ExtractFrustumPlanes).  Returns (..., 6, 4)
    ordered [left, right, bottom, top, near, far], normals pointing inward.
    Assumes Vulkan clip space with z in [0, 1] (reverse-Z handled by the
    projection matrix itself).
    """
    r = view_proj
    planes = jnp.stack(
        [
            r[..., 3, :] + r[..., 0, :],  # left
            r[..., 3, :] - r[..., 0, :],  # right
            r[..., 3, :] + r[..., 1, :],  # bottom
            r[..., 3, :] - r[..., 1, :],  # top
            r[..., 2, :],                 # near  (z >= 0)
            r[..., 3, :] - r[..., 2, :],  # far   (z <= w)
        ],
        axis=-2,
    )
    return normalize_plane(planes)


def frustum_contains_sphere(planes, center, radius):
    """Batched sphere-vs-frustum: planes (..., 6, 4), center (..., 3).

    Returns bool (...). Conservative: True if the sphere is not fully
    outside any plane (reference Bounds.h ContainsSphere).
    """
    dist = jnp.einsum("...pi,...i->...p", planes[..., :3], center) + planes[..., 3]
    return jnp.all(dist >= -radius[..., None], axis=-1)


def frustum_contains_aabb(planes, bmin, bmax):
    """Batched AABB-vs-frustum via p-vertex test. Returns bool (...)."""
    n = planes[..., :3]
    # p-vertex: the AABB corner most along the plane normal.
    p = jnp.where(n >= 0.0, bmax[..., None, :], bmin[..., None, :])
    dist = jnp.sum(n * p, axis=-1) + planes[..., 3]
    return jnp.all(dist >= 0.0, axis=-1)


def sphere_overlaps_tile_frustum(center_vs, radius, planes4, z_near, z_far):
    """Light-culling test: sphere vs 4 side planes + [z_near, z_far] slab.

    View-space variant matching SphereFrustumOverlaps in
    Content/Shaders/ComputeLightCulling.shader. ``planes4`` is (..., 4, 4);
    ``center_vs`` view-space center with +z into the screen.
    """
    side = jnp.einsum("...pi,...i->...p", planes4[..., :3], center_vs) + planes4[..., 3]
    in_sides = jnp.all(side >= -radius[..., None], axis=-1)
    z = center_vs[..., 2]
    in_depth = (z + radius >= z_near) & (z - radius <= z_far)
    return in_sides & in_depth


# ---------------------------------------------------------------------------
# AABB / sphere
# ---------------------------------------------------------------------------


def aabb_union(amin, amax, bmin, bmax):
    return jnp.minimum(amin, bmin), jnp.maximum(amax, bmax)


def aabb_center_extents(bmin, bmax):
    c = (bmin + bmax) * 0.5
    return c, bmax - c


def aabb_to_sphere(bmin, bmax):
    c, e = aabb_center_extents(bmin, bmax)
    return jnp.concatenate([c, m3.length(e, keepdims=True)], axis=-1)


def transform_aabb(m, bmin, bmax):
    """Transform AABB by matrix, returning the enclosing AABB (Arvo's method)."""
    c, e = aabb_center_extents(bmin, bmax)
    nc = m3.transform_point(m, c)
    ne = jnp.einsum("...ij,...j->...i", jnp.abs(m[..., :3, :3]), e)
    return nc - ne, nc + ne


def ray_aabb(origin, inv_dir, bmin, bmax, t_max=jnp.inf):
    """Slab test. Returns (hit, t_enter). Broadcasts over leading dims."""
    t0 = (bmin - origin) * inv_dir
    t1 = (bmax - origin) * inv_dir
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < t_max)
    return hit, tmin


# ---------------------------------------------------------------------------
# Ray-triangle (Möller–Trumbore), batched
# ---------------------------------------------------------------------------


def ray_triangle(origin, direction, v0, v1, v2, eps: float = 1e-8):
    """Intersect rays with triangles (broadcasting leading dims).

    Returns (t, u, v, hit): ray parameter, barycentrics, and hit mask.
    Counterpart of Math::IntersectRayTriangle used by the reference path
    tracer (Runtime/Math/Bounds.h:188).
    """
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = jnp.cross(direction, e2)
    det = m3.dot(e1, pvec)
    inv_det = jnp.where(jnp.abs(det) > eps, 1.0 / det, 0.0)
    tvec = origin - v0
    u = m3.dot(tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = m3.dot(direction, qvec) * inv_det
    t = m3.dot(e2, qvec) * inv_det
    hit = (
        (jnp.abs(det) > eps)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > eps)
    )
    return t, u, v, hit
