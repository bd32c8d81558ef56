"""Cubemap sampling + direction/face math.

Counterpart of the reference's RHICubemap + ComputeEquirect2Cube.shader.
A cubemap is a (6, R, R, C) array with the standard face order
(+X, -X, +Y, -Y, +Z, -Z).  Sampling is branchless: all six face
projections are evaluated via masks (dense math beats divergent branching
on the VPU).
"""

from __future__ import annotations

import jax.numpy as jnp

from sailor_tpu.kernels import sampling


def face_directions(resolution: int):
    """(6, R, R, 3) world direction for every texel center."""
    a = (jnp.arange(resolution) + 0.5) / resolution * 2.0 - 1.0
    u, v = jnp.meshgrid(a, a, indexing="xy")  # u right, v down
    one = jnp.ones_like(u)
    faces = jnp.stack(
        [
            jnp.stack([one, -v, -u], -1),    # +X
            jnp.stack([-one, -v, u], -1),    # -X
            jnp.stack([u, one, v], -1),      # +Y
            jnp.stack([u, -one, -v], -1),    # -Y
            jnp.stack([u, -v, one], -1),     # +Z
            jnp.stack([-u, -v, -one], -1),   # -Z
        ]
    )
    return faces / jnp.linalg.norm(faces, axis=-1, keepdims=True)


def direction_to_face_uv(d):
    """Direction (..., 3) -> (face (...,), u, v in [0,1])."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    is_x = (ax >= ay) & (ax >= az)
    is_y = (ay > ax) & (ay >= az)

    face = jnp.where(
        is_x,
        jnp.where(x > 0, 0, 1),
        jnp.where(is_y, jnp.where(y > 0, 2, 3), jnp.where(z > 0, 4, 5)),
    )
    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-12)
    # face-local (u, v) matching face_directions above
    u = jnp.where(
        is_x,
        jnp.where(x > 0, -z, z),
        jnp.where(is_y, x, jnp.where(z > 0, x, -x)),
    )
    v = jnp.where(is_y, jnp.where(y > 0, z, -z), -y)
    u = (u / ma + 1.0) * 0.5
    v = (v / ma + 1.0) * 0.5
    return face, u, v


def sample_cubemap(cube, d):
    """Bilinear cubemap sample (no seam filtering). cube (6, R, R, C).

    Uses face-offset FLAT indices into the stacked faces: one gather per
    bilinear corner instead of evaluating all six faces and selecting
    (6x fewer gathers; gathers dominate IBL cost on TPU)."""
    r = cube.shape[1]
    c = cube.shape[-1]
    face, u, v = direction_to_face_uv(d)
    flat = cube.reshape(6 * r * r, c)
    fx = u * r - 0.5
    fy = v * r - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    base = face * (r * r)

    def fetch(yy, xx):
        yy = jnp.clip(yy, 0, r - 1)
        xx = jnp.clip(xx, 0, r - 1)
        return flat[base + yy * r + xx]

    c00 = fetch(y0, x0)
    c10 = fetch(y0, x0 + 1)
    c01 = fetch(y0 + 1, x0)
    c11 = fetch(y0 + 1, x0 + 1)
    top = c00 + (c10 - c00) * tx
    bot = c01 + (c11 - c01) * tx
    return top + (bot - top) * ty


def sample_cubemap_lod(mips, d, lod):
    """Trilinear sample across a list of cubemap mips (envmap specular)."""
    lod = jnp.clip(lod, 0.0, len(mips) - 1.0)
    lo = jnp.floor(lod).astype(jnp.int32)
    frac = (lod - lo.astype(jnp.float32))[..., None]
    out_lo = sample_cubemap(mips[0], d)
    out_hi = out_lo
    acc_lo = out_lo
    acc_hi = out_lo
    for m in range(len(mips)):
        s = sample_cubemap(mips[m], d)
        acc_lo = jnp.where((lo == m)[..., None], s, acc_lo)
        acc_hi = jnp.where((lo + 1 == m)[..., None], s, acc_hi)
    return acc_lo * (1.0 - frac) + acc_hi * frac


def sample_cubemap_lod_stack(stack, d, lod):
    """Trilinear sample from a SAME-RESOLUTION mip stack (M, 6, R, R, C).

    The list-of-mips path (sample_cubemap_lod) gathers every mip then
    selects — 4 mips x 4 bilinear corners = 16 HBM-latency gathers per
    pixel. Packing the prefiltered levels at one resolution (upsampled at
    bake time, cached) makes the lod axis part of the flat index: 2 lods x
    4 corners = 8 gathers.
    """
    m, _, r, _, c = stack.shape
    lod = jnp.clip(lod, 0.0, m - 1.0)
    lo = jnp.floor(lod).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, m - 1)
    frac = (lod - lo.astype(jnp.float32))[..., None]

    face, u, v = direction_to_face_uv(d)
    flat = stack.reshape(m * 6 * r * r, c)
    fx = u * r - 0.5
    fy = v * r - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]

    def bilinear(level):
        base = (level * 6 + face) * (r * r)

        def fetch(yy, xx):
            yy = jnp.clip(yy, 0, r - 1)
            xx = jnp.clip(xx, 0, r - 1)
            return flat[base + yy * r + xx]

        c00 = fetch(y0, x0)
        c10 = fetch(y0, x0 + 1)
        c01 = fetch(y0 + 1, x0)
        c11 = fetch(y0 + 1, x0 + 1)
        top = c00 + (c10 - c00) * tx
        bot = c01 + (c11 - c01) * tx
        return top + (bot - top) * ty

    return bilinear(lo) * (1.0 - frac) + bilinear(hi) * frac


def upsample_cubemap(cube, resolution: int):
    """Bilinear per-face upsample to (6, resolution, resolution, C) — used
    to pack prefiltered mips at one resolution at bake time."""
    from sailor_tpu.kernels import sampling

    if cube.shape[1] == resolution:
        return cube
    return jnp.stack([
        sampling.blit(cube[f], (resolution, resolution))
        for f in range(6)
    ])


def equirect_to_cube(equirect, resolution: int):
    """Equirectangular (H, W, C) -> cubemap (6, R, R, C)
    (ComputeEquirect2Cube.shader)."""
    d = face_directions(resolution)
    u = (jnp.arctan2(d[..., 0], -d[..., 2]) / (2.0 * jnp.pi)) + 0.5
    v = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0)) / jnp.pi
    uv = jnp.stack([u, v], axis=-1)
    return sampling.sample_bilinear(equirect, uv, wrap="repeat")


def render_cubemap(radiance_fn, resolution: int):
    """Bake any direction->radiance function into a cubemap (used to bake
    the procedural sky into the environment map, SkyNode env update)."""
    d = face_directions(resolution)
    return radiance_fn(d)


def downsample_cubemap(cube):
    """2x box downsample per face."""
    r2 = cube.shape[1] // 2
    q = cube[:, : r2 * 2, : r2 * 2].reshape(6, r2, 2, r2, 2, -1)
    return q.mean(axis=(2, 4))
