"""HiZ occlusion culling — consumer of the DepthHighZ min-pyramid.

TPU-native analog of Content/Shaders/ComputeMeshCulling.shader (dispatched
per batch in RenderSceneNode.cpp:126-140): the reference sphere-tests every
instance against the hierarchical-Z pyramid on the GPU and compacts the
survivors' draw args. Here the test runs per RASTER TRIANGLE against the
PREVIOUS frame's pyramid (the geometry rasters exactly once per frame, so
there is no current-frame depth to test against — with a static or slowly
moving camera the previous depth is a conservative occluder set; pixels
never covered hold reverse-Z 0 and can never cull).

Test: a triangle is occluded iff the NEAREST it gets over its screen AABB
(max of its reverse-Z plane over the AABB corners — an upper bound of the
true triangle max, hence conservative) is strictly farther than the
farthest stored depth over its footprint (min of the HiZ texels covering
the AABB at the mip where the footprint is <= 2x2 texels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def build_flat_pyramid(mips):
    """Flatten a list of (Hm, Wm) min-mips into (flat_values, metadata).

    Returns (flat (sum Hm*Wm,), offsets list, shapes list) — static
    metadata, traced values.
    """
    offsets, shapes = [], []
    off = 0
    for m in mips:
        offsets.append(off)
        shapes.append(m.shape)
        off += m.shape[0] * m.shape[1]
    flat = jnp.concatenate([m.reshape(-1) for m in mips])
    return flat, tuple(offsets), tuple(shapes)


@functools.partial(jax.jit, static_argnames=("offsets", "shapes", "base_w",
                                             "base_h"))
def occlusion_cull(
    valid,            # (R,) candidate mask
    screen_aabb,      # (xmin, xmax, ymin, ymax) each (R,) in pixels
    zmax,             # (R,) EXACT max vertex reverse-Z (TriangleSetup.zmax)
    flat_pyramid,     # flattened min-pyramid values
    *,
    offsets: tuple,
    shapes: tuple,
    base_w: int,
    base_h: int,
):
    """Returns valid & ~occluded (never culls a visible triangle given a
    conservative pyramid).

    ``zmax`` is the triangle's true nearest reverse-Z (z is affine in
    screen space, so the max sits at a vertex). The previous plane-over-
    AABB-corner bound extrapolated past the triangle; in the far field
    reverse-Z packs whole depth ranges into ~1e-3, and that slack let
    ~60%% of fully-hidden triangles escape the cull (measured on the
    wall-occluder scene at 1080p).
    """
    xmin, xmax, ymin, ymax = screen_aabb
    xmin_c = jnp.clip(xmin, 0.0, base_w - 1.0)
    xmax_c = jnp.clip(xmax, 0.0, base_w - 1.0)
    ymin_c = jnp.clip(ymin, 0.0, base_h - 1.0)
    ymax_c = jnp.clip(ymax, 0.0, base_h - 1.0)

    # mip where the footprint spans <= 2 texels per axis. mip m texel =
    # 2^m base pixels (mip list starts at the level-1 half-res map when
    # built by DepthHighZ; offsets/shapes describe whatever was passed).
    #
    # The level is SELECTED ARITHMETICALLY first (pure elementwise work)
    # and the 2x2 fetch happens ONCE from the flat pyramid with
    # level-dependent offsets: 4 row gathers total instead of 4 per level
    # (gathers are row-count bound; 12 gathers over the raster-capacity
    # table were ~6 ms of the frame at 1080p).
    occluded = jnp.zeros(valid.shape, bool)
    matched = jnp.zeros(valid.shape, bool)
    sel_off = jnp.zeros(valid.shape, jnp.int32)
    sel_wm = jnp.ones(valid.shape, jnp.int32)
    z = jnp.zeros(valid.shape, jnp.int32)
    sel_tx0, sel_ty0 = z, z
    for level, (off, (hm, wm)) in enumerate(zip(offsets, shapes)):
        scale_x = wm / base_w
        scale_y = hm / base_h
        # texel span of the aabb at this level
        tx0 = jnp.floor(xmin_c * scale_x).astype(jnp.int32)
        tx1 = jnp.floor(xmax_c * scale_x).astype(jnp.int32)
        ty0 = jnp.floor(ymin_c * scale_y).astype(jnp.int32)
        ty1 = jnp.floor(ymax_c * scale_y).astype(jnp.int32)
        # Triangles that fit nowhere (huge walls) are simply not tested —
        # a clamped 2x2 fetch at the coarsest level would UNDER-cover the
        # footprint and could cull a visible triangle.
        fits = (tx1 - tx0 <= 1) & (ty1 - ty0 <= 1)
        sel = fits & ~matched
        sel_off = jnp.where(sel, off, sel_off)
        sel_wm = jnp.where(sel, wm, sel_wm)
        sel_tx0 = jnp.where(sel, jnp.clip(tx0, 0, wm - 1), sel_tx0)
        sel_ty0 = jnp.where(sel, jnp.clip(ty0, 0, hm - 1), sel_ty0)
        matched = matched | sel

    # Shifted-min prefilter: texel (y, x) of each level becomes
    # min(p[y:y+2, x:x+2]) (clamped at the border — same as the clipped
    # 2x2 fetch). The <= 2x2 footprint min then needs ONE row gather at
    # (ty0, tx0) instead of four (gathers are row-count latency bound:
    # 4x ~100k-row fetches measured 2.7 ms of the 1080p frame; the dense
    # prefilter over the ~0.7M-texel pyramid is VPU noise). NOTE: for
    # footprints spanning only 1 texel on an axis the prefiltered fetch
    # mins in one extra neighbor texel — slightly MORE conservative than
    # a per-texel fetch (never culls a visible triangle; can keep a few
    # hidden ones — advisor r3).
    mins = []
    for off, (hm, wm) in zip(offsets, shapes):
        m = jax.lax.slice(flat_pyramid, (off,), (off + hm * wm,))
        m = m.reshape(hm, wm)
        mx = jnp.minimum(m, jnp.concatenate([m[:, 1:], m[:, -1:]], axis=1))
        mxy = jnp.minimum(
            mx, jnp.concatenate([mx[1:], mx[-1:]], axis=0)
        )
        mins.append(mxy.reshape(-1))
    flat_min2 = jnp.concatenate(mins)

    hiz_min = flat_min2[sel_off + sel_ty0 * sel_wm + sel_tx0]
    occluded = matched & (zmax < hiz_min)
    return valid & ~occluded
