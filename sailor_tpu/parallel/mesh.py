"""Multi-chip rendering over a jax.sharding.Mesh.

The reference is single-GPU (SURVEY.md §2.9: no distributed layer), so this
is a TPU-native *extension*: screen-space data parallelism over ICI.

Decomposition (one axis, "screen"):
- geometry, lights, camera: replicated (scenes are small next to frames)
- the frame is split by pixel ROWS (tile-row aligned): each chip bins,
  rasterizes, culls lights, and shades only its slice — zero communication
- cross-slice passes use collectives: the exposure histogram is a psum,
  bloom all_gathers the (small) HDR frame, and the 4 CSM cascades are
  sharded over the same axis (chip i rasters cascade i % 4; one psum
  reassembles the full map/EVSM tables — see ShadowPrepassNode)
- the path tracer splits pixel rows the same way; samples are independent
  so scaling is embarrassingly parallel

Everything runs under shard_map with static per-shard shapes, so the same
code path compiles for 1 chip or a full pod slice; validated on a virtual
CPU mesh (tests) and dry-run by the driver.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sailor_tpu import config as cfg
from sailor_tpu.core import math3d as m3
from sailor_tpu.kernels import histogram as hist_k
from sailor_tpu.kernels import light_culling, pbr, tonemap as tm
from sailor_tpu.kernels import bloom as bloom_k
from sailor_tpu.kernels.common import round_up
from sailor_tpu.raster import setup as rsetup, tile_raster


def make_mesh(n_devices: int | None = None, axis: str = "screen") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def _shift_viewport_rows(tri, row0):
    """Re-express a TriangleSetup in the local coordinates of a viewport
    slice starting at global row ``row0``: with y_global = y_local + row0,
    E_local(x, y') = E_global(x, y' + row0), so only the constant terms
    change (C += B * row0) — per-shard viewports are free."""
    off = row0.astype(jnp.float32)
    edge = tri.edge.at[..., 2].add(tri.edge[..., 1] * off)
    zplane = tri.zplane.at[..., 2].add(tri.zplane[..., 1] * off)
    return tri.replace(edge=edge, zplane=zplane)


def _local_pixel_rays(inv_vp, cam, h_local, width, row0, full_h):
    ys = (jnp.arange(h_local, dtype=jnp.float32) + row0 + 0.5) / full_h
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    u, v = jnp.meshgrid(xs, ys, indexing="xy")
    ndc = jnp.stack(
        [u * 2 - 1, 1 - 2 * v, jnp.full_like(u, 0.5), jnp.ones_like(u)], -1
    )
    p = m3.homogenize(jnp.einsum("ij,hwj->hwi", inv_vp, ndc))
    return p - cam


@functools.partial(
    jax.jit, static_argnames=("width", "height", "mesh", "capacity")
)
def sharded_forward_frame(
    scene, *, width: int, height: int, mesh: Mesh, capacity: int = 256,
):
    """Forward+ frame sharded by pixel rows. Returns full (H, W, 3) LDR
    gathered on every device (replicated output)."""
    n = mesh.shape["screen"]
    th = tile_raster.TILE_H
    assert height % (n * th) == 0, "height must split into tile rows per chip"
    h_local = height // n
    tiles_y = h_local // th
    pw = round_up(width, tile_raster.TILE_W)
    tiles_x = pw // tile_raster.TILE_W
    tile = cfg.LIGHTS_CULLING_TILE_SIZE

    def per_shard(scene):
        idx = jax.lax.axis_index("screen")
        row0 = idx * h_local
        frame = scene.frame
        vp = frame.view_projection
        inv_vp = jnp.linalg.inv(vp)

        # raster the local slice (triangle setup replicated, bins local)
        tri, aabb = rsetup.triangle_setup(
            scene.geometry, vp, width=width, height=height, cull="back"
        )
        tri_local = _shift_viewport_rows(tri, row0)
        xmin, xmax, ymin, ymax = aabb
        aabb_local = (xmin, xmax, ymin - row0, ymax - row0)
        # drop triangles entirely outside the local row slice BEFORE binning:
        # bin_all clamps tile ranges into [0, tiles_y-1], so without this an
        # off-slice triangle lands in the boundary tile row and can overflow
        # the bin capacity, silently dropping real geometry at slice seams.
        in_slice = (ymax >= row0) & (ymin < row0 + h_local)
        valid_local = tri_local.valid & in_slice
        passes, _ = rsetup.bin_all(
            valid_local, aabb_local,
            tiles_x=tiles_x, tiles_y=tiles_y,
            tile_w=tile_raster.TILE_W, tile_h=tile_raster.TILE_H,
            capacity=capacity, rounds=1,
        )
        depth = tid = None
        for bins, cnts in passes:
            d_r, t_r = tile_raster.rasterize_tiles(
                tri_local, bins, tiles_y=tiles_y, tiles_x=tiles_x, counts=cnts
            )
            if depth is None:
                depth, tid = d_r, t_r
            else:
                take = d_r > depth
                depth = jnp.where(take, d_r, depth)
                tid = jnp.where(take, t_r, tid)
        depth = depth[:, :width]
        tid = tid[:, :width]

        # G-buffer resolve with global pixel rays
        rays = _local_pixel_rays(
            inv_vp, frame.camera_position, h_local, width, row0, height
        )
        gb = _resolve_local(scene.geometry, tri, tid, rays, frame.camera_position)

        # light culling on local tile rows
        znf = frame.camera_z_near_far
        lin = jnp.where(
            depth > 0.0, znf[0] * znf[1] / (depth * (znf[1] - znf[0]) + znf[0]),
            znf[1],
        )
        plin = jnp.pad(lin, ((0, 0), (0, round_up(width, tile) - width)),
                       constant_values=1e4)
        lidx, _ = _cull_local(
            scene.lights, frame, plin, h_local, width, row0, height, tile
        )

        hdr = pbr.shade_forward_plus(
            gb, scene.lights, lidx, frame.camera_position,
        )[:, :width]

        # exposure: global histogram via psum
        hist = hist_k.luminance_histogram(hdr)
        hist = jax.lax.psum(hist, "screen")
        avg = hist_k.adapt_average_luminance(
            hist, jnp.asarray(0.18), float(width * height), 10.0
        )

        # bloom needs the whole frame: all_gather rows (replicated compute)
        full = jax.lax.all_gather(hdr, "screen", axis=0, tiled=True)
        full = full + bloom_k.bloom(full, threshold=1.0, intensity=0.35)
        ldr = m3.linear_to_srgb(tm.tonemap(full, avg, mode="aces"))
        return ldr

    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(),),               # scene replicated
        out_specs=P(),                 # replicated LDR result
        check_vma=False,
    )
    return fn(scene)


def _resolve_local(geometry, tri_setup, tid, rays, cam):
    """resolve_gbuffer with precomputed local rays."""
    valid = tid >= 0
    rid = jnp.maximum(tid, 0)
    sid = tri_setup.src_id[rid]
    vidx = geometry.indices[sid]
    v0 = geometry.position[vidx[..., 0]]
    v1 = geometry.position[vidx[..., 1]]
    v2 = geometry.position[vidx[..., 2]]
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = jnp.cross(rays, e2)
    det = m3.dot(e1, pvec, keepdims=True)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = cam - v0
    u = jnp.clip(m3.dot(tvec, pvec, keepdims=True) * inv_det, 0.0, 1.0)
    qvec = jnp.cross(tvec, e1)
    v = m3.dot(rays, qvec, keepdims=True) * inv_det
    v = jnp.clip(v, 0.0, 1.0 - u)
    wgt = jnp.concatenate([1.0 - u - v, u, v], axis=-1)

    def interp(attr):
        return jnp.sum(attr[vidx] * wgt[..., None], axis=-2)

    h, w = tid.shape
    cov = valid.astype(jnp.float32)
    return pbr.GBuffer(
        world_position=interp(geometry.position) * cov[..., None],
        normal=jnp.where(valid[..., None],
                         m3.normalize(interp(geometry.normal)),
                         jnp.asarray([0.0, 0.0, 1.0])),
        albedo=interp(geometry.color) * cov[..., None],
        metallic=jnp.zeros((h, w)),
        roughness=jnp.full((h, w), 0.5),
        ao=jnp.ones((h, w)),
        emissive=jnp.zeros((h, w, 3)),
        coverage=cov,
    )


def _cull_local(lights, frame, lin_depth, h_local, width, row0, full_h, tile):
    """Light culling for a row slice: tile side planes built from global
    screen coordinates of the local tiles."""
    tiles_y = h_local // tile
    tiles_x = lin_depth.shape[1] // tile
    zmin, zmax = light_culling.tile_depth_bounds(lin_depth, tiles_y, tiles_x)
    diff = zmax - zmin
    z0, z1 = zmin - diff, zmax + diff

    # global NDC corners for local tiles
    xs = jnp.arange(tiles_x + 1, dtype=jnp.float32) * tile
    ys = jnp.arange(tiles_y + 1, dtype=jnp.float32) * tile + row0
    ndc_x = xs / width * 2.0 - 1.0
    ndc_y = 1.0 - ys / full_h * 2.0
    gx, gy = jnp.meshgrid(ndc_x, ndc_y, indexing="xy")
    corners = jnp.stack([gx, gy, jnp.full_like(gx, 0.5), jnp.ones_like(gx)], -1)
    v = jnp.einsum("ij,abj->abi", frame.inv_projection, corners)
    rays = v[..., :3] / v[..., 3:4]
    tl, tr = rays[:-1, :-1], rays[:-1, 1:]
    bl, br = rays[1:, :-1], rays[1:, 1:]

    def plane(a, b):
        nrm = m3.normalize(jnp.cross(a, b))
        return jnp.concatenate([nrm, jnp.zeros_like(nrm[..., :1])], -1)

    planes = jnp.stack(
        [plane(bl, tl), plane(tr, br), plane(tl, tr), plane(br, bl)], axis=-2
    )
    pos_vs = m3.transform_point(frame.view, lights.position)
    side = jnp.einsum("abpk,lk->abpl", planes[..., :3], pos_vs)
    in_sides = jnp.all(side >= -lights.radius[None, None, None, :], axis=2)
    z = -pos_vs[..., 2]
    in_depth = (
        (z[None, None, :] + lights.radius >= z0[..., None])
        & (z[None, None, :] - lights.radius <= z1[..., None])
    )
    is_dir = lights.type == 0
    hit = ((in_sides & in_depth) | is_dir[None, None, :]) & lights.valid_mask
    d = jnp.sqrt(
        pos_vs[None, None, :, 0] ** 2 + pos_vs[None, None, :, 1] ** 2
        + (z[None, None, :] - (z0 + z1)[..., None] * 0.5) ** 2
    )
    score = jnp.where(hit, -jnp.where(is_dir, 0.0, d), -jnp.inf)
    k = min(32, lights.capacity)
    vals, idx = jax.lax.top_k(score, k)
    return jnp.where(jnp.isfinite(vals), idx, -1), jnp.isfinite(vals).sum(-1)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "mesh", "spp", "max_bounces"),
)
def sharded_path_trace(
    scene, camera_pos, view, proj, *, width: int, height: int, mesh: Mesh,
    spp: int = 4, max_bounces: int = 2, key=None,
):
    """Path trace with pixel rows sharded across the mesh (dp over pixels;
    every chip traces the full BVH, rays never cross chips)."""
    from sailor_tpu.raytracing import path_tracer as pt

    n = mesh.shape["screen"]
    assert height % n == 0
    h_local = height // n
    if key is None:
        key = jax.random.PRNGKey(0)

    def per_shard(scene, key):
        idx = jax.lax.axis_index("screen")
        row0 = idx * h_local
        inv_vp = jnp.linalg.inv(proj @ view)
        ys = (jnp.arange(h_local, dtype=jnp.float32)[:, None] + row0 + 0.5) / height
        xs = (jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5) / width
        ndc = jnp.stack(
            [
                jnp.broadcast_to(xs * 2 - 1, (h_local, width)),
                jnp.broadcast_to(1 - 2 * ys, (h_local, width)),
                jnp.full((h_local, width), 0.5),
                jnp.ones((h_local, width)),
            ],
            -1,
        )
        p = m3.homogenize(jnp.einsum("ij,hwj->hwi", inv_vp, ndc))
        d = m3.normalize(p - camera_pos)
        o = jnp.broadcast_to(camera_pos, d.shape).reshape(-1, 3)
        d = d.reshape(-1, 3)
        key_local = jax.random.fold_in(key, idx)
        img, rays = pt.trace_rays(
            scene, o, d, spp=spp, max_bounces=max_bounces, key=key_local
        )
        img = img.reshape(h_local, width, 3)
        return jax.lax.all_gather(img, "screen", axis=0, tiled=True)

    fn = shard_map(
        per_shard, mesh=mesh, in_specs=(P(), P()), out_specs=P(),
        check_vma=False,
    )
    return fn(scene, key)
