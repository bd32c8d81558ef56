"""Cluster-culled dense MXU sweep tracer — the TPU-native intersector.

The BVH8 megakernel (bvh8.py) is VPU-lockstep-bound: every traversal
iteration pays an (R,)-row table gather plus the 8-wide slab AND 7-wide
Moller-Trumbore tests for every lane (measured 36.7 ms / 262k coherent
rays on v5e, 47% of it gather+layout).  This module replaces tree
traversal with the opposite TPU-native trade: *no pointer chasing at
all*.  Triangles are re-expressed so that every per-(ray, triangle)
quantity is a small matmul, and the MXU sweeps whole (ray-block x
triangle-cluster) tiles at once:

- Plucker side tests: a ray (o, d) has line coordinates (d, m = o x d);
  edge (A -> B) has (B - A, A x B).  The signed side is the permuted
  inner product  s = d . (A x B) + m . (B - A) — LINEAR in the 6 ray
  features, so all three edge tests for a whole tile are three
  (Rb, 6) @ (6, Tb) matmuls.  A triangle is hit iff all three sides
  share a sign (two-sided test); the normalized sides are exactly the
  barycentrics.
- Depth: t = (k - n.o) / (n.d) with n = e1 x e2, k = n.v0 — two more
  tiny matmuls ((Rb,4)@(4,Tb), (Rb,3)@(3,Tb)).
- Culling: triangles are sorted into spatial CLUSTERS (binary-SAH BVH
  leaf order, bvh.py — native builder when available) and a cheap exact
  per-ray cluster slab test runs in XLA first; the kernel's grid steps
  are (ray_block, cluster) and a scalar-prefetched mask skips dead
  pairs entirely (no fetch — the rhs block index holds its previous
  value — and no compute).  Coherent ray blocks skip most clusters.

Same result contract as bvh8.intersect: dict(t, tri (original id), u,
v, hit).  Winner u/v/t are refined with one exact Moller-Trumbore on the
(R,)-row winner gather, so precision matches the megakernel.

Reference counterpart: Runtime/Raytracing/BVH.cpp traversal +
PathTracer.cpp:622-900 — re-architected for the MXU instead of ported.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from sailor_tpu.kernels import common
from sailor_tpu.raytracing import bvh as bvh2

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CLUSTER = 256       # triangles per cluster (rhs tile N)
RAY_BLOCK = 2048    # rays per block (lhs tile M)


@struct.dataclass
class SweepScene:
    g_side: jnp.ndarray   # (24, Tp) edge Plucker features, 8-padded rows:
                          #   rows 8e..8e+6 = [m_e (3), d_e (3)], rows 6,7 pad
    g_plane: jnp.ndarray  # (8, Tp): rows 0:3 = -n, row 3 = k, rows 4:7 = n
    v0e1e2: jnp.ndarray   # (Tp, 9) exact MT refinement data
    tri_id: jnp.ndarray   # (Tp,) original triangle id, -1 padding
    cl_min: jnp.ndarray   # (C, 3) cluster AABB
    cl_max: jnp.ndarray   # (C, 3)
    num_tris: int = struct.field(pytree_node=False)
    n_clusters: int = struct.field(pytree_node=False)


def build(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray) -> SweepScene:
    """Cluster + featurize a triangle soup (host side, like bvh8.build)."""
    b = bvh2.build(np.asarray(v0), np.asarray(v1), np.asarray(v2))
    # BVH leaf order = spatially sorted triangle order; consecutive
    # CLUSTER-sized runs make tight clusters.
    order = np.asarray(b.tri_index)
    a = np.asarray(v0)[order]
    bb = np.asarray(v1)[order]
    c = np.asarray(v2)[order]
    t = a.shape[0]
    tp = max(CLUSTER, -(-t // CLUSTER) * CLUSTER)

    def pad(x, fill=0.0):
        return np.concatenate(
            [x, np.full((tp - t,) + x.shape[1:], fill, x.dtype)]
        )

    a, bb, c = pad(a), pad(bb), pad(c)
    tri_id = np.concatenate(
        [order.astype(np.int32), np.full(tp - t, -1, np.int32)]
    )

    e1 = bb - a
    e2 = c - a
    n = np.cross(e1, e2)
    k = np.sum(n * a, axis=1)

    def edge_feat(p, q):
        return np.concatenate([np.cross(p, q), q - p], axis=1)  # (Tp, 6)

    # Edge order (A->B, B->C, C->A): sides s0,s1,s2; barycentric of vertex
    # C is s0/(s0+s1+s2) etc. — see _refine for the exact mapping.
    g = np.zeros((24, tp), np.float32)
    for e, (p, q) in enumerate(((a, bb), (bb, c), (c, a))):
        g[8 * e:8 * e + 6] = edge_feat(p, q).T
    gp = np.zeros((8, tp), np.float32)
    gp[0:3] = -n.T
    gp[3] = k
    gp[4:7] = n.T

    v0e1e2 = np.concatenate([a, e1, e2], axis=1).astype(np.float32)

    nc = tp // CLUSTER
    tri_min = np.minimum(np.minimum(a, bb), c).reshape(nc, CLUSTER, 3)
    tri_max = np.maximum(np.maximum(a, bb), c).reshape(nc, CLUSTER, 3)
    # padding rows collapse to a point at the first real vertex of their
    # cluster (harmless for the AABB)
    cl_min = tri_min.min(axis=1)
    cl_max = tri_max.max(axis=1)

    return SweepScene(
        g_side=jnp.asarray(g),
        g_plane=jnp.asarray(gp),
        v0e1e2=jnp.asarray(v0e1e2),
        tri_id=jnp.asarray(tri_id),
        cl_min=jnp.asarray(cl_min),
        cl_max=jnp.asarray(cl_max),
        num_tris=int(t),
        n_clusters=int(nc),
    )


def _sweep_kernel(mask_ref, f_ref, tmax_ref, gs_ref, gp_ref, id_ref,
                  t_ref, i_ref, *, n_blocks: int, n_clusters: int):
    """One program = (ray block b, cluster c); c is the inner grid dim.

    mask_ref: (B*C + pad,) int32 — 1 iff any ray of block b hits cluster
    c's AABB. Outputs are (Rb, 1) per-ray COLUMN blocks (Mosaic wants the
    sublane dim 8-divisible; a (1, Rb) row block is illegal), revisited
    across c and initialized at c == 0.
    """
    b = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        t_ref[...] = tmax_ref[...]
        i_ref[...] = jnp.full(i_ref.shape, -1, jnp.int32)

    @pl.when(mask_ref[b * n_clusters + c] == 1)
    def _():
        f = f_ref[...]                      # (Rb, 16)
        f6 = f[:, 0:6]
        fo = f[:, 6:10]
        fd = f[:, 0:3]
        gs = gs_ref[...]                    # (24, Tb)
        gp = gp_ref[...]                    # (8, Tb)
        dot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s0 = dot(f6, gs[0:6])               # (Rb, Tb)
        s1 = dot(f6, gs[8:14])
        s2 = dot(f6, gs[16:22])
        num = dot(fo, gp[0:4])
        den = dot(fd, gp[4:7])

        pos = (s0 >= 0.0) & (s1 >= 0.0) & (s2 >= 0.0)
        neg = (s0 <= 0.0) & (s1 <= 0.0) & (s2 <= 0.0)
        live = (id_ref[...] >= 0)           # (1, Tb)
        safe_den = jnp.where(den == 0.0, 1.0, den)
        tval = num / safe_den
        best = t_ref[...]                   # (Rb, 1)
        ok = (pos | neg) & (den != 0.0) & live \
            & (tval > 1e-4) & (tval < best)
        tm = jnp.where(ok, tval, jnp.inf)
        row_best = jnp.min(tm, axis=1, keepdims=True)      # (Rb, 1)
        gidx = c * tm.shape[1] + jax.lax.broadcasted_iota(
            jnp.int32, tm.shape, 1
        )
        row_idx = jnp.max(
            jnp.where((tm == row_best) & ok, gidx, -1), axis=1, keepdims=True
        )
        found = row_idx >= 0
        t_ref[...] = jnp.where(found, row_best, best)
        i_ref[...] = jnp.where(found, row_idx, i_ref[...])


@functools.partial(jax.jit, static_argnames=("any_hit",))
def intersect(scene: SweepScene, origin, direction, t_max=None, *,
              any_hit: bool = False, active=None):
    """Drop-in for bvh8.intersect: returns dict(t, tri, u, v, hit)."""
    r = origin.shape[0]
    rb = RAY_BLOCK
    rpad = common.round_up(max(r, rb), rb)
    nb = rpad // rb
    nc = scene.n_clusters
    tb = CLUSTER

    def padr(x, fill=0.0):
        return jnp.pad(x, ((0, rpad - r),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    o = padr(origin)
    d = padr(direction, 1e-8)
    if t_max is None:
        tmax = jnp.full((rpad,), jnp.inf)
    else:
        tmax = padr(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,)),
                    -1.0)
    if active is not None:
        tmax = tmax.at[:r].set(jnp.where(active, tmax[:r], -1.0))
    tmax = tmax.at[r:].set(-1.0)  # padding rays: dead (t window empty)

    m = jnp.cross(o, d)
    feats = jnp.concatenate(
        [d, m, o, jnp.ones((rpad, 1)), jnp.zeros((rpad, 6))], axis=1
    )  # (Rp, 16)

    # --- phase 0: exact per-ray cluster slab test, OR-reduced per block ---
    inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 1e12)
    t0 = (scene.cl_min[None] - o[:, None]) * inv[:, None]   # (Rp, C, 3)
    t1 = (scene.cl_max[None] - o[:, None]) * inv[:, None]
    tn = jnp.max(jnp.minimum(t0, t1), axis=2)
    tf = jnp.min(jnp.maximum(t0, t1), axis=2)
    hit_c = (tn <= jnp.minimum(tf, tmax[:, None])) & (tf > 0.0)
    mask = jnp.any(hit_c.reshape(nb, rb, nc), axis=1)        # (B, C)
    mask_i = mask.astype(jnp.int32).reshape(-1)

    # hold-previous fetch index per (b, c): dead steps re-point at the last
    # live cluster so the rhs block is not re-fetched
    live_c = jnp.where(mask, jnp.arange(nc, dtype=jnp.int32)[None, :], -1)
    fetch = jax.lax.cummax(live_c, axis=1)
    fetch = jnp.maximum(fetch, 0).reshape(-1)
    sc = jnp.concatenate([mask_i, fetch])

    def fmap(b, c, sc):
        return (b, 0)

    def gmap(b, c, sc):
        return (0, sc[nb * nc + b * nc + c])

    def omap(b, c, sc):
        return (b, 0)

    kernel = functools.partial(_sweep_kernel, n_blocks=nb, n_clusters=nc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, nc),
        in_specs=[
            pl.BlockSpec((rb, 16), fmap),
            pl.BlockSpec((rb, 1), omap),
            pl.BlockSpec((24, tb), gmap),
            pl.BlockSpec((8, tb), gmap),
            pl.BlockSpec((1, tb), gmap),
        ],
        out_specs=(
            pl.BlockSpec((rb, 1), omap),
            pl.BlockSpec((rb, 1), omap),
        ),
    )
    best_t, best_i = common.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((rpad, 1), jnp.float32),
            jax.ShapeDtypeStruct((rpad, 1), jnp.int32),
        ),
    )(
        sc, feats, tmax.reshape(rpad, 1),
        scene.g_side, scene.g_plane, scene.tri_id[None, :],
    )
    best_t = best_t.reshape(-1)[:r]
    best_i = best_i.reshape(-1)[:r]
    return _refine(scene, origin, direction, best_t, best_i)


def _refine(scene, origin, direction, best_t, best_i):
    """Exact Moller-Trumbore on the winner rows: f32 t/u/v + original id."""
    hit = best_i >= 0
    safe = jnp.maximum(best_i, 0)
    rows = scene.v0e1e2[safe]               # (R, 9) winner gather
    v0, e1, e2 = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9]
    pvec = jnp.cross(direction, e2)
    det = jnp.sum(e1 * pvec, axis=1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = origin - v0
    u = jnp.sum(tvec * pvec, axis=1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(direction * qvec, axis=1) * inv_det
    t = jnp.sum(e2 * qvec, axis=1) * inv_det
    tri = jnp.where(hit, scene.tri_id[safe], -1)
    t = jnp.where(hit, t, jnp.inf)
    return {
        "t": t,
        "tri": tri,
        "u": jnp.clip(jnp.where(hit, u, 0.0), 0.0, 1.0),
        "v": jnp.clip(jnp.where(hit, v, 0.0), 0.0, 1.0),
        "hit": hit,
    }
