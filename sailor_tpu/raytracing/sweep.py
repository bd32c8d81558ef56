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
  are (ray_block, visit step) where each block's clusters are visited
  NEAR-TO-FAR by slab entry distance, and a scalar-prefetched array of
  per-sub-block entry-distance bits drives both dead-pair skipping (no
  fetch — the rhs block index holds its previous value — and no
  compute) and an ordered-traversal early-out: once every ray of a
  sub-block has a hit nearer than the next cluster's entry, the rest of
  the sweep is skipped (any-hit rays retire the same way).  Coherent
  ray blocks touch only the few clusters in front of their hits.

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

import os as _os

# A/B-tunable via env (kernel-shape experiments without code edits):
CLUSTER = int(_os.environ.get("SAILOR_SWEEP_CLUSTER", "256"))
RAY_BLOCK = int(_os.environ.get("SAILOR_SWEEP_RAY_BLOCK", "2048"))
SUB = int(_os.environ.get("SAILOR_SWEEP_SUB", "256"))

# v5e SMEM holds ~1 MB of scalar-prefetch data (measured round 2); the
# per-(sub-block, visit) entry table must fit or Mosaic rejects the kernel.
SMEM_BUDGET = int(_os.environ.get("SAILOR_SWEEP_SMEM", str(1 << 20)))

# Fused in-VMEM slab/entry reduction (see _slab_entry_kernel); the "0"
# fallback runs the original XLA (Rp, C) pass for A/B.
FUSED_SLAB = _os.environ.get("SAILOR_SWEEP_FUSED_SLAB", "1") == "1"

# Per-ray-block DMA walk (_sweep_kernel_dma): each block visits only its
# live near-to-far cluster prefix with an in-kernel break, vs the dense
# (block, cluster) grid. "0" keeps the grid kernel for A/B.
DMA_SWEEP = _os.environ.get("SAILOR_SWEEP_DMA", "1") == "1"


def scalar_bytes(scene: "SweepScene", num_rays: int) -> int:
    """Size of intersect()'s scalar-prefetch array for ``num_rays``."""
    from sailor_tpu.kernels import common

    rpad = common.round_up(max(num_rays, RAY_BLOCK), RAY_BLOCK)
    nb = rpad // RAY_BLOCK
    nsub = RAY_BLOCK // SUB
    return 4 * (nb * nsub + nb) * scene.n_clusters


@struct.dataclass
class SweepScene:
    g_side: jnp.ndarray   # (24, Tp) edge Plucker features, 8-padded rows:
                          #   rows 8e..8e+6 = [m_e (3), d_e (3)], rows 6,7 pad
    g_plane: jnp.ndarray  # (16, Tp): rows 0:3 = -n, row 3 = k (num dot);
                          #   rows 12:15 = n (den dot); others zero —
                          #   K=8-aligned slices so Mosaic can feed the MXU
    v0e1e2: jnp.ndarray   # (Tp, 9) exact MT refinement data
    tri_id: jnp.ndarray   # (Tp,) original triangle id, -1 padding
    cl_min: jnp.ndarray   # (C, 3) cluster AABB
    cl_max: jnp.ndarray   # (C, 3)
    num_tris: int = struct.field(pytree_node=False)
    n_clusters: int = struct.field(pytree_node=False)
    cluster: int = struct.field(pytree_node=False, default=CLUSTER)
    # cluster-contiguous feature blocks for the DMA kernel: (C, 40, tb)
    # f32, rows 0:24 = g_side, 24:40 = g_plane of that cluster — one
    # contiguous async copy per visited cluster
    g_cluster: jnp.ndarray | None = None


def build(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray, *,
          cluster: int = CLUSTER) -> SweepScene:
    """Cluster + featurize a triangle soup (host side, like bvh8.build)."""
    CLUSTER_ = cluster
    b = bvh2.build(np.asarray(v0), np.asarray(v1), np.asarray(v2))
    # BVH leaf order = spatially sorted triangle order; consecutive
    # CLUSTER-sized runs make tight clusters.
    order = np.asarray(b.tri_index)
    a = np.asarray(v0)[order]
    bb = np.asarray(v1)[order]
    c = np.asarray(v2)[order]
    t = a.shape[0]
    tp = max(CLUSTER_, -(-t // CLUSTER_) * CLUSTER_)

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
    gp = np.zeros((16, tp), np.float32)
    gp[0:3] = -n.T
    gp[3] = k
    gp[12:15] = n.T

    v0e1e2 = np.concatenate([a, e1, e2], axis=1).astype(np.float32)

    nc = tp // CLUSTER_
    tri_min = np.minimum(np.minimum(a, bb), c).reshape(nc, CLUSTER_, 3)
    tri_max = np.maximum(np.maximum(a, bb), c).reshape(nc, CLUSTER_, 3)
    # padding rows collapse to a point at the first real vertex of their
    # cluster (harmless for the AABB)
    cl_min = tri_min.min(axis=1)
    cl_max = tri_max.max(axis=1)

    # (C, 40, tb): per-cluster contiguous [g_side; g_plane] for the DMA
    # kernel — one 40 KB async copy fetches a whole cluster's features
    gc = np.concatenate([g, gp], axis=0)           # (40, Tp)
    gc = np.transpose(
        gc.reshape(40, nc, CLUSTER_), (1, 0, 2)
    ).copy()                                       # (C, 40, tb)

    return SweepScene(
        g_side=jnp.asarray(g),
        g_plane=jnp.asarray(gp),
        v0e1e2=jnp.asarray(v0e1e2),
        tri_id=jnp.asarray(tri_id),
        cl_min=jnp.asarray(cl_min),
        cl_max=jnp.asarray(cl_max),
        num_tris=int(t),
        n_clusters=int(nc),
        cluster=CLUSTER_,
        g_cluster=jnp.asarray(gc),
    )


# Sub-blocks folded into one program of the fused slab kernel (the (8*SUB)
# row window keeps the output block 8-sublane-aligned for Mosaic).
_SLAB_GROUP = 8


def _slab_entry_kernel(f_ref, tmax_ref, cl_ref, out_ref, *, sub: int):
    """Fused per-sub-block slab entry: the exact per-ray cluster slab test
    reduced min-over-rays in VMEM.

    The XLA form of this pass materializes several (Rp, C) f32 arrays in
    HBM (~76 MB each at 262k rays x 73 clusters) and was the measured
    dominant cost of an intersect dispatch (23 of ~32 ms on v5e); the
    main sweep kernel only ever consumes the (sub-block, cluster)
    REDUCTION, so this kernel computes the same arithmetic per ray but
    keeps every per-ray intermediate in VMEM and writes only the
    (sub-blocks, clusters) min-entry table (0.3 MB).

    One program = _SLAB_GROUP consecutive sub-blocks. Arithmetic is
    kept identical to slab() in intersect(): inv clamp at |d|>1e-12,
    oinv = o*inv, hit iff tn <= min(tf, tmax) and tf > 0, entry =
    max(tn, 0) where hit else +inf.
    """
    cl = cl_ref[...]                       # (8, Cp) rows 0:3 min, 3:6 max
    rows = []
    for i in range(_SLAB_GROUP):
        f = f_ref[pl.ds(i * sub, sub), :]  # (SUB, 16): [d, m, 0,0 | o, ...]
        tmax = tmax_ref[pl.ds(i * sub, sub), :]   # (SUB, 1)
        tn = None
        tf = None
        for k in range(3):
            dk = f[:, k:k + 1]
            ok = f[:, 8 + k:9 + k]
            inv = jnp.where(jnp.abs(dk) > 1e-12, 1.0 / dk, 1e12)
            oinv = ok * inv
            a = inv * cl[k, :][None, :] - oinv        # (SUB, Cp)
            b = inv * cl[3 + k, :][None, :] - oinv
            lo = jnp.minimum(a, b)
            hi = jnp.maximum(a, b)
            tn = lo if tn is None else jnp.maximum(tn, lo)
            tf = hi if tf is None else jnp.minimum(tf, hi)
        hit = (tn <= jnp.minimum(tf, tmax)) & (tf > 0.0)
        entry = jnp.where(hit, jnp.maximum(tn, 0.0), jnp.inf)
        rows.append(jnp.min(entry, axis=0, keepdims=True))   # (1, Cp)
    out_ref[...] = jnp.concatenate(rows, axis=0)             # (GROUP, Cp)


def _slab_entry_sub(scene: "SweepScene", feats, tmax, rpad: int):
    """(rpad // SUB, n_clusters) min slab-entry distances via the fused
    kernel (+inf where no ray of the sub-block pierces the cluster)."""
    nc = scene.n_clusters
    cp = common.round_up(nc, 128)
    # pad clusters to a far-away +1e30/+2e30 box; its entry values land in
    # the pad columns, which the `out[:, :nc]` slice below discards (the
    # box is NOT guaranteed to reject — with tmax=inf a ray can "hit" it
    # with a finite ~1e30 entry — it only has to stay out of real columns)
    cl = jnp.full((8, cp), 1e30, jnp.float32)
    cl = cl.at[3:6].set(2e30)
    cl = cl.at[0:3, :nc].set(scene.cl_min.T)
    cl = cl.at[3:6, :nc].set(scene.cl_max.T)
    nsb = rpad // SUB
    # Pad the sub-block count up to a multiple of _SLAB_GROUP: a
    # truncating grid (nsb // _SLAB_GROUP) would leave tail sub-blocks'
    # e_sub rows UNWRITTEN (worst case grid=(0,): garbage liveness bits
    # silently dropping hits, e.g. SAILOR_SWEEP_SUB=512 with 2048 rays).
    nsb_p = common.round_up(max(nsb, 1), _SLAB_GROUP)
    if nsb_p != nsb:
        pad_rows = (nsb_p - nsb) * SUB
        # dead pad rays: d=0 rows take the |d|>1e-12 -> inv=1e12 branch
        # and tmax=-inf rejects every cluster, so pad e_sub rows are +inf
        feats = jnp.concatenate(
            [feats, jnp.zeros((pad_rows, feats.shape[1]), feats.dtype)], 0)
        tmax = jnp.concatenate(
            [tmax.reshape(-1), jnp.full((pad_rows,), -jnp.inf, tmax.dtype)])
    grid = (nsb_p // _SLAB_GROUP,)
    out = common.pallas_call(
        functools.partial(_slab_entry_kernel, sub=SUB),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_SLAB_GROUP * SUB, 16), lambda s: (s, 0)),
            pl.BlockSpec((_SLAB_GROUP * SUB, 1), lambda s: (s, 0)),
            pl.BlockSpec((8, cp), lambda s: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_SLAB_GROUP, cp), lambda s: (s, 0)),
        out_shape=jax.ShapeDtypeStruct((nsb_p, cp), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(feats, tmax.reshape(nsb_p * SUB, 1), cl)
    return out[:nsb, :nc]


def _sweep_kernel(sc_ref, f_ref, tmax_ref, gs_ref, gp_ref, id_ref,
                  t_ref, i_ref, bound_ref, *, n_blocks: int,
                  n_clusters: int, any_hit: bool = False):
    """One program = (ray block b, visit step j); j is the inner grid dim.

    The host side sorts each block's clusters near-to-far by the block's
    minimum slab-entry distance, and packs ONE scalar per (sub-block,
    step): the f32 BITS of the sub-block's minimum entry distance to
    that step's cluster (+inf bits when no ray of the sub-block touches
    it).  Positive f32 bits compare like the floats, so the liveness
    test and the occlusion test collapse into one int compare against
    bound_ref[s] — an SMEM scratch holding the bits of the sub-block's
    max-over-rays current best t.  A sub-block stops sweeping as soon
    as every ray's best hit is nearer than the next cluster's entry
    (ordered traversal early-out); retired any-hit rays drive the bound
    to -1.0's bits, which no entry can undercut.  Outputs are (Rb, 1)
    per-ray COLUMN blocks (Mosaic wants the sublane dim 8-divisible; a
    (1, Rb) row block is illegal), revisited across j and initialized
    at j == 0.
    """
    b = pl.program_id(0)
    c = pl.program_id(1)
    nsub = t_ref.shape[0] // SUB

    def subbits(arr):
        # f32 bits of max over the sub-block rows (monotonic for the
        # nonneg best-t values; dead rays' -1.0 maps to a negative int).
        # Bitcast BEFORE the reduce: Mosaic only lowers vector bitcasts
        # (scalar f32->i32 fails verification on real TPU). Int max ==
        # bits(float max) here because the only negative value is the
        # exact -1.0 dead sentinel.
        return jnp.max(
            jax.lax.bitcast_convert_type(arr, jnp.int32)
        )

    @pl.when(c == 0)
    def _():
        t_ref[...] = tmax_ref[...]
        i_ref[...] = jnp.full(i_ref.shape, -1, jnp.int32)
        for s0 in range(nsub):
            bound_ref[s0] = subbits(tmax_ref[pl.ds(s0 * SUB, SUB), :])

    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gs = gs_ref[...]                    # (24, Tb)
    gp = gp_ref[...]                    # (16, Tb)
    cid = sc_ref[n_blocks * nsub * n_clusters + b * n_clusters + c]

    for s in range(nsub):
        @pl.when(sc_ref[(b * nsub + s) * n_clusters + c] < bound_ref[s])
        def _(s=s):
            # K=8-aligned dot slices (zero pad rows in gs/gp line up with
            # zero feature columns) — Mosaic lowers K<8 contractions to
            # VPU FMA chains, which were the measured kernel bottleneck
            f = f_ref[pl.ds(s * SUB, SUB), :]   # (SUB, 16)
            f8 = f[:, 0:8]                      # [d, m, 0, 0]
            fp = f[:, 8:16]                     # [o, 1, d, 0]
            s0 = dot(f8, gs[0:8])               # (SUB, Tb)
            s1 = dot(f8, gs[8:16])
            s2 = dot(f8, gs[16:24])
            num = dot(fp, gp[0:8])
            den = dot(fp, gp[8:16])

            # The post-dot mask/update chain is the kernel's measured
            # bound (the skinny dots are a few % of MXU peak), so it is
            # kept minimal: sign agreement via min/max instead of six
            # compares, and NO explicit pad-liveness term (build() zeroes
            # pad columns' plane rows, so their den == 0 rejects them).
            # The t ratio stays an EXACT divide: an approx reciprocal's
            # 2^-12 slop interacts with the best-t early-out and was
            # measured dropping true winners on near-ties.
            agree = (jnp.minimum(jnp.minimum(s0, s1), s2) >= 0.0) | (
                jnp.maximum(jnp.maximum(s0, s1), s2) <= 0.0
            )
            tval = num / jnp.where(den == 0.0, 1.0, den)
            best = t_ref[pl.ds(s * SUB, SUB), :]   # (SUB, 1)
            ok = agree & (den != 0.0) \
                & (tval > 1e-4) & (tval < best)
            if any_hit:
                # occlusion query: any valid intersection in (eps, t_max)
                # retires the ray — no winner ordering, no index recovery
                found = jnp.any(ok, axis=1, keepdims=True)
                i_ref[pl.ds(s * SUB, SUB), :] = jnp.where(
                    found, 0, i_ref[pl.ds(s * SUB, SUB), :]
                )
                newt = jnp.where(found, -1.0, best)
                t_ref[pl.ds(s * SUB, SUB), :] = newt
            else:
                tm = jnp.where(ok, tval, jnp.inf)
                row_best = jnp.min(tm, axis=1, keepdims=True)  # (SUB, 1)
                gidx = cid * tm.shape[1] + jax.lax.broadcasted_iota(
                    jnp.int32, tm.shape, 1
                )
                row_idx = jnp.max(
                    jnp.where((tm == row_best) & ok, gidx, -1),
                    axis=1, keepdims=True,
                )
                found = row_idx >= 0
                newt = jnp.where(found, row_best, best)
                t_ref[pl.ds(s * SUB, SUB), :] = newt
                i_ref[pl.ds(s * SUB, SUB), :] = jnp.where(
                    found, row_idx, i_ref[pl.ds(s * SUB, SUB), :]
                )
            # tighten the early-out bound with the new best-t maximum
            bound_ref[s] = subbits(newt)


def _sweep_kernel_dma(sc_ref, f_ref, tmax_ref, gc_hbm, t_ref, i_ref,
                      buf, sem, bound_ref, *, n_blocks: int,
                      n_clusters: int, tb: int, any_hit: bool):
    """Work-efficient sweep: grid (ray block,) — each program WALKS its
    own near-to-far cluster list with a double-buffered async-copy
    pipeline and stops at the ordered-traversal break.

    The (block, visit) grid form pays a program step for every
    (block, cluster) pair — 9.3k steps for 262k rays x 73 clusters —
    although coherent blocks retire after the first handful of clusters
    (the per-ray cluster density is ~0.04). Here the visit loop bound is
    the block's LIVE count (finite slab entry), each iteration fetches
    exactly one (40, tb) cluster feature block
    (SweepScene.g_cluster) into VMEM, and the loop goes dead as soon as
    every sub-block's best hit is nearer than the next cluster's entry —
    entries are visit-sorted, so that test is a one-scalar break.
    Scalar layout (ints): [e_sub bits (B*S*C) | visit cluster ids (B*C) |
    block entry bits visit-sorted (B*C) | live count (B)].
    """
    b = pl.program_id(0)
    nsub = t_ref.shape[0] // SUB
    base_f = n_blocks * nsub * n_clusters + b * n_clusters
    base_blk = n_blocks * (nsub + 1) * n_clusters + b * n_clusters
    nlive = sc_ref[n_blocks * (nsub + 2) * n_clusters + b]

    def subbits(arr):
        return jnp.max(jax.lax.bitcast_convert_type(arr, jnp.int32))

    t_ref[...] = tmax_ref[...]
    i_ref[...] = jnp.full(i_ref.shape, -1, jnp.int32)
    for s0 in range(nsub):
        bound_ref[s0] = subbits(tmax_ref[pl.ds(s0 * SUB, SUB), :])

    def cp(j, slot):
        cid = sc_ref[base_f + j]
        return pltpu.make_async_copy(
            gc_hbm.at[cid], buf.at[slot], sem.at[slot]
        )

    @pl.when(nlive > 0)
    def _():
        cp(0, 0).start()

    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    def step(j, stop):
        even = jax.lax.rem(j, 2) == 0

        def body(slot: int):
            cp(j, slot).wait()
            cid = sc_ref[base_f + j]
            gs = buf[slot, 0:24, :]
            gp = buf[slot, 24:40, :]
            for s in range(nsub):
                @pl.when(sc_ref[(b * nsub + s) * n_clusters + j]
                         < bound_ref[s])
                def _(s=s):
                    f = f_ref[pl.ds(s * SUB, SUB), :]
                    f8 = f[:, 0:8]
                    fp = f[:, 8:16]
                    s0 = dot(f8, gs[0:8])
                    s1 = dot(f8, gs[8:16])
                    s2 = dot(f8, gs[16:24])
                    num = dot(fp, gp[0:8])
                    den = dot(fp, gp[8:16])
                    agree = (jnp.minimum(jnp.minimum(s0, s1), s2) >= 0.0) | (
                        jnp.maximum(jnp.maximum(s0, s1), s2) <= 0.0
                    )
                    tval = num / jnp.where(den == 0.0, 1.0, den)
                    best = t_ref[pl.ds(s * SUB, SUB), :]
                    ok = agree & (den != 0.0) \
                        & (tval > 1e-4) & (tval < best)
                    if any_hit:
                        found = jnp.any(ok, axis=1, keepdims=True)
                        i_ref[pl.ds(s * SUB, SUB), :] = jnp.where(
                            found, 0, i_ref[pl.ds(s * SUB, SUB), :]
                        )
                        newt = jnp.where(found, -1.0, best)
                        t_ref[pl.ds(s * SUB, SUB), :] = newt
                    else:
                        tm = jnp.where(ok, tval, jnp.inf)
                        row_best = jnp.min(tm, axis=1, keepdims=True)
                        gidx = cid * tm.shape[1] + jax.lax.broadcasted_iota(
                            jnp.int32, tm.shape, 1
                        )
                        row_idx = jnp.max(
                            jnp.where((tm == row_best) & ok, gidx, -1),
                            axis=1, keepdims=True,
                        )
                        found = row_idx >= 0
                        newt = jnp.where(found, row_best, best)
                        t_ref[pl.ds(s * SUB, SUB), :] = newt
                        i_ref[pl.ds(s * SUB, SUB), :] = jnp.where(
                            found, row_idx, i_ref[pl.ds(s * SUB, SUB), :]
                        )
                    bound_ref[s] = subbits(newt)

            # start the NEXT fetch only if some sub-block can still
            # improve: visit entries are sorted, so a dead j+1 means all
            # later steps are dead too (true ordered-traversal break)
            maxb = bound_ref[0]
            for s in range(1, nsub):
                maxb = jnp.maximum(maxb, bound_ref[s])

            @pl.when((j + 1 < nlive)
                     & (sc_ref[base_blk + j + 1] < maxb))
            def _():
                cp(j + 1, 1 - slot).start()

        @pl.when((stop == 0) & even)
        def _():
            body(0)

        @pl.when((stop == 0) & ~even)
        def _():
            body(1)

        # recompute the same break predicate for the carry (reads the
        # post-update SMEM bounds — identical to the start condition)
        maxb = bound_ref[0]
        for s in range(1, nsub):
            maxb = jnp.maximum(maxb, bound_ref[s])
        live_next = (j + 1 < nlive) & (sc_ref[base_blk + j + 1] < maxb)
        return jnp.where(stop == 1, 1,
                         jnp.where(live_next, 0, 1)).astype(jnp.int32)

    jax.lax.fori_loop(0, nlive, step,
                      jnp.asarray(0, jnp.int32))


@functools.partial(jax.jit, static_argnames=("any_hit", "sort_rays"))
def intersect(scene: SweepScene, origin, direction, t_max=None, *,
              any_hit: bool = False, active=None, sort_rays: bool = False):
    """Drop-in for bvh8.intersect: returns dict(t, tri, u, v, hit).

    ``sort_rays`` re-orders rays by the id of the first cluster their
    segment enters before dispatch (and inverse-permutes the two winner
    scalars after): incoherent bounce rays land next to rays that need
    the same clusters, so the per-sub-block masks stay selective.
    Measured on v5e at 262k rays: the two 262k sorts + permutes cost
    ~8 ms while the masked kernel only saves ~4 ms — so it defaults OFF;
    it pays off for scenes with many clusters (deep pierce-through) or
    mostly-dead late bounces.
    """
    r = origin.shape[0]
    rb = RAY_BLOCK
    rpad = common.round_up(max(r, rb), rb)
    nb = rpad // rb
    nsub = rb // SUB
    nc = scene.n_clusters
    tb = scene.cluster

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

    # --- phase 0: exact per-ray cluster slab test -------------------------
    # Axis-split outer products instead of a materialized (Rp, C, 3)
    # stack: every term is elementwise over (Rp, C) feeding a reduce, so
    # XLA fuses the whole pass (the stacked form spilled ~1.4 GB of
    # rank-3 temporaries to HBM — measured 29 ms of an 80 ms dispatch).
    def slab(o, d, tmax):
        inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 1e12)   # (Rp, 3)
        oinv = o * inv
        tn = jnp.full((rpad, nc), -jnp.inf)
        tf = jnp.full((rpad, nc), jnp.inf)
        for k in range(3):
            a = inv[:, k:k + 1] * scene.cl_min[None, :, k] - oinv[:, k:k + 1]
            b_ = inv[:, k:k + 1] * scene.cl_max[None, :, k] - oinv[:, k:k + 1]
            tn = jnp.maximum(tn, jnp.minimum(a, b_))
            tf = jnp.minimum(tf, jnp.maximum(a, b_))
        return (tn <= jnp.minimum(tf, tmax[:, None])) & (tf > 0.0), tn

    if sort_rays:
        # Sort rays by (first entered cluster, quantized direction):
        # rays that start in the same region AND head the same way share
        # their whole cluster list, and dead rays sort to the end (their
        # sub-blocks go fully dark). Measured sub-block densities on
        # incoherent bounce rays: unsorted 0.62, fc only 0.42,
        # (fc, dir16) 0.24 (per-ray 0.04). The slab pass is recomputed
        # on the sorted rays rather than permuted: a second fused
        # elementwise pass is ~2 ms, gathering the materialized (Rp, C)
        # mask is ~19 MB + a row gather.
        hit_c, tn = slab(o, d, tmax)
        entry = jnp.where(hit_c, tn, jnp.inf)
        fc = jnp.where(
            jnp.any(hit_c, axis=1), jnp.argmin(entry, axis=1), nc
        ).astype(jnp.int32)
        qd = jnp.clip(((d + 1.0) * 2.0).astype(jnp.int32), 0, 3)
        dq = (qd[:, 0] * 4 + qd[:, 1]) * 4 + qd[:, 2]
        iota = jnp.arange(rpad, dtype=jnp.int32)
        _, order = jax.lax.sort_key_val(fc * 64 + dq, iota)
        # inverse permutation by sorting the permutation itself (a sort
        # beats a 262k-row scatter on TPU)
        _, inv_order = jax.lax.sort_key_val(order, iota)
        o = o[order]
        d = d[order]
        tmax = tmax[order]

    m = jnp.cross(o, d)
    z1 = jnp.zeros((rpad, 1))
    feats = jnp.concatenate(
        [d, m, z1, z1, o, jnp.ones((rpad, 1)), d, z1], axis=1
    )  # (Rp, 16): [d, m, 0, 0 | o, 1, d, 0] — see g_side/g_plane layout

    # Per-sub-block minimum entry distance to each cluster (+inf where no
    # ray of the sub-block pierces its AABB) — this one array carries BOTH
    # the liveness mask and the near-to-far metric; its f32 bits compare
    # like the floats, so the kernel tests it against the running best-t
    # bound with a single int compare. The fused kernel keeps the (Rp, C)
    # per-ray intermediates in VMEM (the XLA form was 23 of ~32 ms per
    # dispatch on v5e); the XLA fallback stays as an A/B knob.
    if FUSED_SLAB:
        e_sub = _slab_entry_sub(scene, feats, tmax, rpad)       # (B*S, C)
    else:
        hit_c, tn = slab(o, d, tmax)
        entry = jnp.where(hit_c, jnp.maximum(tn, 0.0), jnp.inf)
        e_sub = jnp.min(entry.reshape(nb * nsub, SUB, nc), axis=1)
    e_blk = jnp.min(e_sub.reshape(nb, nsub, nc), axis=1)        # (B, C)
    # visit order per block: nearest cluster first, dead (inf) last
    order = jnp.argsort(e_blk, axis=1).astype(jnp.int32)        # (B, C)
    e_sub_p = jnp.take_along_axis(
        e_sub.reshape(nb, nsub, nc), order[:, None, :], axis=2
    )
    e_bits = jax.lax.bitcast_convert_type(e_sub_p, jnp.int32).reshape(-1)

    def fmap(b, c, sc):
        return (b, 0)

    def omap(b, c, sc):
        return (b, 0)

    if DMA_SWEEP and scene.g_cluster is not None:
        # per-block walk: visit counts + visit-sorted block entry bits
        blk_sorted = jnp.take_along_axis(e_blk, order, axis=1)   # (B, C)
        blk_bits = jax.lax.bitcast_convert_type(blk_sorted, jnp.int32)
        nlive = jnp.sum(jnp.isfinite(blk_sorted), axis=1).astype(jnp.int32)
        sc = jnp.concatenate([
            e_bits, order.reshape(-1), blk_bits.reshape(-1), nlive
        ])
        kernel = functools.partial(
            _sweep_kernel_dma, n_blocks=nb, n_clusters=nc, tb=tb,
            any_hit=any_hit,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((rb, 16), lambda b, sc: (b, 0)),
                pl.BlockSpec((rb, 1), lambda b, sc: (b, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec((rb, 1), lambda b, sc: (b, 0)),
                pl.BlockSpec((rb, 1), lambda b, sc: (b, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, 40, tb), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SMEM((nsub,), jnp.int32),
            ],
        )
        best_t, best_i = common.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((rpad, 1), jnp.float32),
                jax.ShapeDtypeStruct((rpad, 1), jnp.int32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 2**20
            ),
        )(
            sc, feats, tmax.reshape(rpad, 1), scene.g_cluster,
        )
    else:
        # hold-previous fetch per (b, j): dead steps re-point at the
        # cluster of the last live step so the rhs block is not
        # re-fetched. The visit order is not id-monotonic, so hold the
        # last live STEP index and gather its cluster id.
        blive = jnp.isfinite(e_sub_p).any(axis=1)                # (B, C)
        jlast = jax.lax.cummax(
            jnp.where(blive, jnp.arange(nc, dtype=jnp.int32)[None, :], -1),
            axis=1,
        )
        fetch = jnp.take_along_axis(order, jnp.maximum(jlast, 0), axis=1)
        sc = jnp.concatenate([e_bits, fetch.reshape(-1)])

        def gmap(b, c, sc):
            return (0, sc[nb * nsub * nc + b * nc + c])

        kernel = functools.partial(
            _sweep_kernel, n_blocks=nb, n_clusters=nc, any_hit=any_hit
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb, nc),
            in_specs=[
                pl.BlockSpec((rb, 16), fmap),
                pl.BlockSpec((rb, 1), omap),
                pl.BlockSpec((24, tb), gmap),
                pl.BlockSpec((16, tb), gmap),
                pl.BlockSpec((1, tb), gmap),
            ],
            out_specs=(
                pl.BlockSpec((rb, 1), omap),
                pl.BlockSpec((rb, 1), omap),
            ),
            scratch_shapes=[pltpu.SMEM((nsub,), jnp.int32)],
        )
        best_t, best_i = common.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((rpad, 1), jnp.float32),
                jax.ShapeDtypeStruct((rpad, 1), jnp.int32),
            ),
            # RAY_BLOCK=4096 lhs blocks + double buffering brush the 16 MB
            # default scoped limit; v5e has 128 MB physical VMEM
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        )(
            sc, feats, tmax.reshape(rpad, 1),
            scene.g_side, scene.g_plane, scene.tri_id[None, :],
        )
    best_t = best_t.reshape(-1)
    best_i = best_i.reshape(-1)
    if sort_rays:
        best_t = best_t[inv_order]
        best_i = best_i[inv_order]
    best_t = best_t[:r]
    best_i = best_i[:r]
    if any_hit:
        hit = best_i >= 0
        return {
            "t": jnp.where(hit, 0.0, jnp.inf),
            "tri": jnp.where(hit, 0, -1),
            "u": jnp.zeros((r,)),
            "v": jnp.zeros((r,)),
            "hit": hit,
        }
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
