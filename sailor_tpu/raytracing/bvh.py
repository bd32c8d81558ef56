"""BVH: host-side binned-SAH build (numpy) + batched device traversal.

Counterpart of Runtime/Raytracing/BVH.cpp (SAH binary BVH with ordered
traversal).  The build stays on host (it is scene-load-time work, mirrored
by a native C++ builder in native/); the *flat array* layout is designed for
TPU traversal: SoA node arrays so each traversal step is a handful of dense
gathers, and leaf triangles stored contiguously (leaf = [start, start+count)
range into a triangle array reordered at build time).

Traversal is a vmapped ``lax.while_loop`` with a fixed-depth explicit stack:
every ray advances in lockstep (divergence costs idle lanes, not branches),
and each step gathers both children's AABBs in one shot, visiting the nearer
child first.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

MAX_STACK = 48
LEAF_SIZE = 4
SAH_BINS = 16


# ---------------------------------------------------------------------------
# Host build
# ---------------------------------------------------------------------------


@struct.dataclass
class BVH:
    """Flat BVH. Internal node i has children (left[i], left[i]+1);
    leaf iff count[i] > 0, holding triangles [start[i], start[i]+count[i])
    of the *reordered* triangle arrays."""

    node_min: jnp.ndarray   # (N, 3)
    node_max: jnp.ndarray   # (N, 3)
    node_left: jnp.ndarray  # (N,) int32 (left child index; 0 for leaves)
    node_start: jnp.ndarray  # (N,) int32
    node_count: jnp.ndarray  # (N,) int32 (0 = internal)
    v0: jnp.ndarray  # (T, 3) reordered triangle vertices
    v1: jnp.ndarray
    v2: jnp.ndarray
    tri_index: jnp.ndarray  # (T,) original triangle ids


def build(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray) -> BVH:
    """Binned-SAH top-down build over triangle soup (host, numpy)."""
    t = len(v0)
    cent = (v0 + v1 + v2) / 3.0
    tmin = np.minimum(np.minimum(v0, v1), v2)
    tmax = np.maximum(np.maximum(v0, v1), v2)

    order = np.arange(t, dtype=np.int32)
    # Preallocate worst-case 2T nodes.
    cap = max(2 * t, 2)
    nmin = np.zeros((cap, 3), np.float32)
    nmax = np.zeros((cap, 3), np.float32)
    nleft = np.zeros(cap, np.int32)
    nstart = np.zeros(cap, np.int32)
    ncount = np.zeros(cap, np.int32)
    n_nodes = 1

    stack = [(0, 0, t)]  # (node, start, end) over `order`
    while stack:
        node, start, end = stack.pop()
        ids = order[start:end]
        bb_min = tmin[ids].min(axis=0)
        bb_max = tmax[ids].max(axis=0)
        nmin[node] = bb_min
        nmax[node] = bb_max
        count = end - start
        if count <= LEAF_SIZE:
            nstart[node] = start
            ncount[node] = count
            continue

        # Binned SAH over the largest centroid axis.
        c = cent[ids]
        cmin = c.min(axis=0)
        cmax = c.max(axis=0)
        axis = int(np.argmax(cmax - cmin))
        if cmax[axis] - cmin[axis] < 1e-12:
            # Degenerate spread: median split.
            mid = start + count // 2
        else:
            scale = SAH_BINS * (1.0 - 1e-6) / (cmax[axis] - cmin[axis])
            bins = ((c[:, axis] - cmin[axis]) * scale).astype(np.int32)
            bin_count = np.bincount(bins, minlength=SAH_BINS)
            bin_min = np.full((SAH_BINS, 3), np.inf, np.float32)
            bin_max = np.full((SAH_BINS, 3), -np.inf, np.float32)
            for b in range(SAH_BINS):
                m = bins == b
                if m.any():
                    bin_min[b] = tmin[ids[m]].min(axis=0)
                    bin_max[b] = tmax[ids[m]].max(axis=0)

            def area(lo, hi):
                d = np.maximum(hi - lo, 0)
                return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0]

            lmin = np.minimum.accumulate(bin_min, axis=0)
            lmax = np.maximum.accumulate(bin_max, axis=0)
            rmin = np.minimum.accumulate(bin_min[::-1], axis=0)[::-1]
            rmax = np.maximum.accumulate(bin_max[::-1], axis=0)[::-1]
            lcnt = np.cumsum(bin_count)
            rcnt = np.cumsum(bin_count[::-1])[::-1]
            # Split after bin s: left = bins[0..s], right = bins[s+1..]
            cost = area(lmin[:-1], lmax[:-1]) * lcnt[:-1] + area(
                rmin[1:], rmax[1:]
            ) * rcnt[1:]
            cost = np.where((lcnt[:-1] == 0) | (rcnt[1:] == 0), np.inf, cost)
            s = int(np.argmin(cost))
            if not np.isfinite(cost[s]):
                mid = start + count // 2
            else:
                sel = bins <= s
                left_ids = ids[sel]
                right_ids = ids[~sel]
                order[start : start + len(left_ids)] = left_ids
                order[start + len(left_ids) : end] = right_ids
                mid = start + len(left_ids)

        if mid == start or mid == end:
            mid = start + count // 2
            # median partition on the axis for robustness
            part = np.argsort(cent[order[start:end], axis], kind="stable")
            order[start:end] = order[start:end][part]

        left = n_nodes
        n_nodes += 2
        nleft[node] = left
        stack.append((left, start, mid))
        stack.append((left + 1, mid, end))

    return BVH(
        node_min=jnp.asarray(nmin[:n_nodes]),
        node_max=jnp.asarray(nmax[:n_nodes]),
        node_left=jnp.asarray(nleft[:n_nodes]),
        node_start=jnp.asarray(nstart[:n_nodes]),
        node_count=jnp.asarray(ncount[:n_nodes]),
        v0=jnp.asarray(v0[order]),
        v1=jnp.asarray(v1[order]),
        v2=jnp.asarray(v2[order]),
        tri_index=jnp.asarray(order),
    )


# ---------------------------------------------------------------------------
# Device traversal
# ---------------------------------------------------------------------------


def _ray_aabb_t(omin, omax, origin, inv_dir, t_max):
    """Slab test; returns (hit, t_enter) broadcast over leading dims."""
    t0 = (omin - origin) * inv_dir
    t1 = (omax - origin) * inv_dir
    tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tfar >= jnp.maximum(tnear, 0.0)) & (tnear < t_max)
    return hit, tnear


def _tri_hit(origin, direction, a, b, c, eps=1e-7):
    e1 = b - a
    e2 = c - a
    p = jnp.cross(direction, e2)
    det = jnp.sum(e1 * p, axis=-1)
    inv = jnp.where(jnp.abs(det) > eps, 1.0 / det, 0.0)
    s = origin - a
    u = jnp.sum(s * p, axis=-1) * inv
    q = jnp.cross(s, e1)
    v = jnp.sum(direction * q, axis=-1) * inv
    t = jnp.sum(e2 * q, axis=-1) * inv
    hit = (
        (jnp.abs(det) > eps) & (u >= 0) & (v >= 0) & (u + v <= 1.0) & (t > 1e-4)
    )
    return t, u, v, hit


@functools.partial(jax.jit, static_argnames=("any_hit",))
def intersect(bvh: BVH, origin, direction, t_max=jnp.inf, *, any_hit: bool = False):
    """Batched closest-hit (or any-hit) traversal.

    ``origin``/``direction``: (R, 3). Returns a dict with t (R,), tri (R,)
    reordered-triangle index (-1 = miss), u/v barycentrics. For
    ``any_hit`` the traversal early-outs per ray on the first hit
    (shadow rays, reference TraceSky transmission ray analog).
    """
    r = origin.shape[0]
    inv_dir = jnp.where(jnp.abs(direction) > 1e-12, 1.0 / direction, 1e12)
    t_best = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))

    def body(state):
        stack, sp, node, t_best, tri_best, u_best, v_best, live = state

        is_leaf = bvh.node_count[node] > 0

        # --- leaf: test its (fixed LEAF_SIZE) triangle slots --------------
        start = bvh.node_start[node]

        def leaf_tests(carry, k):
            t_b, tri_b, u_b, v_b = carry
            idx = start + k
            in_leaf = (k < bvh.node_count[node]) & is_leaf & live
            a = bvh.v0[idx]
            b = bvh.v1[idx]
            c = bvh.v2[idx]
            t, u, v, hit = _tri_hit(origin, direction, a, b, c)
            take = in_leaf & hit & (t < t_b)
            return (
                jnp.where(take, t, t_b),
                jnp.where(take, idx, tri_b),
                jnp.where(take, u, u_b),
                jnp.where(take, v, v_b),
            ), None

        (t_best, tri_best, u_best, v_best), _ = jax.lax.scan(
            leaf_tests, (t_best, tri_best, u_best, v_best), jnp.arange(LEAF_SIZE)
        )

        # --- internal: test both children, push far, descend near ---------
        left = bvh.node_left[node]
        right = left + 1
        lhit, lt = _ray_aabb_t(
            bvh.node_min[left], bvh.node_max[left], origin, inv_dir, t_best
        )
        rhit, rt = _ray_aabb_t(
            bvh.node_min[right], bvh.node_max[right], origin, inv_dir, t_best
        )
        lhit = lhit & ~is_leaf & live
        rhit = rhit & ~is_leaf & live

        near_is_left = lt <= rt
        near = jnp.where(near_is_left, left, right)
        far = jnp.where(near_is_left, right, left)
        near_hit = jnp.where(near_is_left, lhit, rhit)
        far_hit = jnp.where(near_is_left, rhit, lhit)

        # push far child when both hit
        push = near_hit & far_hit
        stack = jnp.where(
            push[:, None] & (jnp.arange(MAX_STACK)[None, :] == sp[:, None]),
            far[:, None],
            stack,
        )
        sp = sp + push.astype(jnp.int32)

        # next node: near/far if hit, else pop
        descend = near_hit | far_hit
        next_node = jnp.where(near_hit, near, far)

        pop = ~descend & live
        sp_pop = jnp.maximum(sp - 1, 0)
        popped = jnp.take_along_axis(stack, sp_pop[:, None], axis=1)[:, 0]
        empty = sp == 0
        node = jnp.where(descend, next_node, jnp.where(empty, 0, popped))
        sp = jnp.where(pop, sp_pop, sp)
        live = live & ~(pop & empty)
        if any_hit:
            live = live & (tri_best < 0)

        return stack, sp, node, t_best, tri_best, u_best, v_best, live

    def cond(state):
        return jnp.any(state[-1])

    stack0 = jnp.zeros((r, MAX_STACK), jnp.int32)
    sp0 = jnp.zeros((r,), jnp.int32)
    node0 = jnp.zeros((r,), jnp.int32)
    tri0 = jnp.full((r,), -1, jnp.int32)
    u0 = jnp.zeros((r,))
    v0 = jnp.zeros((r,))
    live0 = jnp.ones((r,), bool)

    state = jax.lax.while_loop(
        cond, body, (stack0, sp0, node0, t_best, tri0, u0, v0, live0)
    )
    _, _, _, t, tri, u, v, _ = state
    return {"t": t, "tri": tri, "u": u, "v": v, "hit": tri >= 0}
