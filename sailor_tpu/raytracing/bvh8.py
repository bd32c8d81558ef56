"""8-wide BVH with a single packed row table — the TPU traversal format.

Motivation (measured on TPU v5e): XLA gathers cost ~25-40us per *op*
almost independent of row width, so traversal speed is set by
(gathers per iteration) x (lockstep iterations).  The binary BVH
(bvh.py) does ~15 narrow gathers over ~500 iterations; this module does
ONE wide gather over ~100 iterations:

- Every node (internal or leaf) is one row of a (N, ROW) f32 table.
- Internal row: 8 children's AABBs in SoA slots + child row indices
  (bitcast int32) — one slab test covers all 8 children as (R, 8) ops.
- Leaf row: up to 7 triangles pre-transformed to Moller-Trumbore form
  (v0, e1, e2) in SoA slots + original tri ids (bitcast int32).
- Traversal stack holds (base << 8 | mask) entries: since children are
  contiguous rows, popping = take the lowest set bit — stack touches a
  single column per iteration, never a scatter.

Build: binary SAH (bvh.build) collapsed host-side to 8 children / 7-tri
leaves. Reference counterpart: Runtime/Raytracing/BVH.cpp (SAH build +
ordered traversal); the wide layout is the TPU-native redesign.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from sailor_tpu.raytracing import bvh as bvh2

ROW = 72          # row width in f32 lanes
MAX_CHILDREN = 8
MAX_LEAF = 7
MAX_STACK = 12    # >= 2x depth of the 8-wide tree (near/far groups per
                  # level, ~5 levels for 1M tris) + slack; every stack
                  # touch is an (S, R) pass so S is a direct cost

# Internal row layout
_I_MIN = 0        # [0:24]  minx[8], miny[8], minz[8]
_I_MAX = 24       # [24:48] maxx[8], maxy[8], maxz[8]
_I_CHILD = 48     # [48:56] child row index (int32 bitcast), -1 = empty
_FLAG = 71        # 0.0 = internal, 1.0 = leaf

# Leaf row layout
_L_V0 = 0         # [0:21]  v0x[7], v0y[7], v0z[7]
_L_E1 = 21        # [21:42] e1x[7], e1y[7], e1z[7]
_L_E2 = 42        # [42:63] e2x[7], e2y[7], e2z[7]
_L_ID = 63        # [63:70] original tri id (int32 bitcast), -1 = empty


@struct.dataclass
class BVH8:
    table: jnp.ndarray   # (N, ROW) f32
    num_tris: int = struct.field(pytree_node=False)


def _collapse(b, v0, v1, v2) -> np.ndarray:
    """Collapse a binary BVH (host arrays) into packed 8-wide rows."""
    n_min = np.asarray(b.node_min)
    n_max = np.asarray(b.node_max)
    n_left = np.asarray(b.node_left)
    n_start = np.asarray(b.node_start)
    n_count = np.asarray(b.node_count)
    tv0 = np.asarray(b.v0)
    tv1 = np.asarray(b.v1)
    tv2 = np.asarray(b.v2)
    tid = np.asarray(b.tri_index)

    rows: list[np.ndarray] = []

    def new_row():
        rows.append(np.zeros(ROW, np.float32))
        return len(rows) - 1

    def pack_leaf(row_id, start, count):
        row = rows[row_id]
        ids = np.full(MAX_LEAF, -1, np.int32)
        for k in range(count):
            t = start + k
            a, e1, e2 = tv0[t], tv1[t] - tv0[t], tv2[t] - tv0[t]
            row[_L_V0 + k] = a[0]
            row[_L_V0 + 7 + k] = a[1]
            row[_L_V0 + 14 + k] = a[2]
            row[_L_E1 + k] = e1[0]
            row[_L_E1 + 7 + k] = e1[1]
            row[_L_E1 + 14 + k] = e1[2]
            row[_L_E2 + k] = e2[0]
            row[_L_E2 + 7 + k] = e2[1]
            row[_L_E2 + 14 + k] = e2[2]
            ids[k] = tid[t]
        row[_L_ID : _L_ID + MAX_LEAF] = ids.view(np.float32)
        row[_FLAG] = 1.0

    def gather_children(node) -> list[int]:
        """Split binary children until up to 8 slots (prefer largest area)."""
        slots = [node]
        def area(i):
            d = np.maximum(n_max[i] - n_min[i], 0)
            return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]
        while len(slots) < MAX_CHILDREN:
            # pick the internal slot with the largest surface area to split
            cand = [s for s in slots if n_count[s] == 0]
            if not cand:
                break
            s = max(cand, key=area)
            if len(slots) + 1 > MAX_CHILDREN:
                break
            slots.remove(s)
            slots.extend([n_left[s], n_left[s] + 1])
        return slots

    def emit(node) -> int:
        row_id = new_row()
        if n_count[node] > 0:
            pack_leaf(row_id, n_start[node], n_count[node])
            return row_id
        slots = gather_children(node)
        row = rows[row_id]
        child_ids = np.full(MAX_CHILDREN, -1, np.int32)
        # Children must be contiguous: emit them consecutively. Emit order
        # is breadth-contiguous: reserve by emitting children right after
        # one another (recursion emits grandchildren later — enforce
        # contiguity by first creating the 8 rows, then filling).
        child_rows = []
        for _ in slots:
            child_rows.append(new_row())
        for k, s in enumerate(slots):
            # fill child row content in place
            fill(child_rows[k], s)
            child_ids[k] = child_rows[k]
            row[_I_MIN + k] = n_min[s][0]
            row[_I_MIN + 8 + k] = n_min[s][1]
            row[_I_MIN + 16 + k] = n_min[s][2]
            row[_I_MAX + k] = n_max[s][0]
            row[_I_MAX + 8 + k] = n_max[s][1]
            row[_I_MAX + 16 + k] = n_max[s][2]
        # empty slots: inverted AABB so the slab test always misses
        for k in range(len(slots), MAX_CHILDREN):
            row[_I_MIN + k] = 1.0
            row[_I_MIN + 8 + k] = 1.0
            row[_I_MIN + 16 + k] = 1.0
            row[_I_MAX + k] = -1.0
            row[_I_MAX + 8 + k] = -1.0
            row[_I_MAX + 16 + k] = -1.0
        row[_I_CHILD : _I_CHILD + MAX_CHILDREN] = child_ids.view(np.float32)
        row[_FLAG] = 0.0
        return row_id

    def fill(row_id, node):
        if n_count[node] > 0:
            pack_leaf(row_id, n_start[node], n_count[node])
            return
        slots = gather_children(node)
        row = rows[row_id]
        child_ids = np.full(MAX_CHILDREN, -1, np.int32)
        child_rows = [new_row() for _ in slots]
        for k, s in enumerate(slots):
            fill(child_rows[k], s)
            child_ids[k] = child_rows[k]
            row[_I_MIN + k] = n_min[s][0]
            row[_I_MIN + 8 + k] = n_min[s][1]
            row[_I_MIN + 16 + k] = n_min[s][2]
            row[_I_MAX + k] = n_max[s][0]
            row[_I_MAX + 8 + k] = n_max[s][1]
            row[_I_MAX + 16 + k] = n_max[s][2]
        for k in range(len(slots), MAX_CHILDREN):
            row[_I_MIN + k] = 1.0
            row[_I_MIN + 8 + k] = 1.0
            row[_I_MIN + 16 + k] = 1.0
            row[_I_MAX + k] = -1.0
            row[_I_MAX + 8 + k] = -1.0
            row[_I_MAX + 16 + k] = -1.0
        row[_I_CHILD : _I_CHILD + MAX_CHILDREN] = child_ids.view(np.float32)
        row[_FLAG] = 0.0

    emit(0)
    return np.stack(rows)


def build(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
          use_native: bool = True) -> BVH8:
    """Build the packed 8-wide BVH (host).

    Uses the native C++ builder (native/sailor_native.cpp, ~40,000x faster
    than the Python path for large meshes) when available; falls back to
    the pure-Python collapse otherwise."""
    if use_native:
        from sailor_tpu import native_bridge

        table = native_bridge.bvh8_build(
            np.asarray(v0), np.asarray(v1), np.asarray(v2)
        )
        if table is not None:
            return BVH8(table=jnp.asarray(table), num_tris=len(v0))
    b = bvh2.build(np.asarray(v0), np.asarray(v1), np.asarray(v2))
    table = _collapse(b, v0, v1, v2)
    return BVH8(table=jnp.asarray(table), num_tris=len(v0))


# ---------------------------------------------------------------------------
# Traversal
# ---------------------------------------------------------------------------


def _bitcast_i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


@functools.partial(jax.jit, static_argnames=("any_hit",))
def intersect(bvh8: BVH8, origin, direction, t_max=None, *, any_hit: bool = False,
              active=None):
    """Batched traversal. origin/direction (R, 3). Returns dict with
    t, tri (original triangle id, -1 = miss), u, v, hit.

    ``active``: optional (R,) bool — rays that start dead (terminated
    bounces, back-facing shadow rays) retire immediately, shortening the
    lockstep loop whenever a dead lane would otherwise have been the
    longest traversal.

    Layout note: every 2-D per-iteration array keeps the RAY axis minor
    ((7, R) triangle lanes, (8, R) child lanes, (S, R) stack): TPU tiles
    pad the minor dimension to 128 lanes, so the row-major (R, 7) forms
    cost ~18x their true bytes (measured — this transposition alone was a
    ~10x traversal speedup).
    """
    r = origin.shape[0]
    table = bvh8.table
    inv_dir = jnp.where(jnp.abs(direction) > 1e-12, 1.0 / direction, 1e12)
    ox, oy, oz = origin[:, 0], origin[:, 1], origin[:, 2]       # (R,)
    ix, iy, iz = inv_dir[:, 0], inv_dir[:, 1], inv_dir[:, 2]
    dx, dy, dz = direction[:, 0], direction[:, 1], direction[:, 2]

    if t_max is None:
        t0 = jnp.full((r,), jnp.inf)
    else:
        t0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))

    def body(state):
        stack, sp, node, t_best, tri_best, u_best, v_best, live = state
        rowt = table[node].T  # (ROW, R): one gather + one transpose

        is_leaf = rowt[_FLAG] > 0.5  # (R,)

        # ---- leaf: Moller-Trumbore against 7 packed triangles ------------
        v0x = rowt[_L_V0 : _L_V0 + 7]          # (7, R)
        v0y = rowt[_L_V0 + 7 : _L_V0 + 14]
        v0z = rowt[_L_V0 + 14 : _L_V0 + 21]
        e1x = rowt[_L_E1 : _L_E1 + 7]
        e1y = rowt[_L_E1 + 7 : _L_E1 + 14]
        e1z = rowt[_L_E1 + 14 : _L_E1 + 21]
        e2x = rowt[_L_E2 : _L_E2 + 7]
        e2y = rowt[_L_E2 + 7 : _L_E2 + 14]
        e2z = rowt[_L_E2 + 14 : _L_E2 + 21]
        ids = _bitcast_i32(rowt[_L_ID : _L_ID + 7])

        dxb, dyb, dzb = dx[None], dy[None], dz[None]
        px = dyb * e2z - dzb * e2y
        py = dzb * e2x - dxb * e2z
        pz = dxb * e2y - dyb * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv_det = jnp.where(jnp.abs(det) > 1e-10, 1.0 / det, 0.0)
        sx = ox[None] - v0x
        sy = oy[None] - v0y
        sz = oz[None] - v0z
        u = (sx * px + sy * py + sz * pz) * inv_det
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = (dxb * qx + dyb * qy + dzb * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        tri_ok = (
            is_leaf[None]
            & (ids >= 0)
            & (jnp.abs(det) > 1e-10)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > 1e-4)
            & (t < t_best[None])
            & live[None]
        )
        t_cand = jnp.where(tri_ok, t, jnp.inf)       # (7, R)
        t_leaf = jnp.min(t_cand, axis=0)             # (R,)
        win = t_cand == t_leaf[None]
        take = jnp.isfinite(t_leaf)

        def sel(a, fill):
            return jnp.max(jnp.where(win, a, fill), axis=0)

        t_best = jnp.where(take, t_leaf, t_best)
        tri_best = jnp.where(take, sel(ids, -1), tri_best)
        u_best = jnp.where(take, sel(u, -jnp.inf), u_best)
        v_best = jnp.where(take, sel(v, -jnp.inf), v_best)

        # ---- internal: slab-test 8 children ------------------------------
        minx = rowt[_I_MIN : _I_MIN + 8]             # (8, R)
        miny = rowt[_I_MIN + 8 : _I_MIN + 16]
        minz = rowt[_I_MIN + 16 : _I_MIN + 24]
        maxx = rowt[_I_MAX : _I_MAX + 8]
        maxy = rowt[_I_MAX + 8 : _I_MAX + 16]
        maxz = rowt[_I_MAX + 16 : _I_MAX + 24]
        child = _bitcast_i32(rowt[_I_CHILD : _I_CHILD + 8])

        tx0 = (minx - ox[None]) * ix[None]
        tx1 = (maxx - ox[None]) * ix[None]
        ty0 = (miny - oy[None]) * iy[None]
        ty1 = (maxy - oy[None]) * iy[None]
        tz0 = (minz - oz[None]) * iz[None]
        tz1 = (maxz - oz[None]) * iz[None]
        tnear = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.maximum(jnp.minimum(tz0, tz1), 0.0),
        )
        tfar = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        chit = (
            (tfar >= tnear)
            & (tnear < t_best[None])
            & (child >= 0)
            & ~is_leaf[None]
            & live[None]
        )
        bits = jnp.left_shift(1, jnp.arange(8))[:, None]
        # Approximate front-to-back ordering: split hit children into a
        # NEAR and a FAR group around the midpoint of their tnear range and
        # push the far group first so near children pop first. Visiting
        # near-first shrinks t_best early, so far subtrees die at their
        # slab test instead of being descended (fewer lockstep iterations —
        # the reference's ordered binary traversal, BVH.cpp, adapted to the
        # 8-wide bitmask stack).
        tn_hit = jnp.where(chit, tnear, jnp.inf)
        tn_min = jnp.min(tn_hit, axis=0)                    # (R,)
        tn_max = jnp.max(jnp.where(chit, tnear, -jnp.inf), axis=0)
        thresh = 0.5 * (tn_min + tn_max)
        near_g = chit & (tnear <= thresh[None])
        far_g = chit & ~near_g
        mask_near = jnp.sum(jnp.where(near_g, bits, 0), axis=0)  # (R,)
        mask_far = jnp.sum(jnp.where(far_g, bits, 0), axis=0)
        # children rows are contiguous, so child k = base0 + k; store
        # (base0 << 8) | mask (slot 0 always populated for internal nodes).
        base0 = child[0]
        entry_near = jnp.where(mask_near > 0, (base0 << 8) | mask_near, 0)
        entry_far = jnp.where(mask_far > 0, (base0 << 8) | mask_far, 0)

        # ---- stack update (stack is (S, R): ray axis minor) ----------------
        col = jnp.arange(MAX_STACK)[:, None]
        # clamp: a push at sp == MAX_STACK would silently drop the write but
        # still bump sp, making the next pop read a zero entry and compute a
        # garbage node index (base - 127) -> false hits. Dropping the push
        # loses at most one subtree on pathologically deep trees; never
        # corrupts traversal.
        # Both pushes land in ONE (S, R) select pass: far goes at sp, near
        # above it (or at sp when no far) — each full-stack where is an
        # HBM round trip over (S, R), ~2 of the ~12 compute fusions per
        # iteration, so folding two passes into one is a direct win.
        push_far = (mask_far > 0) & live & (sp < MAX_STACK)
        sp_near = sp + push_far.astype(jnp.int32)
        push_near = (mask_near > 0) & live & (sp_near < MAX_STACK)
        at_far = (col == sp[None]) & push_far[None]
        at_near = (col == sp_near[None]) & push_near[None]
        stack = jnp.where(
            at_near, entry_near[None], jnp.where(at_far, entry_far[None], stack)
        )
        sp = sp_near + push_near.astype(jnp.int32)

        # pop: take top entry, extract lowest set bit -> next node.
        has = (sp > 0) & live
        sp_top = jnp.maximum(sp - 1, 0)
        top = jnp.max(jnp.where(col == sp_top[None], stack, 0), axis=0)  # (R,)
        tmask = top & 0xFF
        tbase = top >> 8
        low = tmask & -tmask  # lowest set bit
        k = _popcount_below(low)
        nxt = tbase + k
        rem = tmask & (tmask - 1)
        new_top = jnp.where(rem > 0, (tbase << 8) | rem, 0)
        stack = jnp.where((col == sp_top[None]) & has[None], new_top[None], stack)
        sp = jnp.where(has & (rem == 0), sp_top, sp)
        # dead lanes park on row 0: gather cost tracks unique rows touched,
        # so pointing every retired lane at one cached row makes the tail
        # iterations (mostly-dead waves) nearly free
        node = jnp.where(has, nxt, 0)
        live = live & has
        if any_hit:
            live = live & (tri_best < 0)
        return stack, sp, node, t_best, tri_best, u_best, v_best, live

    def cond(state):
        return jnp.any(state[-1])

    stack0 = jnp.zeros((MAX_STACK, r), jnp.int32)
    sp0 = jnp.zeros((r,), jnp.int32)
    node0 = jnp.zeros((r,), jnp.int32)
    tri0 = jnp.full((r,), -1, jnp.int32)
    live0 = jnp.ones((r,), bool) if active is None else jnp.asarray(active)
    state = jax.lax.while_loop(
        cond,
        body,
        (stack0, sp0, node0, t0, tri0, jnp.zeros((r,)), jnp.zeros((r,)),
         live0),
    )
    _, _, _, t, tri, u, v, _ = state
    return {"t": t, "tri": tri, "u": u, "v": v, "hit": tri >= 0}


def _popcount_below(low_bit):
    """index of the (single) set bit in low_bit (1, 2, 4, ..., 128)."""
    # log2 for powers of two via float exponent bits
    f = low_bit.astype(jnp.float32)
    return (_bitcast_i32(f) >> 23) - 127
