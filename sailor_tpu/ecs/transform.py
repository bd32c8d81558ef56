"""Hierarchical transforms — TPU-native TransformECS (Runtime/ECS/
TransformECS.cpp).

The reference dirty-sorts and recursively propagates world matrices on the
CPU, picking between an O(2 dirty log dirty) and O(2N) path by cost model.
On TPU the whole pool recomputes in a handful of batched 4x4 matmuls: one
``trs`` over all components, then one matmul per hierarchy *depth level*
(world[i] = world[parent[i]] @ local[i]), which is both simpler and faster
than host-side dirty bookkeeping for any realistic scene size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from sailor_tpu.core import math3d as m3
from sailor_tpu.ecs.ecs import ComponentPool, System, SystemRegistry


@functools.partial(jax.jit, static_argnames=("levels",))
def compute_world_matrices(position, rotation, scale, parent, levels: int):
    """Batched hierarchy propagation.

    ``parent``: (N,) int32, -1 for roots. ``levels``: static max depth.
    """
    local = m3.trs(position, rotation, scale)  # (N, 4, 4)
    world = local
    safe_parent = jnp.maximum(parent, 0)
    is_root = parent < 0
    for _ in range(levels):
        parent_world = world[safe_parent]
        world = jnp.where(
            is_root[:, None, None], local, parent_world @ local
        )
    return world


@SystemRegistry.register
class TransformSystem(System):
    """Order 0 (reference TransformECS order)."""

    order = 0
    name = "Transform"

    def __init__(self, world=None, capacity: int = 1024):
        super().__init__(world)
        self.pool = ComponentPool(
            {
                "position": ((3,), np.float32, 0.0),
                "rotation": ((4,), np.float32, (0, 0, 0, 1)),
                "scale": ((3,), np.float32, 1.0),
                "parent": ((), np.int32, -1),
            },
            capacity,
        )
        self.world_matrices = None  # device (N, 4, 4) after tick
        self._depth = 1
        # change counter: downstream systems (lighting snapshot cache,
        # static-mesh re-transform) compare against it instead of scanning
        # matrices (the reference's dirty-flag analog, TransformECS.cpp)
        self.version = 0

    # -- component API (TransformComponent parity) --------------------------

    def add(self, position=(0, 0, 0), rotation=(0, 0, 0, 1), scale=(1, 1, 1),
            parent: int = -1) -> int:
        h = self.pool.acquire()
        self.pool.position[h] = position
        self.pool.rotation[h] = rotation
        self.pool.scale[h] = scale
        self.pool.parent[h] = parent
        self.version += 1
        return h

    def set_position(self, h: int, p) -> None:
        self.pool.position[h] = p
        self.version += 1

    def set_rotation(self, h: int, q) -> None:
        self.pool.rotation[h] = q
        self.version += 1

    def set_scale(self, h: int, s) -> None:
        self.pool.scale[h] = s
        self.version += 1

    def set_parent(self, h: int, parent: int) -> None:
        self.pool.parent[h] = parent
        self.version += 1

    def hierarchy_depth(self) -> int:
        parent = self.pool.parent
        depth = 1
        cur = parent[self.pool.alive]
        seen = 0
        while (cur >= 0).any() and seen < 64:
            cur = np.where(cur >= 0, parent[np.maximum(cur, 0)], -1)
            depth += 1
            seen += 1
        return depth

    _computed_version = -1

    def tick(self, dt: float) -> None:
        if (self.world_matrices is not None
                and self._computed_version == self.version):
            return  # nothing moved since the last recompute
        self._depth = self.hierarchy_depth()
        self.world_matrices = compute_world_matrices(
            jnp.asarray(self.pool.position),
            jnp.asarray(self.pool.rotation),
            jnp.asarray(self.pool.scale),
            jnp.asarray(self.pool.parent),
            levels=self._depth,
        )
        self._computed_version = self.version

    def world_matrix(self, h: int):
        return self.world_matrices[h]
