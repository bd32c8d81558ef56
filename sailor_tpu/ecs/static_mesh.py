"""Static-mesh renderer system — counterpart of
Runtime/ECS/StaticMeshRendererECS.cpp.

The reference builds render proxies in worker-task chunks, maintains
octrees for culling, and resolves materials per mesh.  Here the system
merges instance geometry into one device soup (rebuilt only when the
instance set or a transform changes — a topology epoch), and per-frame
culling happens on device in the raster/binning path, so no octree is
needed: frustum rejection of triangles is O(T) dense math.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sailor_tpu.ecs.ecs import System, SystemRegistry
from sailor_tpu.raster.setup import Geometry


@SystemRegistry.register
class StaticMeshSystem(System):
    order = 120
    name = "StaticMesh"

    def __init__(self, world=None):
        super().__init__(world)
        self.instances: dict[int, dict] = {}  # handle -> {mesh, transform, material}
        self._next = 0
        self.geometry: Geometry | None = None
        self._dirty = True
        self._last_matrices = None

    def add(self, mesh, transform: int, material_id: int = 0) -> int:
        h = self._next
        self._next += 1
        self.instances[h] = {
            "mesh": mesh, "transform": transform, "material": material_id,
        }
        self._dirty = True
        return h

    def remove(self, h: int) -> None:
        self.instances.pop(h, None)
        self._dirty = True

    def tick(self, dt: float) -> None:
        tsys = self.world.system("Transform") if self.world else None
        if tsys is None or tsys.world_matrices is None or not self.instances:
            return
        wm = np.asarray(tsys.world_matrices)
        tids = [i["transform"] for i in self.instances.values()]
        mats = wm[np.asarray(tids)]
        if not self._dirty and self._last_matrices is not None and np.allclose(
            mats, self._last_matrices
        ):
            return  # geometry up to date
        self._last_matrices = mats

        pos, nrm, uv, col, idx, mid = [], [], [], [], [], []
        voff = 0
        for inst, m in zip(self.instances.values(), mats):
            mesh = inst["mesh"]
            p = mesh.positions @ m[:3, :3].T + m[:3, 3]
            inv = np.linalg.inv(m[:3, :3]).astype(np.float32)
            n = mesh.normals @ inv
            n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
            pos.append(p.astype(np.float32))
            nrm.append(n)
            uv.append(mesh.uvs)
            col.append(mesh.colors)
            idx.append(mesh.indices + voff)
            mid.append(np.full(len(mesh.indices), inst["material"], np.int32))
            voff += len(p)
        self.geometry = Geometry(
            position=jnp.asarray(np.concatenate(pos)),
            normal=jnp.asarray(np.concatenate(nrm)),
            uv=jnp.asarray(np.concatenate(uv)),
            color=jnp.asarray(np.concatenate(col)),
            indices=jnp.asarray(np.concatenate(idx)),
            material_id=jnp.asarray(np.concatenate(mid)),
        )
        self._dirty = False
