"""Static-mesh renderer system — counterpart of
Runtime/ECS/StaticMeshRendererECS.cpp.

The reference builds render proxies in worker-task chunks, maintains
octrees for culling, and resolves materials per mesh.  Here the system
keeps ONE local-space vertex soup with a per-vertex instance id (built
host-side only when the instance SET changes) and transforms it on DEVICE
every time a transform changes: a (V,)-row gather of the instance matrices
plus one batched matmul — the per-instance SSBO + GPU vertex transform of
RenderSceneNode.cpp:148-228 without any host re-concatenation or PCIe
re-upload on movement (the round-1 host rebuild serialized animated scenes
on CPU + transfer).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from sailor_tpu.ecs.ecs import System, SystemRegistry
from sailor_tpu.raster.setup import Geometry


@jax.jit
def _transform_soup(local_pos, local_nrm, inst_of_vertex, matrices):
    """World-space positions/normals from local soup + instance matrices.

    ``matrices``: (I, 4, 4) world transforms; ``inst_of_vertex``: (V,).
    Normals use the inverse-transpose (computed per instance, I is small).
    """
    m = matrices[inst_of_vertex]                      # (V, 4, 4) gather
    p = jnp.einsum("vij,vj->vi", m[:, :3, :3], local_pos) + m[:, :3, 3]
    inv_t = jnp.transpose(
        jnp.linalg.inv(matrices[:, :3, :3]), (0, 2, 1)
    )[inst_of_vertex]
    n = jnp.einsum("vij,vj->vi", inv_t, local_nrm)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return p, n


@SystemRegistry.register
class StaticMeshSystem(System):
    order = 120
    name = "StaticMesh"

    def __init__(self, world=None):
        super().__init__(world)
        self.instances: dict[int, dict] = {}  # handle -> {mesh, transform, material}
        self._next = 0
        self.geometry: Geometry | None = None
        self._topology_dirty = True
        self._soup = None          # local-space device soup
        self._tids = None          # (I,) transform handles
        self._seen_tversion = -1

    def add(self, mesh, transform: int, material_id: int = 0) -> int:
        h = self._next
        self._next += 1
        self.instances[h] = {
            "mesh": mesh, "transform": transform, "material": material_id,
        }
        self._topology_dirty = True
        return h

    def remove(self, h: int) -> None:
        self.instances.pop(h, None)
        self._topology_dirty = True

    def _rebuild_soup(self) -> None:
        """Host-side: concatenate LOCAL geometry once per topology change."""
        pos, nrm, uv, col, idx, mid, iid = [], [], [], [], [], [], []
        voff = 0
        for k, inst in enumerate(self.instances.values()):
            mesh = inst["mesh"]
            pos.append(np.asarray(mesh.positions, np.float32))
            nrm.append(np.asarray(mesh.normals, np.float32))
            uv.append(np.asarray(mesh.uvs, np.float32))
            col.append(np.asarray(mesh.colors, np.float32))
            idx.append(np.asarray(mesh.indices, np.int32) + voff)
            mid.append(np.full(len(mesh.indices), inst["material"], np.int32))
            iid.append(np.full(len(mesh.positions), k, np.int32))
            voff += len(mesh.positions)
        self._soup = {
            "position": jnp.asarray(np.concatenate(pos)),
            "normal": jnp.asarray(np.concatenate(nrm)),
            "uv": jnp.asarray(np.concatenate(uv)),
            "color": jnp.asarray(np.concatenate(col)),
            "indices": jnp.asarray(np.concatenate(idx)),
            "material_id": jnp.asarray(np.concatenate(mid)),
            "instance": jnp.asarray(np.concatenate(iid)),
        }
        self._tids = np.asarray(
            [i["transform"] for i in self.instances.values()], np.int32
        )
        self._topology_dirty = False

    def tick(self, dt: float) -> None:
        tsys = self.world.system("Transform") if self.world else None
        if tsys is None or tsys.world_matrices is None or not self.instances:
            return
        if self._topology_dirty:
            self._rebuild_soup()
            self._seen_tversion = -1
        if self._seen_tversion == tsys.version and self.geometry is not None:
            return  # nothing moved (version check, not an O(N) matrix scan)
        self._seen_tversion = tsys.version

        mats = tsys.world_matrices[jnp.asarray(self._tids)]  # device gather
        p, n = _transform_soup(
            self._soup["position"], self._soup["normal"],
            self._soup["instance"], mats,
        )
        self.geometry = Geometry(
            position=p,
            normal=n,
            uv=self._soup["uv"],
            color=self._soup["color"],
            indices=self._soup["indices"],
            material_id=self._soup["material_id"],
        )
