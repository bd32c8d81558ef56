"""Camera system — counterpart of Runtime/ECS/CameraECS.{h,cpp}.

Computes view/projection from transform world matrices and snapshots
FrameData per camera (CameraData -> RHISceneViewSnapshot copy)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sailor_tpu.core import math3d as m3
from sailor_tpu.ecs.ecs import ComponentPool, System, SystemRegistry
from sailor_tpu.rhi.types import FrameData


@SystemRegistry.register
class CameraSystem(System):
    order = 100
    name = "Camera"

    def __init__(self, world=None, capacity: int = 8):
        super().__init__(world)
        self.pool = ComponentPool(
            {
                "transform": ((), np.int32, -1),
                "fov_y": ((), np.float32, np.pi / 3),
                "aspect": ((), np.float32, 16 / 9),
                "z_near": ((), np.float32, 0.1),
                "z_far": ((), np.float32, 100.0),
            },
            capacity,
        )
        self.frames: dict[int, FrameData] = {}
        self._time = 0.0

    def add(self, transform: int, fov_y=np.pi / 3, aspect=16 / 9,
            z_near=0.1, z_far=100.0) -> int:
        h = self.pool.acquire()
        self.pool.transform[h] = transform
        self.pool.fov_y[h] = fov_y
        self.pool.aspect[h] = aspect
        self.pool.z_near[h] = z_near
        self.pool.z_far[h] = z_far
        return h

    def tick(self, dt: float) -> None:
        self._time += dt
        tsys = self.world.system("Transform") if self.world else None
        self.frames = {}
        for h in np.nonzero(self.pool.alive)[0]:
            t = int(self.pool.transform[h])
            if tsys is not None and t >= 0 and tsys.world_matrices is not None:
                model = tsys.world_matrices[t]
                view = jnp.linalg.inv(model)
                cam_pos = model[:3, 3]
            else:
                view = m3.identity4()
                cam_pos = jnp.zeros(3)
            proj = m3.perspective(
                float(self.pool.fov_y[h]), float(self.pool.aspect[h]),
                float(self.pool.z_near[h]), float(self.pool.z_far[h]),
            )
            self.frames[int(h)] = FrameData.create(
                view, proj, cam_pos,
                float(self.pool.z_near[h]), float(self.pool.z_far[h]),
                time=self._time, dt=dt,
            )

    def main_frame(self) -> FrameData | None:
        if not self.frames:
            return None
        return self.frames[min(self.frames)]
