"""ECS: struct-of-arrays component systems.

Counterpart of Runtime/ECS/ (TSystem CRTP + contiguous TVector component
storage).  The reference is already SoA; here the arrays live as numpy on
host (cheap in-place edits from gameplay code) and snapshot to device
pytrees once per frame.  System updates that the reference threads across
workers (TransformECS dirty sort, StaticMeshRendererECS 1024-chunk fan-out)
become single vectorized device ops.
"""

from sailor_tpu.ecs.ecs import System, SystemRegistry
from sailor_tpu.ecs.transform import TransformSystem
from sailor_tpu.ecs.camera import CameraSystem
from sailor_tpu.ecs.lighting import LightingSystem
from sailor_tpu.ecs.static_mesh import StaticMeshSystem

__all__ = [
    "System", "SystemRegistry", "TransformSystem", "CameraSystem",
    "LightingSystem", "StaticMeshSystem",
]
