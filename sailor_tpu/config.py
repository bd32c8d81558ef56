"""Global configuration for Sailor-TPU.

Mirrors the roles of the reference's compile-time options (CMakeLists.txt:7-15)
and engine constants (Content/Shaders/Constants.glsl), re-expressed as runtime
configuration. Values here are *static* per-process so that jitted functions
close over them (XLA needs static shapes).
"""

from __future__ import annotations

import dataclasses
import functools
import os


# ---------------------------------------------------------------------------
# Engine constants (parity with Content/Shaders/Constants.glsl).
# ---------------------------------------------------------------------------

#: Forward+ light-culling tile edge, in pixels (Constants.glsl LIGHTS_CULLING_TILE_SIZE).
LIGHTS_CULLING_TILE_SIZE = 16
#: Max candidate lights per tile before impact sort (LIGHTS_CANDIDATES_PER_TILE).
LIGHTS_CANDIDATES_PER_TILE = 196
#: Max lights shaded per tile (LIGHTS_PER_TILE).
LIGHTS_PER_TILE = 128
#: Max lights per world (Runtime/ECS/LightingECS.h:53).
MAX_LIGHTS = 65535
#: Number of cascaded-shadow-map cascades (NUM_CSM_CASCADES).
NUM_CSM_CASCADES = 4
#: Cascade split fractions of zFar (Constants.glsl ShadowCascadeLevels).
SHADOW_CASCADE_LEVELS = (0.05, 0.1, 0.333333, 0.5)
#: CSM shadow-map resolution (Runtime/ECS/LightingECS.h cascade targets 4096^2).
CSM_RESOLUTION = 4096
#: EVSM exponents (Content/Shaders/Lighting.glsl EVSM_C1/C2).
EVSM_C1 = 40.0
EVSM_C2 = 40.0
#: GPU-culling workgroup (Constants.glsl GPU_CULLING_GROUP_SIZE) — informs kernel tiling.
GPU_CULLING_GROUP_SIZE = 256

# Luminance weights used across histogram/tonemap passes (RTR vol4 pg. 278,
# matching ComputeHistogram.shader RGB_TO_LUM).
RGB_TO_LUM = (0.2125, 0.7154, 0.0721)


# ---------------------------------------------------------------------------
# Runtime switches.
# ---------------------------------------------------------------------------


@functools.cache
def on_tpu() -> bool:
    import jax

    return jax.default_backend() in ("tpu", "axon")


@functools.cache
def interpret_pallas() -> bool:
    """Run Pallas kernels in interpreter mode off-TPU (CPU test meshes)."""
    env = os.environ.get("SAILOR_TPU_INTERPRET")
    if env is not None:
        return env not in ("0", "false", "False")
    return not on_tpu()


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static per-pipeline configuration (shapes baked into jit)."""

    width: int = 1920
    height: int = 1080
    max_lights: int = 1024
    msaa: int = 1
    # Rasterizer binning capacities (XLA static-shape regime: fixed-capacity
    # tile bins, see SURVEY.md §7 "hard parts" (a)).
    raster_tile: int = 32          # raster tile edge in pixels
    max_tris_per_tile: int = 512   # per-tile bin capacity
    reverse_z: bool = True

    @property
    def num_tiles_x(self) -> int:
        return -(-self.width // LIGHTS_CULLING_TILE_SIZE)

    @property
    def num_tiles_y(self) -> int:
        return -(-self.height // LIGHTS_CULLING_TILE_SIZE)
