"""Light table as struct-of-arrays — TPU-native LightData
(Content/Shaders/Lighting.glsl LightData struct, Runtime/ECS/LightingECS.h
LightShaderData).

The reference keeps a 65,535-slot SSBO with dirty-range uploads; here the
light table is a pytree of padded arrays resident in HBM — "upload" is just
functional update, and XLA keeps it on-device between frames.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

# Light types (parity with LightData.type encoding used by Standard.shader)
DIRECTIONAL = 0
POINT = 1
SPOT = 2

# Shadow types (LightData.shadowType)
SHADOW_NONE = 0
SHADOW_PCF = 1
SHADOW_EVSM = 2


@struct.dataclass
class Lights:
    """Padded SoA light table. ``num`` is the live count (<= capacity)."""

    type: jnp.ndarray          # (L,) int32
    shadow_type: jnp.ndarray   # (L,) int32
    position: jnp.ndarray      # (L, 3) world position
    direction: jnp.ndarray     # (L, 3) normalized
    intensity: jnp.ndarray     # (L, 3) radiance
    attenuation: jnp.ndarray   # (L, 3) constant/linear/quadratic
    cutoff: jnp.ndarray        # (L, 2) cos inner/outer (spot)
    radius: jnp.ndarray        # (L,) bounds radius (bounds.x in reference)
    num: jnp.ndarray           # scalar int32 live count

    @property
    def capacity(self) -> int:
        return self.type.shape[0]

    @property
    def valid_mask(self):
        return jnp.arange(self.capacity) < self.num

    @classmethod
    def empty(cls, capacity: int) -> "Lights":
        z = jnp.zeros
        return cls(
            type=z((capacity,), jnp.int32),
            shadow_type=z((capacity,), jnp.int32),
            position=z((capacity, 3)),
            direction=jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]]), (capacity, 1)),
            intensity=z((capacity, 3)),
            attenuation=jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (capacity, 1)),
            cutoff=z((capacity, 2)),
            radius=z((capacity,)),
            num=jnp.asarray(0, jnp.int32),
        )

    @classmethod
    def from_host(cls, types, positions, directions, intensities,
                  attenuations=None, cutoffs=None, radii=None,
                  shadow_types=None, capacity: int | None = None) -> "Lights":
        import numpy as np

        n = len(types)
        capacity = capacity or max(1, n)
        # host-side numpy defaults mirroring cls.empty — building via
        # empty() round-tripped every field device->host (np.asarray on
        # a jnp array), 9 tunnel RTTs that intermittently STALLED the
        # axon D2H path (observed: bench --warm-probe hung here >500 s)
        defaults = {
            "type": np.zeros(capacity, np.int32),
            "shadow_type": np.zeros(capacity, np.int32),
            "position": np.zeros((capacity, 3), np.float32),
            "direction": np.tile(
                np.asarray([[0.0, -1.0, 0.0]], np.float32), (capacity, 1)),
            "intensity": np.zeros((capacity, 3), np.float32),
            "attenuation": np.tile(
                np.asarray([[1.0, 0.0, 0.0]], np.float32), (capacity, 1)),
            "cutoff": np.zeros((capacity, 2), np.float32),
            "radius": np.zeros(capacity, np.float32),
        }

        def put(field, values, default=None):
            arr = defaults[field]
            if values is not None:
                arr[:n] = np.asarray(values)
            elif default is not None:
                arr[:n] = default
            return jnp.asarray(arr)

        return cls(
            type=put("type", np.asarray(types, np.int32)),
            shadow_type=put("shadow_type", shadow_types),
            position=put("position", positions),
            direction=put("direction", directions),
            intensity=put("intensity", intensities),
            attenuation=put("attenuation", attenuations),
            cutoff=put("cutoff", cutoffs),
            radius=put("radius", radii, default=100.0),
            num=jnp.asarray(n, jnp.int32),
        )
