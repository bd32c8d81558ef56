"""SceneView: the render-thread snapshot of the world.

Counterpart of Runtime/RHI/SceneView.h — the reference copies ECS state
(octrees, cameras, lights, shadow commands) into a per-frame snapshot; here
the snapshot is a pytree of device arrays that flows into the jitted frame
graph. Copying is functional (the arrays are already on device).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from sailor_tpu.kernels.lights import Lights
from sailor_tpu.kernels.sky import SkyParams
from sailor_tpu.raster.setup import Geometry
from sailor_tpu.rhi.types import FrameData


@struct.dataclass
class SceneView:
    """Everything the frame graph needs to render one camera's view."""

    geometry: Geometry
    lights: Lights
    frame: FrameData
    prev_frame: FrameData
    sky: SkyParams
    star_dirs: jnp.ndarray    # (S, 3) — pass zeros((0,3)) when disabled
    star_colors: jnp.ndarray  # (S, 3)
    materials: "object" = None  # optional MaterialTable (assets/materials.py)
    # per-SOURCE-triangle packed attribute table
    # (interpolate.pack_source_attributes) — camera-independent, so scenes
    # that outlive one frame pre-pack it here and the frame graph reduces
    # the per-frame attribute prep to one src_id row gather
    attrs_packed: jnp.ndarray | None = None

    @classmethod
    def create(cls, geometry, lights, frame, sky=None, prev_frame=None,
               star_dirs=None, star_colors=None, materials=None,
               pack_attrs: bool = True, attrs_packed=None):
        if pack_attrs and attrs_packed is None and geometry is not None:
            from sailor_tpu.raster.interpolate import pack_source_attributes

            attrs_packed = pack_source_attributes(geometry, materials)
        return cls(
            geometry=geometry,
            lights=lights,
            frame=frame,
            prev_frame=prev_frame if prev_frame is not None else frame,
            sky=sky if sky is not None else SkyParams.default(),
            star_dirs=jnp.zeros((0, 3)) if star_dirs is None else jnp.asarray(star_dirs),
            star_colors=jnp.zeros((0, 3)) if star_colors is None else jnp.asarray(star_colors),
            materials=materials,
            attrs_packed=attrs_packed,
        )
