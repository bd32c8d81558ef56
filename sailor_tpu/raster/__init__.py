"""TPU software rasterizer.

Replaces the reference's Vulkan raster pipeline (DepthPrepassNode /
RenderSceneNode draws, Runtime/GraphicsDriver/Vulkan/) with a visibility-
buffer design that maps to TPU strengths:

1. ``setup``      — vertex transform (one big batched matmul), triangle
                    setup (edge/z plane coefficients), tile binning via
                    broadcasted AABB tests + cumsum + searchsorted
                    (no sort, no scatter, no atomics).
2. ``tile_raster``— Pallas kernel: per screen tile, loop candidate
                    triangles in VMEM, edge-test 32x128-pixel blocks on the
                    VPU, keep arg-max reverse-Z depth -> (depth, tri id).
3. ``interpolate``— per-pixel gather of the winning triangle's vertices,
                    perspective-correct barycentric attribute interpolation
                    -> GBuffer (the "forward" shading inputs).
"""

from sailor_tpu.raster import interpolate, setup, tile_raster
from sailor_tpu.raster.pipeline import rasterize

__all__ = ["setup", "tile_raster", "interpolate", "rasterize"]
