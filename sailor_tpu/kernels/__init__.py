"""Pallas TPU kernels — the engine's "shader" layer.

Each module here is the TPU-native counterpart of one or more GLSL shaders
from the reference's Content/Shaders/ directory.  Where a pass is pure
elementwise math, XLA fusion of jnp ops is already speed-of-light and a
hand-written kernel would only add overhead — those passes are expressed as
jnp and fused into neighbours by jit.  Pallas is reserved for passes that
need explicit tiling, on-chip scratch, or reductions XLA schedules poorly
(histogram, tile binning/raster, light culling, blur pyramids).
"""

from sailor_tpu.kernels import common as common
