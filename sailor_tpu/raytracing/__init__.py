"""TPU path tracer.

Counterpart of Runtime/Raytracing/ (PathTracer.cpp, BVH.cpp,
LightingModel.cpp): the reference traces recursively per-pixel on CPU worker
threads in 32x32 tiles; here rays are traced as large batches — BVH
traversal is a vmapped stack-based while_loop (all rays step in lockstep,
SIMT-style), shading is vectorized GGX importance sampling with MIS, and the
bounce loop is a fixed-depth scan with live-ray masking instead of
recursion.
"""

from sailor_tpu.raytracing import bvh, lighting_model, path_tracer

__all__ = ["bvh", "lighting_model", "path_tracer"]
