"""Sailor-TPU: a TPU-native rendering framework.

A from-scratch rebuild of the capabilities of aantropov/Sailor (C++20 Vulkan
forward+ engine, see /root/reference) in idiomatic JAX/XLA/Pallas:

- FrameGraph        -> jitted XLA pass graph over named HBM render targets
                       (reference: Runtime/FrameGraph/RHIFrameGraph.cpp)
- GLSL passes       -> Pallas kernels (reference: Content/Shaders/*.shader)
- CPU path tracer   -> batched wavefront tracer
                       (reference: Runtime/Raytracing/PathTracer.cpp)
- ECS               -> struct-of-arrays + vmapped systems
                       (reference: Runtime/ECS/)
- Tasks/Scheduler   -> XLA async dispatch + native host scheduler
                       (reference: Runtime/Tasks/Scheduler.h)
- AssetRegistry     -> host-side Python/C++ loaders with hot reload
                       (reference: Runtime/AssetRegistry/)
"""

__version__ = "0.2.0"

import os as _os

from sailor_tpu import config as config

# ShaderCache analog: persist XLA-compiled programs across processes
# (reference: Runtime/AssetRegistry/Shader/ShaderCache.h). Must be wired
# before the first compile; set SAILOR_SHADER_CACHE=0 to opt out.
if _os.environ.get("SAILOR_SHADER_CACHE", "1") not in ("0", "false"):
    from sailor_tpu.assets import shader_cache as _shader_cache

    _shader_cache.enable()

__all__ = ["config", "__version__"]
