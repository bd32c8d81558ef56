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

__version__ = "0.1.0"

from sailor_tpu import config as config

__all__ = ["config", "__version__"]
