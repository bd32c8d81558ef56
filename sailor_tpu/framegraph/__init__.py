"""Frame graph: declarative pass list -> one jitted XLA program.

Counterpart of Runtime/FrameGraph/: the reference parses a `.renderer` YAML
into an ordered node list and drives Vulkan command lists through it with
manual barriers/semaphores and cost-based auto-chaining
(RHIFrameGraph.cpp:95-346).  Here the same YAML materializes a Python
composition of kernel calls that jit compiles once — XLA's scheduler
replaces every barrier, semaphore, layout transition, and command-list
chain in the reference.
"""

from sailor_tpu.framegraph.graph import (
    FrameGraph,
    FrameGraphAsset,
    RenderContext,
    node,
)
from sailor_tpu.framegraph import nodes  # noqa: F401  (registers node types)

__all__ = ["FrameGraph", "FrameGraphAsset", "RenderContext", "node", "nodes"]
