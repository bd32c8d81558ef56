from sailor_tpu.rhi import types
from sailor_tpu.rhi.types import FrameData, RenderTargets

__all__ = ["types", "FrameData", "RenderTargets"]
