from sailor_tpu.core import bounds, math3d

__all__ = ["math3d", "bounds"]
