from sailor_tpu.engine.world import Component, GameObject, World
from sailor_tpu.engine import components  # noqa: F401 (registers component types)

__all__ = ["World", "GameObject", "Component", "components"]
