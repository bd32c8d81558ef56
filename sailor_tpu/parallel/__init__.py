from sailor_tpu.parallel.mesh import (
    make_mesh,
    sharded_forward_frame,
    sharded_path_trace,
)

__all__ = ["make_mesh", "sharded_forward_frame", "sharded_path_trace"]
