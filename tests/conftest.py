"""Test harness: run on CPU with an 8-device virtual mesh.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count) since only one physical TPU chip is
available; Pallas kernels run in interpreter mode off-TPU
(sailor_tpu.config.interpret_pallas).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment pre-seeds jax_platforms to "axon,cpu" (TPU tunnel); the env
# var alone doesn't override it, so force CPU before backend initialization.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Host-scope the persistent XLA cache: CPU cache entries embed AOT machine
# code for the COMPILING host (a container migration changed the CPU and
# the foreign entries dropped fusion functions / segfaulted the compiler —
# shader_cache.host_cpu_fingerprint). Stability also requires bounding the
# number of XLA:CPU compiles per process: a single long-lived process
# segfaults in backend_compile_and_load after a few hundred compiled
# executables on this image, hence pytest.ini splits the suite across
# xdist workers.
from sailor_tpu.assets import shader_cache  # noqa: E402

shader_cache.rescope_for_cpu()
