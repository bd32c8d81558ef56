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


# ---------------------------------------------------------------------------
# Known XLA:CPU instability retry (VERDICT r3 #5): after a few hundred
# compiles a process can drop fusion symbols from already-loaded
# executables ("Buffer Definition Event: Function ... not found"). The
# failure is an artifact of the long-lived test process, not of the code
# under test (every such test passes in a fresh process). Detect that
# exact signature, clear jax's executable caches (forcing a retrace +
# recompile), and retry the test once in place.
# ---------------------------------------------------------------------------
from _pytest.runner import runtestprotocol  # noqa: E402


def _is_xla_cpu_instability(report) -> bool:
    text = str(getattr(report, "longrepr", "") or "")
    return ("Buffer Definition Event" in text
            or "backend_compile_and_load" in text)


def pytest_runtest_protocol(item, nextitem):
    reports = runtestprotocol(item, nextitem=nextitem, log=False)
    if any(r.failed and _is_xla_cpu_instability(r) for r in reports):
        import warnings

        import jax as _jax

        warnings.warn(
            f"retrying {item.nodeid} after XLA:CPU fusion-symbol drop"
        )
        _jax.clear_caches()
        reports = runtestprotocol(item, nextitem=nextitem, log=False)
    for r in reports:
        item.ihook.pytest_runtest_logreport(report=r)
    return True
