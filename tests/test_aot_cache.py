"""AOT executable cache: warm starts skip tracing + compile entirely.

The reference loads precompiled SPIR-V from Cache/ without re-running the
compiler (ShaderCache.h:15-91); our analog snapshots the compiled XLA
executable (assets/aot_cache.py) keyed on source digest + logical config +
input avals + backend.

Every cache operation here runs in SUBPROCESSES: XLA:CPU's executable
serialize/deserialize is unstable inside long-lived multi-compile
processes on this image (see conftest) — the pytest process itself must
never serialize or load an executable."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_snippet(snippet, tmp_path, timeout=900):
    env = dict(os.environ, SAILOR_CACHE_DIR=str(tmp_path / "xla"),
               SAILOR_AOT_CACHE="1",
               # persistent XLA cache stays off (conftest rationale); the
               # AOT cache alone provides the warm start under test
               SAILOR_SHADER_CACHE="0")
    env.pop("JAX_PLATFORMS", None)
    return subprocess.run(
        [sys.executable, "-c", snippet], env=env, capture_output=True,
        text=True, timeout=timeout,
    )


_UNIT_SNIPPET = f"""
import sys
sys.path.insert(0, {REPO!r})
import jax
jax.config.update("jax_platforms", "cpu")
import json
import numpy as np
import jax.numpy as jnp
from sailor_tpu.assets import aot_cache

out = {{}}
calls = []

def fn(x, y):
    calls.append(1)
    return {{"out": x @ y + 1.0, "sum": jnp.sum(x)}}

x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 16)), jnp.float32)
y = jnp.asarray(np.random.default_rng(1).normal(size=(16, 16)), jnp.float32)

c1 = aot_cache.load_or_compile(fn, (x, y), logical_key="t1", label="t1")
r1 = c1(x, y)
out["entries_after_store"] = aot_cache.stats()["entries"]
n = len(calls)

# in-memory hit: no retrace
c2 = aot_cache.load_or_compile(fn, (x, y), logical_key="t1", label="t1")
r2 = c2(x, y)
out["retraced_on_memory_hit"] = len(calls) != n
out["results_match"] = bool(
    np.allclose(np.asarray(r1["out"]), np.asarray(r2["out"]))
)

# distinct logical keys -> distinct entries
aot_cache.load_or_compile(lambda a: a * 2.0, (x,), logical_key="k2", label="a")
aot_cache.load_or_compile(lambda a: a * 3.0, (x,), logical_key="k3", label="b")
out["entries_after_keys"] = aot_cache.stats()["entries"]

# aval change -> new entry
b8 = jnp.ones((8, 16), jnp.float32)
aot_cache.load_or_compile(lambda a: a * 2.0, (b8,), logical_key="k2", label="a")
out["entries_after_aval"] = aot_cache.stats()["entries"]

# corrupt entry -> recompile fallback
entry = sorted(aot_cache.cache_dir().glob("*.pkl"))[0]
entry.write_bytes(b"not a pickle")
aot_cache._memory.clear()
# whichever fn owned that entry, resolving ANY key must still work:
c = aot_cache.load_or_compile(fn, (x, y), logical_key="t1", label="t1")
out["corrupt_fallback_ok"] = bool(
    np.allclose(np.asarray(c(x, y)["out"]), np.asarray(r1["out"]))
)
print("JSON" + json.dumps(out))
"""


def test_unit_semantics_subprocess(tmp_path):
    r = _run_snippet(_UNIT_SNIPPET, tmp_path)
    assert r.returncode == 0, r.stderr[-3000:]
    [line] = [l for l in r.stdout.splitlines() if l.startswith("JSON")]
    out = json.loads(line[4:])
    assert out["entries_after_store"] == 1
    assert not out["retraced_on_memory_hit"]
    assert out["results_match"]
    assert out["entries_after_keys"] == 3
    assert out["entries_after_aval"] == 4
    assert out["corrupt_fallback_ok"]


_E2E_SNIPPET = f"""
import os, sys
sys.path.insert(0, {REPO!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
os.chdir({REPO!r})
from sailor_tpu.framegraph import FrameGraph, FrameGraphAsset
from tests.test_framegraph import _scene_view
asset = FrameGraphAsset.from_yaml(
    "frame:\\n  - name: DepthPrepass\\n  - name: LinearizeDepth\\n"
    "  - name: LightCulling\\n  - name: RenderScene\\n  - name: EyeAdaptation\\n")
fg = FrameGraph(asset, 128, 96, config={{"bin_capacity": 256, "bin_rounds": 2}})
scene = _scene_view()
state = fg.initial_state()
fg.prepare(scene, state)
targets, _ = fg.process(scene, state)
print("MEAN", float(np.asarray(targets["Final"]).mean()))

# a SECOND graph over the same config in the same process must reuse the
# in-memory entry (no re-trace, no re-deserialize)
fg2 = FrameGraph(asset, 128, 96, config={{"bin_capacity": 256, "bin_rounds": 2}})
traced = []
orig = fg2._run
fg2._run = lambda s, st: (traced.append(1), orig(s, st))[1]
fg2.prepare(scene, state)
t2, _ = fg2.process(scene, state)
print("RETRACED", len(traced))
print("MEAN2", float(np.asarray(t2["Final"]).mean()))
"""


def test_framegraph_warm_process_skips_trace(tmp_path):
    """End to end across PROCESSES (the real warm-start path): run the
    same tiny graph twice in fresh interpreters sharing one cache dir —
    the second run must log an aot-cache hit and match the first's image;
    within each process, a second FrameGraph must reuse the in-memory
    entry without re-tracing."""
    r1 = _run_snippet(_E2E_SNIPPET, tmp_path)
    assert r1.returncode == 0, r1.stderr[-3000:]
    assert "aot-cache miss framegraph" in r1.stderr
    assert "RETRACED 0" in r1.stdout

    r2 = _run_snippet(_E2E_SNIPPET, tmp_path)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "aot-cache hit framegraph" in r2.stderr
    assert "aot-cache miss" not in r2.stderr
    assert "RETRACED 0" in r2.stdout

    def mean(r, tag):
        [l] = [l for l in r.stdout.splitlines() if l.startswith(tag + " ")]
        return float(l.split()[1])

    assert abs(mean(r1, "MEAN") - mean(r2, "MEAN")) < 1e-6
    assert abs(mean(r1, "MEAN") - mean(r1, "MEAN2")) < 1e-6
