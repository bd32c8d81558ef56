"""AOT executable cache: warm starts skip tracing + compile entirely.

The reference loads precompiled SPIR-V from Cache/ without re-running the
compiler (ShaderCache.h:15-91); our analog snapshots the compiled XLA
executable (assets/aot_cache.py) keyed on source digest + logical config +
input avals + backend."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sailor_tpu.assets import aot_cache


@pytest.fixture()
def tmp_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("SAILOR_CACHE_DIR", str(tmp_path / "xla"))
    monkeypatch.setenv("SAILOR_AOT_CACHE", "1")
    aot_cache._memory.clear()
    yield tmp_path / "aot"
    aot_cache._memory.clear()


def test_miss_then_hit_same_result(tmp_cache):
    calls = []

    def fn(x, y):
        calls.append(1)
        return {"out": x @ y + 1.0, "sum": jnp.sum(x)}

    x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 16)), jnp.float32)
    y = jnp.asarray(np.random.default_rng(1).normal(size=(16, 16)), jnp.float32)

    c1 = aot_cache.load_or_compile(fn, (x, y), logical_key="t1", label="t1")
    r1 = c1(x, y)
    assert aot_cache.stats()["entries"] == 1
    n_traces = len(calls)
    assert n_traces >= 1

    # second resolve: must come from disk — fn must NOT be traced again
    # (clear the in-process cache so this exercises the pickle path)
    aot_cache._memory.clear()
    c2 = aot_cache.load_or_compile(fn, (x, y), logical_key="t1", label="t1")
    r2 = c2(x, y)
    assert len(calls) == n_traces
    np.testing.assert_allclose(np.asarray(r1["out"]), np.asarray(r2["out"]))
    np.testing.assert_allclose(np.asarray(r1["sum"]), np.asarray(r2["sum"]))


def test_key_separates_logical_configs(tmp_cache):
    def fa(x):
        return x * 2.0

    def fb(x):
        return x * 3.0

    x = jnp.ones((8, 8), jnp.float32)
    ca = aot_cache.load_or_compile(fa, (x,), logical_key="a", label="a")
    cb = aot_cache.load_or_compile(fb, (x,), logical_key="b", label="b")
    assert aot_cache.stats()["entries"] == 2
    assert float(ca(x)[0, 0]) == 2.0
    assert float(cb(x)[0, 0]) == 3.0


def test_aval_change_is_new_entry(tmp_cache):
    def fn(x):
        return x + 1.0

    a = jnp.ones((4, 4), jnp.float32)
    b = jnp.ones((8, 4), jnp.float32)
    aot_cache.load_or_compile(fn, (a,), logical_key="k", label="k")
    aot_cache.load_or_compile(fn, (b,), logical_key="k", label="k")
    assert aot_cache.stats()["entries"] == 2


def test_corrupt_entry_falls_back(tmp_cache):
    def fn(x):
        return x - 1.0

    x = jnp.ones((4, 4), jnp.float32)
    aot_cache.load_or_compile(fn, (x,), logical_key="c", label="c")
    [entry] = list(aot_cache.cache_dir().glob("*.pkl"))
    entry.write_bytes(b"not a pickle")
    aot_cache._memory.clear()
    c = aot_cache.load_or_compile(fn, (x,), logical_key="c", label="c")
    assert float(c(x)[0, 0]) == 0.0  # recompiled + rewrote the entry


_E2E_SNIPPET = """
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
os.chdir({repo!r})
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
"""


def test_framegraph_warm_process_skips_trace(tmp_cache, tmp_path):
    """End to end across PROCESSES (the real warm-start path): run the
    same tiny graph twice in fresh interpreters sharing one cache dir —
    the second run must log an aot-cache hit and match the first's image."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    snippet = _E2E_SNIPPET.format(repo=repo)
    env = dict(os.environ, SAILOR_CACHE_DIR=str(tmp_path / "xla"),
               SAILOR_AOT_CACHE="1")
    env.pop("JAX_PLATFORMS", None)

    def run():
        return subprocess.run(
            [sys.executable, "-c", snippet], env=env, capture_output=True,
            text=True, timeout=900,
        )

    r1 = run()
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert "aot-cache miss framegraph" in r1.stderr
    r2 = run()
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "aot-cache hit framegraph" in r2.stderr
    assert "aot-cache miss" not in r2.stderr
    m1 = [l for l in r1.stdout.splitlines() if l.startswith("MEAN")][0]
    m2 = [l for l in r2.stdout.splitlines() if l.startswith("MEAN")][0]
    assert abs(float(m1.split()[1]) - float(m2.split()[1])) < 1e-6


def test_framegraph_same_process_reuses_memory(tmp_cache):
    """Two FrameGraph objects in ONE process share the in-memory entry —
    the second resolve must not re-trace (and must not re-deserialize,
    which XLA:CPU's AOT loader mishandles after a same-process serialize)."""
    from sailor_tpu.framegraph import FrameGraph, FrameGraphAsset
    from tests.test_framegraph import _scene_view

    def _tiny_graph():
        asset = FrameGraphAsset.from_yaml(
            "frame:\n"
            "  - name: DepthPrepass\n"
            "  - name: LinearizeDepth\n"
            "  - name: LightCulling\n"
            "  - name: RenderScene\n"
            "  - name: EyeAdaptation\n"
        )
        fg = FrameGraph(asset, 128, 96,
                        config={"bin_capacity": 256, "bin_rounds": 2})
        scene = _scene_view()
        state = fg.initial_state()
        fg.prepare(scene, state)
        return fg, scene, state

    fg1, scene, state = _tiny_graph()
    t1, _ = fg1.process(scene, state)
    assert aot_cache.stats()["entries"] == 1

    traced = []
    fg2, scene2, state2 = _tiny_graph()
    orig_run = fg2._run
    fg2._run = lambda s, st: (traced.append(1), orig_run(s, st))[1]
    t2, _ = fg2.process(scene2, state2)
    assert not traced, "second FrameGraph re-traced despite in-memory entry"
    np.testing.assert_allclose(
        np.asarray(t1["Final"]), np.asarray(t2["Final"]), rtol=1e-6, atol=1e-6
    )
