"""AOT executable cache — warm starts skip Python tracing AND XLA compile.

The persistent XLA compilation cache (shader_cache.py) removes the
*compile* cost of the frame-graph mega-jit, but a fresh process still
pays 10-20 s of Python tracing + StableHLO lowering before the cache can
even be consulted (measured: trace+lower of the default graph is ~14 s
at any resolution).  The reference engine's analog is loading precompiled
SPIR-V straight from disk without re-running glslang
(Runtime/AssetRegistry/Shader/ShaderCache.h:15-91).

This module snapshots the *compiled executable* itself via
``jax.experimental.serialize_executable`` (PjRt
``SerializeExecutable``/``DeserializeAndLoad``), keyed on everything the
trace could depend on:

- the package source digest (any edit to sailor_tpu/*.py invalidates —
  the reference's timestamp-expiry semantics),
- the caller's logical key (renderer YAML text, config, viewport),
- input avals (shapes/dtypes/weak_type of the example pytree),
- jax version + backend platform + device kind + device count.

Entries live under ``Cache/aot/`` next to the XLA cache.  Failures at
any stage (unsupported backend, topology change, pickle drift) fall back
to a normal ``jit``/``lower``/``compile`` and rewrite the entry.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import sys
import time
from pathlib import Path

import jax

from sailor_tpu.assets import shader_cache
from sailor_tpu.utils.log import SAILOR_LOG


def log(msg: str) -> None:
    SAILOR_LOG(msg)
    print(f"# {msg}", file=sys.stderr)

_src_digest_cache: str | None = None
# Executables this process compiled or loaded, by cache key. Besides the
# obvious speedup, this avoids re-DESERIALIZING a payload serialized in
# the same process — XLA:CPU's AOT loader can drop fusion functions on
# that path ("Buffer Definition Event: Function ... not found"); fresh
# processes load the same entries fine.
_memory: dict = {}


def enabled() -> bool:
    """Default: on for TPU backends, opt-in (SAILOR_AOT_CACHE=1) elsewhere.

    XLA:CPU links deserialized executables into the process with
    generic fusion symbol names; loading a SECOND executable collides
    ("Function add_broadcast_fusion not found" at dispatch), so CPU
    processes that build several graphs (the test suite, bench.py) must
    not load-cache by default.  One-graph CPU processes (the example
    CLIs) opt in explicitly."""
    env = os.environ.get("SAILOR_AOT_CACHE")
    if env is not None:
        return env != "0"
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    if backend == "tpu":
        return True
    if backend == "axon":
        # default-on only after a successful serialize/deserialize probe
        # on this backend (tools/probe_aot_backend.py writes the marker) —
        # an untested crash in the PjRt serialize path must not be able to
        # take down the driver benchmark.
        return (cache_dir() / ".axon_ok").exists()
    return False


def cache_dir() -> Path:
    return shader_cache.default_cache_dir().parent / "aot"


def _source_digest() -> str:
    """Content hash of every .py file in the sailor_tpu package (~1 MB,
    a few ms) — any source change produces a different key, so stale
    executables simply stop being hit (ShaderCache expiry analog)."""
    global _src_digest_cache
    if _src_digest_cache is not None:
        return _src_digest_cache
    root = Path(__file__).resolve().parents[1]
    h = hashlib.sha256()
    for p in sorted(root.rglob("*.py")):
        h.update(p.read_bytes())
    _src_digest_cache = h.hexdigest()
    return _src_digest_cache


def _aval_sig(tree) -> str:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    parts = [str(treedef)]
    for x in leaves:
        parts.append(
            f"{getattr(x, 'dtype', type(x).__name__)}:"
            f"{getattr(x, 'shape', ())}:"
            f"{getattr(x, 'weak_type', False)}"
        )
    return "|".join(parts)


def _backend_sig() -> str:
    devs = jax.devices()
    sig = f"{jax.__version__};{devs[0].platform};{devs[0].device_kind};{len(devs)}"
    if devs[0].platform == "cpu":
        # CPU executables embed host-specific machine code — never share
        # them across hosts (see shader_cache.host_cpu_fingerprint)
        sig += ";" + shader_cache.host_cpu_fingerprint()
    return sig


def cache_key(logical_key: str, example_args: tuple) -> str:
    h = hashlib.sha256()
    for part in (
        _source_digest(), logical_key, _aval_sig(example_args), _backend_sig()
    ):
        h.update(part.encode())
        h.update(b"\0")
    return h.hexdigest()[:32]


# Dispatch-time error markers of a poisoned AOT entry: machine code
# compiled for a different host's CPU features loads fine but throws at
# first execution (observed round 4: "Buffer Definition Event: Function
# slice_concatenate_fusion.118 not found" from an entry compiled with
# +prefer-no-gather on a different µarch). ShaderCache parity demands
# entries can never poison (ShaderCache.h:15-91 timestamp expiry) — so a
# matching dispatch failure evicts the entry and recompiles in place.
_POISON_MARKERS = (
    "Buffer Definition Event",
    "not found",
    "NOT_FOUND",
    "machine feature",
    "Deserializ",
)


class _GuardedExecutable:
    """First-call guard around a cache-LOADED executable.

    A poisoned entry (foreign-host machine code) only reveals itself at
    dispatch. The first ``__call__`` catches a matching runtime error,
    evicts the on-disk entry, recompiles cold (re-storing a good entry),
    and retries; after one success the guard collapses to plain
    delegation. TypeError (aval drift) propagates — callers handle it.
    """

    def __init__(self, compiled, recompile, path: Path, label: str):
        self._inner = compiled
        self._recompile = recompile
        self._path = path
        self._label = label
        self._verified = False

    def __call__(self, *args):
        if self._verified:
            return self._inner(*args)
        try:
            out = self._inner(*args)
            self._verified = True
            return out
        except TypeError:
            raise
        except Exception as e:
            msg = f"{type(e).__name__}: {e}"
            if not any(m in msg for m in _POISON_MARKERS):
                raise
            log(f"aot-cache poisoned entry for {self._label} "
                f"({msg.splitlines()[0][:120]}); evicting + recompiling")
            try:
                self._path.unlink(missing_ok=True)
            except OSError:
                pass
            self._inner = self._recompile()
            self._verified = True
            return self._inner(*args)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def load_or_compile(fn, example_args: tuple, *, logical_key: str,
                    static_argnames=(), label: str = "jit"):
    """Return a compiled executable for ``fn(*example_args)``.

    Warm path: unpickle + ``deserialize_and_load`` (no tracing, no
    compile).  Cold path: ``jit(fn).lower(*args).compile()`` then
    serialize to disk.  Any failure degrades to the cold path — including
    a poisoned entry that only fails at first dispatch (see
    ``_GuardedExecutable``); if even serialization fails the compiled
    object is returned uncached.
    """
    jitted = jax.jit(fn, static_argnames=static_argnames)
    if not enabled():
        return jitted

    key = cache_key(logical_key, example_args)
    if key in _memory:
        return _memory[key]
    path = cache_dir() / f"{key}.pkl"
    if path.exists():
        t0 = time.time()
        try:
            from jax.experimental import serialize_executable as se

            with open(path, "rb") as f:
                raw = f.read()
            if raw[:2] == b"\x78\x01":  # zlib header (see _store)
                import zlib
                raw = zlib.decompress(raw)
            payload, in_tree, out_tree, n_dev = pickle.loads(raw)
            # deserialize_and_load defaults to ALL addressable devices;
            # a 1-device program loaded onto an 8-device client then
            # demands 8-sharded args — pin the original device count.
            compiled = se.deserialize_and_load(
                payload, in_tree, out_tree,
                execution_devices=jax.devices()[:n_dev],
            )
            log(f"aot-cache hit {label}: load {time.time() - t0:.1f}s "
                f"({path.stat().st_size / 1e6:.0f} MB)")

            def _cold():
                c = jitted.lower(*example_args).compile()
                _store(c, path, label)
                return c

            guarded = _GuardedExecutable(compiled, _cold, path, label)
            _memory[key] = guarded
            return guarded
        except Exception as e:  # topology/pickle drift -> recompile
            log(f"aot-cache load failed ({type(e).__name__}: {e}); "
                f"recompiling {label}")

    t0 = time.time()
    lowered = jitted.lower(*example_args)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    log(f"aot-cache miss {label}: trace+lower {t_lower:.1f}s, "
        f"compile {t_compile:.1f}s")
    _store(compiled, path, label)
    _memory[key] = compiled
    return compiled


def _store(compiled, path: Path, label: str) -> None:
    """Serialize a freshly-compiled executable to ``path`` (atomic)."""
    try:
        from jax.experimental import serialize_executable as se

        t0 = time.time()
        payload, in_tree, out_tree = se.serialize(compiled)
        try:
            n_dev = len(compiled._executable.xla_executable.local_devices())
        except Exception:
            n_dev = 1
        path.parent.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(f".tmp{os.getpid()}")
        # executables are ~48% zero bytes (padded layout tables) — zlib-1
        # compresses ~3x, cutting disk + warm-load IO; level 1 keeps the
        # store under a few seconds for the ~600 MB content-scene entry
        import zlib
        blob = zlib.compress(
            pickle.dumps((payload, in_tree, out_tree, n_dev)), 1)
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        log(f"aot-cache store {label}: {time.time() - t0:.1f}s, "
            f"{path.stat().st_size / 1e6:.0f} MB")
    except Exception as e:
        log(f"aot-cache store failed ({type(e).__name__}: {e}); "
            f"running uncached")


def stats() -> dict:
    d = cache_dir()
    if not d.is_dir():
        return {"dir": str(d), "entries": 0, "bytes": 0}
    files = [f for f in d.glob("*.pkl")]
    return {
        "dir": str(d),
        "entries": len(files),
        "bytes": sum(f.stat().st_size for f in files),
    }


def clear() -> None:
    d = cache_dir()
    if d.is_dir():
        for f in d.glob("*.pkl"):
            f.unlink()


def expire(max_age_days: float = 14.0) -> int:
    """Drop entries older than ``max_age_days`` (ShaderCache::Expire
    analog — stale entries also die naturally via the source digest,
    this reclaims their disk)."""
    d = cache_dir()
    if not d.is_dir():
        return 0
    cutoff = time.time() - max_age_days * 86400
    n = 0
    for f in d.glob("*.pkl"):
        if f.stat().st_mtime < cutoff:
            f.unlink()
            n += 1
    return n
