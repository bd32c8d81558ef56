"""Persistent compiled-program cache — the ShaderCache analog.

The reference caches compiled SPIR-V on disk per (shader FileId, define
permutation) and expires entries when the source changes
(Runtime/AssetRegistry/Shader/ShaderCache.h:15-91, ShaderCache.cpp).  On
TPU the "shader" is the XLA program: every jitted frame graph / tracer
permutation compiles for 10-150s.  This module wires JAX's persistent
compilation cache so a process only ever pays that once per (HLO program,
compile options, backend) triple:

- keying: JAX fingerprints the HLO itself, so *any* source change produces
  a different key — the reference's "expire on source change" semantics
  fall out for free (stale entries just stop being hit).
- storage: ``Cache/xla/`` at the repo root (reference keeps ``Cache/`` next
  to the executable), override with ``SAILOR_CACHE_DIR``.
- expiry: :func:`expire` trims by age and :func:`clear` wipes, mirroring
  ShaderCache::Expire / ClearAll; :func:`stats` is the observability hook.

Enabled automatically on ``import sailor_tpu`` (set ``SAILOR_SHADER_CACHE=0``
to opt out) — it must run before the first jit compile to take effect.
"""

from __future__ import annotations

import os
import time
from pathlib import Path

_enabled_dir: Path | None = None


def default_cache_dir() -> Path:
    env = os.environ.get("SAILOR_CACHE_DIR")
    if env:
        return Path(env)
    # repo/app root = two levels above this package (sailor_tpu/assets/..)
    root = Path(__file__).resolve().parents[2]
    if (root / ".git").exists() or os.access(root, os.W_OK):
        return root / "Cache" / "xla"
    return Path.home() / ".cache" / "sailor_tpu" / "xla"


def host_cpu_fingerprint() -> str:
    """Short digest of this host's CPU feature flags.

    XLA:CPU persistent-cache entries embed AOT machine code for the
    COMPILING host's feature set; loading them on a host without those
    features drops functions or crashes outright (observed: a cache
    populated on an AMX machine segfaulted `backend_compile_and_load`
    and produced "Function <fusion> not found" dispatch errors after a
    container migration).  TPU entries are host-independent, so only
    CPU-backend processes need a host-scoped cache directory."""
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            parts = []
            for line in f:
                # flags alone are NOT enough: LLVM applies per-µarch
                # tuning (e.g. +prefer-no-gather on Zen4) keyed on the
                # model, so two hosts with identical flag sets can still
                # produce mutually-poisonous machine code. Hash the model
                # identity lines too (observed round 4: an entry compiled
                # with +prefer-no-gather crashed dispatch on an Intel
                # host with the same flags hash).
                if line.startswith(("flags", "model name", "vendor_id",
                                    "cpu family", "model\t", "stepping")):
                    parts.append(line)
                    if line.startswith("flags"):
                        break
            if parts:
                return hashlib.sha256("".join(parts).encode()).hexdigest()[:10]
    except OSError:
        pass
    return hashlib.sha256(platform.machine().encode()).hexdigest()[:10]


def rescope_for_cpu() -> Path:
    """Re-point the persistent cache at a host-scoped subdir.

    Call right after forcing the CPU backend (jax_platforms="cpu") and
    before the first compile — CPU AOT cache entries must not be shared
    across machines (see host_cpu_fingerprint)."""
    base = default_cache_dir()
    if base.name.startswith("cpu-"):
        return base
    return enable(base.parent / f"cpu-{host_cpu_fingerprint()}")


def enable(cache_dir: str | os.PathLike | None = None) -> Path:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Idempotent; safe to call before or after device init (JAX checks the
    config at compile time). Returns the directory in use.
    """
    global _enabled_dir
    import jax

    path = Path(cache_dir) if cache_dir is not None else default_cache_dir()
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_enable_compilation_cache", True)
    # the frame graph is one huge program: cache anything that took real
    # compile time, no size floor.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled_dir = path
    return path


def disable() -> None:
    global _enabled_dir
    import jax

    jax.config.update("jax_compilation_cache_dir", None)
    _enabled_dir = None


def stats(cache_dir: str | os.PathLike | None = None) -> dict:
    """Entry count + bytes on disk (ShaderCache observability analog)."""
    path = Path(cache_dir) if cache_dir else (_enabled_dir or default_cache_dir())
    if not path.is_dir():
        return {"dir": str(path), "entries": 0, "bytes": 0}
    files = [f for f in path.rglob("*") if f.is_file()]
    return {
        "dir": str(path),
        "entries": len(files),
        "bytes": sum(f.stat().st_size for f in files),
    }


def expire(max_age_days: float = 30.0,
           cache_dir: str | os.PathLike | None = None) -> int:
    """Delete entries older than ``max_age_days`` (ShaderCache::Expire)."""
    path = Path(cache_dir) if cache_dir else (_enabled_dir or default_cache_dir())
    if not path.is_dir():
        return 0
    cutoff = time.time() - max_age_days * 86400.0
    removed = 0
    for f in path.rglob("*"):
        if f.is_file() and f.stat().st_mtime < cutoff:
            try:
                f.unlink()
                removed += 1
            except OSError:
                pass
    return removed


def clear(cache_dir: str | os.PathLike | None = None) -> int:
    """Remove every cached program (ShaderCache::ClearAll)."""
    return expire(max_age_days=-1.0, cache_dir=cache_dir)
