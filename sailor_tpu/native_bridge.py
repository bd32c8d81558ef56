"""ctypes bridge to the native C++ runtime (native/sailor_native.cpp).

Loads (auto-building on first use) the shared library providing:
- Scheduler: the reference's thread-class task system
  (Runtime/Tasks/Scheduler.h) — dependency DAGs, Join/Wait/WaitIdle
- Arena: page-chained bump allocator (Runtime/Memory analog)
- BVH builders: binned-SAH flat BVH + the BVH8 packed-table collapse used
  by the TPU traversal (orders of magnitude faster than the Python builder)

Every entry point has a pure-Python fallback so the engine degrades
gracefully when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsailor_native.so")
_lib = None
_lib_lock = threading.Lock()


_SIG_PATH = _LIB_PATH + ".hostsig"


def _host_sig() -> str:
    from sailor_tpu.assets.shader_cache import host_cpu_fingerprint

    return host_cpu_fingerprint()


def _stale() -> bool:
    """The library is built with -march=native: a binary carried across a
    container migration onto a different CPU can SIGILL. Rebuild whenever
    the recorded host fingerprint differs."""
    if not os.path.exists(_LIB_PATH):
        return True
    try:
        with open(_SIG_PATH) as f:
            return f.read().strip() != _host_sig()
    except OSError:
        return True


def load(build: bool = True):
    """Load (and lazily build) the native library; None if unavailable."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _stale() and build:
            # Inter-process exclusion: concurrent test workers / benches on
            # a freshly migrated host all see a stale library and race the
            # rebuild — loading a half-written .so raises "file too short".
            # One flock'd builder; everyone else blocks, then re-checks.
            try:
                import fcntl

                with open(_LIB_PATH + ".lock", "w") as lk:
                    fcntl.flock(lk, fcntl.LOCK_EX)
                    try:
                        if _stale():
                            subprocess.run(
                                ["make", "-C", _NATIVE_DIR, "-s",
                                 "clean", "all"],
                                check=True, capture_output=True, timeout=120,
                            )
                            with open(_SIG_PATH, "w") as f:
                                f.write(_host_sig())
                    finally:
                        fcntl.flock(lk, fcntl.LOCK_UN)
            except Exception:
                return None
        if not os.path.exists(_LIB_PATH):
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u64p = ctypes.POINTER(ctypes.c_uint64)

        lib.sailor_bvh_build.restype = ctypes.c_int
        lib.sailor_bvh_build.argtypes = [f32p, f32p, f32p, ctypes.c_int,
                                         ctypes.c_int, f32p, f32p, i32p, i32p,
                                         i32p, i32p]
        lib.sailor_bvh8_build.restype = ctypes.c_int
        lib.sailor_bvh8_build.argtypes = [f32p, f32p, f32p, ctypes.c_int,
                                          f32p, ctypes.c_int]
        lib.sailor_scheduler_create.restype = ctypes.c_void_p
        lib.sailor_scheduler_create.argtypes = [ctypes.c_int]
        lib.sailor_scheduler_destroy.argtypes = [ctypes.c_void_p]
        lib.sailor_scheduler_submit.restype = ctypes.c_uint64
        lib.sailor_scheduler_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, u64p,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.sailor_scheduler_wait.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.sailor_scheduler_wait_idle.argtypes = [ctypes.c_void_p]
        lib.sailor_scheduler_is_done.restype = ctypes.c_int
        lib.sailor_scheduler_is_done.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.sailor_scheduler_num_pending.restype = ctypes.c_int
        lib.sailor_scheduler_num_pending.argtypes = [ctypes.c_void_p]
        lib.sailor_arena_create.restype = ctypes.c_void_p
        lib.sailor_arena_create.argtypes = [ctypes.c_size_t]
        lib.sailor_arena_alloc.restype = ctypes.c_void_p
        lib.sailor_arena_alloc.argtypes = [ctypes.c_void_p, ctypes.c_size_t,
                                           ctypes.c_size_t]
        lib.sailor_arena_reset.argtypes = [ctypes.c_void_p]
        lib.sailor_arena_destroy.argtypes = [ctypes.c_void_p]
        szp = ctypes.POINTER(ctypes.c_size_t)
        lib.sailor_pool_create.restype = ctypes.c_void_p
        lib.sailor_pool_create.argtypes = [ctypes.c_size_t, ctypes.c_size_t]
        lib.sailor_pool_alloc.restype = ctypes.c_void_p
        lib.sailor_pool_alloc.argtypes = [ctypes.c_void_p]
        lib.sailor_pool_free.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.sailor_pool_stats.argtypes = [ctypes.c_void_p, szp]
        lib.sailor_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.sailor_mpool_create.restype = ctypes.c_void_p
        lib.sailor_mpool_alloc.restype = ctypes.c_void_p
        lib.sailor_mpool_alloc.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
        lib.sailor_mpool_free.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                          ctypes.c_size_t]
        lib.sailor_mpool_stats.argtypes = [ctypes.c_void_p, szp]
        lib.sailor_mpool_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


# ---------------------------------------------------------------------------
# BVH builders
# ---------------------------------------------------------------------------


def bvh_build(v0, v1, v2, leaf_size: int = 4):
    """Native binned-SAH build. Returns dict of flat arrays (bvh.py layout)
    or None when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    t = len(v0)
    cap = 2 * max(t, 1)
    nmin = np.zeros((cap, 3), np.float32)
    nmax = np.zeros((cap, 3), np.float32)
    nleft = np.zeros(cap, np.int32)
    nstart = np.zeros(cap, np.int32)
    ncount = np.zeros(cap, np.int32)
    order = np.zeros(max(t, 1), np.int32)
    n = lib.sailor_bvh_build(
        _f32p(v0), _f32p(v1), _f32p(v2), t, leaf_size,
        _f32p(nmin), _f32p(nmax), _i32p(nleft), _i32p(nstart), _i32p(ncount),
        _i32p(order),
    )
    return {
        "node_min": nmin[:n], "node_max": nmax[:n], "node_left": nleft[:n],
        "node_start": nstart[:n], "node_count": ncount[:n], "order": order[:t],
    }


def bvh8_build(v0, v1, v2):
    """Native packed 8-wide table build (bvh8.py ROW layout), or None."""
    lib = load()
    if lib is None:
        return None
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    t = len(v0)
    max_rows = 2 * max(t, 2)
    table = np.zeros((max_rows, 72), np.float32)
    n = lib.sailor_bvh8_build(_f32p(v0), _f32p(v1), _f32p(v2), t,
                              _f32p(table), max_rows)
    if n < 0:  # undersized (shouldn't happen with 2T)
        max_rows = -n
        table = np.zeros((max_rows, 72), np.float32)
        n = lib.sailor_bvh8_build(_f32p(v0), _f32p(v1), _f32p(v2), t,
                                  _f32p(table), max_rows)
    return table[:n]


# ---------------------------------------------------------------------------
# Scheduler (Python-facing Task wrapper with Then/Join semantics)
# ---------------------------------------------------------------------------

_TASK_FN = ctypes.CFUNCTYPE(None, ctypes.c_void_p)

# Thread classes (Runtime/Tasks/Scheduler.h EThreadType parity)
RENDER, WORKER, MAIN, RHI = 0, 1, 2, 3


class Scheduler:
    """Native thread-pool scheduler with dependency DAGs.

    Python callables run on native worker threads (the GIL serializes pure-
    Python bodies, but IO and numpy/native calls release it — matching the
    engine's use: async asset decode + BVH builds).
    """

    def __init__(self, num_workers: int = 0):
        lib = load()
        if lib is None:
            raise RuntimeError("native scheduler unavailable (no toolchain?)")
        self._lib = lib
        self._handle = lib.sailor_scheduler_create(num_workers)
        self._keepalive: dict[int, object] = {}
        self._results: dict[int, object] = {}
        self._lock = threading.Lock()

    def submit(self, fn, deps=(), thread_class: int = WORKER) -> int:
        result_slot: dict = {}

        @_TASK_FN
        def trampoline(_arg):
            try:
                result_slot["value"] = fn()
            except Exception as e:  # surfaced on wait()
                result_slot["error"] = e

        deps_arr = (ctypes.c_uint64 * max(len(deps), 1))(*deps)
        tid = self._lib.sailor_scheduler_submit(
            self._handle, ctypes.cast(trampoline, ctypes.c_void_p), None,
            deps_arr, len(deps), thread_class,
        )
        with self._lock:
            self._keepalive[tid] = trampoline
            self._results[tid] = result_slot
        return tid

    def then(self, dep: int, fn, thread_class: int = WORKER) -> int:
        """Continuation chaining (Tasks.h Then())."""
        return self.submit(fn, deps=(dep,), thread_class=thread_class)

    def is_done(self, tid: int) -> bool:
        return bool(self._lib.sailor_scheduler_is_done(self._handle, tid))

    def wait(self, tid: int):
        self._lib.sailor_scheduler_wait(self._handle, tid)
        with self._lock:
            slot = self._results.pop(tid, {})
            self._keepalive.pop(tid, None)
        if "error" in slot:
            raise slot["error"]
        return slot.get("value")

    def wait_idle(self):
        self._lib.sailor_scheduler_wait_idle(self._handle)

    @property
    def num_pending(self) -> int:
        return self._lib.sailor_scheduler_num_pending(self._handle)

    def shutdown(self):
        if self._handle:
            self._lib.sailor_scheduler_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.shutdown()
        except Exception:
            pass


# ---------------------------------------------------------------------------
# Pool / multi-pool allocators (TPoolAllocator / TMultiPoolAllocator analogs)
# ---------------------------------------------------------------------------


class Pool:
    """Fixed-block native pool with occupancy stats (Memory.h
    TPoolAllocator analog)."""

    def __init__(self, block_size: int = 64, blocks_per_page: int = 256):
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.sailor_pool_create(block_size, blocks_per_page)

    def alloc(self) -> int:
        return self._lib.sailor_pool_alloc(self._h)

    def free(self, ptr: int) -> None:
        self._lib.sailor_pool_free(self._h, ptr)

    def stats(self) -> dict:
        out = (ctypes.c_size_t * 4)()
        self._lib.sailor_pool_stats(self._h, out)
        return {"pages": out[0], "capacity": out[1], "used": out[2],
                "reserved_bytes": out[3]}

    def destroy(self) -> None:
        if self._h:
            self._lib.sailor_pool_destroy(self._h)
            self._h = None


class MultiPool:
    """Size-class router over pools (TMultiPoolAllocator analog):
    16B..64KB pow2 classes, oversize falls through to the system heap."""

    def __init__(self):
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.sailor_mpool_create()

    def alloc(self, size: int) -> int:
        return self._lib.sailor_mpool_alloc(self._h, size)

    def free(self, ptr: int, size: int) -> None:
        self._lib.sailor_mpool_free(self._h, ptr, size)

    def stats(self) -> dict:
        out = (ctypes.c_size_t * 4)()
        self._lib.sailor_mpool_stats(self._h, out)
        return {"pages": out[0], "capacity": out[1], "used": out[2],
                "reserved_bytes": out[3]}

    def destroy(self) -> None:
        if self._h:
            self._lib.sailor_mpool_destroy(self._h)
            self._h = None
