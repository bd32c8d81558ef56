"""Asset registry: folder scan, file ids, meta sidecars, importer dispatch,
cache with timestamp expiry, hot reload.

Counterpart of Runtime/AssetRegistry/AssetRegistry.{h,cpp}: the reference
scans Content/, assigns GUID FileIds stored in `.asset` YAML sidecars,
dispatches importers by extension, and fires OnUpdateAssetInfo when
timestamps change (the hot-reload hook that re-compiles shaders and
rebuilds materials).  Same design here; "shader recompilation" becomes
dropping cached jitted artifacts so the next frame re-traces.
"""

from __future__ import annotations

import os
import time
import uuid
from typing import Any, Callable

import yaml

from sailor_tpu.utils.log import SAILOR_LOG


class AssetInfo:
    """Per-asset metadata (AssetInfo.h): file id, timestamps, import settings."""

    def __init__(self, path: str, file_id: str, meta: dict | None = None):
        self.path = path
        self.file_id = file_id
        self.meta = meta or {}
        self.load_time = 0.0

    @property
    def mtime(self) -> float:
        try:
            return os.path.getmtime(self.path)
        except OSError:
            return 0.0

    def is_expired(self) -> bool:
        return self.mtime > self.load_time


class AssetRegistry:
    """Scan + load + cache + hot reload (AssetRegistry.h API surface)."""

    def __init__(self, content_root: str = "content"):
        self.content_root = content_root
        self.infos: dict[str, AssetInfo] = {}       # path -> info
        self.by_id: dict[str, AssetInfo] = {}       # file id -> info
        self.cache: dict[str, Any] = {}             # file id -> loaded asset
        self.importers: dict[str, Callable] = {}    # extension -> loader
        self.listeners: list[Callable] = []         # on-hot-reload callbacks
        self._register_default_importers()

    # -- importer dispatch (per-type AssetInfoHandlers) -----------------------

    def register_importer(self, extension: str, loader: Callable) -> None:
        self.importers[extension.lower()] = loader

    def _register_default_importers(self) -> None:
        from sailor_tpu.assets import gltf, materials, stars, textures
        from sailor_tpu.framegraph.graph import FrameGraphAsset

        self.register_importer(".gltf", lambda p, meta: gltf.load_merged(p))
        self.register_importer(".glb", lambda p, meta: gltf.load_merged(p))
        self.register_importer(".renderer", lambda p, meta: FrameGraphAsset.load(p))
        self.register_importer(
            ".mat",
            lambda p, meta: materials.MaterialAsset.from_yaml(
                open(p).read(), os.path.basename(p)
            ),
        )
        self.register_importer(".world", lambda p, meta: yaml.safe_load(open(p)))
        self.register_importer(".prefab", lambda p, meta: yaml.safe_load(open(p)))
        for ext in (".png", ".jpg", ".jpeg", ".bmp", ".tga", ".gif", ".hdr", ".exr"):
            self.register_importer(ext, lambda p, meta: textures.load(p, **(meta or {})))
        self.register_importer(".bsc5", lambda p, meta: stars.load(p))

    # -- scanning (ScanContentFolder) -------------------------------------------

    def scan_content_folder(self) -> int:
        """Walk the content root, assign file ids, write .asset sidecars."""
        count = 0
        for root, _dirs, files in os.walk(self.content_root):
            for fn in files:
                if fn.endswith(".asset"):
                    continue
                path = os.path.join(root, fn)
                ext = os.path.splitext(fn)[1].lower()
                if ext not in self.importers:
                    continue
                self._register_file(path)
                count += 1
        return count

    def _register_file(self, path: str) -> AssetInfo:
        if path in self.infos:
            return self.infos[path]
        sidecar = path + ".asset"
        meta = {}
        if os.path.exists(sidecar):
            meta = yaml.safe_load(open(sidecar)) or {}
        file_id = meta.get("fileId") or uuid.uuid4().hex
        if "fileId" not in meta:
            meta["fileId"] = file_id
            try:
                with open(sidecar, "w") as f:
                    yaml.safe_dump(meta, f)
            except OSError:
                pass  # read-only content roots are fine
        info = AssetInfo(path, file_id, meta)
        self.infos[path] = info
        self.by_id[file_id] = info
        return info

    # -- loading (LoadAssetFromFile<T>) --------------------------------------------

    def load(self, path_or_id: str) -> Any:
        info = self.by_id.get(path_or_id)
        if info is None:
            path = (
                path_or_id
                if os.path.exists(path_or_id)
                else os.path.join(self.content_root, path_or_id)
            )
            info = self._register_file(path)
        if info.file_id in self.cache and not info.is_expired():
            return self.cache[info.file_id]
        ext = os.path.splitext(info.path)[1].lower()
        loader = self.importers.get(ext)
        if loader is None:
            raise KeyError(f"no importer for '{ext}'")
        asset = loader(info.path, info.meta.get("import", {}))
        info.load_time = time.time()
        self.cache[info.file_id] = asset
        return asset

    def load_mesh(self, name: str, **params):
        """Mesh resolve used by MeshRendererComponent: primitive names or
        model files."""
        from sailor_tpu.assets import primitives

        if name == "cube":
            return primitives.cube(params.get("size", 1.0))
        if name == "sphere":
            return primitives.uv_sphere(params.get("radius", 0.5))
        if name == "plane":
            return primitives.plane(params.get("size", 1.0))
        return self.load(name)

    # -- hot reload (OnUpdateAssetInfo listeners) -------------------------------------

    def add_hot_reload_listener(self, fn: Callable) -> None:
        self.listeners.append(fn)

    def check_hot_reload(self) -> list[str]:
        """Poll timestamps; re-import expired assets and notify listeners.
        Returns reloaded file ids (console `scan` / F5 path)."""
        reloaded = []
        for info in list(self.infos.values()):
            if info.file_id in self.cache and info.is_expired():
                SAILOR_LOG("Hot reload: %s", info.path)
                self.cache.pop(info.file_id, None)
                self.load(info.path)
                reloaded.append(info.file_id)
                for fn in self.listeners:
                    fn(info)
        return reloaded


# ---------------------------------------------------------------------------
# Async loading on the native scheduler (TextureImporter's async load tasks /
# worker-thread import path in the reference).
# ---------------------------------------------------------------------------

_scheduler = None


def _get_scheduler():
    global _scheduler
    if _scheduler is None:
        from sailor_tpu import native_bridge

        if native_bridge.available():
            _scheduler = native_bridge.Scheduler()
    return _scheduler


def load_async(registry: AssetRegistry, path: str):
    """Submit an asset load to the native worker pool; returns a handle with
    .wait() -> asset. Falls back to synchronous load without the toolchain."""
    sched = _get_scheduler()
    if sched is None:
        value = registry.load(path)

        class _Done:
            def wait(self):
                return value

            def is_done(self):
                return True

        return _Done()

    tid = sched.submit(lambda: registry.load(path))

    class _Handle:
        def wait(self):
            return sched.wait(tid)

        def is_done(self):
            return sched.is_done(tid)

    return _Handle()
