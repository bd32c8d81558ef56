"""Editor protocol — parity with the engine DLL C API the MAUI editor
P/Invokes (Lib/DllMain.cpp: Initialize/Start/Stop/Shutdown,
SerializeCurrentWorld, UpdateObject, GetMessages, SetViewport) and the
engine-side Editor submodule (Runtime/Submodules/Editor.cpp).

An out-of-process editor can drive the engine through this object (wrap it
with any RPC layer — the reference uses P/Invoke + a localhost port).
``update_object`` patches live component/transform state from YAML via the
reflection path, exactly like the editor's property inspector."""

from __future__ import annotations

import io

import numpy as np
import yaml

from sailor_tpu.engine.world import World
from sailor_tpu.utils.log import SAILOR_LOG, get_log_messages


class EditorServer:
    def __init__(self):
        self.world: World | None = None
        self.engine_loop = None
        self.viewport = (1280, 720)
        self.running = False

    # -- lifecycle (DllMain Initialize/Start/Stop/Shutdown) -------------------

    def initialize(self, world_path: str | None = None, assets=None) -> bool:
        if world_path:
            self.world = World.load(world_path, assets)
        else:
            self.world = World("Untitled")
        SAILOR_LOG("Editor: initialized world '%s'", self.world.name)
        return True

    def start(self, renderer=None, sky=None) -> None:
        from sailor_tpu.engine.app import EngineLoop
        from sailor_tpu.engine.input import InputState

        if renderer is not None:
            self.engine_loop = EngineLoop(self.world, renderer, sky=sky)
            self.input = self.engine_loop.input
        else:
            # headless protocol mode still carries input state so editor
            # frontends can drive components (GlobalInput analog)
            self.input = InputState()
            if self.world is not None:
                self.world.input = self.input
        self.running = True

    def stop(self) -> None:
        self.running = False

    def shutdown(self) -> None:
        self.stop()
        self.world = None
        self.engine_loop = None

    # -- frame + viewport ------------------------------------------------------

    def set_viewport(self, width: int, height: int) -> None:
        self.viewport = (int(width), int(height))

    def tick(self, dt: float = 1 / 60):
        if self.engine_loop is not None and self.running:
            return self.engine_loop.process_cpu_frame(dt)
        if self.world is not None and self.running:
            self.world.tick(dt)
        return None

    # -- world serialization (SerializeCurrentWorld) ----------------------------

    def serialize_current_world(self) -> str:
        buf = io.StringIO()
        yaml.safe_dump(self.world.serialize(), buf, sort_keys=False)
        return buf.getvalue()

    # -- live property patching (UpdateObject) -----------------------------------

    def update_object(self, instance_id: str, yaml_patch: str) -> bool:
        """Apply a YAML patch to a live game object by instance id:
        transform fields and/or per-component reflected data
        (Runtime/Submodules/Editor.cpp UpdateObject)."""
        go = self.world.find_by_instance_id(instance_id)
        if go is None:
            SAILOR_LOG("Editor: UpdateObject unknown instance %s", instance_id)
            return False
        patch = yaml.safe_load(yaml_patch) or {}
        if "name" in patch:
            go.name = patch["name"]
        for field in ("position", "rotation", "scale"):
            if field in patch:
                setattr(go, field, np.asarray(patch[field], np.float32))
        for cdata in patch.get("components", []) or []:
            tname = cdata.get("typename")
            for comp in go.components:
                if type(comp).__name__ == tname:
                    comp.apply(cdata)
                    break
        return True

    # -- live asset patching (editor ViewModels -> hot reload) --------------------

    def update_asset(self, path: str, yaml_patch: str, registry=None) -> bool:
        """Patch an asset file (e.g. a .mat's uniforms) and hot-reload it —
        the inspector's asset-editing round trip: the reference's C# editor
        ViewModels write the asset YAML and the engine re-imports it via
        OnUpdateAssetInfo (Editor/ViewModels/, MaterialImporter.cpp:53).
        The patch deep-merges into the existing document; listeners (e.g. a
        MaterialLibrary) rebuild so the NEXT frame reflects the edit."""
        reg = registry or getattr(self, "registry", None)
        try:
            with open(path) as f:
                doc = yaml.safe_load(f) or {}
        except OSError:
            SAILOR_LOG("Editor: UpdateAsset unknown path %s", path)
            return False

        def merge(dst, src):
            for k, v in src.items():
                if isinstance(v, dict) and isinstance(dst.get(k), dict):
                    merge(dst[k], v)
                else:
                    dst[k] = v

        patch = yaml.safe_load(yaml_patch) or {}
        merge(doc, patch)
        with open(path, "w") as f:
            yaml.safe_dump(doc, f, sort_keys=False)
        if reg is not None:
            # bump past filesystem mtime granularity so is_expired() fires
            info = reg.infos.get(path)
            if info is not None:
                info.load_time = 0.0
            reg.check_hot_reload()
        SAILOR_LOG("Editor: UpdateAsset %s", path)
        return True

    # -- message queue (GetMessages) ----------------------------------------------

    def get_messages(self, max_count: int = 64) -> list[str]:
        return [f"[{ts:.3f}] {msg}" for ts, msg in get_log_messages(max_count)]
