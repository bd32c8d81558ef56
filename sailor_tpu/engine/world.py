"""World + GameObject + Component object model.

Counterpart of Runtime/Engine/World.{h,cpp} and GameObject.h: the world
owns game objects and ECS systems, ticks systems in GetOrder() order,
instantiates prefabs with two-phase instance-id resolution, and serializes
to YAML (WorldPrefab round trip — the engine's checkpoint/resume story).

The reflection layer (SAILOR_REFLECTABLE) maps to a declarative
``serialized_fields`` list per component class + a name->class registry.
"""

from __future__ import annotations

import uuid
from typing import Any

import numpy as np
import yaml

from sailor_tpu.ecs.ecs import SystemRegistry

_COMPONENT_TYPES: dict[str, type] = {}


def register_component(cls):
    """Component factory registration (Reflection::RegisterFactoryMethod)."""
    _COMPONENT_TYPES[cls.__name__] = cls
    return cls


def component_types() -> dict[str, type]:
    return dict(_COMPONENT_TYPES)


class Component:
    """Base component (Runtime/Components/Component.h).

    ``serialized_fields``: attribute names persisted to YAML (the
    reflection-generated ReflectedData analog).
    """

    serialized_fields: tuple[str, ...] = ()

    def __init__(self, **kwargs):
        self.game_object: GameObject | None = None
        for k, v in kwargs.items():
            setattr(self, k, v)

    # lifecycle (Component.h virtuals)
    def begin_play(self) -> None:
        pass

    def tick(self, dt: float) -> None:
        pass

    def end_play(self) -> None:
        pass

    # reflection-ish serialization
    def serialize(self) -> dict:
        out = {"typename": type(self).__name__}
        for f in self.serialized_fields:
            v = getattr(self, f)
            if isinstance(v, np.ndarray):
                v = v.tolist()
            out[f] = v
        return out

    def apply(self, data: dict) -> None:
        for f in self.serialized_fields:
            if f in data:
                setattr(self, f, data[f])


class GameObject:
    """Transform handle + component list (Runtime/Engine/GameObject.h)."""

    def __init__(self, world: "World", name: str = "GameObject",
                 instance_id: str | None = None):
        self.world = world
        self.name = name
        self.instance_id = instance_id or uuid.uuid4().hex[:16]
        self.transform = world.transforms.add()
        self.parent: GameObject | None = None
        self.components: list[Component] = []
        self._began = False

    # -- transform sugar -----------------------------------------------------

    @property
    def position(self):
        return self.world.transforms.pool.position[self.transform].copy()

    @position.setter
    def position(self, v):
        self.world.transforms.set_position(self.transform, v)

    @property
    def rotation(self):
        return self.world.transforms.pool.rotation[self.transform].copy()

    @rotation.setter
    def rotation(self, v):
        self.world.transforms.set_rotation(self.transform, v)

    @property
    def scale(self):
        return self.world.transforms.pool.scale[self.transform].copy()

    @scale.setter
    def scale(self, v):
        self.world.transforms.set_scale(self.transform, v)

    def set_parent(self, parent: "GameObject | None") -> None:
        self.parent = parent
        self.world.transforms.set_parent(
            self.transform, parent.transform if parent else -1
        )

    # -- components -----------------------------------------------------------

    def add_component(self, comp: Component) -> Component:
        comp.game_object = self
        self.components.append(comp)
        if self._began:
            comp.begin_play()
        return comp

    def get_component(self, cls) -> Component | None:
        for c in self.components:
            if isinstance(c, cls):
                return c
        return None

    def tick(self, dt: float) -> None:
        if not self._began:
            for c in self.components:
                c.begin_play()
            self._began = True
        for c in self.components:
            c.tick(dt)


class World:
    """Owns game objects + systems; ticks in order (World::Tick)."""

    def __init__(self, name: str = "World"):
        self.name = name
        self.systems = SystemRegistry.create_all(self)
        self._by_name = {s.name: s for s in self.systems}
        self.game_objects: list[GameObject] = []
        self._pending_destroy: list[GameObject] = []
        self.time = 0.0
        # optional MaterialLibrary (assets/materials.py): material_id on
        # mesh renderers indexes its table; hot-reload edits swap the table
        self.materials = None

    # -- systems ---------------------------------------------------------------

    def system(self, name: str):
        return self._by_name.get(name)

    @property
    def transforms(self):
        return self._by_name["Transform"]

    @property
    def cameras(self):
        return self._by_name["Camera"]

    @property
    def lighting(self):
        return self._by_name["Lighting"]

    @property
    def meshes(self):
        return self._by_name["StaticMesh"]

    # -- objects ----------------------------------------------------------------

    def instantiate(self, name: str = "GameObject") -> GameObject:
        go = GameObject(self, name)
        self.game_objects.append(go)
        return go

    def destroy(self, go: GameObject) -> None:
        self._pending_destroy.append(go)

    def find(self, name: str) -> GameObject | None:
        for go in self.game_objects:
            if go.name == name:
                return go
        return None

    def find_by_instance_id(self, iid: str) -> GameObject | None:
        for go in self.game_objects:
            if go.instance_id == iid:
                return go
        return None

    # -- tick --------------------------------------------------------------------

    def tick(self, dt: float) -> None:
        """World::Tick: object ticks, then systems in order, then destroys."""
        self.time += dt
        for go in self.game_objects:
            go.tick(dt)
        for s in self.systems:
            s.tick(dt)
        for s in self.systems:
            s.post_tick()
        for go in self._pending_destroy:
            for c in go.components:
                c.end_play()
            self.world_release(go)
        self._pending_destroy.clear()

    def world_release(self, go: GameObject) -> None:
        if go in self.game_objects:
            self.game_objects.remove(go)
            self.transforms.pool.release(go.transform)

    # -- scene view --------------------------------------------------------------

    def scene_view(self, sky=None, stars=None, prev_frame=None):
        """Snapshot for the frame graph (Renderer::PushFrame copy stage)."""
        from sailor_tpu.rhi.scene_view import SceneView

        frame = self.cameras.main_frame()
        if frame is None:
            raise RuntimeError("world has no camera")
        geo = self.meshes.geometry
        if geo is None:
            raise RuntimeError("world has no static meshes")
        star_dirs = star_colors = None
        if stars is not None:
            star_dirs, star_colors = stars
        mats = self.materials.table if self.materials is not None else None
        # per-source-triangle packed attrs: recompute only when the mesh
        # soup object or the material table version changes (movement /
        # topology / hot-reload), not per frame
        key = (id(geo), id(mats))
        if getattr(self, "_attrs_key", None) != key:
            from sailor_tpu.raster.interpolate import pack_source_attributes

            self._attrs_packed = pack_source_attributes(geo, mats)
            self._attrs_key = key
        return SceneView.create(
            geo, self.lighting.snapshot, frame, sky=sky, prev_frame=prev_frame,
            star_dirs=star_dirs, star_colors=star_colors,
            materials=mats, attrs_packed=self._attrs_packed,
        )

    # -- serialization (WorldPrefab round trip) ------------------------------------

    def serialize(self) -> dict:
        objs = []
        index = {go: i for i, go in enumerate(self.game_objects)}
        for go in self.game_objects:
            objs.append(
                {
                    "name": go.name,
                    "instanceId": go.instance_id,
                    "position": go.position.tolist(),
                    "rotation": go.rotation.tolist(),
                    "scale": go.scale.tolist(),
                    "parentIndex": index.get(go.parent, -1),
                    "components": [c.serialize() for c in go.components],
                }
            )
        return {"name": self.name, "gameObjects": objs}

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.serialize(), f, sort_keys=False)

    @classmethod
    def deserialize(cls, doc: dict, assets=None) -> "World":
        """Two-phase load: create all objects (instance ids preserved), then
        resolve parents + component references (World::Instantiate +
        ResolveExternalDependencies)."""
        world = cls(doc.get("name", "World"))
        entries = doc.get("gameObjects", []) or []
        gos = []
        for e in entries:
            go = GameObject(world, e.get("name", "GameObject"),
                            instance_id=e.get("instanceId"))
            world.game_objects.append(go)
            go.position = e.get("position", [0, 0, 0])
            go.rotation = e.get("rotation", [0, 0, 0, 1])
            go.scale = e.get("scale", [1, 1, 1])
            gos.append(go)
        for e, go in zip(entries, gos):
            p = e.get("parentIndex", -1)
            if p is not None and p >= 0:
                go.set_parent(gos[p])
            for cdata in e.get("components", []) or []:
                tname = cdata.get("typename")
                ctype = _COMPONENT_TYPES.get(tname)
                if ctype is None:
                    raise KeyError(f"unknown component type '{tname}'")
                comp = ctype()
                comp.apply(cdata)
                go.add_component(comp)
                if assets is not None and hasattr(comp, "resolve_assets"):
                    comp.resolve_assets(assets)
        return world

    @classmethod
    def load(cls, path: str, assets=None) -> "World":
        with open(path) as f:
            return cls.deserialize(yaml.safe_load(f), assets)
