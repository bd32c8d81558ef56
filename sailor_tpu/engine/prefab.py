"""Prefabs — counterpart of Runtime/AssetRegistry/Prefab/ (PrefabImporter,
Prefab::FromGameObject): serialize a game object's subtree to YAML and
instantiate it into any world with fresh instance ids and two-phase parent
resolution (World::Instantiate(PrefabPtr))."""

from __future__ import annotations

import uuid

import numpy as np
import yaml

from sailor_tpu.engine.world import GameObject, World, component_types


def _subtree(world: World, root: GameObject) -> list[GameObject]:
    out = [root]
    frontier = {root}
    changed = True
    while changed:
        changed = False
        for go in world.game_objects:
            if go not in frontier and go.parent in frontier:
                out.append(go)
                frontier.add(go)
                changed = True
    return out


def from_game_object(root: GameObject) -> dict:
    """Serialize root + descendants (Prefab::FromGameObject)."""
    objs = _subtree(root.world, root)
    index = {go: i for i, go in enumerate(objs)}
    entries = []
    for go in objs:
        entries.append(
            {
                "name": go.name,
                "position": go.position.tolist(),
                "rotation": go.rotation.tolist(),
                "scale": go.scale.tolist(),
                "parentIndex": index.get(go.parent, -1) if go is not root else -1,
                "components": [c.serialize() for c in go.components],
            }
        )
    return {"prefab": root.name, "gameObjects": entries}


def save(root: GameObject, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(from_game_object(root), f, sort_keys=False)


def instantiate(world: World, doc: dict | str, parent: GameObject | None = None,
                position=None, assets=None) -> GameObject:
    """Instantiate a prefab document (or path) into the world; returns the
    new root. Fresh instance ids; optional parent + position override."""
    if isinstance(doc, str):
        with open(doc) as f:
            doc = yaml.safe_load(f)
    entries = doc.get("gameObjects", []) or []
    gos: list[GameObject] = []
    for e in entries:
        go = GameObject(world, e.get("name", "GameObject"),
                        instance_id=uuid.uuid4().hex[:16])
        world.game_objects.append(go)
        go.position = e.get("position", [0, 0, 0])
        go.rotation = e.get("rotation", [0, 0, 0, 1])
        go.scale = e.get("scale", [1, 1, 1])
        gos.append(go)
    types = component_types()
    for e, go in zip(entries, gos):
        p = e.get("parentIndex", -1)
        if p is not None and p >= 0:
            go.set_parent(gos[p])
        for cdata in e.get("components", []) or []:
            ctype = types.get(cdata.get("typename"))
            if ctype is None:
                raise KeyError(f"unknown component '{cdata.get('typename')}'")
            comp = ctype()
            comp.apply(cdata)
            go.add_component(comp)
            if assets is not None and hasattr(comp, "resolve_assets"):
                comp.resolve_assets(assets)
    root = gos[0] if gos else world.instantiate("Prefab")
    if parent is not None:
        root.set_parent(parent)
    if position is not None:
        root.position = np.asarray(position, np.float32)
    return root
