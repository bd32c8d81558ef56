"""Material system — counterpart of Runtime/AssetRegistry/Material/
MaterialImporter.cpp (.mat YAML: render state, shader, samplers, uniforms)
and the bindless texture-samplers set used by Standard.shader.

Device side: a MaterialTable pytree of per-material parameters + one
texture *stack* (N, S, S, 4) — the TPU analog of the bindless descriptor
array (all textures resized to one resolution so a per-pixel layer index
turns sampling into a dense gather).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
import yaml
from flax import struct


QUEUE_OPAQUE = 0
QUEUE_MASKED = 1
QUEUE_TRANSPARENT = 2

_QUEUE_NAMES = {"Opaque": 0, "Masked": 1, "Transparent": 2}


@struct.dataclass
class MaterialTable:
    albedo: jnp.ndarray          # (M, 3)
    metallic: jnp.ndarray        # (M,)
    roughness: jnp.ndarray       # (M,)
    emissive: jnp.ndarray        # (M, 3)
    albedo_texture: jnp.ndarray  # (M,) int32 layer or -1
    normal_texture: jnp.ndarray  # (M,) int32 layer or -1 (tangent-space map)
    textures: jnp.ndarray        # (N, S, S, 4) stacked linear RGBA
    # Render state (Types.h:524-580 RenderState / .mat renderQueue):
    queue: jnp.ndarray           # (M,) int32 0=Opaque 1=Masked 2=Transparent
    alpha_cutoff: jnp.ndarray    # (M,) float alpha-test threshold (Masked)
    opacity: jnp.ndarray         # (M,) float base opacity (Transparent)
    # Static (host) summary so the graph can skip whole passes at trace
    # time — the analog of the reference's tag-filtered proxy lists
    # (RenderSceneNode.cpp:34-104 returning early on empty batches).
    has_masked: bool = struct.field(pytree_node=False, default=False)
    has_transparent: bool = struct.field(pytree_node=False, default=False)

    def sample_normal(self, mat_id, uv):
        """Tangent-space normal from the material's normal map; returns
        ((..., 3) normal in [-1,1], (...,) has_map mask)."""
        layer = self.normal_texture[mat_id]
        if self.textures.shape[0] == 0:
            z = jnp.zeros(mat_id.shape + (3,))
            return z.at[..., 2].set(1.0), jnp.zeros(mat_id.shape, bool)
        tex = _sample_texture_stack(self.textures, layer, uv)
        n = tex[..., :3] * 2.0 - 1.0
        return n, layer >= 0

    def sample(self, mat_id, uv):
        """Per-pixel material fetch (mat_id (H, W), uv (H, W, 2)).

        Returns (albedo_rgba, metallic, roughness, emissive)."""
        alb = self.albedo[mat_id]                       # (H, W, 3)
        met = self.metallic[mat_id]
        rough = self.roughness[mat_id]
        emis = self.emissive[mat_id]
        layer = self.albedo_texture[mat_id]             # (H, W)
        if self.textures.shape[0] > 0:
            tex = _sample_texture_stack(self.textures, layer, uv)
            alb = alb * jnp.where((layer >= 0)[..., None], tex[..., :3], 1.0)
            alpha = jnp.where(layer >= 0, tex[..., 3], 1.0)
        else:
            alpha = jnp.ones_like(met)
        return (
            jnp.concatenate([alb, alpha[..., None]], axis=-1),
            met, rough, emis,
        )

    @classmethod
    def from_host(cls, table: dict, images: list | None = None,
                  texture_size: int = 256) -> "MaterialTable":
        textures = stack_textures(images or [], texture_size)
        m = len(table["albedo"])
        queues = table.get("queue", np.zeros(m, np.int32))
        queues = np.asarray(
            [_QUEUE_NAMES.get(q, q) if isinstance(q, str) else q for q in queues],
            np.int32,
        )
        return cls(
            albedo=jnp.asarray(table["albedo"]),
            metallic=jnp.asarray(table["metallic"]),
            roughness=jnp.asarray(table["roughness"]),
            emissive=jnp.asarray(table["emissive"]),
            albedo_texture=jnp.asarray(
                table.get("albedo_texture", np.full(m, -1, np.int32))
            ),
            normal_texture=jnp.asarray(
                table.get("normal_texture", np.full(m, -1, np.int32))
            ),
            textures=textures,
            queue=jnp.asarray(queues),
            alpha_cutoff=jnp.asarray(
                table.get("alpha_cutoff", np.full(m, 0.5, np.float32))
            ),
            opacity=jnp.asarray(table.get("opacity", np.ones(m, np.float32))),
            has_masked=bool((queues == QUEUE_MASKED).any()),
            has_transparent=bool((queues == QUEUE_TRANSPARENT).any()),
        )


def stack_textures(images: list, size: int) -> jnp.ndarray:
    """Resize decoded images to one (size, size) and stack (bindless-array
    analog). Empty list -> (0, size, size, 4)."""
    if not images:
        return jnp.zeros((0, size, size, 4))
    out = []
    for img in images:
        h, w = img.shape[:2]
        ys = (np.arange(size) + 0.5) * h / size
        xs = (np.arange(size) + 0.5) * w / size
        yi = np.clip(ys.astype(int), 0, h - 1)
        xi = np.clip(xs.astype(int), 0, w - 1)
        out.append(img[yi][:, xi])
    return jnp.asarray(np.stack(out), jnp.float32)


def _sample_texture_stack(stack, layer, uv):
    """Bilinear sample from (N, S, S, 4) with per-pixel layer index."""
    n, s = stack.shape[0], stack.shape[1]
    safe = jnp.clip(layer, 0, n - 1)
    fx = uv[..., 0] * s - 0.5
    fy = uv[..., 1] * s - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]

    def wrap(i):
        return jnp.remainder(i, s)

    flat = stack.reshape(-1, stack.shape[-1])

    def fetch(yy, xx):
        # flat 1-D gather (multi-index gathers hit a slow TPU path)
        return flat[(safe * s + wrap(yy)) * s + wrap(xx)]

    c00 = fetch(y0, x0)
    c10 = fetch(y0, x0 + 1)
    c01 = fetch(y0 + 1, x0)
    c11 = fetch(y0 + 1, x0 + 1)
    top = c00 + (c10 - c00) * tx
    bot = c01 + (c11 - c01) * tx
    return top + (bot - top) * ty


# ---------------------------------------------------------------------------
# .mat YAML import (MaterialImporter parity)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class MaterialAsset:
    """Parsed .mat file: render state + shader + uniforms
    (Content/Models/*/materials/*.mat schema)."""

    name: str = "material"
    render_queue: str = "Opaque"     # Opaque / Masked / Transparent
    blend_mode: str = "None"
    cull_mode: str = "Back"
    depth_bias: float = 0.0
    enable_depth_test: bool = True
    shader: str = "Standard"
    defines: tuple = ()
    uniforms: dict = dataclasses.field(default_factory=dict)
    samplers: dict = dataclasses.field(default_factory=dict)

    @classmethod
    def from_yaml(cls, text: str, name: str = "material") -> "MaterialAsset":
        doc = yaml.safe_load(text) or {}
        return cls(
            name=doc.get("name", name),
            render_queue=doc.get("renderQueue", "Opaque"),
            blend_mode=doc.get("blendMode", "None"),
            cull_mode=doc.get("cullMode", "Back"),
            depth_bias=float(doc.get("depthBias", 0.0)),
            enable_depth_test=bool(doc.get("enableDepthTest", True)),
            shader=doc.get("shader", "Standard"),
            defines=tuple(doc.get("defines", []) or []),
            uniforms=dict(doc.get("uniformsVec4", {}) or {})
            | {k: [v] for k, v in (doc.get("uniformsFloat", {}) or {}).items()},
            samplers=dict(doc.get("samplers", {}) or {}),
        )

    def to_table_row(self) -> dict:
        """Flatten uniforms into MaterialTable row values."""
        albedo = self.uniforms.get("material.albedo", [0.8, 0.8, 0.8, 1.0])
        return {
            "albedo": albedo[:3],
            "metallic": float(self.uniforms.get("material.metallic", [0.0])[0]),
            "roughness": float(self.uniforms.get("material.roughness", [0.6])[0]),
            "emissive": self.uniforms.get("material.emission", [0, 0, 0, 0])[:3],
            "queue": _QUEUE_NAMES.get(self.render_queue, 0),
            "alpha_cutoff": float(
                self.uniforms.get("material.alphaCutoff", [0.5])[0]
            ),
            "opacity": (
                float(albedo[3]) if len(albedo) > 3 and
                _QUEUE_NAMES.get(self.render_queue, 0) == QUEUE_TRANSPARENT
                else 1.0
            ),
        }
