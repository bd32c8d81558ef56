"""RHI types: frame constants, render-target registry, formats.

TPU-native counterpart of Runtime/RHI/Types.h.  On TPU there is no
driver-level resource object — a "render target" is a named HBM array and a
"surface" is just another array (MSAA resolve becomes a reshape-mean).  The
registry keeps the declarative format/size metadata from the `.renderer`
YAML so the frame graph can allocate and type-check targets, mirroring
RHIFrameGraph's render-target map.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
from flax import struct


# Texture formats (subset of Runtime/RHI/Types.h EFormat relevant on TPU —
# everything is an array; format picks channel count + dtype).
FORMATS: dict[str, tuple[int, Any]] = {
    "R8_UNORM": (1, jnp.float32),
    "R16_SFLOAT": (1, jnp.float32),
    "R32_SFLOAT": (1, jnp.float32),
    "R11G11B10_UFLOAT_PACK32": (3, jnp.float32),
    "R16G16B16A16_SFLOAT": (4, jnp.float32),
    "R32G32B32A32_SFLOAT": (4, jnp.float32),
    "R8G8B8A8_SRGB": (4, jnp.float32),
    "R8G8B8A8_UNORM": (4, jnp.float32),
    "B8G8R8A8_SRGB": (4, jnp.float32),
    "D32_SFLOAT": (1, jnp.float32),
    # bf16 variants for HBM-bandwidth-bound intermediates
    "R16G16B16A16_BFLOAT": (4, jnp.bfloat16),
}


@struct.dataclass
class FrameData:
    """Per-frame camera constants (parity: UboFrameData, RHI/Types.h:751-761).

    A pytree of arrays so it can flow through jit; viewport size is static
    metadata carried by RenderConfig instead (XLA static shapes).
    """

    view: jnp.ndarray          # (4, 4)
    projection: jnp.ndarray    # (4, 4)
    inv_projection: jnp.ndarray  # (4, 4)
    camera_position: jnp.ndarray  # (3,)
    camera_z_near_far: jnp.ndarray  # (2,)
    current_time: jnp.ndarray  # scalar
    delta_time: jnp.ndarray    # scalar

    @property
    def view_projection(self):
        return self.projection @ self.view

    @classmethod
    def create(cls, view, projection, camera_position, z_near, z_far,
               time=0.0, dt=0.0):
        return cls(
            view=jnp.asarray(view),
            projection=jnp.asarray(projection),
            inv_projection=jnp.linalg.inv(projection),
            camera_position=jnp.asarray(camera_position),
            camera_z_near_far=jnp.asarray([z_near, z_far]),
            current_time=jnp.asarray(time, jnp.float32),
            delta_time=jnp.asarray(dt, jnp.float32),
        )


def _eval_size_expr(expr: str, original) -> int:
    """Evaluate a size expression with + - * / and parentheses only.

    Recursive-descent over integer tokens; rejects '**', names, and any
    other syntax so a hostile `.renderer`/`.mat` file cannot execute code
    or construct astronomically large values via exponentiation.
    """
    tokens: list = []
    i, n = 0, len(expr)
    while i < n:
        c = expr[i]
        if c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < n and expr[j].isdigit():
                j += 1
            tokens.append(int(expr[i:j]))
            i = j
        elif c in "+-*/()":
            tokens.append(c)
            i += 1
        else:
            raise ValueError(f"bad size expression: {original!r}")
    pos = [0]

    def peek():
        return tokens[pos[0]] if pos[0] < len(tokens) else None

    def take():
        t = peek()
        pos[0] += 1
        return t

    def atom():
        t = take()
        if t == "(":
            v = add()
            if take() != ")":
                raise ValueError(f"bad size expression: {original!r}")
            return v
        if t == "-":
            return -atom()
        if isinstance(t, int):
            return t
        raise ValueError(f"bad size expression: {original!r}")

    def mul():
        v = atom()
        while peek() in ("*", "/"):
            if take() == "*":
                v = v * atom()
            else:
                d = atom()
                if d == 0:
                    raise ValueError(f"division by zero in size: {original!r}")
                v = v // d
        return v

    def add():
        v = mul()
        while peek() in ("+", "-"):
            v = v + mul() if take() == "+" else v - mul()
        return v

    out = add()
    if pos[0] != len(tokens):
        raise ValueError(f"bad size expression: {original!r}")
    if not (0 < out <= 16384 * 16384):
        raise ValueError(f"size out of range: {original!r} -> {out}")
    return int(out)


@dataclasses.dataclass(frozen=True)
class TargetSpec:
    """Declarative render-target spec parsed from `.renderer` YAML
    (parity: FrameGraphAsset render target decls, FrameGraphParser.cpp)."""

    name: str
    format: str = "R16G16B16A16_SFLOAT"
    width: int | str = "ViewportWidth"    # int or size expression
    height: int | str = "ViewportHeight"
    mips: int = 1
    clear: tuple = (0.0, 0.0, 0.0, 0.0)

    def resolve_size(self, viewport_w: int, viewport_h: int) -> tuple[int, int]:
        def resolve(v, vw, vh):
            if isinstance(v, int):
                return v
            expr = str(v).replace("ViewportWidth", str(vw)).replace(
                "ViewportHeight", str(vh)
            )
            # size expressions like "ViewportWidth/2" (FrameGraphParser).
            # Parsed with a tiny arithmetic grammar — NOT eval(): a content
            # file must not be able to run "9**9**9" (or worse).
            return _eval_size_expr(expr, v)

        return resolve(self.width, viewport_w, viewport_h), resolve(
            self.height, viewport_w, viewport_h
        )


class RenderTargets:
    """Allocates and names HBM render targets for a frame graph.

    The jitted pass graph passes a plain dict[str, Array] (a pytree);
    this class is the host-side factory that builds the initial dict from
    TargetSpecs — the analog of RHIFrameGraph's target map +
    VulkanGraphicsDriver's render-target pool, minus the manual memory
    management (XLA owns allocation).
    """

    def __init__(self, viewport_w: int, viewport_h: int):
        self.viewport = (viewport_w, viewport_h)
        self.specs: dict[str, TargetSpec] = {}

    def declare(self, spec: TargetSpec) -> None:
        self.specs[spec.name] = spec

    def allocate(self) -> dict[str, jnp.ndarray]:
        out = {}
        vw, vh = self.viewport
        for name, spec in self.specs.items():
            w, h = spec.resolve_size(vw, vh)
            ch, dtype = FORMATS[spec.format]
            shape = (h, w, ch) if ch > 1 else (h, w)
            fill = spec.clear[0] if ch == 1 else jnp.asarray(spec.clear[:ch], dtype)
            out[name] = jnp.broadcast_to(jnp.asarray(fill, dtype), shape).astype(dtype)
            if spec.mips > 1:
                for m in range(1, spec.mips):
                    mw, mh = max(1, w >> m), max(1, h >> m)
                    mshape = (mh, mw, ch) if ch > 1 else (mh, mw)
                    out[f"{name}/mip{m}"] = jnp.zeros(mshape, dtype)
        return out
