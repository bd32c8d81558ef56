"""Immediate-mode debug drawing — counterpart of Runtime/RHI/DebugContext
(lines/spheres/frustums/origins with lifetimes, batched into one draw).

Lines accumulate host-side per frame with TTLs; rendering projects all
endpoints in one batch and splats fixed sample points along each segment
with a functional scatter (debug geometry is tiny, so a scatter is fine
here — unlike the hot raster path)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sailor_tpu.core import math3d as m3

_SAMPLES_PER_LINE = 64


class DebugContext:
    def __init__(self):
        self._lines: list[tuple] = []  # (a, b, color, ttl)

    # -- emit API (DebugContext.h parity) ------------------------------------

    def draw_line(self, a, b, color=(0.0, 1.0, 0.0), duration: float = 0.0):
        self._lines.append((np.asarray(a, np.float32), np.asarray(b, np.float32),
                            np.asarray(color, np.float32), duration))

    def draw_aabb(self, bmin, bmax, color=(1.0, 1.0, 0.0), duration=0.0):
        bmin = np.asarray(bmin, np.float32)
        bmax = np.asarray(bmax, np.float32)
        c = [bmin, bmax]
        corners = np.asarray(
            [[c[x][0], c[y][1], c[z][2]] for x in (0, 1) for y in (0, 1) for z in (0, 1)]
        )
        edges = [(0, 1), (0, 2), (0, 4), (3, 1), (3, 2), (3, 7), (5, 1), (5, 4),
                 (5, 7), (6, 2), (6, 4), (6, 7)]
        for i, j in edges:
            self.draw_line(corners[i], corners[j], color, duration)

    def draw_sphere(self, center, radius, color=(0.0, 0.7, 1.0), duration=0.0,
                    segments: int = 16):
        center = np.asarray(center, np.float32)
        t = np.linspace(0, 2 * np.pi, segments + 1)
        for axis in range(3):
            pts = np.zeros((len(t), 3), np.float32)
            pts[:, (axis + 1) % 3] = np.cos(t) * radius
            pts[:, (axis + 2) % 3] = np.sin(t) * radius
            pts += center
            for k in range(segments):
                self.draw_line(pts[k], pts[k + 1], color, duration)

    def draw_frustum(self, inv_view_proj, color=(1.0, 0.2, 0.2), duration=0.0):
        ndc = np.asarray(
            [[x, y, z, 1.0] for z in (1.0, 1e-3) for y in (-1, 1) for x in (-1, 1)],
            np.float32,
        )
        p = ndc @ np.asarray(inv_view_proj, np.float32).T
        p = p[:, :3] / p[:, 3:4]
        edges = [(0, 1), (0, 2), (3, 1), (3, 2), (4, 5), (4, 6), (7, 5), (7, 6),
                 (0, 4), (1, 5), (2, 6), (3, 7)]
        for i, j in edges:
            self.draw_line(p[i], p[j], color, duration)

    def draw_origin(self, origin=(0, 0, 0), size: float = 1.0, duration=0.0):
        o = np.asarray(origin, np.float32)
        self.draw_line(o, o + [size, 0, 0], (1, 0, 0), duration)
        self.draw_line(o, o + [0, size, 0], (0, 1, 0), duration)
        self.draw_line(o, o + [0, 0, size], (0, 0, 1), duration)

    # -- frame lifecycle -------------------------------------------------------

    @property
    def has_lines(self) -> bool:
        return bool(self._lines)

    def tick(self, dt: float):
        """Expire lines (DebugContext::Tick lifetime handling)."""
        self._lines = [
            (a, b, c, ttl - dt) for (a, b, c, ttl) in self._lines if ttl - dt > -dt
        ]
        self._lines = [e for e in self._lines if e[3] >= 0.0 or e[3] > -1e9]

    def clear(self):
        self._lines.clear()

    # -- render -----------------------------------------------------------------

    def rasterize_over(self, image, view_projection):
        """Overlay all debug lines onto (H, W, 3) via point splats."""
        if not self._lines:
            return image
        h, w = image.shape[:2]
        a = jnp.asarray(np.stack([e[0] for e in self._lines]))
        b = jnp.asarray(np.stack([e[1] for e in self._lines]))
        col = jnp.asarray(np.stack([e[2] for e in self._lines]))
        t = jnp.linspace(0.0, 1.0, _SAMPLES_PER_LINE)[None, :, None]
        pts = a[:, None, :] * (1 - t) + b[:, None, :] * t          # (L, S, 3)
        clip = m3.transform_point_h(jnp.asarray(view_projection), pts)
        wclip = clip[..., 3]
        ndc = clip[..., :3] / jnp.maximum(jnp.abs(wclip[..., None]), 1e-6)
        xs = ((ndc[..., 0] * 0.5 + 0.5) * w).astype(jnp.int32)
        ys = ((0.5 - ndc[..., 1] * 0.5) * h).astype(jnp.int32)
        ok = (
            (wclip > 1e-6) & (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
            & (ndc[..., 2] > 0.0) & (ndc[..., 2] <= 1.0)
        )
        xs = jnp.clip(xs, 0, w - 1).reshape(-1)
        ys = jnp.clip(ys, 0, h - 1).reshape(-1)
        colors = jnp.broadcast_to(col[:, None, :], pts.shape).reshape(-1, 3)
        mask = ok.reshape(-1)
        img = image.at[ys, xs].set(
            jnp.where(mask[:, None], colors, image[ys, xs])
        )
        return img
