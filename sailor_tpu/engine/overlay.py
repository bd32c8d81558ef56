"""Immediate-mode overlay UI — the ImGui analog.

Counterpart of Runtime/Engine/ImGuiApi.cpp (378 LoC dear-imgui bridge) +
Runtime/FrameGraph/RenderImGuiNode.cpp + Content/Shaders/ImGuiUI.shader:
the reference builds UI vertex data on the CPU each frame and draws it as
the last pass. Here the host rasterizes the HUD into a small RGBA canvas
(PIL bitmap font = the font-atlas analog), the canvas rides into the jit
as a traced state array of FIXED shape, and RenderOverlayNode
alpha-composites it over Final on device.

API mirrors the immediate-mode flow:

    ov = OverlayContext(384, 192)
    ov.new_frame()
    ov.text(4, 4, f"{fps:.1f} FPS")
    ov.rect(0, 0, 120, 40, fill=(0, 0, 0, 120))
    state["overlay/canvas"] = ov.canvas()   # before FrameGraph.process
"""

from __future__ import annotations

import numpy as np

_WHITE = (255, 255, 255, 255)


class OverlayContext:
    """CPU-side HUD canvas (ImGuiApi analog)."""

    def __init__(self, width: int = 384, height: int = 192, scale: int = 1):
        from PIL import Image, ImageDraw, ImageFont

        self.width = width
        self.height = height
        self.scale = scale
        self._Image = Image
        self._Draw = ImageDraw
        self._font = ImageFont.load_default()
        self._img = Image.new("RGBA", (width, height), (0, 0, 0, 0))
        self._draw = ImageDraw.Draw(self._img)

    # -- immediate-mode draw calls ------------------------------------------

    def new_frame(self) -> None:
        """ImGui::NewFrame analog: clear the canvas."""
        self._img = self._Image.new(
            "RGBA", (self.width, self.height), (0, 0, 0, 0)
        )
        self._draw = self._Draw.Draw(self._img)

    def text(self, x: int, y: int, s: str, color=_WHITE) -> None:
        self._draw.text((x, y), s, fill=tuple(color), font=self._font)

    def rect(self, x: int, y: int, w: int, h: int, fill=(0, 0, 0, 128),
             outline=None) -> None:
        self._draw.rectangle(
            [x, y, x + w - 1, y + h - 1], fill=tuple(fill),
            outline=tuple(outline) if outline else None,
        )

    def line(self, x0: int, y0: int, x1: int, y1: int, color=_WHITE,
             width: int = 1) -> None:
        self._draw.line([x0, y0, x1, y1], fill=tuple(color), width=width)

    def progress_bar(self, x: int, y: int, w: int, h: int, frac: float,
                     color=(90, 200, 90, 220)) -> None:
        self.rect(x, y, w, h, fill=(0, 0, 0, 140), outline=(255, 255, 255, 90))
        self.rect(x + 1, y + 1, max(0, int((w - 2) * min(max(frac, 0.0), 1.0))),
                  h - 2, fill=color)

    # -- output ---------------------------------------------------------------

    def canvas(self) -> np.ndarray:
        """(H, W, 4) float32 straight-alpha canvas for the overlay node."""
        arr = np.asarray(self._img, np.float32) / 255.0
        if self.scale > 1:
            arr = np.repeat(np.repeat(arr, self.scale, 0), self.scale, 1)
        return arr


def stats_hud(ov: OverlayContext, stats: dict, console_lines=()) -> None:
    """Standard frame-stats HUD (the reference's window-title FPS/VRAM
    readout, Sailor.cpp:328-347, plus the editor console tail)."""
    ov.new_frame()
    fps = 1000.0 / stats["last_frame_ms"] if stats.get("last_frame_ms") else 0.0
    lines = [
        f"{fps:6.1f} FPS  {stats.get('last_frame_ms', 0.0):6.2f} ms",
        f"frames {stats.get('gpu_frames', 0)}",
    ]
    if "triangles" in stats:
        lines.append(f"tris {stats['triangles']}")
    # per-node device timings when a `profile` pass has run (Tracy GPU
    # cost listing analog) — top entries, heaviest first
    node_ms = stats.get("node_ms")
    if node_ms:
        for name, ms in sorted(node_ms.items(), key=lambda kv: -kv[1])[:8]:
            lines.append(f"{name[:18]:<18}{ms:6.2f}ms")
    pad, lh = 4, 12
    h = pad * 2 + lh * (len(lines) + len(tuple(console_lines)))
    ov.rect(0, 0, 190, h, fill=(0, 0, 0, 130))
    y = pad
    for ln in lines:
        ov.text(pad, y, ln)
        y += lh
    for ln in console_lines:
        ov.text(pad, y, str(ln)[:30], color=(180, 220, 180, 255))
        y += lh
