"""Minimal dependency-free PNG encode (RGB8) — used by the web editor and
the golden-image tooling (stb_image_write analog for the few places the
engine emits images outside of imageio)."""

from __future__ import annotations

import struct
import zlib

import numpy as np


def encode_png(img_u8: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> PNG bytes."""
    h, w = img_u8.shape[:2]
    raw = b"".join(b"\x00" + img_u8[y].tobytes() for y in range(h))

    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF
        )

    hdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", hdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def srgb_to_u8(final_srgb) -> np.ndarray:
    return np.clip(np.asarray(final_srgb) * 255.0 + 0.5, 0, 255).astype(
        np.uint8
    )
