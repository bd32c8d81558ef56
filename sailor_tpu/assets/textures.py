"""Texture import — counterpart of Runtime/AssetRegistry/Texture/
TextureImporter.cpp (stb_image): LDR (png/bmp/tga/jpg/gif) + HDR via
imageio, sRGB->linear, mip generation, sampler meta from the .asset
sidecar."""

from __future__ import annotations

import numpy as np


def load(path: str, *, srgb: bool | None = None, flip_y: bool = False,
         generate_mips: bool = False, **_ignored):
    """Decode to float32 linear RGBA (H, W, 4). HDR formats stay linear."""
    import imageio.v2 as imageio

    arr = np.asarray(imageio.imread(path))
    is_hdr = arr.dtype in (np.float32, np.float64, np.float16)
    if srgb is None:
        srgb = not is_hdr
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    elif arr.dtype == np.uint16:
        arr = arr.astype(np.float32) / 65535.0
    else:
        arr = arr.astype(np.float32)
    if srgb:
        arr = arr**2.2
    if arr.ndim == 2:
        arr = arr[..., None].repeat(3, -1)
    if arr.shape[-1] == 3:
        arr = np.concatenate([arr, np.ones_like(arr[..., :1])], -1)
    if flip_y:
        arr = arr[::-1]
    if generate_mips:
        return mip_chain(arr)
    return arr


def mip_chain(img: np.ndarray) -> list[np.ndarray]:
    """Box-filtered mip pyramid down to 1x1."""
    mips = [img]
    cur = img
    while min(cur.shape[0], cur.shape[1]) > 1:
        h2, w2 = max(1, cur.shape[0] // 2), max(1, cur.shape[1] // 2)
        cur = cur[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2, -1).mean(axis=(1, 3))
        mips.append(cur.astype(np.float32))
    return mips
