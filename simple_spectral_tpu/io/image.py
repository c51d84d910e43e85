"""Image output, host-side.

Equivalent of ``Framebuffer::save`` (reference src/framebuffer.cpp:39-176):
format chosen by extension -- ``.csv`` (lRGB floats), ``.hdr`` (RADIANCE
rgbe), ``.pfm`` (raw f32), default PNG.  Input everywhere is the framebuffer
convention used throughout this package: sRGB+A float32 ``[H, W, 4]`` with
row 0 at the *bottom* (reference src/framebuffer.hpp:23-26).  PNG writing
uses PIL rather than a vendored codec (SURVEY.md C16: image I/O is not on
the device hot path).
"""

from __future__ import annotations

import os

import numpy as np

from simple_spectral_tpu.spectra.colorimetry import srgb_to_lrgb_np


def save_image(path: str, fb: np.ndarray) -> None:
    fb = np.asarray(fb, np.float32)
    assert fb.ndim == 3 and fb.shape[2] in (3, 4)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".csv":
        _save_csv(path, fb)
    elif ext == ".hdr":
        _save_hdr(path, fb)
    elif ext == ".pfm":
        _save_pfm(path, fb)
    else:
        _save_png(path, fb)


def _save_png(path: str, fb: np.ndarray) -> None:
    """Clamp, quantize, flip to top-to-bottom (reference
    src/framebuffer.cpp:141-175)."""
    from PIL import Image

    rgba = fb if fb.shape[2] == 4 else np.concatenate(
        [fb, np.ones_like(fb[..., :1])], axis=-1
    )
    u8 = np.clip(np.round(rgba * 255.0), 0, 255).astype(np.uint8)
    Image.fromarray(u8[::-1], "RGBA").save(path)


def _save_csv(path: str, fb: np.ndarray) -> None:
    """Linear-RGB text rows in framebuffer order, i.e. bottom-to-top
    (reference src/framebuffer.cpp:40-63 iterates scanline 0 first)."""
    lrgb = srgb_to_lrgb_np(fb[..., :3])
    with open(path, "w") as f:
        for row in lrgb:
            f.write(",".join(f"{v:g}" for px in row for v in px))
            f.write("\n")


def _save_pfm(path: str, fb: np.ndarray) -> None:
    """PFM: raw *linear* RGB f32, little-endian scale -1, rows written
    top-first exactly as the reference does (reference
    src/framebuffer.cpp:112-140 reads scanline res[1]-1-j for j=0..)."""
    lrgb = np.ascontiguousarray(srgb_to_lrgb_np(fb[..., :3])[::-1], np.float32)
    with open(path, "wb") as f:
        f.write(b"PF\n")
        f.write(f"{fb.shape[1]} {fb.shape[0]}\n".encode())
        f.write(b"-1.0\n")
        f.write(lrgb.tobytes())


def _save_hdr(path: str, fb: np.ndarray) -> None:
    """RADIANCE .hdr: *linear* RGB as shared-exponent rgbe pixels, flat
    (uncompressed) scanlines, top-to-bottom (reference
    src/framebuffer.cpp:64-111: srgb_to_lrgb then frexp shared exponent)."""
    lrgb = srgb_to_lrgb_np(fb[..., :3])[::-1]  # top-to-bottom
    h, w = lrgb.shape[:2]
    maxc = lrgb.max(axis=-1)
    # frexp: maxc = m * 2**e with m in [0.5, 1); rgbe stores round(v*256/2**e)
    _, e = np.frexp(maxc)
    mult = np.where(maxc >= 1e-32, np.ldexp(256.0, -e), 0.0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(np.round(lrgb * mult[..., None]), 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(maxc >= 1e-32, e + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\n")
        f.write(b"FORMAT=32-bit_rle_rgbe\nEXPOSURE=1.0\nSOFTWARE=simple-spectral-tpu\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())


def load_png_rgb(path: str) -> np.ndarray:
    """Load a PNG as u8[H, W, 3], scanlines top-to-bottom (the layout
    lodepng::decode returns; reference src/material.cpp:10-29)."""
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), dtype=np.uint8)
