"""Image post-processing and output.

Counterpart of the reference's output stage [E: main.cpp]: gamma-2 correction
(``sqrt``), ``int(255.99 * c)`` quantization, and PPM ``P3`` text output.
Adds a dependency-free PNG writer (zlib is in the stdlib) and npz golden
images for tests.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["gamma_correct", "to_uint8", "write_ppm", "write_png"]


def gamma_correct(img):
    """Gamma 2.0: ``sqrt(c)`` [E: main.cpp, BASELINE.json:10]."""
    return np.sqrt(np.clip(np.asarray(img), 0.0, 1.0))


def to_uint8(img, gamma: bool = True):
    """``int(255.99 * c)`` quantization [E: main.cpp]."""
    img = gamma_correct(img) if gamma else np.clip(np.asarray(img), 0.0, 1.0)
    return (255.99 * img).astype(np.uint8)


def write_ppm(path, img, gamma: bool = True):
    """Plain-text PPM ``P3``, the reference's output format [E: main.cpp]."""
    q = to_uint8(img, gamma=gamma)
    ny, nx, _ = q.shape
    with open(path, "w") as f:
        f.write(f"P3\n{nx} {ny}\n255\n")
        for row in q:
            f.write("\n".join(f"{r} {g} {b}" for r, g, b in row))
            f.write("\n")


def write_png(path, img, gamma: bool = True):
    """Minimal RGB8 PNG writer (no external deps)."""
    q = to_uint8(img, gamma=gamma)
    ny, nx, _ = q.shape
    raw = b"".join(b"\x00" + q[y].tobytes() for y in range(ny))

    def chunk(tag, data):
        body = tag + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    header = struct.pack(">IIBBBBB", nx, ny, 8, 2, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", header))
        f.write(chunk(b"IDAT", zlib.compress(raw, 9)))
        f.write(chunk(b"IEND", b""))
