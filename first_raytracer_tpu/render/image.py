"""Image post-processing, output, and comparison.

Counterpart of the reference's output stage [E: main.cpp]: gamma-2 correction
(``sqrt``), ``int(255.99 * c)`` quantization, and PPM ``P3`` text output.
Adds a dependency-free PNG writer/reader (zlib is in the stdlib), a PPM
reader (so a reference binary's stdout can be diffed directly against our
renders — the driver's "pixel allclose vs reference" gate
[BASELINE.json:2]), npz goldens for tests, and quantified image diffs
(``cli compare``).
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["gamma_correct", "to_uint8", "write_ppm", "write_png",
           "read_ppm", "read_png", "read_image", "image_diff_stats"]


def gamma_correct(img):
    """Gamma 2.0: ``sqrt(c)`` [E: main.cpp, BASELINE.json:10]."""
    return np.sqrt(np.clip(np.asarray(img), 0.0, 1.0))


def to_uint8(img, gamma: bool = True):
    """``int(255.99 * c)`` quantization [E: main.cpp]."""
    img = gamma_correct(img) if gamma else np.clip(np.asarray(img), 0.0, 1.0)
    return (255.99 * img).astype(np.uint8)


def write_ppm(path, img, gamma: bool = True):
    """Plain-text PPM ``P3``, the reference's output format [E: main.cpp].

    ``path="-"`` streams to stdout, matching the reference's
    ``main() -> std::cout`` pipeline (``./a.out > image.ppm``).
    """
    import contextlib
    import sys

    q = to_uint8(img, gamma=gamma)
    ny, nx, _ = q.shape
    ctx = (contextlib.nullcontext(sys.stdout) if path == "-"
           else open(path, "w"))
    with ctx as f:
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


def read_ppm(path):
    """Parse plain-text PPM ``P3`` (the reference's stdout format) or the
    binary ``P6`` variant; returns (ny, nx, 3) uint8."""
    with open(path, "rb") as f:
        data = f.read()
    magic = data[:2]
    if magic == b"P3":
        tokens = []
        for line in data.decode("ascii", "replace").splitlines():
            tokens.extend(line.split("#", 1)[0].split())
        assert tokens[0] == "P3", "not a P3 PPM"
        nx, ny, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
        if len(tokens) < 4 + 3 * nx * ny:
            raise ValueError(
                f"truncated P3 PPM: {len(tokens) - 4} samples for "
                f"{nx}x{ny} ({3 * nx * ny} expected)")
        vals = np.array(tokens[4:4 + 3 * nx * ny], dtype=np.int64)
        img = vals.reshape(ny, nx, 3)
    elif magic == b"P6":
        # header: magic, dims, maxval separated by whitespace/comments
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(data) and data[pos:pos + 1].isspace():
                pos += 1
            if data[pos:pos + 1] == b"#":
                pos = data.index(b"\n", pos) + 1
                continue
            end = pos
            while end < len(data) and not data[end:end + 1].isspace():
                end += 1
            fields.append(int(data[pos:end]))
            pos = end
        pos += 1  # single whitespace after maxval
        nx, ny, maxval = fields
        if maxval > 255:
            # 2-bytes-per-sample P6; rejecting beats silently misparsing.
            raise ValueError(f"P6 maxval {maxval} > 255 (16-bit) unsupported")
        img = np.frombuffer(data, np.uint8, 3 * nx * ny, pos).reshape(
            ny, nx, 3).astype(np.int64)
    else:
        raise ValueError(f"not a PPM file: magic {magic!r}")
    if maxval != 255:
        img = img * 255 // maxval
    return img.astype(np.uint8)


def read_png(path):
    """Minimal PNG reader for the subset ``write_png`` emits (RGB8 /
    RGBA8 / gray8, non-interlaced) with full filter-type support;
    returns (ny, nx, 3) uint8."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos, idat, meta = 8, b"", None
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            meta = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    nx, ny, depth, color, _, _, interlace = meta
    assert depth == 8 and interlace == 0, "unsupported PNG subtype"
    nch = {0: 1, 2: 3, 6: 4}[color]
    raw = zlib.decompress(idat)
    stride = nx * nch
    out = np.zeros((ny, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    for y in range(ny):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(raw, np.uint8, stride,
                            y * (stride + 1) + 1).astype(np.int64)
        if ft == 0:
            cur = row
        elif ft == 2:  # up
            cur = (row + prev) & 0xFF
        else:  # sub/average/paeth need the serial left-neighbor scan
            cur = np.zeros(stride, np.int64)
            for x in range(stride):
                a = cur[x - nch] if x >= nch else 0
                b = prev[x]
                if ft == 1:
                    p = a
                elif ft == 3:
                    p = (a + b) // 2
                else:  # paeth
                    c = prev[x - nch] if x >= nch else 0
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    p = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                cur[x] = (row[x] + p) & 0xFF
        out[y] = cur
        prev = cur
    img = out.reshape(ny, nx, nch)
    if nch == 1:
        img = np.repeat(img, 3, axis=2)
    return img[:, :, :3]


def read_image(path):
    """Dispatch on extension: .ppm/.pnm -> read_ppm, .png -> read_png,
    .npz (goldens: linear radiance under key 'img') -> uint8 via
    to_uint8."""
    p = str(path)
    if p.endswith((".ppm", ".pnm")):
        return read_ppm(p)
    if p.endswith(".png"):
        return read_png(p)
    if p.endswith(".npz"):
        return to_uint8(np.load(p)["img"])
    raise ValueError(f"unknown image format: {p}")


def image_diff_stats(a, b):
    """Quantified diff of two uint8 images (the allclose gate's metrics)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    d = np.abs(a - b)
    mse = float((d ** 2).mean())
    return {
        "shape": list(a.shape),
        "max_abs": float(d.max()),
        "mean_abs": float(d.mean()),
        "mse": mse,
        "psnr_db": float("inf") if mse == 0 else float(
            10 * np.log10(255.0 ** 2 / mse)),
        "frac_pixels_gt_1": float((d.max(axis=-1) > 1).mean()),
        "frac_pixels_gt_4": float((d.max(axis=-1) > 4).mean()),
    }
