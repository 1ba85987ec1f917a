"""Image IO: PNG encode/decode (stdlib-only) and the PPM writer family.

The reference writes PNG via Go's image/png (renderer.go:438-451) and has a
dead PPM module (internal/output/ppm.go) - both realized here with zero
external dependencies (zlib + struct), matching the reference's zero-dep
stance (go.mod:1-3).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(img: np.ndarray, compress_level: int = 6) -> bytes:
    """Encode (H,W,3) or (H,W,4) uint8 -> PNG bytes (8-bit RGB/RGBA)."""
    img = np.ascontiguousarray(img)
    if img.dtype != np.uint8:
        raise ValueError(f"expected uint8 image, got {img.dtype}")
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError(f"expected (H,W,3|4), got {img.shape}")
    h, w, c = img.shape
    color_type = 2 if c == 3 else 6
    # Paeth-filter scanlines via the native codec when available
    # (smaller output); otherwise filter byte 0 (None).
    from .. import native
    raw = native.png_filter_paeth_native(img.reshape(h, w * c), c)
    if raw is None:
        raw = np.empty((h, 1 + w * c), np.uint8)
        raw[:, 0] = 0
        raw[:, 1:] = img.reshape(h, w * c)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw.tobytes(), compress_level))
            + _chunk(b"IEND", b""))


def write_png(path: str, img: np.ndarray, compress_level: int = 6) -> None:
    with open(path, "wb") as f:
        f.write(encode_png(img, compress_level))


def _paeth(a, b, c):
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def read_png(path: str) -> np.ndarray:
    """Minimal PNG reader for 8-bit RGB/RGBA/gray non-interlaced images."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG file")
    pos = 8
    idat = b""
    w = h = bit_depth = color_type = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload)
            if bit_depth != 8 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced PNG supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = np.frombuffer(zlib.decompress(idat), np.uint8)
    stride = w * channels
    raw = raw.reshape(h, 1 + stride)
    filters, lines = raw[:, 0], raw[:, 1:]
    bpp = channels
    from .. import native
    nat = native.png_unfilter_native(filters, lines, bpp)
    if nat is not None:
        return nat.reshape(h, w, channels)
    out = np.zeros((h, stride), np.uint8)
    for y in range(h):
        f, line = filters[y], lines[y].copy()
        prev = out[y - 1] if y else np.zeros(stride, np.uint8)
        if f == 0:
            out[y] = line
        elif f == 1:  # Sub
            for x in range(stride):
                line[x] = (int(line[x])
                           + (int(out[y, x - bpp]) if x >= bpp else 0)) & 0xFF
                out[y, x] = line[x]
        elif f == 2:  # Up
            out[y] = (line.astype(np.int32) + prev) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = int(out[y, x - bpp]) if x >= bpp else 0
                line[x] = (line[x] + ((a + int(prev[x])) >> 1)) & 0xFF
                out[y, x] = line[x]
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(out[y, x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (int(line[x]) + pred) & 0xFF
                out[y, x] = line[x]
        else:
            raise ValueError(f"unknown PNG filter {f}")
    return out.reshape(h, w, channels)


# --- PPM family (working equivalents of internal/output/ppm.go) -------------

def write_ppm(path: str, img: np.ndarray) -> None:
    """P3 ASCII PPM from a uint8 (H,W,3) image (ppm.go:11-45)."""
    h, w = img.shape[:2]
    with open(path, "w") as f:
        f.write(f"P3\n{w} {h}\n255\n")
        for y in range(h):
            f.write(" ".join(
                f"{img[y, x, 0]} {img[y, x, 1]} {img[y, x, 2]}"
                for x in range(w)) + "\n")


def write_ppm_float(path: str, img: np.ndarray, gamma: float = 1.0) -> None:
    """PPM from (H,W,3) linear float, optional gamma (ppm.go:119-156)."""
    x = np.clip(img, 0.0, 1.0) ** (1.0 / gamma)
    write_ppm(path, (x * 255).astype(np.uint8))


def write_pgm(path: str, gray: np.ndarray) -> None:
    """P2 ASCII PGM from (H,W) float in [0,1] (ppm.go:79-117)."""
    h, w = gray.shape
    g = (np.clip(gray, 0, 1) * 255).astype(np.uint8)
    with open(path, "w") as f:
        f.write(f"P2\n{w} {h}\n255\n")
        for y in range(h):
            f.write(" ".join(str(int(v)) for v in g[y]) + "\n")
