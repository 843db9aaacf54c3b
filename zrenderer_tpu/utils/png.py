"""Minimal PNG encode/decode (pure Python + zlib).

The presentation analog of the reference's swapchain Present + WIC image
loading (zd3d12.zig:649-675, :1415-1548): frames are written to disk or
streamed instead of flipped to a window, and textures load from PNG files.
A native C++ fast path lives in native/ for high-rate frame dumping.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def write_png(path, rgba: np.ndarray) -> None:
    """Write an (H, W, 3|4) u8 array as a PNG file."""
    data = encode_png(rgba)
    with open(path, "wb") as f:
        f.write(data)


def encode_png(rgba: np.ndarray) -> bytes:
    rgba = np.ascontiguousarray(rgba)
    assert rgba.dtype == np.uint8 and rgba.ndim == 3 and rgba.shape[2] in (3, 4)
    h, w, c = rgba.shape
    color_type = 6 if c == 4 else 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), rgba.reshape(h, w * c)], axis=1
    ).tobytes()
    idat = zlib.compress(raw, 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def read_png(path) -> np.ndarray:
    """Read an 8-bit RGB/RGBA/gray PNG (filters 0-4 supported)."""
    with open(path, "rb") as f:
        data = f.read()
    return decode_png(data)


def decode_png(data: bytes) -> np.ndarray:
    """Decode in-memory PNG bytes (the utils.image dispatch entry)."""
    assert data[:8] == _SIG, "not a PNG"
    pos = 8
    idat = b""
    w = h = bitdepth = color_type = None
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bitdepth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            assert bitdepth == 8 and interlace == 0, "unsupported PNG variant"
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = np.frombuffer(zlib.decompress(idat), np.uint8)
    stride = w * channels
    raw = raw.reshape(h, stride + 1)
    filters = raw[:, 0]
    img = np.zeros((h, stride), np.uint8)
    bpp = channels
    for i in range(h):
        line = raw[i, 1:].astype(np.int32)
        ft = filters[i]
        prev = img[i - 1].astype(np.int32) if i > 0 else np.zeros(stride, np.int32)
        if ft == 0:
            out = line
        elif ft == 2:  # up
            out = (line + prev) & 0xFF
        else:
            out = np.zeros(stride, np.int32)
            for j in range(stride):
                a = out[j - bpp] if j >= bpp else 0
                b = prev[j]
                cc = prev[j - bpp] if j >= bpp else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                else:  # 4: Paeth
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                out[j] = (line[j] + pred) & 0xFF
        img[i] = out.astype(np.uint8)
    return img.reshape(h, w, channels)
