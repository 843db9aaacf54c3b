"""DDS + ICO container decode (the last WIC-container gap vs the
reference's createAndUploadTex2dFromFile, zd3d12.zig:1415-1548)."""

import struct

import numpy as np

from zrenderer_tpu.utils.dds import decode_dds
from zrenderer_tpu.utils.ico import decode_ico
from zrenderer_tpu.utils.image import read_image


def _dds_header(width, height, *, fourcc=None, bitcount=0, masks=None,
                flags=None):
    pf_flags = 0
    if fourcc:
        pf_flags |= 0x4
    if masks:
        pf_flags |= 0x40
        if masks[3]:
            pf_flags |= 0x1
    h = bytearray(128)
    h[0:4] = b"DDS "
    struct.pack_into("<I", h, 4, 124)
    struct.pack_into("<I", h, 8, 0x1007)
    struct.pack_into("<I", h, 12, height)
    struct.pack_into("<I", h, 16, width)
    struct.pack_into("<I", h, 76, 32)
    struct.pack_into("<I", h, 80, pf_flags if flags is None else flags)
    if fourcc:
        h[84:88] = fourcc
    struct.pack_into("<I", h, 88, bitcount)
    if masks:
        struct.pack_into("<4I", h, 92, *masks)
    return bytes(h)


def test_dds_uncompressed_bgra():
    img = np.arange(4 * 4 * 4, dtype=np.uint8).reshape(4, 4, 4)
    bgra = img[..., [2, 1, 0, 3]]
    data = _dds_header(4, 4, bitcount=32,
                       masks=(0x00FF0000, 0x0000FF00, 0x000000FF,
                              0xFF000000)) + bgra.tobytes()
    out = decode_dds(data)
    np.testing.assert_array_equal(out, img)
    out2 = read_image_bytes(data)
    np.testing.assert_array_equal(out2, img)


def read_image_bytes(data):
    import os
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as f:
        f.write(data)
        path = f.name
    try:
        return read_image(path)
    finally:
        os.unlink(path)


def _bc1_block(c0, c1, indices):
    idx = 0
    for i, v in enumerate(indices):
        idx |= v << (2 * i)
    return struct.pack("<HHI", c0, c1, idx)


def test_dds_bc1_endpoints_and_interp():
    # c0 = pure red (0xF800), c1 = pure blue (0x001F); c0 > c1 -> 4-color.
    indices = [0] * 8 + [1] * 4 + [2, 2, 3, 3]
    data = _dds_header(4, 4, fourcc=b"DXT1") + _bc1_block(0xF800, 0x001F,
                                                          indices)
    out = decode_dds(data)
    assert out.shape == (4, 4, 4)
    flat = out.reshape(16, 4)
    np.testing.assert_array_equal(flat[0], [255, 0, 0, 255])
    np.testing.assert_array_equal(flat[8], [0, 0, 255, 255])
    # Interpolants: (2*255 + 0 + 1)//3 = 170, (255 + 0 + 1)//3 = 85.
    np.testing.assert_array_equal(flat[12], [170, 0, 85, 255])
    np.testing.assert_array_equal(flat[14], [85, 0, 170, 255])


def test_dds_bc1_three_color_transparent():
    # c0 <= c1 -> 3-color mode; index 3 = transparent black.
    indices = [0, 1, 2, 3] * 4
    data = _dds_header(4, 4, fourcc=b"DXT1") + _bc1_block(0x001F, 0xF800,
                                                          indices)
    flat = decode_dds(data).reshape(16, 4)
    np.testing.assert_array_equal(flat[0], [0, 0, 255, 255])
    np.testing.assert_array_equal(flat[1], [255, 0, 0, 255])
    np.testing.assert_array_equal(flat[2], [127, 0, 127, 255])  # (a+b)//2
    np.testing.assert_array_equal(flat[3], [0, 0, 0, 0])


def test_dds_bc2_explicit_alpha():
    alpha_nibbles = bytes(
        [0x10, 0x32, 0x54, 0x76, 0x98, 0xBA, 0xDC, 0xFE]
    )  # texel k alpha = k (4-bit)
    block = alpha_nibbles + _bc1_block(0xF800, 0x001F, [0] * 16)
    data = _dds_header(4, 4, fourcc=b"DXT3") + block
    out = decode_dds(data).reshape(16, 4)
    expect = [(k << 4) | k for k in range(16)]
    np.testing.assert_array_equal(out[:, 3], expect)
    np.testing.assert_array_equal(out[:, :3], [[255, 0, 0]] * 16)


def test_dds_bc3_interpolated_alpha():
    # a0=255 > a1=0 -> 7-interpolant mode; selector k for texel k.
    sel = 0
    for i in range(16):
        sel |= (i % 8) << (3 * i)
    abytes = sel.to_bytes(6, "little")
    block = bytes([255, 0]) + abytes + _bc1_block(0xF800, 0x001F, [0] * 16)
    data = _dds_header(4, 4, fourcc=b"DXT5") + block
    out = decode_dds(data).reshape(16, 4)
    # Palette: 255, 0, then ((8-k)*255 + 3)//7 for k=2..7.
    pal = [255, 0] + [((8 - k) * 255 + (k - 1) * 0 + 3) // 7
                      for k in range(2, 8)]
    np.testing.assert_array_equal(out[:8, 3], pal)
    np.testing.assert_array_equal(out[8:, 3], pal)


def test_dds_dx10_header_rgba8():
    img = np.arange(4 * 4 * 4, dtype=np.uint8).reshape(4, 4, 4)
    dx10 = struct.pack("<5I", 28, 3, 0, 1, 0)  # R8G8B8A8_UNORM, tex2d
    data = _dds_header(4, 4, fourcc=b"DX10") + dx10 + img.tobytes()
    np.testing.assert_array_equal(decode_dds(data), img)


def _ico_wrap(entry_bytes, w, h):
    d = struct.pack("<HHH", 0, 1, 1)
    d += struct.pack("<BBBBHHII", w % 256, h % 256, 0, 0, 1, 32,
                     len(entry_bytes), 6 + 16)
    return d + entry_bytes


def test_ico_png_entry():
    from zrenderer_tpu.utils.png import encode_png

    img = np.zeros((8, 8, 4), np.uint8)
    img[..., 0] = 200
    img[..., 3] = 255
    data = _ico_wrap(encode_png(img), 8, 8)
    np.testing.assert_array_equal(decode_ico(data), img)
    np.testing.assert_array_equal(read_image_bytes(data), img)


def test_ico_dib_32bpp():
    img = np.zeros((4, 4, 4), np.uint8)
    img[..., 1] = np.arange(16, dtype=np.uint8).reshape(4, 4) * 10
    img[..., 3] = 255
    bgra = img[..., [2, 1, 0, 3]][::-1]  # bottom-up
    dib = bytearray(40)
    struct.pack_into("<I", dib, 0, 40)
    struct.pack_into("<ii", dib, 4, 4, 8)  # doubled height
    struct.pack_into("<HH", dib, 12, 1, 32)
    and_mask = bytes(4 * 4)  # all opaque
    data = _ico_wrap(bytes(dib) + bgra.tobytes() + and_mask, 4, 4)
    np.testing.assert_array_equal(decode_ico(data), img)
