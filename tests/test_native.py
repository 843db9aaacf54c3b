"""Native runtime library (libzrt) tests — parity with Python fallbacks."""

import numpy as np
import pytest

from zrenderer_tpu.scene.procedural import make_test_scene, make_triangle_soup
from zrenderer_tpu.utils import native
from zrenderer_tpu.utils.png import read_png


def test_native_builds_and_loads():
    assert native.available(), "libzrt should build with the baked toolchain"
    assert native.load().zrt_version() >= 10


def test_meshes_load_matches_python():
    _, md = make_test_scene()
    blob = md.serialize()
    v, i = native.meshes_load(blob)
    np.testing.assert_array_equal(v, md.vertex_data)
    np.testing.assert_array_equal(i, md.index_data)


def test_meshes_probe_rejects_corrupt():
    _, md = make_test_scene()
    blob = bytearray(md.serialize())
    blob[0] ^= 0xFF
    with pytest.raises(ValueError):
        native.meshes_load(bytes(blob))


def test_vertex_remap_dedup():
    verts = np.array(
        [[1, 2], [3, 4], [1, 2], [5, 6], [3, 4]], np.float32
    )
    remap, uniq = native.generate_vertex_remap(verts)
    assert uniq == 3
    np.testing.assert_array_equal(remap, [0, 1, 0, 2, 1])
    out, idx = native.apply_remap(
        verts, remap, uniq, np.array([0, 1, 2, 3, 4, 2], np.uint32)
    )
    np.testing.assert_array_equal(out, [[1, 2], [3, 4], [5, 6]])
    np.testing.assert_array_equal(idx, [0, 1, 0, 2, 1, 0])


def test_vertex_cache_optimizer_preserves_triangles_and_helps():
    _, md = make_triangle_soup(50, seed=2)
    mesh = md.meshes[0]
    # Weld duplicate vertices first so there is cache locality to find.
    verts = md.vertices_of(mesh)
    remap, uniq = native.generate_vertex_remap(verts)
    _, idx = native.apply_remap(verts, remap, uniq, md.indices_of(mesh))

    shuffled = idx.reshape(-1, 3)[np.random.default_rng(0).permutation(50)]
    shuffled = shuffled.reshape(-1)
    opt = native.optimize_vertex_cache(shuffled, uniq, cache_size=8)
    # Same triangle multiset.
    assert sorted(map(tuple, opt.reshape(-1, 3).tolist())) == sorted(
        map(tuple, shuffled.reshape(-1, 3).tolist())
    )
    before = native.analyze_vertex_cache(shuffled, uniq, 8)
    after = native.analyze_vertex_cache(opt, uniq, 8)
    assert after <= before


def test_native_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(16, 24, 4), dtype=np.uint8)
    data = native.encode_png(img)
    p = tmp_path / "t.png"
    p.write_bytes(data)
    back = read_png(p)
    np.testing.assert_array_equal(back, img)


def test_spatial_sort_triangles():
    rng = np.random.default_rng(0)
    verts = rng.uniform(-10, 10, (300, 16)).astype(np.float32)
    idx = np.arange(300, dtype=np.uint32)
    out = native.spatial_sort_triangles(idx, verts)
    # Same triangle multiset, better spatial locality.
    assert sorted(map(tuple, out.reshape(-1, 3).tolist())) == sorted(
        map(tuple, idx.reshape(-1, 3).tolist())
    )
    cent = verts[out.reshape(-1, 3).astype(int), :3].mean(axis=1)
    before = verts[idx.reshape(-1, 3).astype(int), :3].mean(axis=1)
    j_after = np.linalg.norm(np.diff(cent, axis=0), axis=1).mean()
    j_before = np.linalg.norm(np.diff(before, axis=0), axis=1).mean()
    assert j_after < j_before


def test_meshes_probe_rejects_overflowing_mesh_count():
    """nm * 148 wraps u32 for nm = 2^30 (2^30 * 148 mod 2^32 == 0), which a
    32-bit check would accept and then read far out of bounds."""
    import struct

    nm = 1 << 30
    blob = struct.pack("<5I", 0x12345678, nm, 20, 0, 0) + b"\x00" * 64
    with pytest.raises(ValueError):
        native.meshes_load(blob)


def test_image_format_dispatch(tmp_path):
    """WIC-analog breadth (utils.image): BMP, TGA (raw + RLE), PNM, PNG all
    decode to the same RGBA pixels."""
    import struct

    from zrenderer_tpu.utils.image import read_image

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    h, w = rgb.shape[:2]
    expect = np.concatenate([rgb, np.full((h, w, 1), 255, np.uint8)], axis=2)

    # PNG (round trip via the native encoder)
    p = tmp_path / "t.png"
    p.write_bytes(native.encode_png(expect))
    np.testing.assert_array_equal(read_image(p)[..., :3], rgb)

    # BMP (24bpp bottom-up, BGR, 4-byte row padding)
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)
    bmp = (
        b"BM" + struct.pack("<IHHI", 54 + rows.size, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, rows.size, 0, 0, 0, 0)
        + rows.tobytes()
    )
    p = tmp_path / "t.bmp"
    p.write_bytes(bmp)
    np.testing.assert_array_equal(read_image(p), expect)

    # PNM P6
    p = tmp_path / "t.ppm"
    p.write_bytes(f"P6\n{w} {h}\n255\n".encode() + rgb.tobytes())
    np.testing.assert_array_equal(read_image(p), expect)

    # TGA type 2 (uncompressed, bottom-up, BGR)
    tga = bytearray(18)
    tga[2] = 2
    tga[12:14] = struct.pack("<H", w)
    tga[14:16] = struct.pack("<H", h)
    tga[16] = 24
    tga += rgb[::-1, :, ::-1].tobytes()
    p = tmp_path / "t.tga"
    p.write_bytes(bytes(tga))
    np.testing.assert_array_equal(read_image(p), expect)

    # TGA type 10 (RLE): encode each row as one raw packet (<=128 px rows)
    tga = bytearray(18)
    tga[2] = 10
    tga[12:14] = struct.pack("<H", w)
    tga[14:16] = struct.pack("<H", h)
    tga[16] = 24
    bgr = rgb[::-1, :, ::-1]
    for y in range(h):
        tga += bytes([w - 1])  # raw packet of w pixels
        tga += bgr[y].tobytes()
    p = tmp_path / "rle.tga"
    p.write_bytes(bytes(tga))
    np.testing.assert_array_equal(read_image(p), expect)

    # RLE-run packet path: a solid-color image as repeat packets
    solid = np.full((4, 6, 3), (10, 200, 30), np.uint8)
    tga = bytearray(18)
    tga[2] = 10
    tga[12:14] = struct.pack("<H", 6)
    tga[14:16] = struct.pack("<H", 4)
    tga[16] = 24
    for _ in range(4):
        tga += bytes([0x80 | (6 - 1)]) + bytes((30, 200, 10))
    p = tmp_path / "run.tga"
    p.write_bytes(bytes(tga))
    np.testing.assert_array_equal(read_image(p)[..., :3], solid)


def test_texture_from_image_file(tmp_path):
    import struct

    from zrenderer_tpu.engine.textures import Texture

    rgb = np.zeros((8, 8, 3), np.uint8)
    rgb[:, :4] = (255, 0, 0)
    p = tmp_path / "t.ppm"
    p.write_bytes(b"P6\n8 8\n255\n" + rgb.tobytes())
    t = Texture.from_image_file(p)
    assert t.base_shape == (8, 8)
