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
