"""Scene/mesh binary format tests: round-trips, magics, explicit layout."""

import struct

import numpy as np
import pytest

from zrenderer_tpu.math import zmath as zm
from zrenderer_tpu.scene.mesh import (
    MESH_MAGIC,
    MESH_RECORD_SIZE,
    MeshData,
    STREAM_ELEMENT_SIZE,
    make_vertex,
)
from zrenderer_tpu.scene.procedural import make_test_scene, make_cube_mesh
from zrenderer_tpu.scene.scene import (
    CAMERA_RECORD_SIZE,
    Camera,
    Mobility,
    NODE_RECORD_SIZE,
    Node,
    SCENE_MAGIC,
    Scene,
)


def test_record_sizes_documented():
    # Locked-down layout (docs/FORMATS.md): changing these breaks the format.
    assert NODE_RECORD_SIZE == 108
    assert CAMERA_RECORD_SIZE == 108
    assert MESH_RECORD_SIZE == 148
    assert STREAM_ELEMENT_SIZE == 64


def test_scene_magic_value():
    scene, _ = make_test_scene()
    blob = scene.serialize()
    assert struct.unpack_from("<I", blob, 0)[0] == SCENE_MAGIC == 0x87654321


def test_mesh_magic_value():
    _, mesh_data = make_test_scene()
    blob = mesh_data.serialize()
    assert struct.unpack_from("<I", blob, 0)[0] == MESH_MAGIC == 0x12345678


def test_scene_rejects_bad_magic():
    blob = bytearray(make_test_scene()[0].serialize())
    blob[0] ^= 0xFF
    with pytest.raises(ValueError):
        Scene.deserialize(bytes(blob))


def test_mesh_rejects_bad_magic():
    blob = bytearray(make_test_scene()[1].serialize())
    blob[0] ^= 0xFF
    with pytest.raises(ValueError):
        MeshData.deserialize(bytes(blob))


def test_scene_roundtrip():
    scene, _ = make_test_scene()
    scene.active_camera_index = 0
    again = Scene.deserialize(scene.serialize())
    assert len(again.nodes) == 2
    assert [n.name for n in again.nodes] == ["Cube", "Cube.002"]
    assert again.nodes[0].mesh_indices == [0]
    assert again.nodes[1].transform_index == 1
    assert all(n.mobility == Mobility.STATIC for n in again.nodes)
    assert len(again.transforms) == 2
    np.testing.assert_allclose(again.transforms[0], zm.identity())
    np.testing.assert_allclose(
        again.transforms[1][3, :3],
        [-2.2731475830078125, 0.9120144844055176, 2.2185516357421875],
        rtol=1e-6,
    )
    cam = again.active_camera
    assert cam.name == "Camera"
    assert cam.yfov == pytest.approx(0.39959652, rel=1e-6)
    assert cam.znear == pytest.approx(0.1, rel=1e-5)
    np.testing.assert_allclose(cam.position, [-1.5, 3.0, 10.0])
    assert np.linalg.norm(cam.forward) == pytest.approx(1.0, abs=1e-5)


def test_mesh_roundtrip():
    _, mesh_data = make_test_scene()
    again = MeshData.deserialize(mesh_data.serialize())
    assert len(again.meshes) == 1
    m = again.meshes[0]
    assert m.num_vertices == 24
    assert m.lod_size(0) == 36
    assert m.num_lods == 1
    assert m.stream_element_size[0] == 64
    np.testing.assert_array_equal(again.index_data, mesh_data.index_data)
    np.testing.assert_array_equal(again.vertex_data, mesh_data.vertex_data)


def test_mesh_offsets_in_element_units():
    # Two meshes appended: offsets must count vertices/indices, not floats
    # (a deliberate fix over the reference, docs/QUIRKS.md).
    mesh_data = MeshData()
    a = make_cube_mesh(mesh_data)
    b = make_cube_mesh(mesh_data, size=2.0)
    ma, mb = mesh_data.meshes[a], mesh_data.meshes[b]
    assert ma.vertex_offset == 0 and ma.index_offset == 0
    assert mb.vertex_offset == 24 and mb.index_offset == 36
    assert mb.stream_offset[0] == 24 * 64
    v = mesh_data.vertices_of(mb)
    assert v.shape == (24, 16)
    assert np.abs(v[:, 0:3]).max() == pytest.approx(2.0)
    # indices_of returns LOD-0 indices local to the shared array
    idx = mesh_data.indices_of(mb)
    assert idx.min() >= 0 and len(idx) == 36


def test_mesh_multi_lod():
    mesh_data = MeshData()
    verts = np.stack([make_vertex((i, 0, 0)) for i in range(6)])
    indices = np.array([0, 1, 2, 3, 4, 5, 0, 2, 4], np.uint32)
    i = mesh_data.append_mesh(verts, indices, lod_index_counts=[6, 3])
    m = mesh_data.meshes[i]
    assert m.num_lods == 2
    assert m.lod_size(0) == 6 and m.lod_size(1) == 3
    np.testing.assert_array_equal(mesh_data.indices_of(m, lod=1), [0, 2, 4])


def test_node_name_truncation():
    n = Node(name="x" * 100)
    again = Node.unpack(n.pack())
    assert len(again.name) == 63


def test_camera_record_roundtrip():
    cam = Camera(
        position=np.array([1, 2, 3], np.float32),
        forward=np.array([0, 0, -1], np.float32),
        pitch=0.25,
        yaw=-0.5,
        yfov=0.7,
        zfar=500.0,
        znear=0.05,
        name="cam",
    )
    again = Camera.unpack(cam.pack())
    assert again.pitch == pytest.approx(0.25)
    assert again.yaw == pytest.approx(-0.5)
    assert again.zfar == pytest.approx(500.0)
    assert again.name == "cam"


def test_material_section_roundtrip():
    from zrenderer_tpu.scene.mesh import Material

    _, mesh_data = make_test_scene()
    mesh_data.materials = [
        Material(base_color=(0.8, 0.8, 0.8, 1.0), metallic=0.0,
                 roughness=0.4, name="Material"),
    ]
    mesh_data.mesh_material = [0]
    again = MeshData.deserialize(mesh_data.serialize())
    assert len(again.materials) == 1
    m = again.materials[0]
    assert m.name == "Material"
    np.testing.assert_allclose(m.base_color, (0.8, 0.8, 0.8, 1.0), rtol=1e-6)
    assert m.roughness == pytest.approx(0.4)
    assert again.mesh_material == [0]


def test_material_section_optional_backward_compat():
    # Files without the MATL section still load (pre-material writers).
    _, mesh_data = make_test_scene()
    blob = mesh_data.serialize()
    again = MeshData.deserialize(blob)
    assert again.materials == [] and again.mesh_material == []


def test_texs_section_roundtrip():
    """TEXS texture table (uris + per-material indices) survives
    serialize/deserialize; files without it load with empty tables."""
    from zrenderer_tpu.scene.mesh import Material, MeshData, make_vertex
    import numpy as np

    md = MeshData()
    md.append_mesh(
        np.stack([make_vertex((0, 0, 0)), make_vertex((1, 0, 0)),
                  make_vertex((0, 1, 0))]),
        np.array([0, 1, 2], np.uint32),
    )
    md.materials = [Material(name="a"), Material(name="b")]
    md.mesh_material = [1]
    md.texture_uris = ["textures/wood.png", "bricks.bmp"]
    md.material_texture = [1, -1]
    back = MeshData.deserialize(md.serialize())
    assert back.texture_uris == md.texture_uris
    assert back.material_texture == [1, -1]
    assert [m.name for m in back.materials] == ["a", "b"]

    md.texture_uris = []
    md.material_texture = []
    back2 = MeshData.deserialize(md.serialize())
    assert back2.texture_uris == [] and back2.material_texture == []


def test_textures_from_mesh_data_loads_and_falls_back(tmp_path):
    from zrenderer_tpu.engine.textures import textures_from_mesh_data
    from zrenderer_tpu.scene.mesh import Material, MeshData
    import numpy as np

    md = MeshData()
    md.materials = [Material(name="a")]
    md.texture_uris = ["tex.ppm"]
    md.material_texture = [0]
    # Missing file -> graceful fallback
    t, m = textures_from_mesh_data(md, str(tmp_path))
    assert t is None and m is None
    # Present file -> loads
    rgb = np.full((8, 8, 3), 128, np.uint8)
    (tmp_path / "tex.ppm").write_bytes(b"P6\n8 8\n255\n" + rgb.tobytes())
    t, m = textures_from_mesh_data(md, str(tmp_path))
    assert len(t) == 1 and m == [0]
