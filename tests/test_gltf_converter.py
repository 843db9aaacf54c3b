"""Converter tests — run against the real reference test.gltf when present,
otherwise against a synthetic glTF built in-memory."""

import base64
import json
import os

import numpy as np
import pytest

from zrenderer_tpu.scene.mesh import MeshData
from zrenderer_tpu.scene.scene import Mobility, Scene
from zrenderer_tpu.tools.gltf_converter import (
    convert_gltf_scene,
    main as converter_main,
)

REFERENCE_GLTF = "/root/reference/zrenderer/content/scenes/test.gltf"

needs_reference = pytest.mark.skipif(
    not os.path.exists(REFERENCE_GLTF), reason="reference assets not mounted"
)


@needs_reference
def test_reference_scene_counts():
    scene, mesh_data = convert_gltf_scene(REFERENCE_GLTF)
    # test.gltf: nodes Cube + Cube.002 share one mesh; 48 verts, 180 indices.
    assert [n.name for n in scene.nodes] == ["Cube", "Cube.002"]
    assert len(mesh_data.meshes) == 1  # dedup by mesh name
    assert mesh_data.meshes[0].num_vertices == 48
    assert mesh_data.meshes[0].lod_size(0) == 180
    assert len(mesh_data.vertex_data) == 48 * 16  # fixed sizing (QUIRKS.md)
    assert scene.nodes[0].mesh_indices == scene.nodes[1].mesh_indices == [0]
    assert all(n.mobility == Mobility.STATIC for n in scene.nodes)
    assert len(scene.cameras) == 1


@needs_reference
def test_reference_camera():
    scene, _ = convert_gltf_scene(REFERENCE_GLTF)
    cam = scene.cameras[0]
    np.testing.assert_allclose(cam.position, [-1.5, 3.0, 10.0])
    assert cam.yfov == pytest.approx(0.39959652046304894)
    assert cam.znear == pytest.approx(0.10000000149011612)
    assert cam.zfar == pytest.approx(1000.0)
    # Combined rotation is ~-15.5deg about X: forward points ahead and down.
    assert np.linalg.norm(cam.forward) == pytest.approx(1.0, abs=1e-5)
    assert cam.forward[2] < -0.9
    assert cam.forward[1] < 0
    # 2*asin(0.60876) = 75deg up, child -90deg => exactly -15deg pitch.
    assert cam.pitch == pytest.approx(-np.pi / 12, abs=1e-4)


@needs_reference
def test_reference_transforms():
    scene, _ = convert_gltf_scene(REFERENCE_GLTF)
    np.testing.assert_allclose(scene.transforms[0], np.eye(4))
    t = scene.transforms[1]
    np.testing.assert_allclose(
        t[3, :3],
        [-2.2731475830078125, 0.9120144844055176, 2.2185516357421875],
        rtol=1e-6,
    )


@needs_reference
def test_reference_vertex_colors_u16_normalized():
    _, mesh_data = convert_gltf_scene(REFERENCE_GLTF)
    colors = mesh_data.vertices_of(mesh_data.meshes[0])[:, 5:9]
    assert colors.min() >= 0.0 and colors.max() <= 1.0
    # u16/65535 values are exact multiples of 1/65535
    scaled = colors * 65535.0
    np.testing.assert_allclose(scaled, np.round(scaled), atol=1e-3)


@needs_reference
def test_converter_cli_writes_bins(tmp_path):
    rc = converter_main(["-s", REFERENCE_GLTF, "-o", str(tmp_path)])
    assert rc == 0
    scene = Scene.load(tmp_path / "scene.bin")
    mesh_data = MeshData.load(tmp_path / "meshes.bin")
    assert len(scene.nodes) == 2
    assert mesh_data.meshes[0].lod_size(0) == 180


def _write_synthetic_gltf(tmp_path):
    """A minimal one-triangle scene with a u16 color stream and extras."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    col = np.array(
        [[65535, 0, 0, 65535], [0, 65535, 0, 65535], [0, 0, 65535, 65535]], np.uint16
    )
    idx = np.array([0, 1, 2], np.uint16)
    buf = pos.tobytes() + col.tobytes() + idx.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {"mesh": 0, "name": "Tri", "extras": {"static": 0.0},
             "translation": [1, 2, 3]},
            {
                "name": "Cam",
                "translation": [0, 0, 5],
                "children": [2],
            },
            {"name": "CamOrient", "camera": 0},
        ],
        "cameras": [
            {"type": "perspective", "perspective": {"yfov": 0.8, "znear": 0.1}}
        ],
        "meshes": [
            {
                "name": "TriMesh",
                "primitives": [
                    {"attributes": {"POSITION": 0, "COLOR_0": 1}, "indices": 2}
                ],
            }
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {
                "bufferView": 1,
                "componentType": 5123,
                "count": 3,
                "type": "VEC4",
                "normalized": True,
            },
            {"bufferView": 2, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 24},
            {"buffer": 0, "byteOffset": 60, "byteLength": 6},
        ],
        "buffers": [
            {
                "byteLength": len(buf),
                "uri": "data:application/octet-stream;base64,"
                + base64.b64encode(buf).decode(),
            }
        ],
    }
    path = tmp_path / "tri.gltf"
    path.write_text(json.dumps(doc))
    return path


def test_synthetic_scene(tmp_path):
    scene, mesh_data = convert_gltf_scene(str(_write_synthetic_gltf(tmp_path)))
    assert [n.name for n in scene.nodes] == ["Tri"]
    assert scene.nodes[0].mobility == Mobility.MOVEABLE  # extras.static = 0
    colors = mesh_data.vertices_of(mesh_data.meshes[0])[:, 5:9]
    np.testing.assert_allclose(
        colors, [[1, 0, 0, 1], [0, 1, 0, 1], [0, 0, 1, 1]], atol=1e-6
    )
    np.testing.assert_allclose(scene.transforms[0][3, :3], [1, 2, 3])
    cam = scene.cameras[0]
    np.testing.assert_allclose(cam.position, [0, 0, 5])
    np.testing.assert_allclose(cam.forward, [0, 0, -1], atol=1e-6)
    assert cam.zfar == 0.0  # optional zfar missing -> 0 like the reference


def test_mesh_folder_mode(tmp_path):
    _write_synthetic_gltf(tmp_path)
    rc = converter_main(["-i", str(tmp_path), "-o", str(tmp_path / "out")])
    assert rc == 0
    mesh_data = MeshData.load(tmp_path / "out" / "meshes.bin")
    assert len(mesh_data.meshes) == 1
    assert mesh_data.meshes[0].num_vertices == 3
    assert not (tmp_path / "out" / "scene.bin").exists()


@needs_reference
def test_converter_optimize_flag(tmp_path):
    rc = converter_main(["-s", REFERENCE_GLTF, "-o", str(tmp_path), "-O"])
    assert rc == 0
    md = MeshData.load(tmp_path / "meshes.bin")
    # Dedup cannot grow counts; the image-defining data stays a valid mesh.
    assert md.meshes[0].num_vertices <= 48
    assert md.meshes[0].lod_size(0) == 180
    # Optimized and unoptimized convert the same triangle multiset
    # (by position triples).
    scene, md_plain = convert_gltf_scene(REFERENCE_GLTF)
    def tri_set(m):
        v = m.vertices_of(m.meshes[0])[:, :3]
        t = m.indices_of(m.meshes[0]).reshape(-1, 3)
        return sorted(tuple(sorted(map(tuple, v[list(tr)].tolist()))) for tr in t)
    assert tri_set(md) == tri_set(md_plain)


@needs_reference
def test_reference_materials_carried():
    _, md = convert_gltf_scene(REFERENCE_GLTF)
    # test.gltf has one material "Material" (baseColor 0.8, roughness 0.4).
    assert len(md.materials) == 1
    m = md.materials[0]
    assert m.name == "Material"
    np.testing.assert_allclose(m.base_color[:3], [0.8] * 3, rtol=1e-5)
    assert m.roughness == pytest.approx(0.4, rel=1e-5)
    assert m.metallic == pytest.approx(0.0)
    assert md.mesh_material == [0]


def _write_material_gltf(tmp_path, name, base_color, fname):
    """One-triangle glTF whose primitive uses material index 0."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([0, 1, 2], np.uint16)
    buf = pos.tobytes() + idx.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "meshes": [{
            "name": f"{name}Mesh",
            "primitives": [
                {"attributes": {"POSITION": 0}, "indices": 1, "material": 0}
            ],
        }],
        "materials": [{
            "name": name,
            "pbrMetallicRoughness": {"baseColorFactor": list(base_color)},
        }],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 6},
        ],
        "buffers": [{
            "byteLength": len(buf),
            "uri": "data:application/octet-stream;base64,"
            + base64.b64encode(buf).decode(),
        }],
    }
    (tmp_path / fname).write_text(json.dumps(doc))


def test_mesh_folder_materials_not_aliased_across_files(tmp_path):
    """Material index 0 of each .gltf is a different material; the dedup map
    must be per-document, not shared across the folder conversion."""
    _write_material_gltf(tmp_path, "Red", (1, 0, 0, 1), "a_red.gltf")
    _write_material_gltf(tmp_path, "Blue", (0, 0, 1, 1), "b_blue.gltf")
    rc = converter_main(["-i", str(tmp_path), "-o", str(tmp_path / "out")])
    assert rc == 0
    md = MeshData.load(tmp_path / "out" / "meshes.bin")
    assert [m.name for m in md.materials] == ["Red", "Blue"]
    assert md.mesh_material == [0, 1]
    np.testing.assert_allclose(md.materials[0].base_color, (1, 0, 0, 1))
    np.testing.assert_allclose(md.materials[1].base_color, (0, 0, 1, 1))


def _pack_glb(doc: dict, bin_data: bytes) -> bytes:
    """Build a GLB container (glTF 2.0 binary spec) from a JSON doc + BIN."""
    import struct

    doc = dict(doc)
    doc["buffers"] = [dict(b) for b in doc.get("buffers", [])]
    doc["buffers"][0].pop("uri", None)  # GLB: buffer 0 is the BIN chunk
    payload = json.dumps(doc).encode("utf-8")
    payload += b" " * ((-len(payload)) % 4)
    bin_chunk = bin_data + b"\x00" * ((-len(bin_data)) % 4)
    total = 12 + 8 + len(payload) + 8 + len(bin_chunk)
    out = struct.pack("<3I", 0x46546C67, 2, total)
    out += struct.pack("<2I", len(payload), 0x4E4F534A) + payload
    out += struct.pack("<2I", len(bin_chunk), 0x004E4942) + bin_chunk
    return out


@needs_reference
def test_glb_container_converts_byte_identical(tmp_path):
    """The reference test.gltf re-packed as .glb converts to byte-identical
    scene.bin/meshes.bin (GLB capability parity with cgltf)."""
    with open(REFERENCE_GLTF, "r", encoding="utf-8") as f:
        doc = json.load(f)
    with open(os.path.join(os.path.dirname(REFERENCE_GLTF), "test.bin"),
              "rb") as f:
        bin_data = f.read()
    glb_path = tmp_path / "test.glb"
    glb_path.write_bytes(_pack_glb(doc, bin_data))

    scene_a, md_a = convert_gltf_scene(REFERENCE_GLTF)
    scene_b, md_b = convert_gltf_scene(str(glb_path))
    assert md_a.serialize() == md_b.serialize()
    assert scene_a.serialize() == scene_b.serialize()


def test_glb_rejects_corrupt_container(tmp_path):
    p = tmp_path / "bad.glb"
    p.write_bytes(b"glTF" + b"\x07\x00\x00\x00" + b"\x00" * 16)
    with pytest.raises(ValueError):
        convert_gltf_scene(str(p))


@needs_reference
def test_runtime_gltf_load_matches_converted_bins(tmp_path):
    """Runtime glTF load (common.zig:539-667 capability): the app-facing
    loader produces the same scene as the offline converter round trip."""
    from zrenderer_tpu.scene.gltf_runtime import append_gltf_primitives, load_gltf

    scene, md = load_gltf(REFERENCE_GLTF)
    rc = converter_main(["-s", REFERENCE_GLTF, "-o", str(tmp_path)])
    assert rc == 0
    md_disk = MeshData.load(tmp_path / "meshes.bin")
    assert md.serialize() == md_disk.serialize()
    scene_disk = Scene.load(tmp_path / "scene.bin")
    assert scene.serialize() == scene_disk.serialize()

    # appendMeshPrimitive analog: add the same mesh into an existing blob.
    n_before = len(md.meshes)
    new = append_gltf_primitives(md, REFERENCE_GLTF, mesh_index=0)
    assert len(md.meshes) == n_before + len(new)
    assert md.meshes[new[0]].num_vertices == 48


@needs_reference
def test_app_runs_directly_off_gltf(tmp_path):
    """The renderer app accepts a .gltf path (no offline conversion)."""
    from zrenderer_tpu.app.main import main as app_main

    rc = app_main([
        "--scene", REFERENCE_GLTF, "--width", "128", "--height", "96",
        "--frames", "1", "--backend", "xla", "--out", str(tmp_path),
    ])
    assert rc == 0
    out = tmp_path / "frame_0000.png"
    assert out.exists()
    from zrenderer_tpu.utils.png import read_png

    img = read_png(out)
    assert (img[..., :3].sum(axis=-1) > 0).mean() > 0.2
