"""Golden-image regression tests: the CPU oracle render of the procedural
test scene is pinned by content hash; any spec/geometry change that alters
a pixel must consciously update the golden.

(The golden is the oracle's own output — this test guards against
unintended regressions, while parity tests guard cross-backend agreement.)
"""

import hashlib
import os

import numpy as np
import pytest

from zrenderer_tpu.raster_ref import render_scene_cpu
from zrenderer_tpu.scene.procedural import make_test_scene

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _render():
    scene, mesh_data = make_test_scene()
    img, depth = render_scene_cpu(scene, mesh_data, 128, 96)
    return img, depth


def test_golden_image_stable():
    img, depth = _render()
    digest = hashlib.sha256(img.tobytes()).hexdigest()
    path = os.path.join(GOLDEN_DIR, "test_scene_128x96.sha256")
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as f:
            f.write(digest + "\n")
        pytest.skip("golden created; rerun to verify")
    with open(path) as f:
        expected = f.read().strip()
    assert digest == expected, (
        "oracle output changed — if intentional, delete tests/goldens/ and rerun"
    )


def test_golden_lod_selection():
    """A 2-LOD mesh draws different triangle counts per LOD."""
    from zrenderer_tpu.engine.upload import flatten_scene
    from zrenderer_tpu.scene.mesh import MeshData, make_vertex
    from zrenderer_tpu.scene.scene import Node, Scene
    from zrenderer_tpu.math import zmath as zm

    md = MeshData()
    verts = np.stack([make_vertex((i % 3, i // 3, 0)) for i in range(6)])
    idx = np.array([0, 1, 2, 3, 4, 5, 0, 2, 4], np.uint32)
    md.append_mesh(verts, idx, lod_index_counts=[6, 3])
    sc = Scene()
    sc.nodes.append(Node(mesh_indices=[0], transform_index=0))
    sc.transforms.append(zm.identity())

    full = flatten_scene(sc, md, pad=False, lod=0)
    coarse = flatten_scene(sc, md, pad=False, lod=1)
    assert full.num_triangles == 2
    assert coarse.num_triangles == 1
    # Requesting a LOD beyond the mesh's count clamps to the last one.
    clamped = flatten_scene(sc, md, pad=False, lod=7)
    assert clamped.num_triangles == 1
