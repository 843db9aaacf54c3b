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

pytestmark = pytest.mark.slow  # heavyweight; excluded from the smoke tier

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


def test_showcase_lit_golden():
    """Textured multi-material showcase (content/scenes/showcase, authored
    by tools/make_showcase.py): drives the TEXS table -> TextureArray ->
    per-draw texture layers end-to-end through the LIT pipeline and pins
    the output (VERDICT r3 item 10 — the shipped test_scene has no
    textures, so this path was previously exercised only synthetically)."""
    from zrenderer_tpu.engine.config import RenderConfig
    from zrenderer_tpu.engine.renderer import Renderer
    from zrenderer_tpu.engine.textures import textures_from_mesh_data
    from zrenderer_tpu.scene.mesh import MeshData
    from zrenderer_tpu.scene.scene import Scene

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene_dir = os.path.join(here, "content", "scenes", "showcase")
    scene = Scene.load(os.path.join(scene_dir, "scene.bin"))
    mesh_data = MeshData.load(os.path.join(scene_dir, "meshes.bin"))

    # The TEXS table carries two real texture uris; materials bind them
    # per-draw (and the third material has none -> white fallback layer).
    textures, mat_tex = textures_from_mesh_data(mesh_data, scene_dir)
    assert textures is not None and len(textures) == 2
    assert sorted(mesh_data.texture_uris) == ["checker.png", "gradient.png"]
    assert len(set(mat_tex)) >= 2 and -1 in mat_tex

    config = RenderConfig(width=160, height=120, backend="xla",
                          pipeline="lit", tri_align=64)
    r = Renderer(config)
    r.load_scene(scene, mesh_data)
    r.set_environment(textures=textures, material_textures=mat_tex)
    img, depth = r.render_and_read()

    assert (np.asarray(depth) < 1.0).mean() > 0.15  # real coverage
    # Textures actually sampled: every channel varies across the frame.
    assert (np.asarray(img[..., :3]).std(axis=(0, 1)) > 5).all()

    digest = hashlib.sha256(np.asarray(img).tobytes()).hexdigest()
    path = os.path.join(GOLDEN_DIR, "showcase_lit_160x120.sha256")
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as f:
            f.write(digest + "\n")
        pytest.skip("golden created; rerun to verify")
    with open(path) as f:
        expected = f.read().strip()
    assert digest == expected, (
        "showcase lit render changed — if intentional, delete "
        "tests/goldens/showcase_lit_160x120.sha256 and rerun"
    )


# ---------------------------------------------------------------------------
# Stored-PNG goldens (VERDICT r4 #8): actual committed reference images for
# every pipeline + TAA + overlay composite, compared with an explicit LSB
# tolerance; failures write the actual and diff images next to the goldens
# so a regression is actionable, not just a hash mismatch.
# ---------------------------------------------------------------------------

GW, GH = 160, 96


def _check_png_golden(name, img, tol_lsb=0):
    from zrenderer_tpu.utils.png import read_png, write_png

    img = np.asarray(img)
    path = os.path.join(GOLDEN_DIR, name + ".png")
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        write_png(path, img)
        pytest.skip(f"golden {name} created; rerun to verify")
    ref = read_png(path)
    assert ref.shape == img.shape, (ref.shape, img.shape)
    diff = np.abs(img.astype(np.int16) - ref.astype(np.int16))
    if diff.max() > tol_lsb:
        fail_dir = os.path.join(GOLDEN_DIR, "failures")
        os.makedirs(fail_dir, exist_ok=True)
        write_png(os.path.join(fail_dir, name + "_actual.png"), img)
        write_png(
            os.path.join(fail_dir, name + "_diff.png"),
            np.clip(diff.max(axis=-1, keepdims=True) * 8, 0, 255)
            .astype(np.uint8).repeat(3, axis=-1),
        )
        raise AssertionError(
            f"golden {name}: max diff {int(diff.max())} LSB > {tol_lsb}; "
            f"{int((diff.max(axis=-1) > tol_lsb).sum())} px differ "
            f"(actual + diff written to {fail_dir})"
        )


def _golden_renderer(pipeline):
    from zrenderer_tpu.engine.config import RenderConfig
    from zrenderer_tpu.engine.renderer import Renderer

    scene, md = make_test_scene()
    r = Renderer(RenderConfig(width=GW, height=GH, pipeline=pipeline,
                              backend="pallas", debug=True, tri_align=64))
    r.load_scene(scene, md)
    return r


def test_png_golden_flat():
    r = _golden_renderer("flat")
    img, _ = r.render_and_read()
    _check_png_golden("flat_160x96", img)


def test_png_golden_lit():
    from zrenderer_tpu.engine.textures import Texture, checkerboard

    r = _golden_renderer("lit")
    r.set_environment(texture=Texture.from_array(checkerboard(64, 8)))
    img, _ = r.render_and_read()
    _check_png_golden("lit_160x96", img)


def test_png_golden_shadowed():
    r = _golden_renderer("shadowed")
    img, _ = r.render_and_read()
    _check_png_golden("shadowed_160x96", img)


def test_png_golden_deferred():
    r = _golden_renderer("deferred")
    rng = np.random.default_rng(5)
    pos = rng.uniform([-5, 0.5, -5], [5, 5, 5], (8, 3)).astype(np.float32)
    col = rng.uniform(0.2, 2.0, (8, 3)).astype(np.float32)
    r.set_environment(lights=(pos, col))
    img, _ = r.render_and_read()
    _check_png_golden("deferred_160x96", img)


def test_png_golden_taa_converged():
    """8 jittered frames through the TAA resolve (the app/main.py --taa
    composition), pinning the converged temporal image."""
    from zrenderer_tpu.ops import taa as taa_ops

    r = _golden_renderer("flat")
    jitters = taa_ops.jitter_sequence(8)
    history = None
    for i in range(8):
        r.render(jitter=jitters[i % 8])
        color, depth_dev = r._pending
        if history is None:
            history = taa_ops.taa_init_history(color)
        history, resolved = taa_ops.taa_resolve(history, color)
        r._pending = (resolved, depth_dev)
    img, _ = r.read_frame()
    _check_png_golden("taa_converged_160x96", img)


def test_png_golden_overlay_composite():
    """Flat frame + the stats/outliner overlay raster composite
    (app/main.py --overlay) with FIXED text (live timings would make the
    golden nondeterministic)."""
    from zrenderer_tpu.app.overlay_ui import OverlayUI

    r = _golden_renderer("flat")
    img, _ = r.render_and_read()
    overlay = OverlayUI(GW, GH)
    img2 = overlay.compose(
        img, ["zrenderer-tpu golden", "nodes: Cube, Cube.002"]
    )
    _check_png_golden("overlay_160x96", np.asarray(img2))
