"""Unit tests for the compaction + block/superblock binning structures."""

import numpy as np

from zrenderer_tpu.engine.upload import flatten_scene
from zrenderer_tpu.ops import geometry as g
from zrenderer_tpu.scene.procedural import make_test_scene, make_stress_scene
import pytest

pytestmark = pytest.mark.slow  # heavyweight; excluded from the smoke tier


def _setup(tri_align=128):
    scene, mesh_data = make_test_scene()
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=tri_align)
    vp = g.view_proj_from_camera(scene.active_camera, 256, 128)
    matrices = np.einsum("nij,jk->nik", flat.node_to_world, vp).astype(np.float32)
    return g.geometry_pipeline(
        np, flat.positions, flat.attrs, flat.tri_vidx, matrices,
        flat.vert_node, 256, 128,
    )


def test_compaction_preserves_live_order():
    ti, tf = _setup()
    ci, cf = g.compact_triangles(np, ti, tf)
    live_before = ti[ti[:, g.I_VALID] > 0]
    live_after = ci[ci[:, g.I_VALID] > 0]
    np.testing.assert_array_equal(live_before, live_after)
    n_live = len(live_after)
    # All live triangles are at the front.
    assert (ci[:n_live, g.I_VALID] > 0).all()
    assert (ci[n_live:, g.I_VALID] == 0).all()


def test_block_bounds_cover_member_triangles():
    ti, tf = _setup()
    ci, cf = g.compact_triangles(np, ti, tf)
    blocks = g.block_bounds(np, ci)
    assert blocks.shape == (len(ci) // g.RASTER_BLOCK, 8)
    for b in range(blocks.shape[0]):
        rows = ci[b * g.RASTER_BLOCK : (b + 1) * g.RASTER_BLOCK]
        live = rows[rows[:, g.I_VALID] > 0]
        if len(live) == 0:
            assert blocks[b, 4] == 0
            assert blocks[b, 0] > blocks[b, 1]  # empty bbox
            continue
        assert blocks[b, 4] == 1
        assert blocks[b, 0] == live[:, g.I_JMIN].min()
        assert blocks[b, 1] == live[:, g.I_JMAX].max()
        assert blocks[b, 2] == live[:, g.I_IMIN].min()
        assert blocks[b, 3] == live[:, g.I_IMAX].max()


def test_super_bounds_cover_blocks():
    ti, tf = _setup(tri_align=128)
    ci, cf = g.compact_triangles(np, ti, tf)
    blocks = g.block_bounds(np, ci)
    padded, supers = g.super_bounds(np, blocks)
    assert padded.shape[0] % g.SUPER_BLOCK == 0
    assert supers.shape[0] == padded.shape[0] // g.SUPER_BLOCK
    for sidx in range(supers.shape[0]):
        grp = padded[sidx * g.SUPER_BLOCK : (sidx + 1) * g.SUPER_BLOCK]
        live = grp[grp[:, 4] > 0]
        if len(live) == 0:
            assert supers[sidx, 4] == 0
            continue
        assert supers[sidx, 0] <= live[:, 0].min()
        assert supers[sidx, 1] >= live[:, 1].max()


def test_stress_scene_generator():
    scene, mesh_data = make_stress_scene(12_000, seed=1)
    assert len(mesh_data.index_data) // 3 == 12_000
    assert mesh_data.meshes[0].num_vertices == 1000 * 24
    cam = scene.active_camera
    assert np.linalg.norm(cam.forward) > 0.99
    # Spatial coherence: consecutive triangles stay close (binning relies
    # on bounded block unions).
    flat = flatten_scene(scene, mesh_data, pad=False)
    tri_centers = flat.positions[flat.tri_vidx.reshape(-1), :3].reshape(-1, 3, 3).mean(1)
    jumps = np.linalg.norm(np.diff(tri_centers[:2000], axis=0), axis=1)
    assert np.median(jumps) < 5.0
