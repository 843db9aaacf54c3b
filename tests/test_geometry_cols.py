"""Column (SoA) per-corner geometry (ops/geometry.py
geometry_pipeline_cols) vs the indexed row pipeline.

The engine's production path feeds geometry_pipeline the (48, T)
corner-column buffer (FlatScene.expand_corner_cols) instead of indexed
vertex streams; the contract is BIT-identical tri_i32/tri_f32 — same
formulas, same rounding barriers, same reduction order, different array
shapes only.  These tests pin that contract on a clipping-heavy soup
(slot-0, subset-fan, overflow, materials, normal matrices) in both np
and jnp.
"""

import numpy as np

import jax.numpy as jnp

from zrenderer_tpu.engine.upload import flatten_scene
from zrenderer_tpu.ops import geometry as g
from zrenderer_tpu.scene.procedural import make_triangle_soup


def _setup(n=96, seed=7, behind=0.5, width=128, height=96):
    scene, md = make_triangle_soup(
        n, seed=seed, extent=8.0, behind_camera_fraction=behind
    )
    flat = flatten_scene(scene, md, pad=True, tri_align=32)
    vp = g.view_proj_from_camera(scene.active_camera, width, height)
    matrices = np.einsum(
        "nij,jk->nik", flat.node_to_world, vp
    ).astype(np.float32)
    return flat, matrices


def _bits_equal(a, b):
    np.testing.assert_array_equal(
        np.asarray(a).view(np.uint32), np.asarray(b).view(np.uint32)
    )


def test_cols_matches_indexed_np():
    width = height = 96
    flat, matrices = _setup(width=width, height=height)
    ti_r, tf_r = g.geometry_pipeline(
        np, flat.positions, flat.attrs, flat.tri_vidx, matrices,
        flat.vert_node, width, height,
    )
    ccols, tri_node = flat.expand_corner_cols()
    ti_c, tf_c = g.geometry_pipeline(
        np, ccols, None, None, matrices, tri_node, width, height,
    )
    assert (ti_c[:, g.I_VALID] > 0).any()
    np.testing.assert_array_equal(ti_r, ti_c)
    _bits_equal(tf_r, tf_c)


def test_cols_matches_indexed_jnp():
    width = height = 96
    flat, matrices = _setup(width=width, height=height)
    args_tail = (matrices, width, height)
    ti_r, tf_r = g.geometry_pipeline(
        jnp, flat.positions, flat.attrs, flat.tri_vidx, matrices,
        flat.vert_node, width, height,
    )
    ccols, tri_node = flat.expand_corner_cols()
    ti_c, tf_c = g.geometry_pipeline(
        jnp, jnp.asarray(ccols), None, None, matrices,
        jnp.asarray(tri_node), width, height,
    )
    np.testing.assert_array_equal(np.asarray(ti_r), np.asarray(ti_c))
    _bits_equal(tf_r, tf_c)


def test_cols_matches_indexed_with_materials_and_normals():
    width = height = 96
    flat, matrices = _setup(width=width, height=height)
    draws = flat.draw_count
    rng = np.random.default_rng(3)
    material_table = rng.uniform(0.0, 1.0, (draws, g.MATERIAL_COLS)).astype(
        np.float32)
    normal_mats = np.stack(
        [np.linalg.inv(m[:3, :3]).T for m in flat.node_to_world]
    ).astype(np.float32)
    for xp in (np, jnp):
        ti_r, tf_r = g.geometry_pipeline(
            xp, flat.positions, flat.attrs, flat.tri_vidx, matrices,
            flat.vert_node, width, height, normal_matrices=normal_mats,
            material_table=material_table,
        )
        ccols, tri_node = flat.expand_corner_cols()
        ti_c, tf_c = g.geometry_pipeline(
            xp, ccols if xp is np else jnp.asarray(ccols), None, None,
            matrices, tri_node if xp is np else jnp.asarray(tri_node),
            width, height, normal_matrices=normal_mats,
            material_table=material_table,
        )
        live = np.asarray(ti_r)[:, g.I_VALID] > 0
        assert live.any()
        assert np.abs(np.asarray(tf_r)[live, g.F_MET]).max() > 0
        np.testing.assert_array_equal(np.asarray(ti_r), np.asarray(ti_c))
        _bits_equal(tf_r, tf_c)


def test_cols_overflow_matches_indexed():
    width = height = 96
    flat, matrices = _setup(n=64, behind=1.0, width=width, height=height)
    cap = 4
    ti_r, tf_r = g.geometry_pipeline(
        np, flat.positions, flat.attrs, flat.tri_vidx, matrices,
        flat.vert_node, width, height, clip_cap=cap,
    )
    ccols, tri_node = flat.expand_corner_cols()
    ti_c, tf_c = g.geometry_pipeline(
        np, ccols, None, None, matrices, tri_node, width, height,
        clip_cap=cap,
    )
    np.testing.assert_array_equal(ti_r, ti_c)
    _bits_equal(tf_r, tf_c)
