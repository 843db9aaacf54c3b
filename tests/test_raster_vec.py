"""Block-grouped lane-parallel raster (ops/experiments/raster_vec.py) parity.

The vec kernel must be bit-identical to the HBM hierarchy kernel (which
is itself oracle-verified in test_raster_pallas.py): coverage is the
same i32 edge arithmetic under a wraparound-equivalent rearrangement,
z / attribute numerators use the identical f32 expressions, and the
group-winner-then-strict-less merge is outcome-equivalent to sequential
id-order processing — including exact depth ties, which the duplicate-
triangle scene below constructs deliberately.
"""

from functools import lru_cache

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.experiments

from zrenderer_tpu.engine.upload import flatten_scene
from zrenderer_tpu.ops import geometry as g
from zrenderer_tpu.ops import raster_pallas as rp
from zrenderer_tpu.ops.experiments import raster_vec as rv
from zrenderer_tpu.scene.procedural import make_test_scene, make_triangle_soup


def _setup(scene, mesh_data, W, H, tri_align=64):
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=tri_align)
    vp = g.view_proj_from_camera(scene.active_camera, W, H)
    mats = np.einsum("nij,jk->nik", flat.node_to_world, vp).astype(np.float32)
    ti, tf = g.geometry_pipeline(
        np, flat.positions, flat.attrs, flat.tri_vidx, mats,
        flat.vert_node, W, H,
    )
    return jnp.asarray(ti), jnp.asarray(tf)


def _assert_same(a, b):
    a, b = np.asarray(a), np.asarray(b)
    if a.dtype == np.float32:
        np.testing.assert_array_equal(a.view(np.uint32), b.view(np.uint32))
    else:
        np.testing.assert_array_equal(a, b)


@lru_cache(maxsize=None)
def _demo():
    scene, md = make_test_scene()
    return _setup(scene, md, 128, 32)


def test_vec_flat_matches_hbm_demo_scene():
    ti, tf = _demo()
    c_h, d_h = rp.rasterize_setup_pallas_hbm(ti, tf, 128, 32, interpret=True)
    c_v, d_v = rv.rasterize_setup_pallas_vec(ti, tf, 128, 32, interpret=True)
    assert (np.asarray(d_h) < 1.0).mean() > 0.1
    _assert_same(d_v, d_h)
    _assert_same(c_v, c_h)


def test_vec_flat_matches_hbm_soup_with_exact_ties():
    """Dense soup with clipped fan rows, overlap, and exact depth ties
    between distinct triangle ids (duplicated geometry) — the in-group
    (z, id)-lexicographic winner rule is live here, not vacuous."""
    W, H = 256, 64
    scene, mesh_data = make_triangle_soup(
        500, seed=7, extent=2.0, behind_camera_fraction=0.1
    )
    v = mesh_data.vertex_data.reshape(-1, 16)
    for t in range(10, 20):
        v[3 * t: 3 * t + 3, 0:3] = v[3 * (t - 10): 3 * (t - 10) + 3, 0:3]
    ti, tf = _setup(scene, mesh_data, W, H)
    c_h, d_h = rp.rasterize_setup_pallas_hbm(ti, tf, W, H, interpret=True)
    c_v, d_v = rv.rasterize_setup_pallas_vec(ti, tf, W, H, interpret=True)
    assert (np.asarray(d_h) < 1.0).mean() > 0.03
    _assert_same(d_v, d_h)
    _assert_same(c_v, c_h)


def test_vec_gbuffer_matches_hbm():
    ti, tf = _demo()
    o_h = rp.rasterize_gbuffer_pallas_hbm(ti, tf, 128, 32, interpret=True)
    o_v = rv.rasterize_gbuffer_pallas_vec(ti, tf, 128, 32, interpret=True)
    assert len(o_h) == len(o_v) == 13
    for a, b in zip(o_h, o_v):
        _assert_same(b, a)


def test_vec_empty_scene():
    ti = jnp.zeros((128, g.NI32), jnp.int32).at[:, g.I_JMIN].set(1)
    tf = jnp.zeros((128, g.NF32), jnp.float32)
    color, depth = rv.rasterize_setup_pallas_vec(ti, tf, 128, 32,
                                                 interpret=True)
    assert (np.asarray(depth) == 1.0).all()
    assert (np.asarray(color) == 0xFF000000).all()


def test_vec_record_layout_roundtrip():
    """prepare_vec_inputs: ti/tf columns and folded constants recoverable
    from the packed record rows; subgroup bboxes land on every 32nd row."""
    ti, tf = _demo()
    supers, blocks, rec = rv.prepare_vec_inputs(ti, tf)
    rec = np.asarray(rec)
    t = rec.shape[0]
    assert t % g.RASTER_BLOCK == 0 and rec.shape[1] == rv.REC_LANES
    np.testing.assert_array_equal(rec[: ti.shape[0], : g.NI32],
                                  np.asarray(ti))
    np.testing.assert_array_equal(
        rec[: tf.shape[0], rv._F_BASE: rv._F_BASE + g.NF32].view(np.float32),
        np.asarray(tf),
    )
    tin = np.asarray(ti)
    a0 = tin[:, g.I_DY0] * tin[:, g.I_X1] - tin[:, g.I_DX0] * tin[:, g.I_Y1]
    np.testing.assert_array_equal(rec[: ti.shape[0], rv._A_BASE], a0)
    # Subgroup bbox covers its members.
    alive = tin[:, g.I_VALID] > 0
    for s in range(ti.shape[0] // rv.SUBGROUP):
        rows = slice(s * rv.SUBGROUP, (s + 1) * rv.SUBGROUP)
        if not alive[rows].any():
            continue
        bb = rec[s * rv.SUBGROUP, rv._SG_BBOX: rv._SG_BBOX + 4]
        assert bb[0] == tin[rows][alive[rows], g.I_JMIN].min()
        assert bb[1] == tin[rows][alive[rows], g.I_JMAX].max()
        assert bb[2] == tin[rows][alive[rows], g.I_IMIN].min()
        assert bb[3] == tin[rows][alive[rows], g.I_IMAX].max()
