"""HBM-scale per-tile-list raster (pair-ordered record streaming) parity.

`rasterize_*_pallas_binned_hbm` must be bit-identical to the proven
VMEM-resident binned kernels (same (z, id) tie-break contract, itself
oracle-verified in test_raster_pallas.py) — including exact depth ties,
cap-exceeding leftovers through the phase-2 HBM hierarchy, clipped fan
rows, and spans that cross multiple REC_CHUNK streaming windows.
The round-4 motivation: the VMEM binned kernel cannot compile past
VMEM_RESIDENT_MAX_TRIS (whole-VMEM ti/tf operands OOM'd the 100K/1M
soup benchmarks); the streaming variant has no triangle-count ceiling.
"""

from functools import lru_cache

import numpy as np

import jax.numpy as jnp

from zrenderer_tpu.engine.upload import flatten_scene
from zrenderer_tpu.ops import geometry as g
from zrenderer_tpu.ops import raster_pallas as rp
from zrenderer_tpu.scene.procedural import make_test_scene, make_triangle_soup

import pytest

pytestmark = pytest.mark.slow  # heavyweight; excluded from the smoke tier


def _setup(scene, mesh_data, W, H):
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=64)
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
def _mixed_soup():
    """Soup with listed + cap-exceeding + clipped rows (the
    test_binned_raster_matches_oracle construction)."""
    W, H = 384, 128
    scene, mesh_data = make_triangle_soup(
        400, seed=3, extent=2.0, behind_camera_fraction=0.1
    )
    v = mesh_data.vertex_data.reshape(-1, 16)
    for t in range(60, 80):
        tri = v[3 * t: 3 * t + 3, 0:3]
        c = tri.mean(axis=0)
        v[3 * t: 3 * t + 3, 0:3] = c + (tri - c) * 10.0
    for t in range(80, 100):
        v[3 * t, 2] += 15.0
    ti, tf = _setup(scene, mesh_data, W, H)
    return ti, tf, W, H


def test_binned_hbm_matches_vmem_binned_mixed_soup():
    ti, tf, W, H = _mixed_soup()
    cap = 4  # forces the blown-up triangles into phase 2
    c_v, d_v = rp.rasterize_setup_pallas_binned(
        ti, tf, W, H, interpret=True, cap=cap)
    c_s, d_s = rp.rasterize_setup_pallas_binned_hbm(
        ti, tf, W, H, interpret=True, cap=cap)
    assert (np.asarray(d_v) < 1.0).mean() > 0.1
    _assert_same(d_s, d_v)
    _assert_same(c_s, c_v)


def test_binned_hbm_exact_depth_ties_break_by_id():
    """Duplicate triangles (exact z ties) must resolve identically in
    both binned kernels — first-submitted wins."""
    W, H = 256, 64
    scene, mesh_data = make_triangle_soup(120, seed=11, extent=1.5)
    v = mesh_data.vertex_data.reshape(-1, 16)
    # Duplicate the geometry of 40 triangles onto 40 later slots with
    # DIFFERENT colors: exact coverage + z ties, winner decided by id.
    v[3 * 60: 3 * 100, 0:3] = v[3 * 10: 3 * 50, 0:3]
    ti, tf = _setup(scene, mesh_data, W, H)
    c_v, d_v = rp.rasterize_setup_pallas_binned(
        ti, tf, W, H, interpret=True)
    c_s, d_s = rp.rasterize_setup_pallas_binned_hbm(
        ti, tf, W, H, interpret=True)
    _assert_same(d_s, d_v)
    _assert_same(c_s, c_v)


def test_binned_hbm_multi_window_spans():
    """A concentrated soup makes per-tile spans exceed REC_CHUNK records,
    exercising the multi-window streaming loop and its edge masks."""
    W, H = 256, 64  # 2x2 tiles
    n = 2600
    scene, mesh_data = make_triangle_soup(n, seed=7, extent=1.0)
    ti, tf = _setup(scene, mesh_data, W, H)
    offsets, *_ = rp.prepare_binned_hbm_inputs(ti, tf, W, H)
    spans = np.diff(np.asarray(offsets))
    assert spans.max() > rp.REC_CHUNK, "need a span crossing windows"
    c_v, d_v = rp.rasterize_setup_pallas_binned(ti, tf, W, H, interpret=True)
    c_s, d_s = rp.rasterize_setup_pallas_binned_hbm(
        ti, tf, W, H, interpret=True)
    _assert_same(d_s, d_v)
    _assert_same(c_s, c_v)


def test_binned_hbm_gbuffer_matches_vmem_binned_gbuffer():
    ti, tf, W, H = _mixed_soup()
    outs_v = rp.rasterize_gbuffer_pallas_binned(
        ti, tf, W, H, interpret=True, cap=4)
    outs_s = rp.rasterize_gbuffer_pallas_binned_hbm(
        ti, tf, W, H, interpret=True, cap=4)
    assert len(outs_v) == len(outs_s) == 13
    for a, b in zip(outs_s, outs_v):
        _assert_same(a, b)


def test_binned_hbm_depth_matches_vmem_binned_depth():
    ti, tf, W, H = _mixed_soup()
    d_v = rp.rasterize_depth_pallas_binned(ti, tf, W, H, interpret=True,
                                           cap=4)
    d_s = rp.rasterize_depth_pallas_binned_hbm(ti, tf, W, H, interpret=True,
                                               cap=4)
    _assert_same(d_s, d_v)


def test_binned_hbm_demo_scene_matches_hierarchy():
    scene, md = make_test_scene()
    ti, tf = _setup(scene, md, 128, 32)
    c_h, d_h = rp.rasterize_setup_pallas(ti, tf, 128, 32, interpret=True)
    c_s, d_s = rp.rasterize_setup_pallas_binned_hbm(
        ti, tf, 128, 32, interpret=True)
    _assert_same(d_s, d_h)
    _assert_same(c_s, c_h)


def test_binned_hbm_budget_clamp_demotes_exactly(monkeypatch):
    """With a tiny record budget, overflow triangles must demote to the
    phase-2 hierarchy and the image must not change."""
    ti, tf, W, H = _mixed_soup()
    c_ref, d_ref = rp.rasterize_setup_pallas_binned_hbm(
        ti, tf, W, H, interpret=True, cap=4)
    monkeypatch.setattr(rp, "HBM_PAIR_BUDGET", 256)
    offsets, *_ = rp.prepare_binned_hbm_inputs(ti, tf, W, H, cap=4)
    assert int(np.asarray(offsets)[-1]) <= 256, "clamp must bound pairs"
    c_c, d_c = rp.rasterize_setup_pallas_binned_hbm(
        ti, tf, W, H, interpret=True, cap=4)
    _assert_same(d_c, d_ref)
    _assert_same(c_c, c_ref)


def test_pair_value_sort_lex_fallback_matches_packed():
    """Past i32 packing capacity the pair sort switches to a two-key
    lexicographic lax.sort (ADVICE r4: the old fallback was a stable
    argsort + index gather).  Both branches must produce identical
    spans and an identical pair-ordered triangle sequence."""
    rng = np.random.default_rng(7)
    cap, num_tiles, p0 = 4, 37, 512
    keys = jnp.asarray(rng.integers(0, num_tiles + 1, p0), jnp.int32)
    tri_p, off_p = rp._pair_value_sort(keys, cap, num_tiles, force="packed")
    tri_l, off_l = rp._pair_value_sort(keys, cap, num_tiles, force="lex")
    np.testing.assert_array_equal(np.asarray(off_p), np.asarray(off_l))
    # Within a tile the order is free (id tie-break) — but both branches
    # sort unique (key, idx) pairs, so the full sequences agree exactly.
    np.testing.assert_array_equal(np.asarray(tri_p), np.asarray(tri_l))


def test_gathered_layout_does_not_invert_as_capped_rows():
    """Why multi-chip callers must thread n_head (ADVICE r4 high): the
    all-gathered row count n * capped_rows(shard) either fails to invert
    (1M over 8 shards: AssertionError) or inverts to the WRONG head
    count (2 shards of 1056 -> 8256, true head count 2112)."""
    import pytest

    rows_8 = 8 * g.capped_rows(125_000)
    with pytest.raises(AssertionError):
        g.head_count(rows_8)

    rows_2 = 2 * g.capped_rows(1056)
    assert g.head_count(rows_2) == 8256  # silently != 2 * 1056


def test_binned_band_traces_at_multichip_1m_scale():
    """Trace-only regression for the round-4 multi-chip crash: the
    streaming binned band must TRACE with the 8-shard 1M gathered row
    layout when n_head is threaded (it raised AssertionError at trace
    time before the fix — parallel/tiles.py now passes n_head)."""
    import functools

    import jax

    n, shard = 8, 125_000
    rows = n * g.capped_rows(shard)
    ti = jax.ShapeDtypeStruct((rows, g.NI32), jnp.int32)
    tf = jax.ShapeDtypeStruct((rows, g.NF32), jnp.float32)
    row0 = jax.ShapeDtypeStruct((), jnp.int32)
    fn = functools.partial(
        rp.rasterize_setup_pallas_binned_band,
        width=1920, full_height=2048, band_h=256, n_head=n * shard,
    )
    color, depth = jax.eval_shape(fn, ti, tf, row0=row0)
    assert color.shape == (256, 1920)
    assert depth.shape == (256, 1920)


def test_coarse_class_matches_and_engages():
    """The coarse second list class (big-footprint leftovers as
    (coarse-bin, triangle) records with per-record bbox masks) must be
    bit-identical to the hierarchy-leftover path and actually own the
    cap-exceeding triangles (coffsets non-empty, hierarchy rows killed)."""
    ti, tf, W, H = _mixed_soup()
    c_ref, d_ref = rp.rasterize_setup_pallas_binned_hbm(
        ti, tf, W, H, interpret=True, cap=4)
    c_c, d_c = rp.rasterize_setup_pallas_binned_hbm(
        ti, tf, W, H, interpret=True, cap=4, coarse_cap=8)
    _assert_same(d_c, d_ref)
    _assert_same(c_c, c_ref)

    out = rp.prepare_binned_hbm_inputs(ti, tf, W, H, cap=4, coarse_cap=8)
    assert len(out) == 10
    coffsets = np.asarray(out[7])
    assert coffsets[-1] > 0, "coarse class must own some leftovers"


def test_coarse_class_budget_overflow_demotes_to_hierarchy():
    """Coarse-budget overflow falls back to the hierarchy, image
    unchanged."""
    ti, tf, W, H = _mixed_soup()
    c_ref, d_ref = rp.rasterize_setup_pallas_binned_hbm(
        ti, tf, W, H, interpret=True, cap=4)
    c_c, d_c = rp.rasterize_setup_pallas_binned_hbm(
        ti, tf, W, H, interpret=True, cap=4, coarse_cap=8,
        coarse_budget=8)
    _assert_same(d_c, d_ref)
    _assert_same(c_c, c_ref)
