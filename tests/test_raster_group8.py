"""Group-vectorized binned raster (ops/experiments/raster_group8.py) parity.

The group8 kernels must be bit-identical to the scalar hierarchy kernels
(which are themselves oracle-verified in test_raster_pallas.py): the
(z, id)-lexicographic winner is partition-invariant, so splitting
triangles between the vectorized lists and the leftover hierarchy cannot
change any pixel.  Scenes exercise BOTH phases plus the list-span tail
masking (spans not multiples of the 8-triangle group).

Interpret-mode kernels execute eagerly per grid point, so scenes/grids
are kept small and expensive renders are computed once per module.
"""

from functools import lru_cache

import numpy as np
import pytest

pytestmark = pytest.mark.experiments

import jax.numpy as jnp

from zrenderer_tpu.engine.upload import flatten_scene
from zrenderer_tpu.ops import geometry as g
from zrenderer_tpu.ops.experiments import raster_group8 as g8
from zrenderer_tpu.ops import raster_pallas as rp
from zrenderer_tpu.scene.procedural import make_triangle_soup


def _setup_soup(W, H, n, seed, blow_up=False, materials=False):
    scene, mesh_data = make_triangle_soup(
        n, seed=seed, extent=2.0, behind_camera_fraction=0.1
    )
    v = mesh_data.vertex_data.reshape(-1, 16)
    if blow_up:
        # Oversized triangles exceed the pair cap -> leftover hierarchy;
        # near-plane straddlers produce clipped fan rows (also leftovers).
        for t in range(20, 30):
            tri = v[3 * t: 3 * t + 3, 0:3]
            c = tri.mean(axis=0)
            v[3 * t: 3 * t + 3, 0:3] = c + (tri - c) * 10.0
        for t in range(30, 40):
            v[3 * t, 2] += 15.0
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=64)
    vp = g.view_proj_from_camera(scene.active_camera, W, H)
    matrices = np.einsum(
        "nij,jk->nik", flat.node_to_world, vp
    ).astype(np.float32)
    mat_table = None
    if materials:
        mat_table = np.zeros((flat.draw_count, g.MATERIAL_COLS), np.float32)
        mat_table[0] = (1.0, 0.2, 0.0, 0.1, 0.0, 1.0)
    return g.geometry_pipeline(
        np, flat.positions, flat.attrs, flat.tri_vidx, matrices,
        flat.vert_node, W, H, material_table=mat_table,
    )


@lru_cache(maxsize=1)
def _flat_case():
    W, H = 256, 64
    ti, tf = _setup_soup(W, H, n=150, seed=3, blow_up=True)
    color_h, depth_h = rp.rasterize_setup_pallas(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True)
    color_g, depth_g = g8.rasterize_setup_pallas_group8(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True, chunk=16)
    return (W, H, ti, tf, np.asarray(color_h), np.asarray(depth_h),
            np.asarray(color_g), np.asarray(depth_g))


def test_group8_flat_matches_hierarchy():
    """Bit-exact color + depth vs the hierarchy kernel on a dense soup
    with clipping, cap-exceeding triangles, and partial final groups."""
    W, H, ti, tf, color_h, depth_h, color_g, depth_g = _flat_case()

    n_head = g.head_count(ti.shape[0])
    head = ti[:n_head]
    valid = head[:, g.I_VALID] > 0
    foot = ((head[:, g.I_JMAX] // g8.GT_W - head[:, g.I_JMIN] // g8.GT_W + 1)
            * (head[:, g.I_IMAX] // g8.GT_H
               - head[:, g.I_IMIN] // g8.GT_H + 1))
    assert (valid & (foot <= g8.PAIR_CAP)).sum() > 40, "need listed tris"
    assert (valid & (foot > g8.PAIR_CAP)).sum() > 3, "need leftover tris"
    assert (ti[n_head:, g.I_VALID] > 0).sum() > 0, "need clipped fan rows"

    assert (depth_h < 1.0).mean() > 0.2
    np.testing.assert_array_equal(
        depth_g.view(np.uint32), depth_h.view(np.uint32))
    np.testing.assert_array_equal(color_g, color_h)


def test_group8_list_budget_overflow_degrades_to_hierarchy():
    """A tiny list budget forces most triangles through the leftover
    hierarchy — the image must not change (never drops triangles)."""
    W, H, ti, tf, color_h, depth_h, _, _ = _flat_case()
    tiny_c, tiny_d = g8.rasterize_setup_pallas_group8(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True, chunk=16,
        list_budget=32)
    np.testing.assert_array_equal(np.asarray(tiny_c), color_h)
    np.testing.assert_array_equal(
        np.asarray(tiny_d).view(np.uint32), depth_h.view(np.uint32))


def test_group8_gbuffer_matches_hierarchy():
    """All 13 G-buffer planes bit-equal, including material constants."""
    W, H = 128, 32
    ti, tf = _setup_soup(W, H, n=60, seed=7, materials=True)
    ref = [np.asarray(o) for o in rp.rasterize_gbuffer_pallas(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True)]
    out = [np.asarray(o) for o in g8.rasterize_gbuffer_pallas_group8(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True,
        chunk=16, pair_cap=2)]
    assert (ref[1] < 1.0).mean() > 0.01
    for a, b in zip(ref, out):
        np.testing.assert_array_equal(a, b)


def test_group8_depth_matches_depth_kernel():
    W, H = 128, 32
    ti, tf = _setup_soup(W, H, n=40, seed=9)
    ref = rp.rasterize_depth_pallas(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True)
    out = g8.rasterize_depth_pallas_group8(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True,
        chunk=16, pair_cap=2)
    np.testing.assert_array_equal(
        np.asarray(out).view(np.uint32), np.asarray(ref).view(np.uint32))
    assert (np.asarray(ref) < 1.0).mean() > 0.01


def test_group8_exact_depth_tie_breaks_by_id():
    """Two coplanar identical triangles (exact z tie) resolve identically
    to the hierarchy kernel (lower id wins in both)."""
    W, H = 128, 32
    scene, mesh_data = make_triangle_soup(8, seed=11, extent=1.0)
    v = mesh_data.vertex_data.reshape(-1, 16)
    v[3:6] = v[0:3]  # triangle 1 duplicates triangle 0, different color
    v[3:6, 4:7] = (0.9, 0.1, 0.1)
    v[0:3, 4:7] = (0.1, 0.9, 0.1)
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=64)
    vp = g.view_proj_from_camera(scene.active_camera, W, H)
    matrices = np.einsum(
        "nij,jk->nik", flat.node_to_world, vp).astype(np.float32)
    ti, tf = g.geometry_pipeline(
        np, flat.positions, flat.attrs, flat.tri_vidx, matrices,
        flat.vert_node, W, H)
    color_h, depth_h = rp.rasterize_setup_pallas(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True)
    color_g, depth_g = g8.rasterize_setup_pallas_group8(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True, chunk=16)
    np.testing.assert_array_equal(np.asarray(color_g), np.asarray(color_h))
    np.testing.assert_array_equal(
        np.asarray(depth_g).view(np.uint32),
        np.asarray(depth_h).view(np.uint32))


def test_group8_empty_scene():
    """No live triangles: background color, depth 1.0 everywhere."""
    t = g.capped_rows(64)
    pad = (-t) % 64
    ti = np.zeros((t + pad, g.NI32), np.int32)
    ti[:, g.I_JMIN] = 1
    ti[:, g.I_BIAS0] = ti[:, g.I_BIAS1] = ti[:, g.I_BIAS2] = 2**31 - 1
    tf = np.zeros((t + pad, g.NF32), np.float32)
    color, depth = g8.rasterize_setup_pallas_group8(
        jnp.asarray(ti), jnp.asarray(tf), 128, 32, interpret=True, chunk=16)
    assert (np.asarray(depth) == 1.0).all()
    assert (np.asarray(color) == 0xFF000000).all()
