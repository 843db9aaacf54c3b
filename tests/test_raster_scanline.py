"""Scanline-grouped raster parity vs the HBM hierarchy kernel and the CPU
oracle (interpret mode on CPU).

The scanline kernel re-orders triangle processing twice (block-local row
sort + suffix roll-min winner selection), so these fixtures specifically
exercise the reorder hazards: same-row overlap runs, exact z ties inside
and across runs, short/tall class mixing, and tile-straddling rows.
Bit-exact raster parity on real hardware is covered by `-m tpu` tests and
bench.py --verify.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.experiments

import jax.numpy as jnp

from zrenderer_tpu.engine.upload import flatten_scene
from zrenderer_tpu.ops import geometry as g
from zrenderer_tpu.ops import raster_pallas as rp
from zrenderer_tpu.ops.experiments import raster_scanline as rs
from zrenderer_tpu.raster_ref import raster_cpu
from zrenderer_tpu.scene.procedural import make_stress_scene, make_test_scene


def _geom(scene, mesh_data, W, H, align):
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=align)
    vp = g.view_proj_from_camera(scene.active_camera, W, H)
    matrices = np.einsum(
        "nij,jk->nik", flat.node_to_world, vp).astype(np.float32)
    return g.geometry_pipeline(
        np, flat.positions, flat.attrs, flat.tri_vidx, matrices,
        flat.vert_node, W, H,
    )


def _assert_matches_hbm1(ti, tf, W, H, min_cov=0.01):
    color_1, depth_1 = rp.rasterize_setup_pallas_hbm(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True, compact=False
    )
    color_2, depth_2 = rs.rasterize_setup_pallas_scanline(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True
    )
    assert (np.asarray(depth_1) < 1.0).mean() > min_cov
    np.testing.assert_array_equal(np.asarray(depth_2), np.asarray(depth_1))
    np.testing.assert_array_equal(np.asarray(color_2), np.asarray(color_1))


def test_scanline_matches_oracle_and_hbm1_demo_scene():
    """Demo scene (all-tall class): exercises the tall pass + epilogue."""
    W, H = 128, 32
    ti, tf = _geom(*make_test_scene(), W, H, 16)
    img_cpu, depth_cpu = raster_cpu.rasterize_setup(ti, tf, W, H)
    u8_cpu = raster_cpu.pack_u8(img_cpu)

    color, depth = rs.rasterize_setup_pallas_scanline(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True
    )
    u8_pl = np.asarray(rp.unpack_rgba8(color))
    depth_pl = np.asarray(depth)
    assert (depth_pl < 1.0).mean() > 0.1
    np.testing.assert_array_equal(depth_pl < 1.0, depth_cpu < 1.0)
    np.testing.assert_allclose(depth_pl, depth_cpu, atol=1e-6)
    assert np.abs(u8_pl.astype(np.int32) - u8_cpu.astype(np.int32)).max() <= 1
    _assert_matches_hbm1(ti, tf, W, H, min_cov=0.1)


def test_scanline_matches_hbm1_stress_mix():
    """Short/tall mixed lattice: row-sorted groups, run conflicts, class
    boundary, tile straddles — bit-identical to the hierarchy kernel."""
    W, H = 256, 64
    ti, tf = _geom(*make_stress_scene(1536), W, H, 64)
    short = np.asarray(rp._classify_short(np, ti))
    alive = ti[:, g.I_VALID] > 0
    assert short.sum() > 0 and (alive & ~short).sum() > 0
    _assert_matches_hbm1(ti, tf, W, H, min_cov=0.05)


def test_scanline_same_row_run_exact_z_tie_breaks_by_id():
    """A run of SHORT triangles on the SAME rows with exactly tied depth
    (za zeroed): the suffix roll-min must keep the lowest id, matching
    the sequential strict-less oracle."""
    W, H = 128, 32
    n = 6
    positions = []
    tri_vidx = []
    # n short triangles stacked left-to-right on the same rows, each
    # overlapping its neighbour by half a base: every covered pixel in
    # the overlap belongs to two triangles of the SAME row run.
    for k in range(n):
        x0 = -0.9 + 0.2 * k
        positions += [
            [x0, -0.1, 0.5, 1.0],
            [x0 + 0.3, -0.1, 0.5, 1.0],
            [x0 + 0.15, 0.1, 0.5, 1.0],
        ]
        tri_vidx.append([3 * k, 3 * k + 1, 3 * k + 2])
    positions = np.asarray(positions, np.float32)
    attrs = np.zeros((3 * n, 12), np.float32)
    for k in range(n):
        attrs[3 * k:3 * k + 3, 0:3] = [(k + 1) / n, 1.0 - k / n, 0.25 * (k % 4)]
    tri_vidx = np.asarray(tri_vidx, np.int32)
    node_ids = np.zeros(3 * n, np.int32)
    matrices = np.eye(4, dtype=np.float32)[None]
    ti, tf = g.geometry_pipeline(
        np, positions, attrs, tri_vidx, matrices, node_ids, W, H)
    ti, tf = np.array(ti), np.array(tf)
    short = np.asarray(rp._classify_short(np, ti))
    assert short[np.asarray(ti[:, g.I_VALID] > 0)].all()
    # Exact z tie on every covered pixel.
    for col in (g.F_ZA0, g.F_ZA1, g.F_ZA2):
        tf[:, col] = 0.0
    _assert_matches_hbm1(ti, tf, W, H)


def test_scanline_cross_class_exact_z_tie_breaks_by_id():
    """SHORT over TALL with exact z tie: cross-pass id tie-break."""
    W, H = 128, 32
    positions = np.array([
        [-0.8, -0.8, 0.5, 1.0],
        [0.8, -0.8, 0.5, 1.0],
        [0.0, 0.8, 0.5, 1.0],
        [-0.2, -0.1, 0.3, 1.0],
        [0.2, -0.1, 0.3, 1.0],
        [0.0, 0.1, 0.3, 1.0],
    ], np.float32)
    attrs = np.zeros((6, 12), np.float32)
    attrs[:3, 0:3] = [1.0, 0.0, 0.0]
    attrs[3:, 0:3] = [0.0, 1.0, 0.0]
    tri_vidx = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    node_ids = np.zeros(6, np.int32)
    matrices = np.eye(4, dtype=np.float32)[None]
    ti, tf = g.geometry_pipeline(
        np, positions, attrs, tri_vidx, matrices, node_ids, W, H)
    ti, tf = np.array(ti), np.array(tf)
    alive = np.flatnonzero(ti[:, g.I_VALID] > 0)
    short = np.asarray(rp._classify_short(np, ti))
    assert not short[alive[0]] and short[alive[1]]
    for col in (g.F_ZA0, g.F_ZA1, g.F_ZA2):
        tf[alive, col] = 0.0
    _assert_matches_hbm1(ti, tf, W, H)


def test_scanline_row_sort_reorders_but_output_is_submission_exact():
    """Triangles submitted in REVERSE row order (the sort must actually
    permute within the block) with inter-row overlaps across tiles."""
    rng = np.random.default_rng(7)
    W, H = 256, 64
    n = 80
    positions = []
    tri_vidx = []
    for k in range(n):
        # reverse sweep top to bottom, random jitter, ~2-4 px triangles
        cy = 0.9 - 1.8 * ((n - 1 - k) / n) + rng.uniform(-0.05, 0.05)
        cx = rng.uniform(-0.95, 0.9)
        w = rng.uniform(0.02, 0.08)
        h = rng.uniform(0.02, 0.12)
        positions += [
            [cx, cy, 0.5, 1.0],
            [cx + w, cy, 0.5, 1.0],
            [cx + w / 2, cy + h, 0.5, 1.0],
        ]
        tri_vidx.append([3 * k, 3 * k + 1, 3 * k + 2])
    positions = np.asarray(positions, np.float32)
    attrs = rng.uniform(0, 1, (3 * n, 12)).astype(np.float32)
    tri_vidx = np.asarray(tri_vidx, np.int32)
    node_ids = np.zeros(3 * n, np.int32)
    matrices = np.eye(4, dtype=np.float32)[None]
    ti, tf = g.geometry_pipeline(
        np, positions, attrs, tri_vidx, matrices, node_ids, W, H)
    _assert_matches_hbm1(ti, tf, W, H, min_cov=0.005)
