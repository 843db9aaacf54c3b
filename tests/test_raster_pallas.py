"""Pallas kernel parity vs the CPU oracle (interpret mode on CPU).

Interpret mode dispatches kernel ops eagerly per triangle iteration, so this
is kept to one compact scene.  On the CPU backend XLA FMA-contracts the
f32 interpolation chains, so the contract here is coverage-exact + u8
within 1 LSB (docs/RASTER_SPEC.md §5); bit-exact raster parity vs the
oracle is verified on real TPU hardware by bench.py --verify.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zrenderer_tpu.engine.upload import flatten_scene
from zrenderer_tpu.ops import geometry as g
from zrenderer_tpu.ops import raster_pallas as rp
from zrenderer_tpu.ops.experiments import raster_hbm2 as rh2
from zrenderer_tpu.ops.experiments import raster_vis_trans as rvt
from zrenderer_tpu.raster_ref import raster_cpu
from zrenderer_tpu.scene.procedural import make_test_scene

pytestmark = pytest.mark.slow  # heavyweight; excluded from the smoke tier


def test_pallas_interpret_bit_exact_parity():
    W, H = 128, 32  # one (TILE_H, TILE_W) tile
    scene, mesh_data = make_test_scene()
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=16)
    vp = g.view_proj_from_camera(scene.active_camera, W, H)
    matrices = np.einsum("nij,jk->nik", flat.node_to_world, vp).astype(np.float32)
    ti, tf = g.geometry_pipeline(
        np, flat.positions, flat.attrs, flat.tri_vidx, matrices,
        flat.vert_node, W, H,
    )

    img_cpu, depth_cpu = raster_cpu.rasterize_setup(ti, tf, W, H)
    u8_cpu = raster_cpu.pack_u8(img_cpu)

    color, depth = rp.rasterize_setup_pallas(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True
    )
    u8_pl = np.asarray(rp.unpack_rgba8(color))

    depth_pl = np.asarray(depth)
    assert (depth_pl < 1.0).mean() > 0.1, "scene unexpectedly empty"
    # Coverage must match exactly; f32 interpolation within CPU-FMA slack.
    np.testing.assert_array_equal(depth_pl < 1.0, depth_cpu < 1.0)
    np.testing.assert_allclose(depth_pl, depth_cpu, atol=1e-6)
    diff = np.abs(u8_pl.astype(np.int32) - u8_cpu.astype(np.int32))
    assert diff.max() <= 1


def test_depth_only_kernel_matches_full_depth():
    """The depth-only kernel (shadow-map pass) is bit-identical to the
    full kernel's depth plane."""
    W, H = 128, 32
    scene, mesh_data = make_test_scene()
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=16)
    vp = g.view_proj_from_camera(scene.active_camera, W, H)
    matrices = np.einsum("nij,jk->nik", flat.node_to_world, vp).astype(np.float32)
    ti, tf = g.geometry_pipeline(
        np, flat.positions, flat.attrs, flat.tri_vidx, matrices,
        flat.vert_node, W, H,
    )
    _, depth_full = rp.rasterize_setup_pallas(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True
    )
    depth_only = rp.rasterize_depth_pallas(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(depth_only),
                                  np.asarray(depth_full))
    assert (np.asarray(depth_only) < 1.0).mean() > 0.1


def test_unpack_rgba8():
    packed = jnp.asarray(np.array([[0x04030201, 0xFF000000]], np.uint32))
    u8 = np.asarray(rp.unpack_rgba8(packed))
    np.testing.assert_array_equal(u8[0, 0], [1, 2, 3, 4])
    np.testing.assert_array_equal(u8[0, 1], [0, 0, 0, 255])


def test_pallas_hbm_streaming_matches_oracle():
    """The HBM-streaming kernel variant (large scenes) produces the same
    coverage/colors as the oracle on a small scene (interpret mode)."""
    W, H = 128, 32
    scene, mesh_data = make_test_scene()
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=16)
    vp = g.view_proj_from_camera(scene.active_camera, W, H)
    matrices = np.einsum("nij,jk->nik", flat.node_to_world, vp).astype(np.float32)
    ti, tf = g.geometry_pipeline(
        np, flat.positions, flat.attrs, flat.tri_vidx, matrices,
        flat.vert_node, W, H,
    )
    img_cpu, depth_cpu = raster_cpu.rasterize_setup(ti, tf, W, H)
    u8_cpu = raster_cpu.pack_u8(img_cpu)

    color, depth = rp.rasterize_setup_pallas_hbm(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True
    )
    u8_pl = np.asarray(rp.unpack_rgba8(color))
    depth_pl = np.asarray(depth)
    np.testing.assert_array_equal(depth_pl < 1.0, depth_cpu < 1.0)
    np.testing.assert_allclose(depth_pl, depth_cpu, atol=1e-6)
    assert np.abs(u8_pl.astype(np.int32) - u8_cpu.astype(np.int32)).max() <= 1


@pytest.mark.experiments
def test_vis_buffer_matches_hbm_kernel():
    """The visibility-buffer path (z+id Pallas pass + XLA color resolve)
    is bit-identical to the single-pass HBM kernel: same depth plane,
    same packed color (the resolve recomputes the winner's color with
    the kernel's exact arithmetic)."""
    W, H = 128, 32
    scene, mesh_data = make_test_scene()
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=16)
    vp = g.view_proj_from_camera(scene.active_camera, W, H)
    matrices = np.einsum("nij,jk->nik", flat.node_to_world, vp).astype(np.float32)
    ti, tf = g.geometry_pipeline(
        np, flat.positions, flat.attrs, flat.tri_vidx, matrices,
        flat.vert_node, W, H,
    )
    color_h, depth_h = rp.rasterize_setup_pallas_hbm(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True
    )
    color_v, depth_v = rvt.rasterize_setup_pallas_vis(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(depth_v), np.asarray(depth_h))
    np.testing.assert_array_equal(np.asarray(color_v), np.asarray(color_h))
    assert (np.asarray(depth_v) < 1.0).mean() > 0.1


@pytest.mark.experiments
def test_trans_group_raster_matches_hbm_kernel():
    """The transposed-group visibility raster (8 triangles per sublane
    vector, z+id merge, exact XLA resolve) is bit-identical to the
    single-pass HBM kernel — including on a dense soup with clipped fan
    rows, overlap, and exact depth ties between distinct triangles."""
    from zrenderer_tpu.scene.procedural import make_triangle_soup

    W, H = 256, 64  # 2x2 tiles
    scene, mesh_data = make_triangle_soup(
        500, seed=7, extent=2.0, behind_camera_fraction=0.1
    )
    # Duplicate a few triangles exactly: identical z everywhere on the
    # shared footprint, so the min-id tie rule is live, not vacuous.
    v = mesh_data.vertex_data.reshape(-1, 16)
    for t in range(10, 20):
        v[3 * t: 3 * t + 3, 0:3] = v[3 * (t - 10): 3 * (t - 10) + 3, 0:3]
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=64)
    vp = g.view_proj_from_camera(scene.active_camera, W, H)
    matrices = np.einsum(
        "nij,jk->nik", flat.node_to_world, vp
    ).astype(np.float32)
    ti, tf = g.geometry_pipeline(
        np, flat.positions, flat.attrs, flat.tri_vidx, matrices,
        flat.vert_node, W, H,
    )
    color_h, depth_h = rp.rasterize_setup_pallas_hbm(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True
    )
    color_t, depth_t = rvt.rasterize_setup_pallas_trans(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True
    )
    assert (np.asarray(depth_h) < 1.0).mean() > 0.05
    np.testing.assert_array_equal(
        np.asarray(depth_t).view(np.uint32),
        np.asarray(depth_h).view(np.uint32),
    )
    np.testing.assert_array_equal(np.asarray(color_t), np.asarray(color_h))


def test_pallas_gbuffer_interpret_parity_with_xla():
    """The Pallas G-buffer kernel and its XLA twin agree on coverage and
    interpolants (CPU: interpret mode, 1-LSB contract)."""
    from zrenderer_tpu.ops import raster_xla

    W, H = 128, 32
    scene, mesh_data = make_test_scene()
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=16)
    vp = g.view_proj_from_camera(scene.active_camera, W, H)
    matrices = np.einsum("nij,jk->nik", flat.node_to_world, vp).astype(np.float32)
    normal_mats = np.tile(np.eye(3, dtype=np.float32), (flat.draw_count, 1, 1))
    ti, tf = g.geometry_pipeline(
        np, flat.positions, flat.attrs, flat.tri_vidx, matrices,
        flat.vert_node, W, H,
    )

    outs_x = [
        np.asarray(o) for o in raster_xla.rasterize_gbuffer_xla(
            jnp.asarray(ti), jnp.asarray(tf), W, H
        )
    ]
    rgba_x, depth_x, u_x, v_x, nx_x, ny_x, nz_x = outs_x[:7]
    outs = rp.rasterize_gbuffer_pallas(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True
    )
    outs_p = [np.asarray(o) for o in outs]
    color_p, depth_p, u_p, v_p, nx_p, ny_p, nz_p = outs_p[:7]
    rgba_p = np.asarray(rp.unpack_rgba8(jnp.asarray(color_p)))

    cov_x = depth_x < 1.0
    assert cov_x.mean() > 0.1
    np.testing.assert_array_equal(cov_x, depth_p < 1.0)
    np.testing.assert_allclose(depth_p, depth_x, atol=1e-6)
    assert np.abs(rgba_p.astype(int) - rgba_x.astype(int)).max() <= 1
    for a, b in ((u_p, u_x), (v_p, v_x), (nx_p, nx_x), (ny_p, ny_x), (nz_p, nz_x)):
        np.testing.assert_allclose(a, b, atol=1e-5)
    # Material constant planes (met/rgh/emissive/tex) agree exactly.
    for a, b in zip(outs_p[7:], outs_x[7:]):
        np.testing.assert_array_equal(a, b)


def test_pallas_hbm_gbuffer_matches_vmem_gbuffer():
    """The HBM-streaming G-buffer kernel (lit/deferred past the VMEM
    triangle budget, VERDICT r1 item 5) agrees with the VMEM-resident
    G-buffer kernel on every plane, including material constants."""
    W, H = 128, 32
    scene, mesh_data = make_test_scene()
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=16)
    vp = g.view_proj_from_camera(scene.active_camera, W, H)
    matrices = np.einsum("nij,jk->nik", flat.node_to_world, vp).astype(np.float32)
    mat_table = np.zeros((flat.draw_count, g.MATERIAL_COLS), np.float32)
    mat_table[0] = (1.0, 0.2, 0.0, 0.1, 0.0, 1.0)
    mat_table[1] = (0.0, 0.8, 0.3, 0.0, 0.0, 2.0)
    ti, tf = g.geometry_pipeline(
        np, flat.positions, flat.attrs, flat.tri_vidx, matrices,
        flat.vert_node, W, H, material_table=mat_table,
    )
    vmem = [np.asarray(o) for o in rp.rasterize_gbuffer_pallas(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True
    )]
    hbm = [np.asarray(o) for o in rp.rasterize_gbuffer_pallas_hbm(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True
    )]
    assert (vmem[1] < 1.0).mean() > 0.1  # scene covered
    for a, b in zip(vmem, hbm):
        np.testing.assert_array_equal(a, b)
    # Material constants landed per draw (two distinct tex layers on screen).
    tex_plane = vmem[12][vmem[1] < 1.0]
    assert set(np.unique(tex_plane)) == {1.0, 2.0}


def test_binned_raster_matches_oracle():
    """The per-tile-list (sort-by-tile) raster is bit-exact with the CPU
    oracle on a dense soup with clipping and overlap — the id tie-break is
    equivalent to sequential strict-less depth testing."""
    from zrenderer_tpu.raster_ref.raster_cpu import rasterize_setup
    from zrenderer_tpu.scene.procedural import make_triangle_soup

    W, H = 384, 128  # 3x4 tiles: the 2x2 bin window cannot cover the frame
    scene, mesh_data = make_triangle_soup(
        400, seed=3, extent=2.0, behind_camera_fraction=0.1
    )
    # Blow up a few triangles so they exceed the bin window (phase 2),
    # and straddle a few across the near plane (clipped fan rows).
    v = mesh_data.vertex_data.reshape(-1, 16)
    for t in range(60, 80):
        tri = v[3 * t : 3 * t + 3, 0:3]
        c = tri.mean(axis=0)
        v[3 * t : 3 * t + 3, 0:3] = c + (tri - c) * 10.0
    for t in range(80, 100):
        v[3 * t, 2] += 15.0  # one vertex behind the z=12 camera
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=64)
    vp = g.view_proj_from_camera(scene.active_camera, W, H)
    matrices = np.einsum(
        "nij,jk->nik", flat.node_to_world, vp
    ).astype(np.float32)
    ti, tf = g.geometry_pipeline(
        np, flat.positions, flat.attrs, flat.tri_vidx, matrices,
        flat.vert_node, W, H,
    )
    # The workload must exercise BOTH phases: listed and hierarchy rows.
    # A small explicit cap forces the blown-up triangles into phase 2
    # (with the auto cap every bbox fits this tiny 3x4-tile frame).
    cap = 4
    n_input = ti.shape[0] // g.FAN_SLOTS
    head = ti[:n_input]
    ntx = head[:, g.I_JMAX] // 128 - head[:, g.I_JMIN] // 128 + 1
    nty = head[:, g.I_IMAX] // 32 - head[:, g.I_IMIN] // 32 + 1
    valid = head[:, g.I_VALID] > 0
    listed = valid & (ntx * nty <= cap)
    assert listed.sum() > 50, "need listed triangles"
    assert (valid & ~listed).sum() > 5, "need cap-exceeding triangles"
    assert (ti[n_input:, g.I_VALID] > 0).sum() > 0, "need clipped fan rows"

    color, depth = rp.rasterize_setup_pallas_binned(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True, cap=cap
    )
    img = np.asarray(rp.unpack_rgba8(color))

    # Bit-exact vs the hierarchy Pallas kernel (identical arithmetic —
    # this isolates the binning/tie logic; same-kernel contraction).
    color_h, depth_h = rp.rasterize_setup_pallas(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(depth).view(np.uint32), np.asarray(depth_h).view(np.uint32)
    )
    np.testing.assert_array_equal(np.asarray(color), np.asarray(color_h))

    # And against the CPU oracle within the XLA:CPU fused-FMA tolerance
    # (RASTER_SPEC §5; on real TPU the hardware subset asserts bit-equality).
    rgba_cpu, depth_cpu = rasterize_setup(ti, tf, W, H)
    img_cpu = np.floor(np.clip(rgba_cpu, 0, 1) * 255.0 + 0.5).astype(np.uint8)
    assert (depth_cpu < 1).mean() > 0.3
    np.testing.assert_allclose(np.asarray(depth), depth_cpu, atol=2e-6)
    assert np.abs(img.astype(int) - img_cpu.astype(int)).max() <= 1


def test_binned_gbuffer_matches_vmem_gbuffer():
    """The per-tile-list G-buffer kernel agrees with the hierarchy G-buffer
    kernel on every plane (depth/color/uv/normals/material constants) on a
    multi-tile frame with overlap and clipped rows."""
    from zrenderer_tpu.scene.procedural import make_triangle_soup

    W, H = 256, 64  # 2x2 tiles
    scene, mesh_data = make_triangle_soup(
        120, seed=7, extent=2.0, behind_camera_fraction=0.1
    )
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=64)
    vp = g.view_proj_from_camera(scene.active_camera, W, H)
    matrices = np.einsum(
        "nij,jk->nik", flat.node_to_world, vp
    ).astype(np.float32)
    mat_table = np.zeros((flat.draw_count, g.MATERIAL_COLS), np.float32)
    mat_table[0] = (1.0, 0.2, 0.0, 0.1, 0.0, 1.0)
    ti, tf = g.geometry_pipeline(
        np, flat.positions, flat.attrs, flat.tri_vidx, matrices,
        flat.vert_node, W, H, material_table=mat_table,
    )
    ref = [np.asarray(o) for o in rp.rasterize_gbuffer_pallas(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True
    )]
    binned = [np.asarray(o) for o in rp.rasterize_gbuffer_pallas_binned(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True, cap=2
    )]
    assert (ref[1] < 1.0).mean() > 0.02, "scene unexpectedly empty"
    for a, b in zip(ref, binned):
        np.testing.assert_array_equal(a, b)


def test_binned_depth_matches_depth_kernel():
    """The per-tile-list depth-only kernel (binned shadow pass) is
    bit-identical to the hierarchy depth kernel."""
    from zrenderer_tpu.scene.procedural import make_triangle_soup

    W, H = 256, 64
    scene, mesh_data = make_triangle_soup(
        80, seed=9, extent=2.0, behind_camera_fraction=0.1
    )
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=64)
    vp = g.view_proj_from_camera(scene.active_camera, W, H)
    matrices = np.einsum(
        "nij,jk->nik", flat.node_to_world, vp
    ).astype(np.float32)
    ti, tf = g.geometry_pipeline(
        np, flat.positions, flat.attrs, flat.tri_vidx, matrices,
        flat.vert_node, W, H,
    )
    ref = rp.rasterize_depth_pallas(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True
    )
    binned = rp.rasterize_depth_pallas_binned(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True, cap=2
    )
    np.testing.assert_array_equal(
        np.asarray(ref).view(np.uint32), np.asarray(binned).view(np.uint32)
    )
    assert (np.asarray(ref) < 1.0).mean() > 0.01


def test_bin_cap_auto_lists_everything_small_scene():
    """With the auto cap, every valid head triangle of the 120-tri test
    scene is listed (nothing rides the leftover hierarchy) — the property
    that makes tile_lists the small-scene default."""
    import pytest
    if rp.TILE_H != 32:
        pytest.skip("auto bin cap is tuned for the default 32-row tiles "
                    "(footprints double under the ZRENDERER_TILE_H knob)")
    W, H = 1920, 1088  # the headline target (padded), large cube faces
    scene, mesh_data = make_test_scene()
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=64)
    vp = g.view_proj_from_camera(scene.active_camera, W, H)
    matrices = np.einsum(
        "nij,jk->nik", flat.node_to_world, vp
    ).astype(np.float32)
    ti, tf = g.geometry_pipeline(
        np, flat.positions, flat.attrs, flat.tri_vidx, matrices,
        flat.vert_node, W, H,
    )
    cap = rp.bin_cap_for(g.head_count(ti.shape[0]))
    n_input = g.head_count(ti.shape[0])
    head = ti[:n_input]
    valid = head[:, g.I_VALID] > 0
    ntx = head[:, g.I_JMAX] // rp.TILE_W - head[:, g.I_JMIN] // rp.TILE_W + 1
    nty = head[:, g.I_IMAX] // rp.TILE_H - head[:, g.I_IMIN] // rp.TILE_H + 1
    assert valid.sum() > 5  # backface culling leaves the front faces
    assert ((ntx * nty)[valid] <= cap).all(), (
        "auto cap leaves head triangles in the leftover hierarchy"
    )


def _soup_setup(W=384, H=128, n=300, seed=7):
    """Dense soup with clipped fan rows + overlap on a 3x4-tile frame."""
    from zrenderer_tpu.scene.procedural import make_triangle_soup

    scene, mesh_data = make_triangle_soup(
        n, seed=seed, extent=2.0, behind_camera_fraction=0.1
    )
    v = mesh_data.vertex_data.reshape(-1, 16)
    for t in range(40, 60):
        v[3 * t, 2] += 15.0  # one vertex behind the near plane -> clip fan
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=64)
    vp = g.view_proj_from_camera(scene.active_camera, W, H)
    matrices = np.einsum(
        "nij,jk->nik", flat.node_to_world, vp
    ).astype(np.float32)
    ti, tf = g.geometry_pipeline(
        np, flat.positions, flat.attrs, flat.tri_vidx, matrices,
        flat.vert_node, W, H,
    )
    n_input = g.head_count(ti.shape[0])
    assert (ti[n_input:, g.I_VALID] > 0).sum() > 0, "need clipped fan rows"
    return jnp.asarray(ti), jnp.asarray(tf), W, H


def test_small_binned_raster_matches_hierarchy_and_oracle():
    """The sort-free small-scene per-tile-list raster (strided-offsets
    contract) is bit-exact with the hierarchy kernel — clipped fan rows
    ride its phase-2 hierarchy — and matches the CPU oracle."""
    ti, tf, W, H = _soup_setup()
    color_s, depth_s = rp.rasterize_setup_pallas_small(
        ti, tf, W, H, interpret=True
    )
    color_h, depth_h = rp.rasterize_setup_pallas(ti, tf, W, H, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(depth_s).view(np.uint32),
        np.asarray(depth_h).view(np.uint32),
    )
    np.testing.assert_array_equal(np.asarray(color_s), np.asarray(color_h))

    rgba_cpu, depth_cpu = raster_cpu.rasterize_setup(
        np.asarray(ti), np.asarray(tf), W, H
    )
    img = np.asarray(rp.unpack_rgba8(color_s))
    img_cpu = np.floor(np.clip(rgba_cpu, 0, 1) * 255.0 + 0.5).astype(np.uint8)
    assert (depth_cpu < 1).mean() > 0.1
    np.testing.assert_allclose(np.asarray(depth_s), depth_cpu, atol=2e-6)
    assert np.abs(img.astype(int) - img_cpu.astype(int)).max() <= 1


def test_small_binned_gbuffer_matches_vmem_gbuffer():
    ti, tf, W, H = _soup_setup(seed=11)
    ref = [np.asarray(o) for o in rp.rasterize_gbuffer_pallas(
        ti, tf, W, H, interpret=True
    )]
    small = [np.asarray(o) for o in rp.rasterize_gbuffer_pallas_small(
        ti, tf, W, H, interpret=True
    )]
    for a, b in zip(ref, small):
        np.testing.assert_array_equal(a.view(np.uint32), b.view(np.uint32))


def test_small_binned_depth_matches_depth_kernel():
    ti, tf, W, H = _soup_setup(seed=13)
    ref = rp.rasterize_depth_pallas(ti, tf, W, H, interpret=True)
    small = rp.rasterize_depth_pallas_small(ti, tf, W, H, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(ref).view(np.uint32), np.asarray(small).view(np.uint32)
    )


def test_small_bins_auto_dispatch_bounds():
    """"auto" routes small scenes (head rows <= SMALL_BIN_MAX_ROWS) to the
    sort-free path and larger ones to the hierarchy."""
    small_rows = g.capped_rows(256)
    big_rows = g.capped_rows(rp.SMALL_BIN_MAX_ROWS + 1)
    assert rp._use_small_bins("auto", small_rows)
    assert not rp._use_small_bins("auto", big_rows)
    assert not rp._use_small_bins("hierarchy", small_rows)
    assert rp._use_small_bins("small", big_rows)  # explicit (prep asserts)


@pytest.mark.experiments
def test_hbm2_two_class_matches_oracle_demo_scene():
    """The two-class windowed HBM kernel on the demo scene (all-tall
    class: cube faces span many rows) — oracle parity, interpret mode."""
    W, H = 128, 32
    scene, mesh_data = make_test_scene()
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=16)
    vp = g.view_proj_from_camera(scene.active_camera, W, H)
    matrices = np.einsum("nij,jk->nik", flat.node_to_world, vp).astype(np.float32)
    ti, tf = g.geometry_pipeline(
        np, flat.positions, flat.attrs, flat.tri_vidx, matrices,
        flat.vert_node, W, H,
    )
    img_cpu, depth_cpu = raster_cpu.rasterize_setup(ti, tf, W, H)
    u8_cpu = raster_cpu.pack_u8(img_cpu)

    color, depth = rh2.rasterize_setup_pallas_hbm2(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True
    )
    u8_pl = np.asarray(rp.unpack_rgba8(color))
    depth_pl = np.asarray(depth)
    assert (depth_pl < 1.0).mean() > 0.1
    # Oracle tolerance matches the hbm1 contract (interpret-mode FMA
    # contraction differs sub-LSB from the NumPy oracle; hardware runs
    # are 0-LSB, bench.py --verify).
    np.testing.assert_array_equal(depth_pl < 1.0, depth_cpu < 1.0)
    np.testing.assert_allclose(depth_pl, depth_cpu, atol=1e-6)
    assert np.abs(u8_pl.astype(np.int32) - u8_cpu.astype(np.int32)).max() <= 1
    # Cross-kernel contract IS bit-exact: same arithmetic as hbm1.
    color_1, depth_1 = rp.rasterize_setup_pallas_hbm(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True,
        compact=False,
    )
    np.testing.assert_array_equal(depth_pl, np.asarray(depth_1))
    np.testing.assert_array_equal(np.asarray(color), np.asarray(color_1))


@pytest.mark.experiments
def test_hbm2_two_class_matches_hbm1_stress_mix():
    """Short/tall mixed scene (tiny lattice cubes at low res: bbox spans
    straddle the 8-row class boundary): the two-class kernel is
    bit-identical to the single-class HBM kernel and the oracle."""
    from zrenderer_tpu.scene.procedural import make_stress_scene

    W, H = 256, 64
    scene, mesh_data = make_stress_scene(1536)
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=64)
    vp = g.view_proj_from_camera(scene.active_camera, W, H)
    matrices = np.einsum("nij,jk->nik", flat.node_to_world, vp).astype(np.float32)
    ti, tf = g.geometry_pipeline(
        np, flat.positions, flat.attrs, flat.tri_vidx, matrices,
        flat.vert_node, W, H,
    )
    # The class split must be non-trivial for this fixture to test the
    # boundary (otherwise it degenerates to one of the single-class cases).
    short = np.asarray(rp._classify_short(np, ti))
    alive = ti[:, g.I_VALID] > 0
    assert short.sum() > 0 and (alive & ~short).sum() > 0

    color_1, depth_1 = rp.rasterize_setup_pallas_hbm(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True,
        compact=False,
    )
    color_2, depth_2 = rh2.rasterize_setup_pallas_hbm2(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True
    )
    assert (np.asarray(depth_1) < 1.0).mean() > 0.05
    np.testing.assert_array_equal(np.asarray(depth_2), np.asarray(depth_1))
    np.testing.assert_array_equal(np.asarray(color_2), np.asarray(color_1))


@pytest.mark.experiments
def test_hbm2_cross_class_exact_z_tie_breaks_by_id():
    """Constructed exact depth tie between a SHORT and a TALL triangle
    (za columns zeroed -> z == 0 on every covered pixel): the two-pass
    kernel must break the tie by triangle id (== submission order), i.e.
    match the sequential oracle no matter which pass ran first."""
    W, H = 128, 32
    # Hand-built geometry: a TALL triangle A (rows ~3..28) and a SHORT
    # triangle B (~3 rows) inside A's footprint, submitted after A.  With
    # an identity matrix, positions are clip coordinates directly.
    positions = np.array([
        [-0.8, -0.8, 0.5, 1.0],
        [0.8, -0.8, 0.5, 1.0],
        [0.0, 0.8, 0.5, 1.0],
        [-0.2, -0.1, 0.3, 1.0],
        [0.2, -0.1, 0.3, 1.0],
        [0.0, 0.1, 0.3, 1.0],
    ], np.float32)
    attrs = np.zeros((6, 12), np.float32)
    attrs[:3, 0:3] = [1.0, 0.0, 0.0]  # A red
    attrs[3:, 0:3] = [0.0, 1.0, 0.0]  # B green
    tri_vidx = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    node_ids = np.zeros(6, np.int32)
    matrices = np.eye(4, dtype=np.float32)[None]
    ti, tf = g.geometry_pipeline(
        np, positions, attrs, tri_vidx, matrices, node_ids, W, H,
    )
    ti = np.array(ti)
    tf = np.array(tf)
    alive = np.flatnonzero(ti[:, g.I_VALID] > 0)
    assert len(alive) == 2
    a, b = int(alive[0]), int(alive[1])
    short = np.asarray(rp._classify_short(np, ti))
    assert not short[a] and short[b]
    # Give both triangles identical (zero) depth everywhere: an exact
    # cross-class z tie on every overlapped pixel.
    for col in (g.F_ZA0, g.F_ZA1, g.F_ZA2):
        tf[a, col] = 0.0
        tf[b, col] = 0.0

    # hbm1 loops rows sequentially (strict-less == lowest-id tie winner,
    # the oracle rule) with identical kernel arithmetic — the bit-exact
    # comparator for the two-pass id tie-break.
    color_1, depth_1 = rp.rasterize_setup_pallas_hbm(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True,
        compact=False,
    )
    color, depth = rh2.rasterize_setup_pallas_hbm2(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True
    )
    # Both triangles rendered somewhere at the tied depth 0.0.
    assert (np.asarray(depth) == 0.0).sum() > 0
    np.testing.assert_array_equal(np.asarray(depth), np.asarray(depth_1))
    np.testing.assert_array_equal(np.asarray(color), np.asarray(color_1))
