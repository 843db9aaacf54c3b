"""Pallas kernel parity vs the CPU oracle (interpret mode on CPU).

Interpret mode dispatches kernel ops eagerly per triangle iteration, so this
is kept to one compact scene.  On the CPU backend XLA FMA-contracts the
f32 interpolation chains, so the contract here is coverage-exact + u8
within 1 LSB (docs/RASTER_SPEC.md §5); bit-exact raster parity vs the
oracle is verified on real TPU hardware by bench.py --verify.
"""

import numpy as np

import jax
import jax.numpy as jnp

from zrenderer_tpu.engine.upload import flatten_scene
from zrenderer_tpu.ops import geometry as g
from zrenderer_tpu.ops import raster_pallas as rp
from zrenderer_tpu.raster_ref import raster_cpu
from zrenderer_tpu.scene.procedural import make_test_scene


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
