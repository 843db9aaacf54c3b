"""Parity: CPU oracle vs XLA path (geometry + raster + pack).

The core correctness gate demanded by BASELINE.md.  Contract
(docs/RASTER_SPEC.md §5): integer coverage data bit-exact; images within
1 u8 LSB on the CPU test backend (whose fused loops FMA-contract
irreducibly); bit-exact raster parity is verified on the real TPU target
(bench.py --verify and tests/test_raster_pallas.py on hardware).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zrenderer_tpu.engine.upload import flatten_scene
from zrenderer_tpu.ops import geometry as g
from zrenderer_tpu.ops import raster_xla
from zrenderer_tpu.raster_ref import raster_cpu
from zrenderer_tpu.scene.procedural import make_test_scene, make_triangle_soup

pytestmark = pytest.mark.slow  # heavyweight; excluded from the smoke tier


def _prepare(scene, mesh_data, width, height, camera=None):
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=64)
    cam = camera or scene.active_camera
    vp = g.view_proj_from_camera(cam, width, height)
    matrices = np.einsum("nij,jk->nik", flat.node_to_world, vp).astype(np.float32)
    return flat, matrices


def _setup_np(flat, matrices, width, height):
    return g.geometry_pipeline(
        np, flat.positions, flat.attrs, flat.tri_vidx, matrices,
        flat.vert_node, width, height,
    )


def _setup_jax(flat, matrices, width, height):
    ti, tf = raster_xla.setup_pipeline_jit(
        flat.positions, flat.attrs, flat.tri_vidx, matrices, flat.vert_node,
        width, height,
    )
    return np.asarray(ti), np.asarray(tf)


def _assert_ulp_close(a, b, max_ulp=4):
    """f32 arrays equal within max_ulp units in the last place."""
    ai = a.view(np.int32).astype(np.int64)
    bi = b.view(np.int32).astype(np.int64)
    # Map to monotonic integer space (sign-magnitude -> offset binary).
    ai = np.where(ai < 0, np.int64(-0x80000000) - ai, ai)
    bi = np.where(bi < 0, np.int64(-0x80000000) - bi, bi)
    ulp = np.abs(ai - bi)
    assert ulp.max() <= max_ulp, f"max ulp diff {ulp.max()}"


def assert_setup_parity(flat, matrices, width, height):
    """Setup parity contract (docs/RASTER_SPEC.md §5): integer coverage data
    bit-exact (rounding barriers in ops/geometry.py pin every mul+add);
    f32 interpolation constants within 4 ulp — XLA's `1/x` is a reciprocal
    refinement that is 1 ulp off IEEE on ~25% of inputs (chained divides
    compound to a few ulp), irreducible without a software-emulated
    divide."""
    ti_np, tf_np = _setup_np(flat, matrices, width, height)
    ti_jx, tf_jx = _setup_jax(flat, matrices, width, height)
    np.testing.assert_array_equal(ti_np, ti_jx)
    _assert_ulp_close(tf_np, tf_jx, max_ulp=4)
    return ti_np, tf_np


def assert_image_parity(scene, mesh_data, width, height, min_coverage=0.01):
    flat, matrices = _prepare(scene, mesh_data, width, height)
    ti, tf = assert_setup_parity(flat, matrices, width, height)

    img_cpu, depth_cpu = raster_cpu.rasterize_setup(ti, tf, width, height)
    u8_cpu = raster_cpu.pack_u8(img_cpu)

    u8_jax, depth_jax = raster_xla.render_setup_jit(ti, tf, width, height)
    u8_jax = np.asarray(u8_jax)
    depth_jax = np.asarray(depth_jax)

    coverage = (depth_cpu < 1.0).mean()
    assert coverage > min_coverage, "scene unexpectedly empty"
    # Raster parity given shared setup (docs/RASTER_SPEC.md §5): coverage
    # masks identical; f32 interpolation within the backend's FMA slack
    # (XLA:CPU contracts mul+add inside fused loops and no barrier/flag
    # stops it; Mosaic-on-TPU is verified bit-exact separately).
    np.testing.assert_array_equal(depth_cpu < 1.0, depth_jax < 1.0)
    np.testing.assert_allclose(depth_jax, depth_cpu, atol=1e-6, rtol=1e-6)
    diff = np.abs(u8_cpu.astype(np.int32) - u8_jax.astype(np.int32))
    assert diff.max() <= 1, f"u8 differs by more than 1 LSB ({diff.max()})"
    return u8_cpu, coverage


def test_parity_test_scene_256():
    scene, mesh_data = make_test_scene()
    img, cov = assert_image_parity(scene, mesh_data, 256, 256)
    assert 0.3 < cov < 0.9


def test_parity_test_scene_nonsquare():
    scene, mesh_data = make_test_scene()
    assert_image_parity(scene, mesh_data, 320, 192)


def test_parity_reference_scene():
    import os

    if not os.path.exists("/root/reference/zrenderer/content/scenes/test.gltf"):
        pytest.skip("reference assets not mounted")
    from zrenderer_tpu.tools.gltf_converter import convert_gltf_scene

    scene, mesh_data = convert_gltf_scene(
        "/root/reference/zrenderer/content/scenes/test.gltf"
    )
    img, cov = assert_image_parity(scene, mesh_data, 256, 144)
    assert cov > 0.2


def test_parity_triangle_soup():
    scene, mesh_data = make_triangle_soup(120, seed=3)
    assert_image_parity(scene, mesh_data, 192, 128)


def test_parity_soup_with_near_clipping():
    # Push a fraction of triangles behind/through the camera plane to
    # exercise the Sutherland-Hodgman near/guard clipper.
    scene, mesh_data = make_triangle_soup(
        150, seed=11, extent=10.0, behind_camera_fraction=0.4
    )
    assert_image_parity(scene, mesh_data, 160, 120, min_coverage=0.005)


def test_parity_huge_triangles_guard_band():
    # Triangles far larger than the viewport: guard-band clipping must keep
    # integer coverage exact.
    scene, mesh_data = make_triangle_soup(24, seed=5, extent=1.0)
    md = mesh_data
    verts = md.vertex_data.reshape(-1, 16)
    verts[:, 0:2] *= 40.0  # huge in x/y
    md.vertex_data = verts.reshape(-1)
    assert_image_parity(scene, md, 128, 96, min_coverage=0.01)


def test_degenerate_and_padding_triangles_ignored():
    scene, mesh_data = make_test_scene()
    flat, matrices = _prepare(scene, mesh_data, 64, 64)
    ti, tf = _setup_np(flat, matrices, 64, 64)
    # Padding triangles (index 0,0,0) must be culled in setup.
    n_valid = int(ti[:, g.I_VALID].sum())
    assert n_valid <= flat.num_triangles
    img, depth = raster_cpu.rasterize_setup(ti, tf, 64, 64)
    assert np.isfinite(img).all()


def test_depth_tie_first_triangle_wins():
    # Two identical triangles with different colors: the first submitted must
    # win everywhere (strict LESS + submission order).
    from zrenderer_tpu.scene.mesh import MeshData, make_vertex
    from zrenderer_tpu.scene.scene import Camera, Node, Scene
    from zrenderer_tpu.math import zmath as zm

    tri = [(-1, -1, 0), (1, -1, 0), (0, 1, 0)]
    verts = []
    for color in [(1, 0, 0, 1), (0, 1, 0, 1)]:
        for p in tri:
            verts.append(make_vertex(p, color=color))
    md = MeshData()
    md.append_mesh(np.stack(verts), np.arange(6, dtype=np.uint32))
    sc = Scene()
    sc.nodes.append(Node(mesh_indices=[0], transform_index=0, name="t"))
    sc.transforms.append(zm.identity())
    sc.cameras.append(
        Camera(position=np.array([0, 0, 3], np.float32),
               forward=np.array([0, 0, -1], np.float32),
               yfov=1.0, znear=0.1, zfar=100.0)
    )
    img, cov = assert_image_parity(sc, md, 96, 96, min_coverage=0.05)
    covered = img[..., 3] == 255
    drawn = img[covered & (img[..., 0:3].sum(axis=-1) > 0)]
    assert (drawn[:, 0] == 255).all() and (drawn[:, 1] == 0).all()


def test_parity_wide_viewport_adaptive_guard():
    # 2560-wide viewport exercises the shrunken guard band (docs spec §2).
    scene, mesh_data = make_test_scene()
    flat, matrices = _prepare(scene, mesh_data, 2560, 128)
    ti, tf = assert_setup_parity(flat, matrices, 2560, 128)
    img_cpu, depth_cpu = raster_cpu.rasterize_setup(ti, tf, 2560, 128)
    assert (depth_cpu < 1.0).mean() > 0.02  # scene is small at 20:1 aspect
    assert np.isfinite(img_cpu).all()


def test_ssaa_resolve_matches_manual_box_filter():
    """RenderConfig(supersample=2): the flat frame renders at 2x and
    box-resolves (the MSAA-capable-pass analog, docs/QUIRKS.md #11).
    The resolved frame must equal the manual resolve of the 2x render,
    and must differ from the 1x render (it actually anti-aliases)."""
    from zrenderer_tpu.engine.config import RenderConfig
    from zrenderer_tpu.engine.renderer import Renderer
    from zrenderer_tpu.scene.procedural import make_test_scene

    W, H = 96, 64
    scene, md = make_test_scene()
    r2 = Renderer(RenderConfig(width=W, height=H, backend="xla",
                               tri_align=64, supersample=2))
    r2.load_scene(scene, md)
    img2, depth2 = r2.render_and_read()
    assert img2.shape == (H, W, 4) and depth2.shape == (H, W)

    r1 = Renderer(RenderConfig(width=W, height=H, backend="xla",
                               tri_align=64))
    r1.load_scene(scene, md)
    img1, _ = r1.render_and_read()
    assert not np.array_equal(img1, img2)  # edges are anti-aliased

    rbig = Renderer(RenderConfig(width=2 * W, height=2 * H, backend="xla",
                                 tri_align=64))
    rbig.load_scene(scene, md)
    big, bigd = rbig.render_and_read()
    c = big.astype(np.uint32).reshape(H, 2, W, 2, 4).sum(axis=(1, 3))
    manual = ((c + 2) // 4).astype(np.uint8)
    np.testing.assert_array_equal(img2, manual)
    np.testing.assert_array_equal(
        depth2, np.asarray(bigd).reshape(H, 2, W, 2).min(axis=(1, 3)))
