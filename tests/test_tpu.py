"""Hardware (real-TPU) test subset — VERDICT r1 item 10.

Run on a TPU host with:

    ZRENDERER_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

Covers compiled-mode (non-interpret) Mosaic kernels against the CPU oracle:
the flat Pallas raster, the band kernel, the G-buffer + lit/deferred
pipelines, and the overlay pass.  Small frames keep tunnel readbacks cheap;
each test is one compile (~20-60 s through the axon tunnel).
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.tpu

W, H = 256, 64  # tile-multiple frame, small readbacks


@pytest.fixture(scope="module")
def on_tpu():
    if jax.devices()[0].platform != "tpu":
        pytest.skip("not on a TPU host")
    return jax.devices()[0]


@pytest.fixture(scope="module")
def scene_inputs():
    from zrenderer_tpu.engine.upload import flatten_scene
    from zrenderer_tpu.ops import geometry as g
    from zrenderer_tpu.scene.procedural import make_test_scene

    scene, mesh_data = make_test_scene()
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=64)
    vp = g.view_proj_from_camera(scene.active_camera, W, H)
    matrices = np.einsum(
        "nij,jk->nik", flat.node_to_world, vp
    ).astype(np.float32)
    return scene, mesh_data, flat, matrices


def test_pallas_compiled_matches_oracle(on_tpu, scene_inputs):
    """Compiled (non-interpret) Mosaic raster vs the CPU oracle — the
    pixel-exactness north star on real hardware."""
    import jax.numpy as jnp

    from zrenderer_tpu.ops import geometry as g
    from zrenderer_tpu.ops import raster_pallas as rp
    from zrenderer_tpu.raster_ref.raster_cpu import rasterize_setup

    scene, mesh_data, flat, matrices = scene_inputs
    ti, tf = g.geometry_pipeline(
        np, flat.positions, flat.attrs, flat.tri_vidx, matrices,
        flat.vert_node, W, H,
    )
    color, depth = rp.rasterize_setup_pallas(
        jnp.asarray(ti), jnp.asarray(tf), W, H
    )
    img_tpu = np.asarray(rp.unpack_rgba8(color))
    depth_tpu = np.asarray(depth)

    rgba_cpu, depth_cpu = rasterize_setup(ti, tf, W, H)
    img_cpu = np.floor(np.clip(rgba_cpu, 0, 1) * 255.0 + 0.5).astype(np.uint8)
    assert (depth_cpu < 1).mean() > 0.1
    np.testing.assert_array_equal(depth_tpu, depth_cpu)
    np.testing.assert_array_equal(img_tpu, img_cpu)


def test_band_kernel_compiled(on_tpu, scene_inputs):
    """The multi-chip band kernel compiled on hardware, band == full-frame
    crop."""
    import jax.numpy as jnp

    from zrenderer_tpu.ops import geometry as g
    from zrenderer_tpu.ops import raster_pallas as rp

    scene, mesh_data, flat, matrices = scene_inputs
    ti, tf = g.geometry_pipeline(
        np, flat.positions, flat.attrs, flat.tri_vidx, matrices,
        flat.vert_node, W, H,
    )
    full_c, full_d = rp.rasterize_setup_pallas(
        jnp.asarray(ti), jnp.asarray(tf), W, H
    )
    band_c, band_d = rp.rasterize_setup_pallas_band(
        jnp.asarray(ti), jnp.asarray(tf), W, 32, 32
    )
    np.testing.assert_array_equal(np.asarray(band_d), np.asarray(full_d)[32:64])
    np.testing.assert_array_equal(np.asarray(band_c), np.asarray(full_c)[32:64])


def test_lit_and_deferred_pipelines_compiled(on_tpu):
    """One lit and one deferred frame (materials + textures) through the
    Renderer on hardware."""
    from zrenderer_tpu.engine.config import RenderConfig
    from zrenderer_tpu.engine.renderer import Renderer
    from zrenderer_tpu.engine.textures import Texture, checkerboard
    from zrenderer_tpu.scene.procedural import make_material_scene

    scene, mesh_data = make_material_scene()
    red = Texture.from_array(checkerboard(64, color_a=(1, 0.2, 0.2)))
    blue = Texture.from_array(checkerboard(64, color_a=(0.2, 0.2, 1.0)))

    r = Renderer(RenderConfig(width=W, height=H, backend="pallas",
                              pipeline="lit", tri_align=64))
    r.load_scene(scene, mesh_data)
    r.set_environment(textures=[red, blue], material_textures=[0, 1])
    img, depth = r.render_and_read()
    cov = depth < 1.0
    assert cov.mean() > 0.05
    half = W // 2
    left = img[:, :half, :3][cov[:, :half]].mean(axis=0)
    right = img[:, half:, :3][cov[:, half:]].mean(axis=0)
    assert left[0] > left[2]  # red texture left
    assert right[2] > right[0]  # blue texture right

    rd = Renderer(RenderConfig(width=W, height=H, backend="pallas",
                               pipeline="deferred", tri_align=64))
    rd.load_scene(scene, mesh_data)
    rd.set_environment(lights=(np.array([[0.0, 0.0, 6.0]], np.float32),
                               np.array([[6.0, 6.0, 6.0]], np.float32)))
    img_d, depth_d = rd.render_and_read()
    covd = depth_d < 1.0
    # Emissive green cube on the right.
    right_g = img_d[:, half:, 1][covd[:, half:]].mean()
    right_r = img_d[:, half:, 0][covd[:, half:]].mean()
    assert right_g > right_r


def test_overlay_pass_compiled(on_tpu):
    """The layered overlay kernel compiled on hardware vs the CPU
    compositor oracle."""
    import jax.numpy as jnp

    from zrenderer_tpu.app.draw_list import DrawList
    from zrenderer_tpu.app.font import UIAtlas
    from zrenderer_tpu.ops import overlay_raster as ov
    from zrenderer_tpu.raster_ref.overlay_cpu import composite_overlay_cpu

    atlas = UIAtlas()
    rng = np.random.default_rng(7)
    frame = rng.integers(0, 255, (H, W, 4), np.uint8)
    dl = DrawList(W, H, atlas)
    dl.add_rect_filled(8, 8, 120, 48, (0.1, 0.1, 0.3, 0.8))
    dl.add_quad_filled((60, 10), (110, 20), (100, 55), (50, 45),
                       (1.0, 1.0, 0.2, 0.7),
                       uvs=[(0, 0), (0.5, 0), (0.5, 0.5), (0, 0.5)])
    dl.push_clip_rect(12, 12, 100, 40)
    dl.add_text(14, 14, "TPU OK", (0.0, 0.9, 0.0, 1.0))
    dl.pop_clip_rect()

    verts, scissors = dl.build()
    expect, count = composite_overlay_cpu(
        frame, verts, scissors, atlas.data, return_count=True
    )
    ti, tf = dl.setup()
    got = np.asarray(ov.overlay_pass(
        jnp.asarray(frame), jnp.asarray(ti), jnp.asarray(tf),
        atlas.packed_u32, "pallas",
    ))
    diff = np.abs(got.astype(np.int32) - expect.astype(np.int32))
    assert (diff <= np.maximum(count, 1)[..., None]).all(), diff.max()


def test_many_light_deferred_matches_xla_reference(on_tpu):
    """256-light deferred on hardware vs the XLA reference shade (<= 2 LSB).

    Regression test for two real on-chip bugs caught in round 2: the
    default-precision einsums in reconstruct_world_pos / shadow clip ran
    bf16 on the MXU (up to 252 u8 divergence), and kernel timings hid it
    because axon's block_until_ready does not wait for device execution.
    """
    from zrenderer_tpu.engine.config import RenderConfig
    from zrenderer_tpu.engine.renderer import Renderer
    from zrenderer_tpu.scene.scene import Scene
    from zrenderer_tpu.scene.mesh import MeshData
    import os

    here = os.path.join(os.path.dirname(__file__), "..")
    sd = os.path.join(here, "content", "scenes", "test_scene")
    scene = Scene.load(os.path.join(sd, "scene.bin"))
    md = MeshData.load(os.path.join(sd, "meshes.bin"))
    rng = np.random.default_rng(3)
    pos = rng.uniform([-6, 0.5, -6], [6, 6, 6], (256, 3)).astype(np.float32)
    col = rng.uniform(0.1, 1.0, (256, 3)).astype(np.float32)

    imgs = {}
    for backend in ("pallas", "xla"):
        r = Renderer(RenderConfig(width=W, height=H, pipeline="deferred",
                                  backend=backend, tri_align=64))
        r.load_scene(scene, md)
        r.set_environment(lights=(pos, col))
        img, _ = r.render_and_read()
        imgs[backend] = img.astype(np.int32)
    d = np.abs(imgs["pallas"] - imgs["xla"])
    assert d.max() <= 2, (d.max(), (d > 2).mean())


def test_small_binned_kernels_compiled_match_hierarchy(on_tpu, scene_inputs):
    """Compiled small-scene per-tile-list kernels (sort-free prep,
    local_lists blocks) are bit-identical to the hierarchy kernels on
    hardware — flat, G-buffer (all 13 planes), and depth-only."""
    import jax.numpy as jnp

    from zrenderer_tpu.ops import geometry as g
    from zrenderer_tpu.ops import raster_pallas as rp

    scene, mesh_data, flat, matrices = scene_inputs
    ti, tf = g.geometry_pipeline(
        np, flat.positions, flat.attrs, flat.tri_vidx, matrices,
        flat.vert_node, W, H,
    )
    ti, tf = jnp.asarray(ti), jnp.asarray(tf)

    ch, dh = rp.rasterize_setup_pallas(ti, tf, W, H)
    cs, ds = rp.rasterize_setup_pallas_small(ti, tf, W, H)
    np.testing.assert_array_equal(np.asarray(ch), np.asarray(cs))
    np.testing.assert_array_equal(
        np.asarray(dh).view(np.uint32), np.asarray(ds).view(np.uint32)
    )

    gh = rp.rasterize_gbuffer_pallas(ti, tf, W, H)
    gs = rp.rasterize_gbuffer_pallas_small(ti, tf, W, H)
    for a, b in zip(gh, gs):
        np.testing.assert_array_equal(
            np.asarray(a).view(np.uint32), np.asarray(b).view(np.uint32)
        )

    zh = rp.rasterize_depth_pallas(ti, tf, W, H)
    zs = rp.rasterize_depth_pallas_small(ti, tf, W, H)
    np.testing.assert_array_equal(
        np.asarray(zh).view(np.uint32), np.asarray(zs).view(np.uint32)
    )


def test_sharded_pallas_band_compiled_matches_single_device(on_tpu,
                                                            scene_inputs):
    """The production Pallas band kernel under shard_map on a REAL device
    mesh (1 chip reachable): the Mosaic kernel compiles and executes inside
    the sharded frame step and its output is bit-equal to the single-device
    Pallas frame (VERDICT r2 weak #3 — sharded Pallas had never executed
    compiled before this test)."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from zrenderer_tpu.ops import geometry as g
    from zrenderer_tpu.ops import raster_pallas as rp
    from zrenderer_tpu.parallel.tiles import make_sharded_frame

    _, _, flat, matrices = scene_inputs
    mesh = Mesh(np.array(jax.devices()[:1]), ("tiles",))
    frame_fn, shard_inputs = make_sharded_frame(mesh, W, H, use_pallas=True)
    args = shard_inputs(
        flat.positions, flat.attrs, flat.tri_vidx, matrices, flat.vert_node
    )
    rgba_sh, depth_sh = frame_fn(*args)
    rgba_sh = np.asarray(rgba_sh)
    depth_sh = np.asarray(depth_sh)

    ti, tf = g.geometry_pipeline(
        jnp, flat.positions, flat.attrs, flat.tri_vidx,
        jnp.asarray(matrices), flat.vert_node, W, H,
    )
    color_1, depth_1 = jax.jit(
        lambda a, b: rp.rasterize_setup_pallas(a, b, W, H)
    )(ti, tf)
    rgba_1 = np.asarray(rp.unpack_rgba8(color_1))
    assert (np.asarray(depth_1) < 1).mean() > 0.2
    np.testing.assert_array_equal(depth_sh.view(np.uint32),
                                  np.asarray(depth_1).view(np.uint32))
    np.testing.assert_array_equal(rgba_sh, rgba_1)
