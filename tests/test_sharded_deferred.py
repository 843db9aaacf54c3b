"""Multi-chip deferred pipeline (VERDICT r4 #5): band-sharded G-buffer
raster + per-band tiled light culling + GGX, bit-equal to the
single-device deferred renderer on the virtual CPU mesh."""

import numpy as np
import pytest

import jax

from zrenderer_tpu.engine.config import RenderConfig
from zrenderer_tpu.engine.renderer import Renderer
from zrenderer_tpu.parallel.tiles import make_sharded_deferred_frame
from zrenderer_tpu.scene.procedural import make_test_scene

pytestmark = [
    pytest.mark.skipif(
        len(jax.devices()) < 8, reason="needs 8 virtual devices"
    ),
    pytest.mark.slow,  # heavyweight; excluded from the smoke tier
]

W, H = 128, 64


def _deferred_setup(n_lights=8):
    scene, md = make_test_scene()
    r = Renderer(RenderConfig(width=W, height=H, pipeline="deferred",
                              backend="pallas", debug=True, tri_align=64))
    r.load_scene(scene, md)
    rng = np.random.default_rng(3)
    pos = rng.uniform(-4, 4, (n_lights, 3)).astype(np.float32)
    pos[:, 1] = np.abs(pos[:, 1]) + 1.0
    col = rng.uniform(0.2, 3.0, (n_lights, 3)).astype(np.float32)
    r.set_environment(lights=(pos, col))
    return r


def test_sharded_deferred_matches_single_device():
    from jax.sharding import Mesh

    r = _deferred_setup()
    img_ref, depth_ref = r.render_and_read()
    c = r._lit_constants()
    b = r._buffers()

    mesh = Mesh(np.array(jax.devices()[:2]), ("tiles",))
    frame_fn, shard_inputs = make_sharded_deferred_frame(
        mesh, W, H, use_pallas="interpret"
    )
    args = shard_inputs(
        b["positions"], b["attrs"], b["tri_vidx"], c["matrices"],
        b["vert_node"], c["normal_mats"], b["materials"],
        c["inv_view_proj"], c["cam_pos"], r.lights[0], r.lights[1],
        c["view_proj"],
    )
    rgba_sh, depth_sh = frame_fn(*args)
    assert (np.asarray(depth_ref) < 1).mean() > 0.2
    np.testing.assert_array_equal(
        np.asarray(depth_sh).view(np.uint32),
        np.asarray(depth_ref).view(np.uint32),
    )
    np.testing.assert_array_equal(np.asarray(rgba_sh), np.asarray(img_ref))


def test_sharded_deferred_output_is_band_sharded():
    from jax.sharding import Mesh

    r = _deferred_setup(n_lights=4)
    c = r._lit_constants()
    b = r._buffers()
    # 2 devices: 32-row bands need band_h >= TILE_H at H=64.
    mesh = Mesh(np.array(jax.devices()[:2]), ("tiles",))
    frame_fn, shard_inputs = make_sharded_deferred_frame(
        mesh, W, H, use_pallas="interpret"
    )
    args = shard_inputs(
        b["positions"], b["attrs"], b["tri_vidx"], c["matrices"],
        b["vert_node"], c["normal_mats"], b["materials"],
        c["inv_view_proj"], c["cam_pos"], r.lights[0], r.lights[1],
        c["view_proj"],
    )
    rgba, depth = frame_fn(*args)
    assert len(rgba.sharding.device_set) == 2
    assert rgba.shape == (H, W, 4) and depth.shape == (H, W)
