"""Shading model + lit pipeline tests (configs 1-3) on the CPU backend."""

import numpy as np
import pytest

import jax.numpy as jnp

from zrenderer_tpu.engine.config import RenderConfig
from zrenderer_tpu.engine.renderer import Renderer
from zrenderer_tpu.engine.textures import Texture, checkerboard
from zrenderer_tpu.math import zmath as zm
from zrenderer_tpu.ops import geometry as g
from zrenderer_tpu.ops import shading
from zrenderer_tpu.scene.procedural import make_test_scene
from zrenderer_tpu.scene.scene import Camera


def test_reconstruct_world_pos_roundtrip():
    cam = Camera(
        position=np.array([1.0, 2.0, 8.0], np.float32),
        forward=np.array([0, 0, -1], np.float32),
        yfov=0.8, znear=0.5, zfar=50.0,
    )
    W, H = 64, 32
    vp = g.view_proj_from_camera(cam, W, H)
    world = np.array([0.8, 1.5, -3.0, 1.0], np.float32)
    clip = world @ vp
    ndc = clip[:3] / clip[3]
    depth = jnp.full((H, W), ndc[2], jnp.float32)
    recon = np.asarray(
        shading.reconstruct_world_pos(
            depth,
            jnp.asarray(np.linalg.inv(vp.astype(np.float64)).astype(np.float32)),
            W, H,
        )
    )
    # True invariant: every reconstructed point projects back to its own
    # pixel center at the given depth.
    i, j = 10, 40
    back = np.concatenate([recon[i, j], [1.0]]).astype(np.float32) @ vp
    bndc = back[:3] / back[3]
    # f32 projective roundtrip: ~1e-3 ndc error near the far plane is
    # inherent (the same reconstruction precision hardware deferred
    # renderers accept).
    assert bndc[0] == pytest.approx((j + 0.5) * 2 / W - 1, abs=2e-3)
    assert bndc[1] == pytest.approx(1 - (i + 0.5) * 2 / H, abs=2e-3)
    assert bndc[2] == pytest.approx(ndc[2], abs=2e-3)


def test_blinn_phong_direction_response():
    shape = (1, 2, 3)
    albedo = jnp.ones(shape, jnp.float32)
    normal = jnp.asarray([[[0, 0, 1.0], [0, 0, -1.0]]], jnp.float32)
    world = jnp.zeros(shape, jnp.float32)
    out = np.asarray(
        shading.blinn_phong(
            albedo, normal, world,
            cam_pos=jnp.asarray([0, 0, 5.0]),
            light_pos=jnp.asarray([0, 0, 4.0]),
            light_color=jnp.asarray([1.0, 1.0, 1.0]),
        )
    )
    facing, away = out[0, 0], out[0, 1]
    assert facing[0] > 3 * away[0]  # facing the light is much brighter
    assert away[0] == pytest.approx(0.08, abs=1e-5)  # ambient only


def test_ggx_many_lights_shapes_and_positivity():
    H, W, L = 8, 16, 64
    rng = np.random.default_rng(0)
    albedo = jnp.full((H, W, 3), 0.5, jnp.float32)
    normal = jnp.asarray(
        np.tile([0, 0, 1.0], (H, W, 1)).astype(np.float32)
    )
    world = jnp.zeros((H, W, 3), jnp.float32)
    lights = jnp.asarray(rng.uniform(-3, 3, (L, 3)).astype(np.float32) + [0, 0, 5])
    colors = jnp.full((L, 3), 0.05, jnp.float32)
    out = np.asarray(
        shading.ggx_shade_many_lights(
            albedo, normal, world, jnp.asarray([0, 0, 5.0]), lights, colors,
            roughness=0.4, chunk=32,
        )
    )
    assert out.shape == (H, W, 3)
    assert (out > 0).all() and np.isfinite(out).all()


def test_pcf_shadow_occlusion():
    # Shadow map: everything at depth 0.3 (an occluder plane).
    sm = jnp.full((64, 64), 0.3, jnp.float32)
    light_vp = jnp.asarray(
        zm.mul(
            zm.look_at_rh(zm.vec3(0, 10, 0), zm.vec3(0, 0, 0), zm.f32x4(0, 0, -1, 0)),
            zm.orthographic_rh(20, 20, 0.1, 30),
        )
    )
    # A point far below the occluder depth is shadowed; one near the light
    # (depth < occluder) is lit.
    world = jnp.asarray(
        [[[0.0, 0.5, 0.0], [0.0, 9.0, 0.0]]], jnp.float32
    )  # y=0.5 deep, y=9 close
    lit = np.asarray(shading.shadow_factor_pcf(sm, world, light_vp))
    assert lit[0, 0] == pytest.approx(0.0, abs=1e-6)
    assert lit[0, 1] == pytest.approx(1.0, abs=1e-6)


# -- end-to-end lit pipelines (CPU/XLA backend) --------------------------------


def _renderer(pipeline, **env):
    config = RenderConfig(width=128, height=96, backend="xla",
                          pipeline=pipeline, tri_align=64, shadow_size=128)
    r = Renderer(config)
    scene, mesh_data = make_test_scene()
    r.load_scene(scene, mesh_data)
    r.set_environment(**env)
    return r


def test_lit_pipeline_end_to_end():
    tex = Texture.from_array(checkerboard(64))
    r = _renderer("lit", texture=tex, light_pos=(2.0, 6.0, 8.0))
    img, depth = r.render_and_read()
    assert img.shape == (96, 128, 4)
    cov = depth < 1.0
    assert 0.2 < cov.mean() < 0.9
    lum = img[..., :3].astype(np.int32).sum(axis=-1)
    # Lighting creates variation across covered pixels beyond flat colors.
    assert lum[cov].std() > 10
    assert (img[~cov][:, :3] == 0).all()  # background stays clear


def test_deferred_pipeline_256_lights():
    rng = np.random.default_rng(1)
    lights = (
        rng.uniform(-6, 6, (256, 3)).astype(np.float32) + [0, 4, 6],
        np.full((256, 3), 0.06, np.float32),
    )
    r = _renderer("deferred", lights=lights)
    img, depth = r.render_and_read()
    cov = depth < 1.0
    assert img[cov][:, :3].max() > 30  # lights actually illuminate
    assert np.isfinite(depth).all()


def test_shadowed_pipeline_end_to_end():
    tex = Texture.from_array(checkerboard(64))
    r = _renderer("shadowed", texture=tex, light_dir=(-0.3, -1.0, -0.2))
    img, depth = r.render_and_read()
    cov = depth < 1.0
    assert cov.mean() > 0.2
    # The second cube shadows the scene partially: some covered pixels are
    # ambient-only dark while others are lit.
    lum = img[..., :3].astype(np.int32).sum(axis=-1)[cov]
    assert lum.max() > 2 * max(lum.min(), 1)
    # The shadow map itself contains scene depth.
    sm = np.asarray(r._shadow_map)
    assert (sm < 1.0).mean() > 0.05


def test_shadow_lookup_stride_close_to_exact():
    """stride=2 PCF (quarter the gathers + bilinear upsample) stays close
    to the exact per-pixel path on smooth geometry."""
    import jax.numpy as jnp
    from zrenderer_tpu.math import zmath as zm

    rng = np.random.default_rng(5)
    sh = 64
    shadow_depth = jnp.asarray(
        np.clip(rng.normal(0.5, 0.1, (sh, sh)), 0, 1).astype(np.float32))
    h, w = 64, 128
    # A smooth world-position field (a tilted plane).
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    world = np.stack([xs / w * 4 - 2, ys / h * 4 - 2,
                      0.1 * xs / w + 0.05 * ys / h], axis=-1)
    world = jnp.asarray(world)
    view = zm.look_at_rh(zm.vec3(0, 0, 6), zm.vec3(0, 0, 0), zm.vec3(0, 1, 0))
    proj = zm.orthographic_rh(8.0, 8.0, 0.1, 20.0)
    lvp = jnp.asarray(zm.mul(view, proj))
    exact = np.asarray(shading.shadow_factor_pcf_strided(
        shadow_depth, world, lvp, stride=1))
    approx = np.asarray(shading.shadow_factor_pcf_strided(
        shadow_depth, world, lvp, stride=2))
    assert approx.shape == exact.shape
    # Lit fractions agree on average; local error bounded by the blur.
    assert abs(approx.mean() - exact.mean()) < 0.05
    assert np.abs(approx - exact).mean() < 0.15


def test_shadowed_pipeline_stride_config_runs():
    from zrenderer_tpu.engine.config import RenderConfig
    from zrenderer_tpu.engine.renderer import Renderer
    from zrenderer_tpu.scene.procedural import make_test_scene

    scene, md = make_test_scene()
    r = Renderer(RenderConfig(width=128, height=64, pipeline="shadowed",
                              tri_align=64, shadow_size=128,
                              shadow_lookup_stride=2))
    r.load_scene(scene, md)
    img, depth = r.render_and_read()
    assert (depth < 1.0).mean() > 0.05
