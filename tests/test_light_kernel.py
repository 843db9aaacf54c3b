"""Tiled deferred-lighting kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from zrenderer_tpu.math import zmath as zm
from zrenderer_tpu.ops.light_kernel import (
    TILE_H,
    TILE_W,
    light_screen_bounds,
    tiled_deferred_lighting,
)

import pytest

pytestmark = pytest.mark.slow  # heavyweight; excluded from the smoke tier


def _vp(width, height):
    view = zm.look_at_rh(zm.vec3(0, 0, 10), zm.vec3(0, 0, 0), zm.vec3(0, 1, 0))
    proj = zm.perspective_fov_rh(0.8, width / height, 0.1, 100.0)
    return jnp.asarray(zm.mul(view, proj))


def test_light_screen_bounds_center_light():
    vp = _vp(128, 64)
    pos = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    col = jnp.asarray([[0.5, 0.5, 0.5]], jnp.float32)
    b = np.asarray(light_screen_bounds(pos, col, vp, 128, 64))
    jmin, jmax, imin, imax = b[0]
    # A light at the view center must cover the screen center.
    assert jmin <= 64 <= jmax and imin <= 32 <= imax
    assert 0 <= jmin <= jmax <= 127 and 0 <= imin <= imax <= 63


def test_light_behind_camera_is_conservative():
    vp = _vp(128, 64)
    pos = jnp.asarray([[0.0, 0.0, 20.0]], jnp.float32)  # behind the eye
    col = jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32)
    b = np.asarray(light_screen_bounds(pos, col, vp, 128, 64))
    assert (b[0] == [0, 127, 0, 63]).all()  # full screen


def test_tiled_lighting_interpret_basic():
    h, w = TILE_H, TILE_W
    albedo = jnp.full((h, w, 3), 0.5, jnp.float32)
    normal = jnp.asarray(np.tile([0, 0, 1.0], (h, w, 1)).astype(np.float32))
    world = jnp.zeros((h, w, 3), jnp.float32)
    covered = jnp.ones((h, w), bool)
    lights = jnp.asarray([[0.0, 0.0, 3.0]], jnp.float32)
    colors = jnp.asarray([[4.0, 0.0, 0.0]], jnp.float32)
    vp = _vp(w, h)
    rgb = np.asarray(
        tiled_deferred_lighting(
            albedo, normal, world, covered,
            jnp.asarray([0.0, 0.0, 5.0]), lights, colors, vp,
            interpret=True,
        )
    )
    assert rgb.shape == (h, w, 3)
    # Red light head-on: red channel lit well above ambient, green near ambient.
    assert rgb[:, :, 0].max() > 0.1  # GGX diffuse: albedo/pi * N.L * rad
    assert rgb[:, :, 1].max() < 0.05
    # Uncovered pixels are zeroed.
    covered2 = covered.at[0, 0].set(False)
    rgb2 = np.asarray(
        tiled_deferred_lighting(
            albedo, normal, world, covered2,
            jnp.asarray([0.0, 0.0, 5.0]), lights, colors, vp,
            interpret=True,
        )
    )
    assert (rgb2[0, 0] == 0).all()


def test_culled_light_does_not_contribute():
    h, w = TILE_H, TILE_W
    albedo = jnp.full((h, w, 3), 0.5, jnp.float32)
    normal = jnp.asarray(np.tile([0, 0, 1.0], (h, w, 1)).astype(np.float32))
    world = jnp.zeros((h, w, 3), jnp.float32)
    covered = jnp.ones((h, w), bool)
    # A dim light far off-screen to the right: its bbox misses the only tile.
    lights = jnp.asarray([[500.0, 0.0, 0.0]], jnp.float32)
    colors = jnp.asarray([[0.01, 0.01, 0.01]], jnp.float32)
    vp = _vp(w, h)
    rgb = np.asarray(
        tiled_deferred_lighting(
            albedo, normal, world, covered,
            jnp.asarray([0.0, 0.0, 5.0]), lights, colors, vp,
            ambient=0.03, interpret=True,
        )
    )
    # Ambient only.
    np.testing.assert_allclose(rgb, 0.03 * 0.5, atol=1e-5)


def test_bf16_planes_close_to_f32():
    """The bf16-plane experiment stays visually indistinguishable: output
    within ~1% of the f32 path (bf16 has ~3 decimal digits; the BRDF math
    itself remains f32)."""
    rng = np.random.default_rng(11)
    h, w = TILE_H, TILE_W * 2
    albedo = jnp.asarray(rng.uniform(0.1, 1.0, (h, w, 3)).astype(np.float32))
    n = rng.normal(size=(h, w, 3)).astype(np.float32)
    n[..., 2] = np.abs(n[..., 2]) + 0.5
    normal = jnp.asarray(n / np.linalg.norm(n, axis=-1, keepdims=True))
    world = jnp.asarray(rng.uniform(-2, 2, (h, w, 3)).astype(np.float32))
    covered = jnp.ones((h, w), bool)
    lights = jnp.asarray(rng.uniform(-3, 3, (8, 3)).astype(np.float32) +
                         np.array([0, 0, 4], np.float32))
    colors = jnp.asarray(rng.uniform(0.2, 2.0, (8, 3)).astype(np.float32))
    vp = _vp(w, h)
    cam = jnp.asarray([0.0, 0.0, 8.0])
    kw = dict(interpret=True)
    rgb32 = np.asarray(tiled_deferred_lighting(
        albedo, normal, world, covered, cam, lights, colors, vp, **kw))
    rgb16 = np.asarray(tiled_deferred_lighting(
        albedo, normal, world, covered, cam, lights, colors, vp,
        plane_dtype=jnp.bfloat16, **kw))
    assert rgb16.dtype == np.float32  # output stays f32
    denom = np.maximum(np.abs(rgb32), 0.05)
    rel = np.abs(rgb16 - rgb32) / denom
    assert rel.max() < 0.15, rel.max()  # worst-case pixel
    assert rel.mean() < 0.01, rel.mean()  # visually identical on average


def test_renderer_bf16_config_runs():
    """RenderConfig(lighting_planes='bf16') renders a deferred frame whose
    u8 image is within 2 LSB of the f32 config (CPU uses the XLA shade for
    both — the knob only affects the pallas backend — so this exercises
    config plumbing + cache keying, and the kernels match in interpret)."""
    from zrenderer_tpu.engine.config import RenderConfig
    from zrenderer_tpu.engine.renderer import Renderer
    from zrenderer_tpu.scene.procedural import make_test_scene

    scene, md = make_test_scene()
    imgs = []
    for planes in ("f32", "bf16"):
        r = Renderer(RenderConfig(width=128, height=64, pipeline="deferred",
                                  backend="pallas", debug=True,
                                  tri_align=64, lighting_planes=planes))
        r.load_scene(scene, md)
        img, _ = r.render_and_read()
        imgs.append(img.astype(np.int32))
    diff = np.abs(imgs[0] - imgs[1])
    assert diff.max() <= 2, diff.max()
