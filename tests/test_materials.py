"""Material system end-to-end: per-draw materials + per-material textures
consumed by the lit/deferred pipelines (the per-draw SRV/material binding
capability, zd3d12.zig:1273-1356).

Acceptance (VERDICT round 1, item 2): two meshes with different
materials/textures visibly differ in ONE frame, validated against the XLA
reference shade.
"""

import numpy as np
import pytest

from zrenderer_tpu.engine.config import RenderConfig
from zrenderer_tpu.engine.renderer import Renderer
from zrenderer_tpu.engine.textures import Texture, checkerboard
from zrenderer_tpu.scene.procedural import make_material_scene

pytestmark = pytest.mark.slow  # heavyweight; excluded from the smoke tier

W, H = 128, 96


def _renderer(pipeline, **env):
    config = RenderConfig(width=W, height=H, backend="xla",
                          pipeline=pipeline, tri_align=64)
    r = Renderer(config)
    scene, mesh_data = make_material_scene()
    r.load_scene(scene, mesh_data)
    r.set_environment(**env)
    return r


def _halves(img, depth):
    """Mean RGB over covered pixels of the left/right frame halves."""
    cov = depth < 1.0
    half = img.shape[1] // 2
    left = img[:, :half, :3][cov[:, :half]].mean(axis=0)
    right = img[:, half:, :3][cov[:, half:]].mean(axis=0)
    return left, right


def test_lit_per_material_textures_differ_in_one_frame():
    red = Texture.from_array(checkerboard(64, color_a=(1, 0.2, 0.2),
                                          color_b=(0.6, 0.1, 0.1)))
    blue = Texture.from_array(checkerboard(64, color_a=(0.2, 0.2, 1),
                                           color_b=(0.1, 0.1, 0.6)))
    r = _renderer("lit", textures=[red, blue], material_textures=[0, 1])
    img, depth = r.render_and_read()
    left, right = _halves(img, depth)
    # Left cube samples the red texture layer, right cube the blue one.
    assert left[0] > left[2] * 1.5, (left, right)
    assert right[2] > right[0] * 1.5, (left, right)


def test_lit_untextured_material_gets_white_layer():
    red = Texture.from_array(checkerboard(64, color_a=(1, 0.2, 0.2),
                                          color_b=(0.6, 0.1, 0.1)))
    # Material 1 has no texture -> auto white layer (not the red one).
    r = _renderer("lit", textures=[red], material_textures=[0])
    img, depth = r.render_and_read()
    left, right = _halves(img, depth)
    assert left[0] > left[2] * 1.5
    # Right: white albedo + green emissive -> not red-dominated.
    assert right[0] <= right[1] + 1.0


def test_deferred_materials_drive_ggx_and_emissive():
    r = _renderer("deferred",
                  lights=(np.array([[0.0, 0.0, 6.0]], np.float32),
                          np.array([[6.0, 6.0, 6.0]], np.float32)))
    img, depth = r.render_and_read()
    left, right = _halves(img, depth)
    # Right cube's green emissive shows regardless of lighting.
    assert right[1] > right[0] + 10, (left, right)
    # Left (metal, albedo-tinted fresnel, no diffuse) differs from right.
    assert np.abs(left - right).max() > 10


def test_deferred_pallas_kernel_matches_xla_reference_shade():
    """The tiled GGX light kernel (interpret mode) against the chunked XLA
    GGX reference — same BRDF, per-pixel material planes."""
    lights = (np.array([[0.0, 2.0, 6.0], [-3.0, -2.0, 4.0]], np.float32),
              np.array([[5.0, 5.0, 5.0], [2.0, 1.0, 4.0]], np.float32))
    rx = _renderer("deferred", lights=lights)
    img_x, depth_x = rx.render_and_read()

    config = RenderConfig(width=W, height=H, backend="pallas",
                          pipeline="deferred", tri_align=64, debug=True)
    rp = Renderer(config)
    scene, mesh_data = make_material_scene()
    rp.load_scene(scene, mesh_data)
    rp.set_environment(lights=lights)
    img_p, depth_p = rp.render_and_read()

    np.testing.assert_array_equal(depth_x < 1.0, depth_p < 1.0)
    diff = np.abs(img_x.astype(np.int32) - img_p.astype(np.int32))
    # Same BRDF evaluated in a different (kernel) order: tight u8 agreement.
    assert diff.max() <= 2, diff.max()


def test_shadowed_emissive_and_texture():
    red = Texture.from_array(checkerboard(64, color_a=(1, 0.2, 0.2),
                                          color_b=(0.6, 0.1, 0.1)))
    r = _renderer("shadowed", textures=[red, red],
                  material_textures=[0, -1])
    img, depth = r.render_and_read()
    left, right = _halves(img, depth)
    assert left[0] > left[2]  # textured red
    assert right[1] > left[1]  # emissive green on the right cube


def test_quad_sampler_matches_reference_sampler():
    """The 1-gather quad-atlas bilinear/trilinear equals the 4/8-gather
    reference sampler bit-for-bit on the same texels."""
    import jax.numpy as jnp
    from zrenderer_tpu.engine.textures import Texture, checkerboard
    from zrenderer_tpu.ops import sampling

    tex = Texture.from_array(checkerboard(64))
    th, tw = tex.base_shape
    rng = np.random.default_rng(9)
    uv = jnp.asarray(rng.uniform(0, 1, (33, 57, 2)).astype(np.float32))
    lod = jnp.asarray(
        rng.uniform(0, tex.num_levels - 1, (33, 57)).astype(np.float32))
    ref = sampling.sample_trilinear(tex.atlas_u32, th, tw, tex.num_levels,
                                    uv, lod)
    quad = sampling.sample_trilinear_quad(tex.quad_atlas_u32, th, tw,
                                          tex.num_levels, uv, lod)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(quad))


def test_quad_sampler_texture_array_layers():
    import jax.numpy as jnp
    from zrenderer_tpu.engine.textures import Texture, TextureArray, checkerboard
    from zrenderer_tpu.ops import sampling

    red = Texture.from_array(checkerboard(32, color_a=(1, 0, 0)))
    blue = Texture.from_array(checkerboard(32, color_a=(0, 0, 1)))
    arr = TextureArray.from_textures([red, blue])
    th, tw = arr.base_shape
    uv = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (8, 16, 2))
                     .astype(np.float32))
    lod = jnp.zeros((8, 16), jnp.float32)
    for layer_idx, tex in ((0, red), (1, blue)):
        layer = jnp.full((8, 16), layer_idx, jnp.int32)
        got = sampling.sample_trilinear_quad(
            arr.quad_atlas_u32, th, tw, arr.num_levels, uv, lod, layer=layer)
        ref = sampling.sample_trilinear(
            tex.atlas_u32, th, tw, tex.num_levels, uv, lod)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_oct_sampler_matches_reference_sampler():
    """The ONE-gather oct-atlas trilinear (fine quad + parent 3x3 in a
    16-lane row) equals the 8-gather reference sampler bit-for-bit."""
    import jax.numpy as jnp
    from zrenderer_tpu.engine.textures import Texture, checkerboard
    from zrenderer_tpu.ops import sampling

    tex = Texture.from_array(checkerboard(64))
    th, tw = tex.base_shape
    rng = np.random.default_rng(11)
    uv = jnp.asarray(rng.uniform(0, 1, (33, 57, 2)).astype(np.float32))
    lod = jnp.asarray(
        rng.uniform(0, tex.num_levels - 1, (33, 57)).astype(np.float32))
    ref = sampling.sample_trilinear(tex.atlas_u32, th, tw, tex.num_levels,
                                    uv, lod)
    oct_ = sampling.sample_trilinear_oct(tex.oct_atlas_u32, th, tw,
                                         tex.num_levels, uv, lod)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(oct_))


def test_oct_sampler_texture_array_layers():
    import jax.numpy as jnp
    from zrenderer_tpu.engine.textures import Texture, TextureArray, checkerboard
    from zrenderer_tpu.ops import sampling

    red = Texture.from_array(checkerboard(32, color_a=(1, 0, 0)))
    blue = Texture.from_array(checkerboard(32, color_a=(0, 0, 1)))
    arr = TextureArray.from_textures([red, blue])
    th, tw = arr.base_shape
    rng = np.random.default_rng(5)
    uv = jnp.asarray(rng.uniform(0, 1, (8, 16, 2)).astype(np.float32))
    lod = jnp.asarray(
        rng.uniform(0, arr.num_levels - 1, (8, 16)).astype(np.float32))
    for layer_idx, tex in ((0, red), (1, blue)):
        layer = jnp.full((8, 16), layer_idx, jnp.int32)
        got = sampling.sample_trilinear_oct(
            arr.oct_atlas_u32, th, tw, arr.num_levels, uv, lod, layer=layer)
        ref = sampling.sample_trilinear(
            tex.atlas_u32, th, tw, tex.num_levels, uv, lod)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pvar_sampler_matches_oct_and_reference():
    """The 8-lane parent-variant trilinear (anchor offset folded into the
    gather index, build_pvar_atlas) equals both the oct sampler and the
    8-gather reference bit-for-bit."""
    import jax.numpy as jnp
    from zrenderer_tpu.engine.textures import Texture, checkerboard
    from zrenderer_tpu.ops import sampling

    tex = Texture.from_array(checkerboard(64))
    th, tw = tex.base_shape
    rng = np.random.default_rng(11)
    uv = jnp.asarray(rng.uniform(0, 1, (33, 57, 2)).astype(np.float32))
    lod = jnp.asarray(
        rng.uniform(0, tex.num_levels - 1, (33, 57)).astype(np.float32))
    ref = sampling.sample_trilinear(tex.atlas_u32, th, tw, tex.num_levels,
                                    uv, lod)
    oct_ = sampling.sample_trilinear_oct(tex.oct_atlas_u32, th, tw,
                                         tex.num_levels, uv, lod)
    pvar = sampling.sample_trilinear_pvar(tex.pvar_atlas_u32, th, tw,
                                          tex.num_levels, uv, lod)
    np.testing.assert_array_equal(np.asarray(pvar), np.asarray(oct_))
    np.testing.assert_array_equal(np.asarray(pvar), np.asarray(ref))


def test_pvar_sampler_texture_array_layers():
    import jax.numpy as jnp
    from zrenderer_tpu.engine.textures import Texture, TextureArray, checkerboard
    from zrenderer_tpu.ops import sampling

    red = Texture.from_array(checkerboard(32, color_a=(1, 0, 0)))
    blue = Texture.from_array(checkerboard(32, color_a=(0, 0, 1)))
    arr = TextureArray.from_textures([red, blue])
    th, tw = arr.base_shape
    rng = np.random.default_rng(5)
    uv = jnp.asarray(rng.uniform(0, 1, (8, 16, 2)).astype(np.float32))
    lod = jnp.asarray(
        rng.uniform(0, arr.num_levels - 1, (8, 16)).astype(np.float32))
    for layer_idx, tex in ((0, red), (1, blue)):
        layer = jnp.full((8, 16), layer_idx, jnp.int32)
        got = sampling.sample_trilinear_pvar(
            arr.pvar_atlas_u32, th, tw, arr.num_levels, uv, lod,
            layer=layer)
        ref = sampling.sample_trilinear(
            tex.atlas_u32, th, tw, tex.num_levels, uv, lod)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
