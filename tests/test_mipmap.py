"""Mipmap generation + texture sampling tests (MipmapGenerator analog)."""

import numpy as np
import pytest

import jax.numpy as jnp

from zrenderer_tpu.engine.textures import Texture, checkerboard, white_texture
from zrenderer_tpu.ops.mipmap import (
    downsample_2x2,
    generate_mip_chain,
    pack_mip_atlas,
)
from zrenderer_tpu.ops import sampling

pytestmark = pytest.mark.slow  # heavyweight; excluded from the smoke tier


def test_box_filter_exact_average():
    # The filter must be 0.25 * (s00 + s01 + s10 + s11), like
    # csGenerateMipmaps (common.hlsl:82-90).
    x = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
    down = np.asarray(downsample_2x2(jnp.asarray(x)))
    expect = np.array(
        [[(0 + 1 + 4 + 5) / 4, (2 + 3 + 6 + 7) / 4],
         [(8 + 9 + 12 + 13) / 4, (10 + 11 + 14 + 15) / 4]],
        np.float32,
    ).reshape(2, 2, 1)
    np.testing.assert_allclose(down, expect)


def test_chain_shapes_and_levels():
    tex = jnp.asarray(checkerboard(64))
    chain = generate_mip_chain(tex)
    assert len(chain) == 7  # 64 -> 1
    assert chain[0].shape == (64, 64, 4)
    assert chain[-1].shape == (1, 1, 4)
    # Uniform average is preserved down the chain (box filter conserves mean)
    # f32 summation-order slack between the chained box filter and a
    # direct mean over 4096 texels.
    np.testing.assert_allclose(
        np.asarray(chain[-1])[0, 0, :3],
        np.asarray(tex)[..., :3].mean(axis=(0, 1)),
        rtol=1e-3,
    )


def test_non_square_chain():
    tex = jnp.ones((16, 64, 4), jnp.float32)
    chain = generate_mip_chain(tex)
    assert chain[-1].shape == (1, 4, 4)  # stops at min-dim 1


def test_atlas_packing():
    chain = generate_mip_chain(jnp.asarray(checkerboard(32)))
    atlas, offsets, sizes = pack_mip_atlas(chain)
    assert atlas.shape == (32, 64, 4)
    np.testing.assert_array_equal(np.asarray(offsets), [0, 32, 48, 56, 60, 62])
    np.testing.assert_array_equal(np.asarray(sizes)[0], [32, 32])
    np.testing.assert_array_equal(np.asarray(sizes)[-1], [1, 1])


def test_bilinear_sampling_interpolates():
    tex = np.zeros((4, 4, 4), np.float32)
    tex[:, 2:, 0] = 1.0  # right half red
    t = Texture.from_array(tex, num_levels=1)
    uv = jnp.asarray([[[0.125, 0.5], [0.875, 0.5], [0.5, 0.5]]], jnp.float32)
    out = np.asarray(
        sampling.sample_bilinear_level(
            t.atlas_u32, *t.base_shape, uv, jnp.zeros((1, 3), jnp.int32)
        )
    )
    assert out[0, 0, 0] == pytest.approx(0.0)
    assert out[0, 1, 0] == pytest.approx(1.0)
    assert out[0, 2, 0] == pytest.approx(0.5)  # straddles the edge


def test_trilinear_blends_levels():
    tex = checkerboard(32, cells=16)
    t = Texture.from_array(tex)
    uv = jnp.full((2, 2, 2), 0.37, jnp.float32)
    fine = np.asarray(
        sampling.sample_trilinear(
            t.atlas_u32, *t.base_shape, t.num_levels, uv,
            jnp.zeros((2, 2), jnp.float32),
        )
    )
    coarse = np.asarray(
        sampling.sample_trilinear(
            t.atlas_u32, *t.base_shape, t.num_levels, uv,
            jnp.full((2, 2), float(t.num_levels - 1), jnp.float32),
        )
    )
    # Coarsest mip is the global average (~0.625 grey for the checker).
    assert abs(coarse[0, 0, 0] - np.asarray(t.atlas)[..., 0].max() / 2) < 0.5
    assert not np.allclose(fine, coarse)


def test_mip_level_from_derivatives():
    h = w = 8
    # uv covering the whole [0,1] across 8 pixels of a 64-texel texture:
    # footprint = 8 texels/pixel -> lod = 3.
    uu, vv = np.meshgrid(
        np.linspace(0, 1, w, endpoint=False), np.linspace(0, 1, h, endpoint=False)
    )
    uv = jnp.asarray(np.stack([uu, vv], axis=-1), jnp.float32)
    lod = np.asarray(sampling.mip_level_from_derivatives(uv, 64, 64, 7))
    assert abs(lod[4, 4] - 3.0) < 0.01


def test_white_texture_default():
    t = white_texture()
    assert t.num_levels == 1
    out = np.asarray(
        sampling.sample_nearest_level(
            t.atlas_u32, *t.base_shape,
            jnp.asarray([[[0.3, 0.7]]], jnp.float32),
            jnp.zeros((1, 1), jnp.int32),
        )
    )
    np.testing.assert_allclose(out[0, 0], [1, 1, 1, 1])
