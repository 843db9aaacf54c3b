"""Mipmap generation — the MipmapGenerator analog.

The reference generates mip chains on the GPU with a compute shader that
produces 4 mips per dispatch using a 2x2 box filter and groupshared
reductions (zd3d12.zig:1551-1726 driving csGenerateMipmaps,
libs/common/src/hlsl/common.hlsl:74-130), limited to square textures
<= 2048.  The TPU version is a fused XLA reduction chain: each level is
``0.25 * (s00 + s01 + s10 + s11)`` exactly like the shader's filter, all
levels generated in one jitted call (XLA fuses the chain; there is no
groupshared-memory staging to manage by hand).  Non-square power-of-two
textures are supported.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _is_pow2(x: int) -> bool:
    return x > 0 and (x & (x - 1)) == 0


def downsample_2x2(level):
    """One 2x2 box-filter step: (h, w, c) -> (h/2, w/2, c), the exact
    filter of csGenerateMipmaps (common.hlsl:82-90)."""
    h, w = level.shape[0], level.shape[1]
    s = level.reshape(h // 2, 2, w // 2, 2, -1)
    return (
        jnp.float32(0.25)
        * ((s[:, 0, :, 0] + s[:, 0, :, 1]) + (s[:, 1, :, 0] + s[:, 1, :, 1]))
    ).astype(level.dtype)


def generate_mip_chain(texture, num_levels: int | None = None):
    """Full mip pyramid from a base (h, w, c) f32 texture.

    Returns a list [base, mip1, ...]; level count defaults to
    log2(min(h, w)) + 1 (down to 1x1 for square textures).
    """
    h, w = texture.shape[0], texture.shape[1]
    assert _is_pow2(h) and _is_pow2(w), "mip generation needs power-of-2 dims"
    max_levels = int(np.log2(min(h, w))) + 1
    num_levels = max_levels if num_levels is None else min(num_levels, max_levels)
    chain = [texture]
    for _ in range(num_levels - 1):
        chain.append(downsample_2x2(chain[-1]))
    return chain


generate_mip_chain_jit = jax.jit(generate_mip_chain, static_argnums=(1,))


def pack_mip_atlas(chain):
    """Pack a mip chain into one (h, 2w, c) atlas for single-gather
    sampling: mip L sits at x offset sum(w / 2^k, k<L), y offset 0.

    Returns (atlas, offsets_x (L,) i32, sizes (L, 2) i32 [h, w]).
    """
    h, w = chain[0].shape[0], chain[0].shape[1]
    c = chain[0].shape[2]
    atlas = jnp.zeros((h, 2 * w, c), chain[0].dtype)
    offsets = []
    sizes = []
    x = 0
    for level in chain:
        lh, lw = level.shape[0], level.shape[1]
        atlas = jax.lax.dynamic_update_slice(atlas, level, (0, x, 0))
        offsets.append(x)
        sizes.append((lh, lw))
        x += lw
    return atlas, jnp.asarray(offsets, jnp.int32), jnp.asarray(sizes, jnp.int32)
