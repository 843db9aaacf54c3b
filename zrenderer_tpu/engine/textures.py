"""Texture resources: image load, device upload, mip pyramid, atlas.

The WIC-image-load + texture-upload + mipmap-generation capability of the
reference platform layer (zd3d12.zig:1415-1548 createAndUploadTex2dFromFile,
:1551-1726 MipmapGenerator), reshaped for TPU: decode on host (PNG via
utils.png — the stb/WIC analog), upload once as a device array, generate
the mip chain with one jitted call, and pack a mip atlas for single-gather
sampling (ops/sampling.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from zrenderer_tpu.ops.mipmap import generate_mip_chain, pack_mip_atlas
from zrenderer_tpu.ops.sampling import pack_texels_u32


@dataclass
class Texture:
    atlas: jax.Array  # (h, 2w, 4) f32 mip atlas
    atlas_u32: jax.Array  # (h, 2w) uint32 RGBA8-packed (the sampler's view)
    offsets: jax.Array  # (L,) i32 per-level x offsets
    sizes: jax.Array  # (L, 2) i32 per-level (h, w)
    num_levels: int
    base_shape: tuple

    @classmethod
    def from_array(cls, image: np.ndarray, num_levels: int | None = None):
        """Create from (h, w, 3|4) u8 or f32 host image."""
        img = np.asarray(image)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / np.float32(255.0)
        if img.shape[2] == 3:
            img = np.concatenate(
                [img, np.ones((*img.shape[:2], 1), np.float32)], axis=-1
            )
        chain = generate_mip_chain(jnp.asarray(img), num_levels)
        atlas, offsets, sizes = pack_mip_atlas(chain)
        return cls(
            atlas=atlas,
            atlas_u32=pack_texels_u32(atlas),
            offsets=offsets,
            sizes=sizes,
            num_levels=len(chain),
            base_shape=img.shape[:2],
        )

    @classmethod
    def from_png(cls, path, num_levels: int | None = None):
        """The createAndUploadTex2dFromFile analog (PNG instead of WIC)."""
        from zrenderer_tpu.utils.png import read_png

        return cls.from_array(read_png(path), num_levels)


def checkerboard(size: int = 256, cells: int = 8,
                 color_a=(1.0, 1.0, 1.0), color_b=(0.25, 0.25, 0.3)) -> np.ndarray:
    """Procedural checker texture (test/demo content)."""
    ij = np.arange(size)
    cell = (ij[:, None] // (size // cells) + ij[None, :] // (size // cells)) % 2
    img = np.where(
        cell[..., None] > 0,
        np.array(color_a, np.float32),
        np.array(color_b, np.float32),
    )
    return np.concatenate([img, np.ones((size, size, 1), np.float32)], axis=-1)


def white_texture() -> Texture:
    """1-texel white texture: the 'no texture bound' default."""
    return Texture.from_array(np.ones((1, 1, 4), np.float32), num_levels=1)
