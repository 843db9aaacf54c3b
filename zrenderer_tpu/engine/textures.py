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
from zrenderer_tpu.ops.sampling import (build_oct_atlas, build_pvar_atlas,
                                         build_quad_atlas, pack_texels_u32)


@dataclass
class Texture:
    atlas: jax.Array  # (h, 2w, 4) f32 mip atlas
    atlas_u32: jax.Array  # (h, 2w) uint32 RGBA8-packed (the sampler's view)
    offsets: jax.Array  # (L,) i32 per-level x offsets
    sizes: jax.Array  # (L, 2) i32 per-level (h, w)
    num_levels: int
    base_shape: tuple
    # Derived gather atlases are built LAZILY on first use (ADVICE r4:
    # keeping quad + oct + pvar all resident was ~53x the base texel
    # bytes while the lit path samples only pvar).
    _quad: jax.Array | None = None
    _oct: jax.Array | None = None
    _pvar: jax.Array | None = None

    def _lazy_atlas(self, attr, builder):
        val = getattr(self, attr)
        if val is None:
            val = builder()
            # Never cache values produced INSIDE a jit trace: a cached
            # tracer escapes its trace and poisons every later use
            # (UnexpectedTracerError).  Engine code pre-touches the
            # atlas outside jit (Renderer.set_environment) so the cache
            # normally populates with a concrete array.
            if not isinstance(val, jax.core.Tracer):
                setattr(self, attr, val)
        return val

    @property
    def quad_atlas_u32(self):
        """(h, 2w, 4) u32 2x2 neighborhoods (1-gather bilinear)."""
        h, w = self.base_shape
        return self._lazy_atlas(
            "_quad",
            lambda: build_quad_atlas(self.atlas_u32, h, w, self.num_levels))

    @property
    def oct_atlas_u32(self):
        """(h, 2w, 16) u32 quad + parent 3x3 (1-gather trilinear)."""
        h, w = self.base_shape
        return self._lazy_atlas(
            "_oct",
            lambda: build_oct_atlas(self.atlas_u32, h, w, self.num_levels))

    @property
    def pvar_atlas_u32(self):
        """(h, 2w, 32) u32 4x(quad + selected parent quad) — the
        production lit-path sampler's atlas (8-lane trilinear)."""
        h, w = self.base_shape
        return self._lazy_atlas(
            "_pvar",
            lambda: build_pvar_atlas(self.atlas_u32, h, w, self.num_levels))

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
        atlas_u32 = pack_texels_u32(atlas)
        return cls(
            atlas=atlas,
            atlas_u32=atlas_u32,
            offsets=offsets,
            sizes=sizes,
            num_levels=len(chain),
            base_shape=img.shape[:2],
        )

    @classmethod
    def from_png(cls, path, num_levels: int | None = None):
        """PNG-specific loader (see from_image_file for the general path)."""
        from zrenderer_tpu.utils.png import read_png

        return cls.from_array(read_png(path), num_levels)

    @classmethod
    def from_image_file(cls, path, num_levels: int | None = None):
        """The createAndUploadTex2dFromFile analog (zd3d12.zig:1415-1548,
        WIC-style format dispatch): decode any supported image format
        (utils.image) and upload."""
        from zrenderer_tpu.utils.image import read_image

        return cls.from_array(read_image(path), num_levels)


@dataclass
class TextureArray:
    """Uniform-size texture array: L mip-strip atlases stacked vertically
    into one device array — the texture-array/per-draw-SRV analog
    (zd3d12.zig:1273-1356).  Layer selection is a per-pixel row offset in
    the sampler (ops/sampling.py), so one gather path serves every draw.
    Like D3D12 texture arrays, all layers share one (h, w, mips) shape.
    """

    atlas_u32: jax.Array  # (L*h, 2w) uint32 RGBA8-packed
    num_levels: int
    base_shape: tuple  # (h, w) of one layer
    num_layers: int
    # Source layers kept for lazy per-kind stacking (see Texture: only
    # the pvar atlas is sampled by the production lit path).
    _layers: list | None = None
    _quad: jax.Array | None = None
    _oct: jax.Array | None = None
    _pvar: jax.Array | None = None

    _lazy_atlas = Texture._lazy_atlas

    @property
    def quad_atlas_u32(self):
        """(L*h, 2w, 4) u32 (per-layer wrap-correct)."""
        return self._lazy_atlas("_quad", lambda: jnp.concatenate(
            [t.quad_atlas_u32 for t in self._layers], axis=0))

    @property
    def oct_atlas_u32(self):
        """(L*h, 2w, 16) u32 (per-layer wrap-correct)."""
        return self._lazy_atlas("_oct", lambda: jnp.concatenate(
            [t.oct_atlas_u32 for t in self._layers], axis=0))

    @property
    def pvar_atlas_u32(self):
        """(L*h, 2w, 32) u32 (per-layer wrap-correct)."""
        return self._lazy_atlas("_pvar", lambda: jnp.concatenate(
            [t.pvar_atlas_u32 for t in self._layers], axis=0))

    @classmethod
    def from_textures(cls, textures):
        """Stack Texture objects (same base size and mip count)."""
        assert textures, "need at least one texture"
        base = textures[0]
        for t in textures:
            assert tuple(t.base_shape) == tuple(base.base_shape), (
                "texture arrays require uniform layer sizes "
                f"({t.base_shape} != {base.base_shape})"
            )
            assert t.num_levels == base.num_levels
        atlas = jnp.concatenate([t.atlas_u32 for t in textures], axis=0)
        return cls(
            atlas_u32=atlas,
            num_levels=base.num_levels,
            base_shape=tuple(base.base_shape),
            num_layers=len(textures),
            _layers=list(textures),
        )

    @classmethod
    def from_images(cls, images, num_levels: int | None = None):
        return cls.from_textures(
            [Texture.from_array(img, num_levels) for img in images]
        )


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


def textures_from_mesh_data(mesh_data, base_dir):
    """Load the meshes.bin TEXS table from disk (uris relative to the scene
    folder) — the runtime half of per-material texture binding.  Returns
    (textures, material_textures) for Renderer.set_environment, or
    (None, None) when the scene carries no textures or loading fails
    (missing file / mixed sizes); the caller then falls back to its default
    texture."""
    import logging
    import os

    log = logging.getLogger("zrenderer.textures")
    uris = getattr(mesh_data, "texture_uris", None)
    if not uris:
        return None, None
    textures = []
    for uri in uris:
        path = os.path.join(base_dir, uri)
        try:
            textures.append(Texture.from_image_file(path))
        except (OSError, ValueError) as e:
            log.warning("texture %s failed to load (%s); falling back", path, e)
            return None, None
    base = tuple(textures[0].base_shape)
    if any(tuple(t.base_shape) != base for t in textures):
        log.warning(
            "scene textures have mixed sizes %s; texture arrays need "
            "uniform layers — falling back",
            [tuple(t.base_shape) for t in textures],
        )
        return None, None
    return textures, list(mesh_data.material_texture)
