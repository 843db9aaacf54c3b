"""Texture sampling: nearest / bilinear / trilinear from a mip atlas.

The software-sampler analog of the reference's static sampler
(FILTER_MIN_MAG_MIP_LINEAR in the imgui root signature, common.hlsl:8) and
of the texture units its platform layer feeds (zd3d12 texture upload +
MipmapGenerator).  Addressing is WRAP.  Mip level selection uses
screen-space UV derivatives computed by finite differences over the
G-buffer (the software analog of pixel-quad derivatives).
"""

from __future__ import annotations

import jax.numpy as jnp


def _wrap(i, n):
    return jnp.remainder(i, n)


def _gather_level(atlas, off_x, lh, lw, ix, iy):
    """Nearest texel fetch from one mip level inside the atlas (wrapped).

    Flattens to a single-axis row gather — one dynamic dimension instead of
    two — which XLA lowers to a dramatically cheaper TPU gather than 2D
    indexing."""
    ix = _wrap(ix, lw)
    iy = _wrap(iy, lh)
    w2 = atlas.shape[1]
    flat = atlas.reshape(-1, atlas.shape[2])
    return jnp.take(flat, iy * w2 + (ix + off_x), axis=0)


def sample_bilinear_level(atlas, offsets, sizes, uv, level):
    """Bilinear sample at integer mip `level`.

    atlas: (h, 2w, c); uv: (..., 2) in [0,1) wrap space; level: (...) i32.
    Returns (..., c).
    """
    off_x = offsets[level]
    lh = sizes[level, 0]
    lw = sizes[level, 1]
    x = uv[..., 0] * lw.astype(jnp.float32) - 0.5
    y = uv[..., 1] * lh.astype(jnp.float32) - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0.astype(jnp.float32))[..., None]
    fy = (y - y0.astype(jnp.float32))[..., None]
    c00 = _gather_level(atlas, off_x, lh, lw, x0, y0)
    c10 = _gather_level(atlas, off_x, lh, lw, x0 + 1, y0)
    c01 = _gather_level(atlas, off_x, lh, lw, x0, y0 + 1)
    c11 = _gather_level(atlas, off_x, lh, lw, x0 + 1, y0 + 1)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def mip_level_from_derivatives(uv, base_size, num_levels):
    """Per-pixel LOD from finite-difference UV derivatives over the frame.

    uv: (H, W, 2).  Returns (H, W) i32 clamped mip level (the standard
    log2(max texel footprint) rule).
    """
    u, v = uv[..., 0], uv[..., 1]
    du_dx = jnp.abs(jnp.diff(u, axis=1, append=u[:, -1:]))
    dv_dx = jnp.abs(jnp.diff(v, axis=1, append=v[:, -1:]))
    du_dy = jnp.abs(jnp.diff(u, axis=0, append=u[-1:, :]))
    dv_dy = jnp.abs(jnp.diff(v, axis=0, append=v[-1:, :]))
    w, h = jnp.float32(base_size[1]), jnp.float32(base_size[0])
    rho = jnp.maximum(
        jnp.maximum(du_dx * w, dv_dx * h), jnp.maximum(du_dy * w, dv_dy * h)
    )
    lod = jnp.log2(jnp.maximum(rho, 1e-8))
    return jnp.clip(lod, 0, num_levels - 1)


def sample_trilinear(atlas, offsets, sizes, uv, lod):
    """Trilinear: bilinear at floor/ceil mips, lerped by the LOD fraction."""
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, offsets.shape[0] - 1)
    f = (lod - l0.astype(jnp.float32))[..., None]
    c0 = sample_bilinear_level(atlas, offsets, sizes, uv, l0)
    c1 = sample_bilinear_level(atlas, offsets, sizes, uv, l1)
    return c0 * (1 - f) + c1 * f


def sample_nearest_level(atlas, offsets, sizes, uv, level):
    off_x = offsets[level]
    lh = sizes[level, 0]
    lw = sizes[level, 1]
    ix = jnp.floor(uv[..., 0] * lw.astype(jnp.float32)).astype(jnp.int32)
    iy = jnp.floor(uv[..., 1] * lh.astype(jnp.float32)).astype(jnp.int32)
    return _gather_level(atlas, off_x, lh, lw, ix, iy)
