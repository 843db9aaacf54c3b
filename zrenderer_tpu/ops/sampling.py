"""Texture sampling: nearest / bilinear / trilinear from a mip atlas.

The software-sampler analog of the reference's static sampler
(FILTER_MIN_MAG_MIP_LINEAR in the imgui root signature, common.hlsl:8) and
of the texture units its platform layer feeds (zd3d12 texture upload +
MipmapGenerator).  Addressing is WRAP.  Mip level selection uses
screen-space UV derivatives computed by finite differences over the
G-buffer (the software analog of pixel-quad derivatives).

TPU notes: per-pixel level-dependent mip geometry (width, height, atlas
x-offset) is computed in closed form with shifts — power-of-two mip chains
make `lw = W0 >> L` and `off_x(L) = 2*W0 - (W0 >> (L-1))` exact — because
gathering from tiny lookup tables is pathologically slow on TPU (measured
38 ms/frame at 1080p vs ~0 for the arithmetic).  The only real gather is
the texel fetch itself, flattened to a single dynamic axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def _wrap(i, n):
    return jnp.remainder(i, n)


def _mip_geometry(base_h: int, base_w: int, level):
    """Closed-form (lh, lw, off_x) for mip `level` in the strip atlas."""
    lw = jnp.right_shift(jnp.int32(base_w), level)
    lh = jnp.right_shift(jnp.int32(base_h), level)
    lw = jnp.maximum(lw, 1)
    lh = jnp.maximum(lh, 1)
    lm1 = jnp.maximum(level - 1, 0)
    off = 2 * base_w - jnp.maximum(
        jnp.right_shift(jnp.int32(base_w), lm1), 1
    )
    off_x = jnp.where(level <= 0, 0, off)
    return lh, lw, off_x


def pack_texels_u32(atlas_f32):
    """(h, w, 4) f32 -> (h, w) uint32 RGBA8: scalar gathers are ~250x
    faster than row gathers on TPU (measured), and 8-bit albedo is exactly
    the precision the reference's RGBA8 textures carry."""
    q = jnp.clip(atlas_f32, 0.0, 1.0)
    q = jnp.floor(q * jnp.float32(255.0) + jnp.float32(0.5)).astype(jnp.uint32)
    return q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16) | (q[..., 3] << 24)


def _gather_flat(atlas_u32, flat_idx):
    """Single-axis scalar texel gather (the fast TPU path); unpacks RGBA8
    back to (..., 4) f32."""
    texel = jnp.take(atlas_u32.reshape(-1), flat_idx, axis=0)
    inv255 = jnp.float32(1.0 / 255.0)
    return jnp.stack(
        [
            (texel & 0xFF).astype(jnp.float32) * inv255,
            ((texel >> 8) & 0xFF).astype(jnp.float32) * inv255,
            ((texel >> 16) & 0xFF).astype(jnp.float32) * inv255,
            ((texel >> 24) & 0xFF).astype(jnp.float32) * inv255,
        ],
        axis=-1,
    )


def sample_bilinear_level(atlas, base_h: int, base_w: int, uv, level,
                          layer=None):
    """Bilinear sample at integer mip `level`.

    atlas: (L*base_h, 2*base_w) uint32 RGBA8-packed strip atlas
    (pack_texels_u32 of ops/mipmap.py:pack_mip_atlas); L same-size texture
    layers stacked vertically — the texture-array analog of per-draw SRV
    binding (zd3d12.zig:1273-1356).  uv: (..., 2) in [0,1) wrap space;
    level: (...) i32; layer (optional): (...) i32 texture index (wrap
    stays within the layer's own rows).  Returns (..., 4) f32.
    """
    lh, lw, off_x = _mip_geometry(base_h, base_w, level)
    w2 = atlas.shape[1]
    x = uv[..., 0] * lw.astype(jnp.float32) - 0.5
    y = uv[..., 1] * lh.astype(jnp.float32) - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0.astype(jnp.float32))[..., None]
    fy = (y - y0.astype(jnp.float32))[..., None]
    row0 = 0 if layer is None else layer * jnp.int32(base_h)

    def fetch(ix, iy):
        ix = _wrap(ix, lw)
        iy = _wrap(iy, lh) + row0
        return _gather_flat(atlas, iy * w2 + (ix + off_x))

    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def mip_level_from_derivatives(uv, base_h: int, base_w: int, num_levels: int):
    """Per-pixel LOD from finite-difference UV derivatives over the frame.

    uv: (H, W, 2).  Returns (H, W) f32 clamped LOD (the standard
    log2(max texel footprint) rule)."""
    u, v = uv[..., 0], uv[..., 1]
    du_dx = jnp.abs(jnp.diff(u, axis=1, append=u[:, -1:]))
    dv_dx = jnp.abs(jnp.diff(v, axis=1, append=v[:, -1:]))
    du_dy = jnp.abs(jnp.diff(u, axis=0, append=u[-1:, :]))
    dv_dy = jnp.abs(jnp.diff(v, axis=0, append=v[-1:, :]))
    w, h = jnp.float32(base_w), jnp.float32(base_h)
    rho = jnp.maximum(
        jnp.maximum(du_dx * w, dv_dx * h), jnp.maximum(du_dy * w, dv_dy * h)
    )
    lod = jnp.log2(jnp.maximum(rho, 1e-8))
    return jnp.clip(lod, 0, num_levels - 1)


def sample_trilinear(atlas, base_h: int, base_w: int, num_levels: int,
                     uv, lod, layer=None):
    """Trilinear: bilinear at floor/ceil mips, lerped by the LOD fraction."""
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, num_levels - 1)
    f = (lod - l0.astype(jnp.float32))[..., None]
    c0 = sample_bilinear_level(atlas, base_h, base_w, uv, l0, layer=layer)
    c1 = sample_bilinear_level(atlas, base_h, base_w, uv, l1, layer=layer)
    return c0 * (1 - f) + c1 * f


def sample_nearest_level(atlas, base_h: int, base_w: int, uv, level):
    lh, lw, off_x = _mip_geometry(base_h, base_w, level)
    w2 = atlas.shape[1]
    ix = _wrap(jnp.floor(uv[..., 0] * lw.astype(jnp.float32)).astype(jnp.int32), lw)
    iy = _wrap(jnp.floor(uv[..., 1] * lh.astype(jnp.float32)).astype(jnp.int32), lh)
    return _gather_flat(atlas, iy * w2 + (ix + off_x))


def build_quad_atlas(atlas_u32, base_h: int, base_w: int, num_levels: int):
    """Precompute each texel's 2x2 wrap-correct neighborhood.

    Returns (h, 2w, 4) u32: lanes = (c00, c10, c01, c11) — self, right,
    down, diagonal, with WRAP handled per mip region at build time.  The
    sampler then fetches all four bilinear taps with ONE row gather
    (XLA gathers on TPU pay per INDEX, not per byte; the 4-gather bilinear
    measured ~16 ms per full-screen tap set at 1080p — a trilinear
    textured frame was 131 ms).  Built once at texture upload.
    """
    h, w2 = atlas_u32.shape
    quad = jnp.zeros((h, w2, 4), jnp.uint32)
    for level in range(num_levels):
        lw = max(base_w >> level, 1)
        lh = max(base_h >> level, 1)
        off = 0 if level == 0 else 2 * base_w - max(base_w >> (level - 1), 1)
        region = atlas_u32[0:lh, off:off + lw]
        right = jnp.roll(region, -1, axis=1)
        down = jnp.roll(region, -1, axis=0)
        diag = jnp.roll(right, -1, axis=0)
        q = jnp.stack([region, right, down, diag], axis=-1)
        quad = quad.at[0:lh, off:off + lw].set(q)
    return quad


def _unpack_u32(texel):
    inv255 = jnp.float32(1.0 / 255.0)
    return jnp.stack(
        [
            (texel & 0xFF).astype(jnp.float32) * inv255,
            ((texel >> 8) & 0xFF).astype(jnp.float32) * inv255,
            ((texel >> 16) & 0xFF).astype(jnp.float32) * inv255,
            ((texel >> 24) & 0xFF).astype(jnp.float32) * inv255,
        ],
        axis=-1,
    )


def sample_bilinear_level_quad(quad_atlas, base_h: int, base_w: int, uv,
                               level, layer=None):
    """Bilinear sample with ONE gather: all four taps ride a contiguous
    (4,) u32 row of the precomputed quad atlas (build_quad_atlas).
    Bit-identical to sample_bilinear_level on the same texels."""
    lh, lw, off_x = _mip_geometry(base_h, base_w, level)
    w2 = quad_atlas.shape[1]
    x = uv[..., 0] * lw.astype(jnp.float32) - 0.5
    y = uv[..., 1] * lh.astype(jnp.float32) - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0.astype(jnp.float32))[..., None]
    fy = (y - y0.astype(jnp.float32))[..., None]
    row0 = 0 if layer is None else layer * jnp.int32(base_h)
    ix = _wrap(x0, lw)
    iy = _wrap(y0, lh) + row0
    rows = jnp.take(quad_atlas.reshape(-1, 4), iy * w2 + (ix + off_x), axis=0)
    c00 = _unpack_u32(rows[..., 0])
    c10 = _unpack_u32(rows[..., 1])
    c01 = _unpack_u32(rows[..., 2])
    c11 = _unpack_u32(rows[..., 3])
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def sample_trilinear_quad(quad_atlas, base_h: int, base_w: int,
                          num_levels: int, uv, lod, layer=None):
    """Trilinear via the quad atlas: TWO gathers total (vs eight)."""
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, num_levels - 1)
    f = (lod - l0.astype(jnp.float32))[..., None]
    c0 = sample_bilinear_level_quad(quad_atlas, base_h, base_w, uv, l0,
                                    layer=layer)
    c1 = sample_bilinear_level_quad(quad_atlas, base_h, base_w, uv, l1,
                                    layer=layer)
    return c0 * (1 - f) + c1 * f
