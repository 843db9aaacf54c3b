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
import numpy as np


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


def build_oct_atlas(atlas_u32, base_h: int, base_w: int, num_levels: int):
    """Precompute, per texel, its own 2x2 quad AND the parent-mip 3x3
    neighborhood bracketing it — single-gather TRILINEAR.

    Returns (h, 2w, 16) u32.  Lanes 0-3 = the texel's own 2x2 quad
    (c00, c10, c01, c11 — exactly build_quad_atlas); lanes 4-12 = the
    wrap-correct parent-level 3x3 anchored at ``bx = (tx - 1) >> 1``
    (``by`` likewise): for any sample point inside texel (ty, tx)'s quad
    footprint, the true parent bilinear quad base lies at anchor offset
    (dy, dx) in {0, 1}^2 (derivation: x in [x0+.5, x0+1.5) => the parent
    coordinate x/2 - .5 spans < one texel).  Lanes 13-15 pad to 16.

    Why: TPU gathers pay per INDEX, so sample_trilinear_quad's TWO row
    gathers (one per mip level) cost ~12 ms of a 16 ms lit frame at
    1080p; fetching a 64-B row instead of 16-B is bandwidth-free by
    comparison.  Bit-identical taps for power-of-two textures (the
    mipmap module's contract).
    """
    h, w2 = atlas_u32.shape
    oct_ = jnp.zeros((h, w2, 16), jnp.uint32)
    for level in range(num_levels):
        lw = max(base_w >> level, 1)
        lh = max(base_h >> level, 1)
        off = 0 if level == 0 else 2 * base_w - max(base_w >> (level - 1), 1)
        region = atlas_u32[0:lh, off:off + lw]
        right = jnp.roll(region, -1, axis=1)
        down = jnp.roll(region, -1, axis=0)
        diag = jnp.roll(right, -1, axis=0)
        own = [region, right, down, diag]

        pl = min(level + 1, num_levels - 1)
        pw = max(base_w >> pl, 1)
        ph = max(base_h >> pl, 1)
        poff = 0 if pl == 0 else 2 * base_w - max(base_w >> (pl - 1), 1)
        parent = atlas_u32[0:ph, poff:poff + pw]
        bx = (np.arange(lw) - 1) >> 1  # unwrapped anchors (floor div)
        by = (np.arange(lh) - 1) >> 1
        taps = []
        for j in range(3):
            ry = np.mod(by + j, ph)
            for i in range(3):
                rx = np.mod(bx + i, pw)
                taps.append(parent[jnp.asarray(ry)][:, jnp.asarray(rx)])
        q = jnp.stack(own + taps + [region] * 3, axis=-1)
        oct_ = oct_.at[0:lh, off:off + lw].set(q)
    return oct_


def build_pvar_atlas(atlas_u32, base_h: int, base_w: int, num_levels: int):
    """Parent-VARIANT atlas: per texel, 4 rows of 8 lanes — one row per
    (dy, dx) parent-anchor offset, each holding the texel's own 2x2 quad
    (lanes 0-3) plus the parent 2x2 ALREADY SELECTED for that offset
    (lanes 4-7).  Returns (h, 2w, 32) u32 (variants x lanes flattened).

    Why (round-4 lit profile, v5e): sample_trilinear_oct's 16-lane
    gather output needs a {2,1,0}->{1,0,2} relayout copy before the
    blend math — 265 MB at 1080p = 1.66 ms/frame of pure data
    formatting (copy.1798), plus ~9 masked-select passes for the 3x3 ->
    2x2 parent tap selection.  The anchor offset (dy, dx) is computable
    from index math ALONE (no tap values), so folding it into the gather
    index halves the gathered/relayouted bytes and deletes the selection
    masks entirely.  Taps and weight formulas are unchanged —
    bit-identical to sample_trilinear_oct/quad (tested).  Cost: 2x atlas
    memory vs the oct atlas (the fine quad is replicated per variant).
    """
    h, w2 = atlas_u32.shape
    pvar = jnp.zeros((h, w2, 32), jnp.uint32)
    for level in range(num_levels):
        lw = max(base_w >> level, 1)
        lh = max(base_h >> level, 1)
        off = 0 if level == 0 else 2 * base_w - max(base_w >> (level - 1), 1)
        region = atlas_u32[0:lh, off:off + lw]
        right = jnp.roll(region, -1, axis=1)
        down = jnp.roll(region, -1, axis=0)
        diag = jnp.roll(right, -1, axis=0)
        own = [region, right, down, diag]

        pl = min(level + 1, num_levels - 1)
        pw = max(base_w >> pl, 1)
        ph = max(base_h >> pl, 1)
        poff = 0 if pl == 0 else 2 * base_w - max(base_w >> (pl - 1), 1)
        parent = atlas_u32[0:ph, poff:poff + pw]
        bx = (np.arange(lw) - 1) >> 1
        by = (np.arange(lh) - 1) >> 1
        taps = []
        for j in range(3):
            ry = np.mod(by + j, ph)
            for i in range(3):
                rx = np.mod(bx + i, pw)
                taps.append(parent[jnp.asarray(ry)][:, jnp.asarray(rx)])
        lanes = []
        for dy in range(2):
            for dx in range(2):
                lanes += own + [
                    taps[(dy + jj) * 3 + (dx + ii)]
                    for jj, ii in ((0, 0), (0, 1), (1, 0), (1, 1))
                ]
        q = jnp.stack(lanes, axis=-1)  # (lh, lw, 32)
        pvar = pvar.at[0:lh, off:off + lw].set(q)
    return pvar


def sample_trilinear_pvar(pvar_atlas, base_h: int, base_w: int,
                          num_levels: int, uv, lod, layer=None):
    """Trilinear with ONE 8-lane gather via the parent-variant atlas
    (build_pvar_atlas).  The parent-anchor offset (dy, dx) folds into
    the gather index, so the row carries exactly the 8 needed taps.
    Bit-identical to sample_trilinear_oct (same taps, same weight
    formulas, same lerp order)."""
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, num_levels - 1)
    f = (lod - l0.astype(jnp.float32))[..., None]

    lh, lw, off_x = _mip_geometry(base_h, base_w, l0)
    ph, pw, _ = _mip_geometry(base_h, base_w, l1)
    w2 = pvar_atlas.shape[1]
    x = uv[..., 0] * lw.astype(jnp.float32) - 0.5
    y = uv[..., 1] * lh.astype(jnp.float32) - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0.astype(jnp.float32))[..., None]
    fy = (y - y0.astype(jnp.float32))[..., None]
    row0 = 0 if layer is None else layer * jnp.int32(base_h)
    ix = _wrap(x0, lw)
    iy = _wrap(y0, lh) + row0

    xp = uv[..., 0] * pw.astype(jnp.float32) - 0.5
    yp = uv[..., 1] * ph.astype(jnp.float32) - 0.5
    qx = jnp.floor(xp).astype(jnp.int32)
    qy = jnp.floor(yp).astype(jnp.int32)
    fxp = (xp - qx.astype(jnp.float32))[..., None]
    fyp = (yp - qy.astype(jnp.float32))[..., None]
    # Same anchor-offset formula as sample_trilinear_oct's ptap — but
    # evaluated BEFORE the gather, as part of the index.
    dx = jnp.clip(qx - ((x0 - 1) >> 1), 0, 1)
    dy = jnp.clip(qy - ((y0 - 1) >> 1), 0, 1)

    rows = jnp.take(
        pvar_atlas.reshape(-1, 8),
        (iy * w2 + (ix + off_x)) * 4 + dy * 2 + dx,
        axis=0,
    )

    c00 = _unpack_u32(rows[..., 0])
    c10 = _unpack_u32(rows[..., 1])
    c01 = _unpack_u32(rows[..., 2])
    c11 = _unpack_u32(rows[..., 3])
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    c0 = top * (1 - fy) + bot * fy

    p00 = _unpack_u32(rows[..., 4])
    p10 = _unpack_u32(rows[..., 5])
    p01 = _unpack_u32(rows[..., 6])
    p11 = _unpack_u32(rows[..., 7])
    topp = p00 * (1 - fxp) + p10 * fxp
    botp = p01 * (1 - fxp) + p11 * fxp
    c1 = topp * (1 - fyp) + botp * fyp
    return c0 * (1 - f) + c1 * f


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


def sample_trilinear_oct(oct_atlas, base_h: int, base_w: int,
                         num_levels: int, uv, lod, layer=None):
    """Trilinear with ONE gather via the oct atlas (build_oct_atlas).

    Both mip levels' taps ride one 16-lane u32 row: lanes 0-3 the fine
    quad, lanes 4-12 the parent 3x3; the true parent 2x2 is selected from
    the 3x3 with elementwise masks (offsets dy, dx in {0,1} by
    construction, clamped for safety on non-pow2 degenerates).
    Bit-identical to sample_trilinear_quad for pow2 textures: identical
    taps, identical weight formulas, identical lerp order."""
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, num_levels - 1)
    f = (lod - l0.astype(jnp.float32))[..., None]

    lh, lw, off_x = _mip_geometry(base_h, base_w, l0)
    ph, pw, _ = _mip_geometry(base_h, base_w, l1)
    w2 = oct_atlas.shape[1]
    x = uv[..., 0] * lw.astype(jnp.float32) - 0.5
    y = uv[..., 1] * lh.astype(jnp.float32) - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0.astype(jnp.float32))[..., None]
    fy = (y - y0.astype(jnp.float32))[..., None]
    row0 = 0 if layer is None else layer * jnp.int32(base_h)
    ix = _wrap(x0, lw)
    iy = _wrap(y0, lh) + row0
    rows = jnp.take(oct_atlas.reshape(-1, 16), iy * w2 + (ix + off_x),
                    axis=0)

    c00 = _unpack_u32(rows[..., 0])
    c10 = _unpack_u32(rows[..., 1])
    c01 = _unpack_u32(rows[..., 2])
    c11 = _unpack_u32(rows[..., 3])
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    c0 = top * (1 - fy) + bot * fy

    xp = uv[..., 0] * pw.astype(jnp.float32) - 0.5
    yp = uv[..., 1] * ph.astype(jnp.float32) - 0.5
    qx = jnp.floor(xp).astype(jnp.int32)
    qy = jnp.floor(yp).astype(jnp.int32)
    fxp = (xp - qx.astype(jnp.float32))[..., None]
    fyp = (yp - qy.astype(jnp.float32))[..., None]
    # Anchor offsets in the stored 3x3 (same unwrapped frame as x0/qx, so
    # the difference is wrap-invariant; >> is the floor division the
    # build used).
    dx = jnp.clip(qx - ((x0 - 1) >> 1), 0, 1)
    dy = jnp.clip(qy - ((y0 - 1) >> 1), 0, 1)

    def ptap(jj, ii):
        # lane 4 + (dy+jj)*3 + (dx+ii), via elementwise masks.
        a = jnp.where(dx == 0, rows[..., 4 + jj * 3 + ii],
                      rows[..., 4 + jj * 3 + ii + 1])
        b = jnp.where(dx == 0, rows[..., 4 + (jj + 1) * 3 + ii],
                      rows[..., 4 + (jj + 1) * 3 + ii + 1])
        return _unpack_u32(jnp.where(dy == 0, a, b))

    p00 = ptap(0, 0)
    p10 = ptap(0, 1)
    p01 = ptap(1, 0)
    p11 = ptap(1, 1)
    topp = p00 * (1 - fxp) + p10 * fxp
    botp = p01 * (1 - fxp) + p11 * fxp
    c1 = topp * (1 - fyp) + botp * fyp
    return c0 * (1 - f) + c1 * f
