"""General 2D overlay rasterizer — full GuiRenderer parity.

The reference composites Dear ImGui geometry after the main pass
(GuiRenderer.zig:112-274): arbitrary *textured* 2D triangle lists, blended
in submission order with the PSO state at GuiRenderer.zig:66-81
(CullMode NONE, depth off, SrcBlend=SRC_ALPHA / DestBlend=INV_SRC_ALPHA,
SrcBlendAlpha=INV_SRC_ALPHA / DestBlendAlpha=ZERO) and a per-command
scissor rect (RSSetScissorRects, GuiRenderer.zig:260).  The pixel shader is
``vertex_color * tex.Sample(linear, uv)`` (common.hlsl:31-37); vertex colors
are R8G8B8A8_UNORM (GuiRenderer.zig:63).

TPU-native design — blending is order-dependent, texture sampling is a
gather, and Mosaic kernels cannot gather; so the pass splits in two:

1. **Layered raster (Pallas)**: grid over screen tiles; per tile, triangles
   stream in submission order (bbox∩scissor block skip) and each covered
   pixel appends (u, v, quantized vertex RGBA) to a K-deep per-pixel layer
   stack held in VMEM scratch (slot = running coverage count).  This is the
   order-capturing step — no texture access, pure dense tile math.
2. **Composite (XLA)**: for the K static layers in order: bilinear-sample
   the UI atlas at the layer's uv (packed-u32 scalar gathers — the fast TPU
   gather shape), modulate by the layer's vertex color, and src-over blend.
   One pass over the frame, everything fuses.

K bounds per-pixel overlay *depth* (overlapping translucent draws on one
pixel), not draw count; draws beyond K on a single pixel are dropped
newest-first and reported in the overflow plane.  Like the reference's
ImGui pass, triangle setup runs on host each frame (ImGui builds its draw
lists on CPU and uploads per-frame VB/IBs, GuiRenderer.zig:124-194); the
setup arrays are traced args, so one compilation serves every frame.

Solid (untextured) geometry samples the atlas's white cell — exactly
ImGui's white-pixel trick (one texture bound for the whole UI,
GuiRenderer.zig:225).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zrenderer_tpu.ops import geometry as g
from zrenderer_tpu.ops.raster_pallas import TILE_H, TILE_W

# Default per-pixel layer depth (see module docstring).
DEFAULT_K = 8

# i32 setup columns — reuses the main raster's layout (ops/geometry.py) so
# the block-skip helpers (block_bounds/super_bounds) work unchanged.
NI32_2D = g.NI32  # 20: x/y coords, edge deltas, biases, bbox, valid

# f32 setup columns: per-vertex attribute numerators (attr * inv_area).
F2_U0, F2_U1, F2_U2 = range(3)
F2_V0, F2_V1, F2_V2 = range(3, 6)
F2_R0, F2_R1, F2_R2 = range(6, 9)
F2_G0, F2_G1, F2_G2 = range(9, 12)
F2_B0, F2_B1, F2_B2 = range(12, 15)
F2_A0, F2_A1, F2_A2 = range(15, 18)
NF32_2D = 24  # padded


def setup_overlay_triangles(xp, verts, scissors, width: int, height: int):
    """Shared 2D triangle setup (host numpy AND the CPU oracle use xp=np).

    verts: (T, 3, 8) f32 — x, y (screen pixels), u, v (texture space),
    r, g, b, a (vertex color, straight alpha).  scissors: (T, 4) i32
    [x0, y0, x1, y1) pixel rects.  Returns (tri_i32 (T, NI32_2D),
    tri_f32 (T, NF32_2D)).

    Same fixed-point discipline as the 3D path (docs/RASTER_SPEC.md §1-3):
    positions snap to 1/8-subpixel int32, coverage is exact integer edge
    functions with the top-left fill rule — shared quad diagonals composite
    each pixel exactly once, which blending (unlike Z-testing) requires.
    No cull (CullMode NONE): negative-area triangles are rewound.
    """
    f32 = xp.float32
    i32 = xp.int32
    T = verts.shape[0]

    xs = verts[..., 0]
    ys = verts[..., 1]
    lo = f32(-g.guard_px(width) * g.SUBPIXEL)
    hix = f32((width + g.guard_px(width)) * g.SUBPIXEL)
    hiy = f32((height + g.guard_px(height)) * g.SUBPIXEL)
    X = xp.clip(xp.floor(xs * f32(g.SUBPIXEL) + f32(0.5)), lo, hix).astype(i32)
    Y = xp.clip(xp.floor(ys * f32(g.SUBPIXEL) + f32(0.5)), lo, hiy).astype(i32)

    x0, x1, x2 = X[:, 0], X[:, 1], X[:, 2]
    y0, y1, y2 = Y[:, 0], Y[:, 1], Y[:, 2]
    area2 = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)

    # No culling: flip negative-area (CCW in y-down) triangles by swapping
    # v1 <-> v2 so every live triangle has positive interior edge values.
    flip = area2 < 0
    x1f = xp.where(flip, x2, x1)
    y1f = xp.where(flip, y2, y1)
    x2f = xp.where(flip, x1, x2)
    y2f = xp.where(flip, y1, y2)
    x1, x2, y1, y2 = x1f, x2f, y1f, y2f
    attr = verts[..., 2:8]  # (T, 3, 6): u, v, r, g, b, a
    a1 = xp.where(flip[:, None], attr[:, 2], attr[:, 1])
    a2 = xp.where(flip[:, None], attr[:, 1], attr[:, 2])
    varr = xp.stack([attr[:, 0], a1, a2], axis=1)
    area2 = xp.where(flip, -area2, area2)
    alive = area2 > 0  # degenerate triangles culled

    dx0, dy0 = x2 - x1, y2 - y1
    dx1, dy1 = x0 - x2, y0 - y2
    dx2, dy2 = x1 - x0, y1 - y0

    def bias(dx, dy):
        top_left = (dy < 0) | ((dy == 0) & (dx > 0))
        return xp.where(top_left, i32(0), i32(1))

    # Pixel bbox = triangle bbox ∩ scissor ∩ viewport.  Per-pixel coverage
    # tests membership in this rect, which (given edge coverage) equals the
    # scissor test exactly.
    half = g.SUBPIXEL // 2
    xmin = xp.minimum(xp.minimum(x0, x1), x2)
    xmax = xp.maximum(xp.maximum(x0, x1), x2)
    ymin = xp.minimum(xp.minimum(y0, y1), y2)
    ymax = xp.maximum(xp.maximum(y0, y1), y2)
    sc = scissors.astype(i32)
    jmin = xp.maximum((xmin + (g.SUBPIXEL - 1 - half)) >> g.SUBPIXEL_BITS, 0)
    jmax = xp.minimum((xmax - half) >> g.SUBPIXEL_BITS, width - 1)
    imin = xp.maximum((ymin + (g.SUBPIXEL - 1 - half)) >> g.SUBPIXEL_BITS, 0)
    imax = xp.minimum((ymax - half) >> g.SUBPIXEL_BITS, height - 1)
    jmin = xp.maximum(jmin, sc[:, 0])
    jmax = xp.minimum(jmax, sc[:, 2] - 1)
    imin = xp.maximum(imin, sc[:, 1])
    imax = xp.minimum(imax, sc[:, 3] - 1)
    alive = alive & (jmin <= jmax) & (imin <= imax)
    jmin = xp.where(alive, jmin, 1).astype(i32)
    jmax = xp.where(alive, jmax, 0).astype(i32)
    imin = xp.where(alive, imin, 1).astype(i32)
    imax = xp.where(alive, imax, 0).astype(i32)

    tri_i32 = xp.stack(
        [
            x0, y0, x1, y1, x2, y2,
            dx0, dy0, dx1, dy1, dx2, dy2,
            bias(dx0, dy0), bias(dx1, dy1), bias(dx2, dy2),
            jmin, jmax, imin, imax,
            alive.astype(i32),
        ],
        axis=1,
    ).astype(i32)

    safe_area = xp.where(alive, area2, 1)
    inv_area = (f32(1.0) / safe_area.astype(f32)).astype(f32)
    num = (varr * inv_area[:, None, None]).astype(f32)  # (T, 3, 6)
    tri_f32 = xp.concatenate(
        [
            num[:, 0, 0:1], num[:, 1, 0:1], num[:, 2, 0:1],  # u
            num[:, 0, 1:2], num[:, 1, 1:2], num[:, 2, 1:2],  # v
            num[:, 0, 2:3], num[:, 1, 2:3], num[:, 2, 2:3],  # r
            num[:, 0, 3:4], num[:, 1, 3:4], num[:, 2, 3:4],  # g
            num[:, 0, 4:5], num[:, 1, 4:5], num[:, 2, 4:5],  # b
            num[:, 0, 5:6], num[:, 1, 5:6], num[:, 2, 5:6],  # a
            xp.zeros((T, NF32_2D - 18), f32),
        ],
        axis=1,
    ).astype(f32)
    return tri_i32, tri_f32


def _pad_and_bin(xp, tri_i32, tri_f32):
    """Pad to RASTER_BLOCK and build the block/superblock skip tables
    (reuses the main raster's helpers — identical column layout)."""
    t = tri_i32.shape[0]
    pad = (-t) % g.RASTER_BLOCK
    if pad:
        pi = xp.zeros((pad, NI32_2D), xp.int32)
        pf = xp.zeros((pad, NF32_2D), xp.float32)
        if xp is np:
            pi[:, g.I_JMIN] = 1
        else:
            pi = pi.at[:, g.I_JMIN].set(1)
        tri_i32 = xp.concatenate([tri_i32, pi], axis=0)
        tri_f32 = xp.concatenate([tri_f32, pf], axis=0)
    blocks = g.block_bounds(xp, tri_i32)
    blocks, supers = g.super_bounds(xp, blocks)
    return supers, blocks, tri_i32, tri_f32


def _quantize_channel(c):
    """f32 [0,1] -> u32 [0,255]: vertex colors are R8G8B8A8_UNORM in the
    reference (GuiRenderer.zig:63) — quantizing the interpolated color at
    raster time matches the u8 interpolant precision and lets a layer hold
    one packed u32 lane instead of four f32 planes."""
    q = jnp.floor(jnp.clip(c, 0.0, 1.0) * jnp.float32(255.0) + jnp.float32(0.5))
    return q.astype(jnp.int32).astype(jnp.uint32)


def _overlay_kernel_body(K, sup_ref, blk_ref, ti_ref, tf_ref,
                         cnt_ref, over_ref, out_refs,
                         cnt, lu, lv, lc):
    tile_i = pl.program_id(0)
    tile_j = pl.program_id(1)
    row0 = tile_i * TILE_H
    col0 = tile_j * TILE_W

    half = g.SUBPIXEL // 2
    iy = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    pix_j = col0 + ix
    pix_i = row0 + iy
    py = pix_i * g.SUBPIXEL + half
    px = pix_j * g.SUBPIXEL + half

    cnt[...] = jnp.zeros((TILE_H, TILE_W), jnp.int32)
    for k in range(K):
        lu[k][...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        lv[k][...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        lc[k][...] = jnp.zeros((TILE_H, TILE_W), jnp.uint32)

    def tile_overlap(jmin, jmax, imin, imax):
        return (
            (jmax >= col0)
            & (jmin < col0 + TILE_W)
            & (imax >= row0)
            & (imin < row0 + TILE_H)
            & (jmin <= jmax)
            & (imin <= imax)
        )

    def body(t, carry):
        overlap = tile_overlap(
            ti_ref[t, g.I_JMIN], ti_ref[t, g.I_JMAX],
            ti_ref[t, g.I_IMIN], ti_ref[t, g.I_IMAX],
        )

        @pl.when(overlap)
        def _():
            e0 = ti_ref[t, g.I_DX0] * (py - ti_ref[t, g.I_Y1]) - \
                 ti_ref[t, g.I_DY0] * (px - ti_ref[t, g.I_X1])
            e1 = ti_ref[t, g.I_DX1] * (py - ti_ref[t, g.I_Y2]) - \
                 ti_ref[t, g.I_DY1] * (px - ti_ref[t, g.I_X2])
            e2 = ti_ref[t, g.I_DX2] * (py - ti_ref[t, g.I_Y0]) - \
                 ti_ref[t, g.I_DY2] * (px - ti_ref[t, g.I_X0])
            cov = (
                (e0 >= ti_ref[t, g.I_BIAS0])
                & (e1 >= ti_ref[t, g.I_BIAS1])
                & (e2 >= ti_ref[t, g.I_BIAS2])
            )
            # Scissor ∩ viewport: membership in the precomputed pixel rect.
            inside = (
                cov
                & (pix_j >= ti_ref[t, g.I_JMIN])
                & (pix_j <= ti_ref[t, g.I_JMAX])
                & (pix_i >= ti_ref[t, g.I_IMIN])
                & (pix_i <= ti_ref[t, g.I_IMAX])
            )

            ef0 = e0.astype(jnp.float32)
            ef1 = e1.astype(jnp.float32)
            ef2 = e2.astype(jnp.float32)

            def interp(c0):
                return (
                    ef0 * tf_ref[t, c0]
                    + ef1 * tf_ref[t, c0 + 1]
                    + ef2 * tf_ref[t, c0 + 2]
                )

            u = interp(F2_U0)
            v = interp(F2_V0)
            col = (
                _quantize_channel(interp(F2_R0))
                | (_quantize_channel(interp(F2_G0)) << 8)
                | (_quantize_channel(interp(F2_B0)) << 16)
                | (_quantize_channel(interp(F2_A0)) << 24)
            )

            c = cnt[...]
            for k in range(K):
                m = inside & (c == k)
                lu[k][...] = jnp.where(m, u, lu[k][...])
                lv[k][...] = jnp.where(m, v, lv[k][...])
                lc[k][...] = jnp.where(m, col, lc[k][...])
            cnt[...] = c + inside.astype(jnp.int32)

        return carry

    def block_body(bk, carry):
        b_overlap = tile_overlap(
            blk_ref[bk, 0], blk_ref[bk, 1], blk_ref[bk, 2], blk_ref[bk, 3]
        )

        @pl.when(b_overlap)
        def _():
            jax.lax.fori_loop(
                bk * g.RASTER_BLOCK, (bk + 1) * g.RASTER_BLOCK, body, 0
            )

        return carry

    def super_body(sb, carry):
        s_overlap = tile_overlap(
            sup_ref[sb, 0], sup_ref[sb, 1], sup_ref[sb, 2], sup_ref[sb, 3]
        )

        @pl.when(s_overlap)
        def _():
            jax.lax.fori_loop(
                sb * g.SUPER_BLOCK, (sb + 1) * g.SUPER_BLOCK, block_body, 0
            )

        return carry

    jax.lax.fori_loop(0, sup_ref.shape[0], super_body, 0)

    c = cnt[...]
    cnt_ref[...] = jnp.minimum(c, K)
    over_ref[...] = jnp.maximum(c - K, 0)
    for k in range(K):
        out_refs[3 * k][...] = lu[k][...]
        out_refs[3 * k + 1][...] = lv[k][...]
        out_refs[3 * k + 2][...] = lc[k][...]


def rasterize_overlay_pallas(tri_i32, tri_f32, width: int, height: int,
                             K: int = DEFAULT_K, interpret: bool = False):
    """Layered raster (pass 1).  width/height must be tile multiples.

    Returns (cnt (H,W) i32 clamped to K, overflow (H,W) i32,
    layers: K * (u f32, v f32, col u32) planes, oldest first).
    """
    assert height % TILE_H == 0 and width % TILE_W == 0
    grid = (height // TILE_H, width // TILE_W)
    supers, blocks, tri_i32, tri_f32 = _pad_and_bin(jnp, tri_i32, tri_f32)

    def kernel(sup_ref, blk_ref, ti_ref, tf_ref, cnt_ref, over_ref,
               *rest):
        out_refs = rest[: 3 * K]
        scratch = rest[3 * K:]
        cnt = scratch[0]
        lu = scratch[1 : 1 + K]
        lv = scratch[1 + K : 1 + 2 * K]
        lc = scratch[1 + 2 * K :]
        _overlay_kernel_body(K, sup_ref, blk_ref, ti_ref, tf_ref,
                             cnt_ref, over_ref, list(out_refs), cnt, lu, lv, lc)

    plane = lambda dt: jax.ShapeDtypeStruct((height, width), dt)
    tile_spec = pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[tile_spec] * (2 + 3 * K),
        out_shape=[plane(jnp.int32), plane(jnp.int32)]
        + [plane(jnp.float32), plane(jnp.float32), plane(jnp.uint32)] * K,
        scratch_shapes=[pltpu.VMEM((TILE_H, TILE_W), jnp.int32)]
        + [pltpu.VMEM((TILE_H, TILE_W), jnp.float32)] * (2 * K)
        + [pltpu.VMEM((TILE_H, TILE_W), jnp.uint32)] * K,
        interpret=interpret,
    )(supers, blocks, tri_i32, tri_f32)
    return outs[0], outs[1], list(outs[2:])


def rasterize_overlay_xla(tri_i32, tri_f32, width: int, height: int,
                          K: int = DEFAULT_K):
    """XLA fallback raster (pass 1) — identical formulas, full-frame planes,
    fori_loop over triangles (the CPU-backend path, like raster_xla)."""
    half = g.SUBPIXEL // 2
    pix_i = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    pix_j = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    py = pix_i * g.SUBPIXEL + half
    px = pix_j * g.SUBPIXEL + half

    def body(t, state):
        cnt, lu, lv, lc = state
        ti = tri_i32[t]
        tf = tri_f32[t]
        e0 = ti[g.I_DX0] * (py - ti[g.I_Y1]) - ti[g.I_DY0] * (px - ti[g.I_X1])
        e1 = ti[g.I_DX1] * (py - ti[g.I_Y2]) - ti[g.I_DY1] * (px - ti[g.I_X2])
        e2 = ti[g.I_DX2] * (py - ti[g.I_Y0]) - ti[g.I_DY2] * (px - ti[g.I_X0])
        cov = (
            (e0 >= ti[g.I_BIAS0]) & (e1 >= ti[g.I_BIAS1]) & (e2 >= ti[g.I_BIAS2])
        )
        inside = (
            cov
            & (pix_j >= ti[g.I_JMIN]) & (pix_j <= ti[g.I_JMAX])
            & (pix_i >= ti[g.I_IMIN]) & (pix_i <= ti[g.I_IMAX])
            & (ti[g.I_VALID] > 0)
        )
        ef0 = e0.astype(jnp.float32)
        ef1 = e1.astype(jnp.float32)
        ef2 = e2.astype(jnp.float32)

        def interp(c0):
            p01 = g._ob(jnp, ef0 * tf[c0]) + g._ob(jnp, ef1 * tf[c0 + 1])
            return p01 + g._ob(jnp, ef2 * tf[c0 + 2])

        u = interp(F2_U0)
        v = interp(F2_V0)
        col = (
            _quantize_channel(interp(F2_R0))
            | (_quantize_channel(interp(F2_G0)) << 8)
            | (_quantize_channel(interp(F2_B0)) << 16)
            | (_quantize_channel(interp(F2_A0)) << 24)
        )
        onehot = [inside & (cnt == k) for k in range(K)]
        lu = [jnp.where(onehot[k], u, lu[k]) for k in range(K)]
        lv = [jnp.where(onehot[k], v, lv[k]) for k in range(K)]
        lc = [jnp.where(onehot[k], col, lc[k]) for k in range(K)]
        return cnt + inside.astype(jnp.int32), lu, lv, lc

    shape = (height, width)
    init = (
        jnp.zeros(shape, jnp.int32),
        [jnp.zeros(shape, jnp.float32)] * K,
        [jnp.zeros(shape, jnp.float32)] * K,
        [jnp.zeros(shape, jnp.uint32)] * K,
    )
    cnt, lu, lv, lc = jax.lax.fori_loop(0, tri_i32.shape[0], body, init)
    layers = []
    for k in range(K):
        layers += [lu[k], lv[k], lc[k]]
    return jnp.minimum(cnt, K), jnp.maximum(cnt - K, 0), layers


def sample_atlas_bilinear(atlas_u32, uv_x, uv_y):
    """Bilinear WRAP sample of the packed-u32 UI atlas at texture-space uv
    (the FILTER_MIN_MAG_MIP_LINEAR static sampler, common.hlsl:7)."""
    h, w = atlas_u32.shape
    x = uv_x * jnp.float32(w) - jnp.float32(0.5)
    y = uv_y * jnp.float32(h) - jnp.float32(0.5)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0.astype(jnp.float32))[..., None]
    fy = (y - y0.astype(jnp.float32))[..., None]

    flat = atlas_u32.reshape(-1)
    inv255 = jnp.float32(1.0 / 255.0)

    def fetch(ix, iy):
        ix = jnp.remainder(ix, w)
        iy = jnp.remainder(iy, h)
        texel = jnp.take(flat, iy * w + ix, axis=0)
        return jnp.stack(
            [
                (texel & 0xFF).astype(jnp.float32) * inv255,
                ((texel >> 8) & 0xFF).astype(jnp.float32) * inv255,
                ((texel >> 16) & 0xFF).astype(jnp.float32) * inv255,
                ((texel >> 24) & 0xFF).astype(jnp.float32) * inv255,
            ],
            axis=-1,
        )

    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def composite_layers(frame_u8, cnt, layers, atlas_u32, K: int = DEFAULT_K):
    """Pass 2: texture + blend the K layer planes onto the frame, in
    submission order.  Blend state per GuiRenderer.zig:68-74:
    rgb = src_rgb*src_a + dst_rgb*(1-src_a); the framebuffer alpha channel
    is forced opaque at the end (the reference's swapchain never displays
    alpha; our PNG path needs opaque output like the main raster's A=255).
    """
    h, w = cnt.shape
    dst = frame_u8[..., :3].astype(jnp.float32) / jnp.float32(255.0)
    inv255 = jnp.float32(1.0 / 255.0)
    for k in range(K):
        u, v, col = layers[3 * k], layers[3 * k + 1], layers[3 * k + 2]
        tex = sample_atlas_bilinear(atlas_u32, u, v)
        vr = (col & 0xFF).astype(jnp.float32) * inv255
        vg = ((col >> 8) & 0xFF).astype(jnp.float32) * inv255
        vb = ((col >> 16) & 0xFF).astype(jnp.float32) * inv255
        va = ((col >> 24) & 0xFF).astype(jnp.float32) * inv255
        src_rgb = jnp.stack([vr, vg, vb], axis=-1) * tex[..., :3]
        src_a = va * tex[..., 3]
        live = (cnt > k)[..., None].astype(jnp.float32)
        a = (src_a[..., None]) * live
        dst = src_rgb * a + dst * (1.0 - a)
    q = jnp.floor(jnp.clip(dst, 0.0, 1.0) * jnp.float32(255.0) + jnp.float32(0.5))
    out = q.astype(jnp.uint8)
    alpha = jnp.full((h, w, 1), 255, jnp.uint8)
    return jnp.concatenate([out, alpha], axis=-1)


@partial(jax.jit, static_argnums=(4, 5, 6))
def overlay_pass(frame_u8, tri_i32, tri_f32, atlas_u32,
                 backend: str = "pallas", K: int = DEFAULT_K,
                 interpret: bool = False):
    """Full overlay pass on an (H, W, 4) u8 frame; returns the composited
    frame.  Setup arrays are traced args (per-frame UI geometry, the
    growable-VB analog); H/W are static via the frame shape."""
    h, w = frame_u8.shape[:2]
    if backend == "pallas":
        ph = -(-h // TILE_H) * TILE_H
        pw = -(-w // TILE_W) * TILE_W
        cnt, _over, layers = rasterize_overlay_pallas(
            tri_i32, tri_f32, pw, ph, K=K, interpret=interpret
        )
        cnt = cnt[:h, :w]
        layers = [p[:h, :w] for p in layers]
    else:
        cnt, _over, layers = rasterize_overlay_xla(tri_i32, tri_f32, w, h, K=K)
    return composite_layers(frame_u8, cnt, layers, atlas_u32, K=K)
