"""2D overlay pass — the GuiRenderer analog (GuiRenderer.zig:112-274).

The reference draws Dear ImGui geometry after the main pass: alpha-blended,
depth-off, scissored, textured 2D primitives composited in submission order.
The TPU-native overlay keeps those semantics with a layered model that maps
to dense tile math:

* **panels**: solid rectangles (window backgrounds) alpha-blended one by one
  in submission order (few per frame, each one fused masked lerp);
* **glyphs**: font-atlas quads scattered into a text layer via
  dynamic_update_slice (glyph cells are laid out disjointly by the UI
  layer), then composited with one alpha blend;
* **scissor**: every panel/glyph carries a clip rectangle.

Everything is jittable with static quad counts (quads are padded; dead quads
write nothing).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from zrenderer_tpu.app.font import GLYPH_H, GLYPH_W


def blend_panels(frame_f32, rects, colors):
    """Alpha-blend solid rectangles in submission order.

    frame_f32: (H, W, 4) f32; rects: (N, 4) i32 [x0, y0, x1, y1) pixels;
    colors: (N, 4) f32 straight-alpha.  Dead slots: x0 >= x1.
    """
    h, w = frame_f32.shape[:2]
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    def body(i, frame):
        x0, y0, x1, y1 = rects[i, 0], rects[i, 1], rects[i, 2], rects[i, 3]
        inside = (xs >= x0) & (xs < x1) & (ys >= y0) & (ys < y1)
        c = colors[i]
        a = jnp.where(inside, c[3], 0.0)[..., None]
        src = jnp.concatenate([c[:3], jnp.ones(1, jnp.float32)])
        return frame * (1.0 - a) + src[None, None, :] * a

    return jax.lax.fori_loop(0, rects.shape[0], body, frame_f32)


def blend_glyphs(frame_f32, atlas, glyph_ids, positions, colors, scale: int = 2):
    """Scatter glyph quads into a text layer, then one alpha blend.

    atlas: (G, GLYPH_H, GLYPH_W) f32 coverage; glyph_ids: (N,) i32;
    positions: (N, 2) i32 top-left pixel (pre-clamped by the UI layer so
    dynamic_update_slice never shifts a glyph); colors: (N, 4) f32.  Dead
    slots use glyph_id 0 (space: zero coverage).  Glyph cells must not
    overlap (the text layouter guarantees it), so scatter order is free.
    """
    h, w = frame_f32.shape[:2]
    gh, gw = GLYPH_H * scale, GLYPH_W * scale

    # Pre-scale the atlas once (nearest-neighbour, crisp pixels).
    atlas_scaled = jnp.repeat(jnp.repeat(atlas, scale, axis=1), scale, axis=2)

    text_a = jnp.zeros((h, w), jnp.float32)
    text_rgb = jnp.zeros((h, w, 3), jnp.float32)

    def body(i, state):
        ta, trgb = state
        cov = atlas_scaled[glyph_ids[i]]  # (gh, gw)
        x, y = positions[i, 0], positions[i, 1]
        patch_a = jax.lax.dynamic_slice(ta, (y, x), (gh, gw))
        ta = jax.lax.dynamic_update_slice(ta, jnp.maximum(patch_a, cov * colors[i, 3]), (y, x))
        patch_rgb = jax.lax.dynamic_slice(trgb, (y, x, 0), (gh, gw, 3))
        rgb = jnp.where(cov[..., None] > 0, colors[i, :3][None, None, :], patch_rgb)
        trgb = jax.lax.dynamic_update_slice(trgb, rgb, (y, x, 0))
        return ta, trgb

    text_a, text_rgb = jax.lax.fori_loop(
        0, glyph_ids.shape[0], body, (text_a, text_rgb)
    )

    a = text_a[..., None]
    rgb = frame_f32[..., :3] * (1.0 - a) + text_rgb * a
    alpha = jnp.maximum(frame_f32[..., 3:4], a)
    return jnp.concatenate([rgb, alpha], axis=-1)


@partial(jax.jit, static_argnums=(6,))
def compose_overlay(frame_u8, atlas, panel_rects, panel_colors,
                    glyph_ids, glyph_data, scale: int = 2):
    """Full overlay pass on a u8 frame; returns the composited u8 frame.

    glyph_data: (N, 6) f32: x, y (as float-encoded ints), r, g, b, a.
    """
    frame = frame_u8.astype(jnp.float32) / jnp.float32(255.0)
    frame = blend_panels(frame, panel_rects, panel_colors)
    positions = glyph_data[:, 0:2].astype(jnp.int32)
    colors = glyph_data[:, 2:6]
    frame = blend_glyphs(frame, atlas, glyph_ids, positions, colors, scale)
    c = jnp.clip(frame, 0.0, 1.0)
    return jnp.floor(c * jnp.float32(255.0) + jnp.float32(0.5)).astype(jnp.uint8)
