"""GuiRenderer-parity overlay pass: device backends vs the CPU compositor
oracle (painter's algorithm, raster_ref/overlay_cpu.py).

Contract (mirrors the 3D raster contract, docs/RASTER_SPEC.md §5):
per-pixel coverage COUNT is exact across all backends; composited u8 color
matches within 1 LSB per blended layer (each src-over step can round
differently under XLA:CPU fused-loop FMA contraction, which barriers cannot
suppress on the CPU backend — see RASTER_SPEC §5; single-layer pixels are
within 1 LSB).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from zrenderer_tpu.app.draw_list import DrawList
from zrenderer_tpu.app.font import UIAtlas
from zrenderer_tpu.ops import overlay_raster as ov
from zrenderer_tpu.raster_ref.overlay_cpu import composite_overlay_cpu

pytestmark = pytest.mark.slow  # heavyweight; excluded from the smoke tier

W, H = 128, 64  # one Pallas tile wide, two tall


@pytest.fixture(scope="module")
def atlas():
    return UIAtlas()


def _frame(w=W, h=H):
    rng = np.random.default_rng(7)
    return rng.integers(0, 255, (h, w, 4), np.uint8)


def _busy_draw_list(atlas):
    """Overlapping translucent panels, a rotated textured quad, scissored
    text, a circle — the imgui-style workload from VERDICT item 1."""
    dl = DrawList(W, H, atlas)
    dl.add_rect_filled(4, 4, 70, 40, (0.1, 0.1, 0.3, 0.8))
    dl.add_rect(4, 4, 70, 40, (0.4, 0.9, 0.4, 1.0), thickness=1)
    # Overlapping translucent panel (order-dependent blend).
    dl.add_rect_filled(30, 20, 100, 58, (0.8, 0.2, 0.1, 0.5))
    # Rotated textured quad (arbitrary geometry the old pass couldn't draw).
    dl.add_quad_filled(
        (80, 8), (110, 20), (98, 50), (68, 38), (1.0, 1.0, 0.2, 0.9),
        uvs=[(0.0, 0.0), (0.5, 0.0), (0.5, 0.5), (0.0, 0.5)],
    )
    # Scissored text (clipped mid-glyph).
    dl.push_clip_rect(10, 10, 52, 34)
    dl.add_text(12, 12, "HELLO 123", (0.0, 0.9, 0.0, 1.0), scale=2)
    dl.pop_clip_rect()
    dl.add_circle_filled(100, 45, 12, (0.2, 0.6, 0.9, 0.65), segments=12)
    dl.add_line((0, 60), (127, 30), (1.0, 0.3, 0.8, 0.7), thickness=2)
    return dl


def _oracle(frame, dl, atlas):
    verts, scissors = dl.build()
    return composite_overlay_cpu(frame, verts, scissors, atlas.data,
                                 return_count=True)


def test_xla_matches_oracle(atlas):
    frame = _frame()
    dl = _busy_draw_list(atlas)
    expect, count = _oracle(frame, dl, atlas)
    assert count.max() >= 2, "workload must overlap translucent draws"

    ti, tf = dl.setup()
    got = np.asarray(ov.overlay_pass(
        jnp.asarray(frame), jnp.asarray(ti), jnp.asarray(tf),
        atlas.packed_u32, "xla",
    ))
    cnt, over, _ = ov.rasterize_overlay_xla(
        jnp.asarray(ti), jnp.asarray(tf), W, H
    )
    np.testing.assert_array_equal(np.asarray(cnt), np.minimum(count, ov.DEFAULT_K))
    assert int(np.asarray(over).max()) == 0
    diff = np.abs(got.astype(np.int32) - expect.astype(np.int32))
    allowed = np.maximum(count, 1)[..., None]  # 1 LSB per blended layer
    assert (diff <= allowed).all(), f"color diff {diff.max()}"


def test_pallas_interpret_matches_oracle(atlas):
    frame = _frame()
    dl = _busy_draw_list(atlas)
    expect, count = _oracle(frame, dl, atlas)

    ti, tf = dl.setup()
    got = np.asarray(ov.overlay_pass(
        jnp.asarray(frame), jnp.asarray(ti), jnp.asarray(tf),
        atlas.packed_u32, "pallas", ov.DEFAULT_K, True,
    ))
    cnt, _, _ = ov.rasterize_overlay_pallas(
        jnp.asarray(ti), jnp.asarray(tf), W, H, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(cnt), np.minimum(count, ov.DEFAULT_K))
    diff = np.abs(got.astype(np.int32) - expect.astype(np.int32))
    allowed = np.maximum(count, 1)[..., None]
    assert (diff <= allowed).all(), f"color diff {diff.max()}"


def test_submission_order_blending(atlas):
    """Red-over-blue differs from blue-over-red: the pass must composite in
    submission order (the reference draws imgui commands in order)."""
    frame = np.zeros((H, W, 4), np.uint8)

    def run(order):
        dl = DrawList(W, H, atlas)
        for color in order:
            dl.add_rect_filled(10, 10, 60, 40, color)
        ti, tf = dl.setup()
        return np.asarray(ov.overlay_pass(
            jnp.asarray(frame), jnp.asarray(ti), jnp.asarray(tf),
            atlas.packed_u32, "xla",
        ))

    red = (1.0, 0.0, 0.0, 0.7)
    blue = (0.0, 0.0, 1.0, 0.7)
    rb = run([red, blue])
    br = run([blue, red])
    # Last draw dominates.
    assert rb[20, 30, 2] > rb[20, 30, 0]
    assert br[20, 30, 0] > br[20, 30, 2]
    # And both match the oracle's order semantics exactly.
    dl = DrawList(W, H, atlas)
    dl.add_rect_filled(10, 10, 60, 40, red)
    dl.add_rect_filled(10, 10, 60, 40, blue)
    verts, scissors = dl.build()
    expect = composite_overlay_cpu(frame, verts, scissors, atlas.data)
    diff = np.abs(rb.astype(np.int32) - expect.astype(np.int32))
    assert diff.max() <= 2  # two blended layers (see module docstring)


def test_scissor_clips_exactly(atlas):
    frame = np.zeros((H, W, 4), np.uint8)
    dl = DrawList(W, H, atlas)
    dl.push_clip_rect(20, 16, 40, 32)
    dl.add_rect_filled(0, 0, W, H, (1.0, 1.0, 1.0, 1.0))  # fullscreen draw
    dl.pop_clip_rect()
    ti, tf = dl.setup()
    got = np.asarray(ov.overlay_pass(
        jnp.asarray(frame), jnp.asarray(ti), jnp.asarray(tf),
        atlas.packed_u32, "xla",
    ))
    lit = got[..., 0] > 0
    expect = np.zeros((H, W), bool)
    expect[16:32, 20:40] = True
    np.testing.assert_array_equal(lit, expect)


def test_quad_seam_watertight(atlas):
    """A translucent quad's two triangles share a diagonal; the top-left
    fill rule must composite every interior pixel exactly once (double
    blending would darken a visible seam)."""
    dl = DrawList(W, H, atlas)
    dl.add_quad_filled((15, 7), (90, 13), (101, 53), (9, 47),
                       (0.5, 0.5, 0.5, 0.5))
    ti, tf = dl.setup()
    cnt, _, _ = ov.rasterize_overlay_xla(jnp.asarray(ti), jnp.asarray(tf), W, H)
    assert int(np.asarray(cnt).max()) == 1


def test_reversed_winding_draws(atlas):
    """CullMode NONE (GuiRenderer.zig:66): both windings rasterize, and a
    flipped triangle produces the identical image."""
    frame = np.zeros((H, W, 4), np.uint8)

    def run(p0, p1, p2):
        dl = DrawList(W, H, atlas)
        dl.add_triangle_filled(p0, p1, p2, (0.9, 0.4, 0.1, 1.0))
        ti, tf = dl.setup()
        return np.asarray(ov.overlay_pass(
            jnp.asarray(frame), jnp.asarray(ti), jnp.asarray(tf),
            atlas.packed_u32, "xla",
        ))

    a = run((10, 10), (60, 12), (30, 50))
    b = run((10, 10), (30, 50), (60, 12))  # reversed
    assert (a[..., 0] > 0).sum() > 100
    np.testing.assert_array_equal(a, b)


def test_layer_overflow_reported(atlas):
    """More than K overlapping draws on one pixel: the K oldest composite,
    the excess is dropped and reported in the overflow plane."""
    frame = np.zeros((H, W, 4), np.uint8)
    dl = DrawList(W, H, atlas)
    n = ov.DEFAULT_K + 3
    for _ in range(n):
        dl.add_rect_filled(10, 10, 30, 30, (1.0, 1.0, 1.0, 0.1))
    ti, tf = dl.setup()
    cnt, over, layers = ov.rasterize_overlay_xla(
        jnp.asarray(ti), jnp.asarray(tf), W, H
    )
    assert int(np.asarray(cnt)[20, 20]) == ov.DEFAULT_K
    assert int(np.asarray(over)[20, 20]) == 3
    # Composite still well-defined (first K in order).
    out = np.asarray(ov.composite_layers(
        jnp.asarray(frame), cnt, layers, atlas.packed_u32
    ))
    assert out[20, 20, 0] > 0


def test_textured_glyphs_match_oracle_bilinear(atlas):
    """Text at non-integer scale exercises true bilinear filtering."""
    frame = np.full((H, W, 4), 32, np.uint8)
    dl = DrawList(W, H, atlas)
    dl.add_text(5, 5, "AXW", (1.0, 0.8, 0.2, 1.0), scale=2.5)
    expect, _ = _oracle(frame, dl, atlas)
    ti, tf = dl.setup()
    got = np.asarray(ov.overlay_pass(
        jnp.asarray(frame), jnp.asarray(ti), jnp.asarray(tf),
        atlas.packed_u32, "xla",
    ))
    diff = np.abs(got.astype(np.int32) - expect.astype(np.int32))
    assert diff.max() <= 1
    # Glyph coverage actually landed.
    assert (got[..., 0] > 128).sum() > 50
