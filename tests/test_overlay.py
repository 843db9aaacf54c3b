"""Overlay pass (GuiRenderer analog) tests on CPU."""

import numpy as np

from zrenderer_tpu.app import font
from zrenderer_tpu.app.overlay_ui import OverlayUI


def test_font_atlas_shapes_and_glyphs():
    atlas = font.build_atlas()
    assert atlas.shape == (font.NUM_CHARS, font.GLYPH_H, font.GLYPH_W)
    # Letters have coverage, space has none.
    assert atlas[font.glyph_index("A")].sum() > 5
    assert atlas[font.glyph_index(" ")].sum() == 0
    # Lowercase maps to uppercase bitmaps.
    np.testing.assert_array_equal(
        atlas[font.glyph_index("a")], atlas[font.glyph_index("A")]
    )


def test_overlay_composes_text_and_panel():
    ui = OverlayUI(256, 128)
    frame = np.zeros((128, 256, 4), np.uint8)
    frame[..., 3] = 255
    out = ui.compose(frame, ["FPS: 60.0", "Cube", "Cube.002"])
    assert out.shape == frame.shape and out.dtype == np.uint8
    # Panel dims the background region; text pixels are green-ish.
    assert (out != frame).any()
    greens = (out[..., 1] > 150) & (out[..., 0] < 100)
    assert greens.sum() > 50  # glyph coverage exists
    # Pixels far from the panel are untouched.
    np.testing.assert_array_equal(out[100:, 200:], frame[100:, 200:])


def test_overlay_scissor_clips_offscreen_text():
    ui = OverlayUI(64, 32)
    frame = np.zeros((32, 64, 4), np.uint8)
    out = ui.compose(frame, ["X" * 100])  # line far wider than the frame
    assert out.shape == frame.shape  # no crash, clipped layout
