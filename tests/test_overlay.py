"""OverlayUI (imgui-window analog) on the general overlay pass, CPU."""

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


def test_ui_atlas_layout():
    ua = font.UIAtlas()
    assert ua.data.shape == (font.ATLAS_H, font.ATLAS_W, 4)
    # White cell is opaque white at its uv center.
    wu, wv = ua.white_uv
    ty, tx = int(wv * font.ATLAS_H), int(wu * font.ATLAS_W)
    np.testing.assert_array_equal(ua.data[ty, tx], [255, 255, 255, 255])
    # Glyph cells have a 1px transparent margin (bilinear bleed guard).
    u0, v0, u1, v1 = ua.glyph_uv_rect("H")
    x0, y0 = int(u0 * font.ATLAS_W), int(v0 * font.ATLAS_H)
    cell = ua.data[y0 : y0 + font.GLYPH_H, x0 : x0 + font.GLYPH_W]
    assert cell[..., 3].sum() > 0  # glyph coverage present
    assert cell[0, :, 3].sum() == 0  # top margin row empty
    assert cell[:, 0, 3].sum() == 0  # left margin col empty
    assert cell[:, -1, 3].sum() == 0  # right margin col empty


def test_overlay_composes_text_and_panel():
    ui = OverlayUI(256, 128)
    frame = np.zeros((128, 256, 4), np.uint8)
    frame[..., 3] = 255
    out = ui.compose(frame, ["FPS: 60.0", "Cube", "Cube.002"])
    assert out.shape == frame.shape and out.dtype == np.uint8
    # Panel lightens the background region; text pixels are green-ish.
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


def test_overlay_matches_cpu_compositor():
    """The full UI window (panel + border + clipped text) against the
    painter's-algorithm oracle."""
    from zrenderer_tpu.app.draw_list import DrawList
    from zrenderer_tpu.raster_ref.overlay_cpu import composite_overlay_cpu

    ui = OverlayUI(128, 64)
    rng = np.random.default_rng(3)
    frame = rng.integers(0, 255, (64, 128, 4), np.uint8)
    lines = ["FPS: 60", "Cube"]
    out = ui.compose(frame, lines)

    dl = DrawList(128, 64, ui.atlas)
    ui.draw_panel(dl, lines)
    verts, scissors = dl.build()
    expect, count = composite_overlay_cpu(
        frame, verts, scissors, ui.atlas.data, return_count=True
    )
    diff = np.abs(out.astype(np.int32) - expect.astype(np.int32))
    assert (diff <= np.maximum(count, 1)[..., None]).all()
