"""Overlay UI: stats line + scene-outliner panel as glyph quads.

The text-mode replacement for the reference's imgui windows
(zrenderer.zig:246-254 scene outliner; FrameStats in the window title,
common.zig:63-71).  Lays text out into non-overlapping glyph cells and
composes them onto frames with the device-side overlay pass
(ops/overlay.py).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from zrenderer_tpu.app import font
from zrenderer_tpu.ops.overlay import compose_overlay

PANEL_COLOR = (0.06, 0.06, 0.10, 0.82)
TEXT_COLOR = (0.0, 0.9, 0.0, 1.0)  # the outliner's green (zrenderer.zig:251)
MAX_GLYPHS = 1024
MAX_PANELS = 4


class OverlayUI:
    def __init__(self, width: int, height: int, scale: int = 2):
        self.width = width
        self.height = height
        self.scale = scale
        self.atlas = jnp.asarray(font.build_atlas())

    def _layout(self, lines, origin=(8, 8)):
        """Text lines -> (glyph_ids, glyph_data) padded arrays + panel rect."""
        gw = font.GLYPH_W * self.scale
        gh = font.GLYPH_H * self.scale
        ids = np.zeros(MAX_GLYPHS, np.int32)
        data = np.zeros((MAX_GLYPHS, 6), np.float32)
        n = 0
        max_cols = 0
        for row, line in enumerate(lines):
            max_cols = max(max_cols, len(line))
            for col, ch in enumerate(line):
                if ch == " " or n >= MAX_GLYPHS:
                    continue
                x = origin[0] + col * gw
                y = origin[1] + row * gh
                if x + gw > self.width or y + gh > self.height:
                    continue
                ids[n] = font.glyph_index(ch)
                data[n, 0] = x
                data[n, 1] = y
                data[n, 2:6] = TEXT_COLOR
                n += 1
        panel = np.array(
            [
                [
                    origin[0] - 4,
                    origin[1] - 4,
                    min(self.width, origin[0] + max_cols * gw + 4),
                    min(self.height, origin[1] + len(lines) * gh + 4),
                ]
            ]
            + [[0, 0, 0, 0]] * (MAX_PANELS - 1),
            np.int32,
        )
        colors = np.zeros((MAX_PANELS, 4), np.float32)
        colors[0] = PANEL_COLOR
        return ids, data, panel, colors

    def compose(self, frame_u8: np.ndarray, lines) -> np.ndarray:
        """Blend panel + text onto a frame (device-side, jitted)."""
        ids, data, panel, colors = self._layout(lines)
        out = compose_overlay(
            jnp.asarray(frame_u8),
            self.atlas,
            jnp.asarray(panel),
            jnp.asarray(colors),
            jnp.asarray(ids),
            jnp.asarray(data),
            self.scale,
        )
        return np.asarray(out)
