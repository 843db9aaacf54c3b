"""Overlay UI: stats line + scene-outliner panel on the general 2D pass.

The imgui-window replacement for the reference's GUI (zrenderer.zig:246-254
scene outliner; FrameStats in the window title, common.zig:63-71), built as
an immediate-mode draw list (app/draw_list.py) rendered by the
GuiRenderer-parity overlay rasterizer (ops/overlay_raster.py): translucent
window background + border and atlas-textured glyph quads, alpha-blended in
submission order with scissoring.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from zrenderer_tpu.app import font
from zrenderer_tpu.app.draw_list import DrawList
from zrenderer_tpu.ops.overlay_raster import overlay_pass

PANEL_COLOR = (0.06, 0.06, 0.10, 0.82)
BORDER_COLOR = (0.25, 0.55, 0.25, 1.0)
TEXT_COLOR = (0.0, 0.9, 0.0, 1.0)  # the outliner's green (zrenderer.zig:251)
MAX_TRIS = 4096


def detect_backend(backend: str | None) -> str:
    """Overlay backend selection shared by every UI compositor."""
    if backend is not None:
        return backend
    return "pallas" if jax.devices()[0].platform == "tpu" else "xla"


def compose_draw_list(frame_u8, dl: DrawList, atlas_u32, backend: str,
                      min_tris: int = 64) -> np.ndarray:
    """Composite finished draw data onto a frame (device-side).  Triangle
    arrays pad to power-of-two buckets that GROW with the UI (the
    growable-VB analog, GuiRenderer.zig:124-168) — a huge draw list costs a
    recompile at the next bucket, never a crash."""
    from zrenderer_tpu.app.draw_list import padded_count

    ti, tf = dl.setup(padded_count(len(dl), lo=min_tris))
    out = overlay_pass(
        jnp.asarray(frame_u8), jnp.asarray(ti), jnp.asarray(tf),
        atlas_u32, backend,
    )
    return np.asarray(out)


class OverlayUI:
    def __init__(self, width: int, height: int, scale: int = 2,
                 backend: str | None = None, max_tris: int = MAX_TRIS):
        self.width = width
        self.height = height
        self.scale = scale
        self.max_tris = max_tris
        self.atlas = font.UIAtlas()
        self.backend = detect_backend(backend)

    def draw_panel(self, dl: DrawList, lines, origin=(8, 8)) -> None:
        """One imgui-style window: translucent background, border, text."""
        gw = font.GLYPH_W * self.scale
        gh = font.GLYPH_H * self.scale
        pad = 6
        max_cols = max((len(l) for l in lines), default=0)
        x0, y0 = origin[0] - pad, origin[1] - pad
        x1 = origin[0] + max_cols * gw + pad
        y1 = origin[1] + len(lines) * gh + pad
        dl.add_rect_filled(x0, y0, x1, y1, PANEL_COLOR)
        dl.add_rect(x0, y0, x1, y1, BORDER_COLOR, thickness=1)
        # Text clips to the panel interior (the imgui window scissor).
        dl.push_clip_rect(x0 + 1, y0 + 1, x1 - 1, y1 - 1)
        for row, line in enumerate(lines):
            dl.add_text(origin[0], origin[1] + row * gh, line, TEXT_COLOR,
                        scale=self.scale)
        dl.pop_clip_rect()

    def compose(self, frame_u8: np.ndarray, lines) -> np.ndarray:
        """Blend the stats/outliner window onto a frame (device-side)."""
        dl = DrawList(self.width, self.height, self.atlas)
        self.draw_panel(dl, list(lines))
        return compose_draw_list(frame_u8, dl, self.atlas.packed_u32,
                                 self.backend)


class ImguiOverlay:
    """The full imgui-window UI (app/imgui.py Context): a Stats window and
    the reference's 'Scene Outliner' window (igBegin / igBulletText /
    igSameLine / igTextColored, zrenderer.zig:246-254), composited by the
    overlay pass.  Headless apps call :meth:`compose` with no input; an
    interactive host (the viewer) feeds ``ctx.io`` first, making windows
    draggable/collapsible live."""

    OUTLINER_GREEN = (0.0, 0.8, 0.0, 1.0)  # igTextColored(0, 0.8, 0, 1)

    def __init__(self, width: int, height: int, backend: str | None = None):
        from zrenderer_tpu.app.imgui import Context

        self.ctx = Context(width, height)
        self.backend = detect_backend(backend)

    def build(self, stats_line: str, scene) -> None:
        """Submit the frame's windows (between new_frame and render)."""
        ctx = self.ctx
        if ctx.begin("Stats", pos=(8, 8)):
            ctx.text(stats_line)
        ctx.end()
        if ctx.begin("Scene Outliner", pos=(8, 70)):
            for node in scene.nodes:
                ctx.bullet_text("")
                ctx.same_line()
                ctx.text_colored(self.OUTLINER_GREEN, node.name)
        ctx.end()

    def compose_dl(self, frame_u8: np.ndarray, dl: DrawList) -> np.ndarray:
        return compose_draw_list(frame_u8, dl, self.ctx.atlas.packed_u32,
                                 self.backend)

    def compose(self, frame_u8: np.ndarray, stats_line: str,
                scene) -> np.ndarray:
        ctx = self.ctx
        ctx.new_frame()
        self.build(stats_line, scene)
        return self.compose_dl(frame_u8, ctx.render())
