"""Immediate-mode GUI (app/imgui.py — the Dear ImGui analog).

Drives the context through multi-frame input sequences (the event-queue
feed the reference's WndProc uses, common.zig:75-208) and checks the
hot/active widget protocol, window interactions (drag, collapse, close,
focus z-order), layout, and that the produced draw data composites through
the CPU compositor oracle.
"""

import numpy as np

from zrenderer_tpu.app.font import UIAtlas
from zrenderer_tpu.app.imgui import Context
from zrenderer_tpu.raster_ref.overlay_cpu import composite_overlay_cpu
import pytest

pytestmark = pytest.mark.slow  # heavyweight; excluded from the smoke tier

W, H = 320, 240


def ui_frame(ctx, build):
    """One full UI frame; returns build()'s result."""
    ctx.new_frame()
    out = build(ctx)
    ctx.render()
    return out


def center(rect):
    return ((rect[0] + rect[2]) / 2, (rect[1] + rect[3]) / 2)


def make_ctx():
    return Context(W, H, atlas=UIAtlas())


# ---------------------------------------------------------------------------
# widgets
# ---------------------------------------------------------------------------


def test_button_clicks_on_release_inside():
    ctx = make_ctx()
    rects = {}

    def build(ui):
        ui.begin("Win", pos=(20, 20))
        clicked = ui.button("Go")
        rects["btn"] = ui._prev_item_rect
        ui.end()
        return clicked

    assert ui_frame(ctx, build) is False
    cx, cy = center(rects["btn"])
    ctx.io.add_mouse_pos_event(cx, cy)
    assert ui_frame(ctx, build) is False  # hover only
    ctx.io.add_mouse_button_event(0, True)
    assert ui_frame(ctx, build) is False  # press: active, not clicked yet
    assert ctx.active_id != 0
    ctx.io.add_mouse_button_event(0, False)
    assert ui_frame(ctx, build) is True  # release inside → click
    assert ctx.active_id == 0


def test_button_release_outside_does_not_click():
    ctx = make_ctx()
    rects = {}

    def build(ui):
        ui.begin("Win", pos=(20, 20))
        clicked = ui.button("Go")
        rects["btn"] = ui._prev_item_rect
        ui.end()
        return clicked

    ui_frame(ctx, build)
    cx, cy = center(rects["btn"])
    ctx.io.add_mouse_pos_event(cx, cy)
    ctx.io.add_mouse_button_event(0, True)
    ui_frame(ctx, build)
    ctx.io.add_mouse_pos_event(cx + 500, cy)  # drag off the button
    ctx.io.add_mouse_button_event(0, False)
    assert ui_frame(ctx, build) is False


def test_press_and_release_same_frame_still_clicks():
    """The event queue preserves a fast click arriving within one frame."""
    ctx = make_ctx()
    rects = {}

    def build(ui):
        ui.begin("Win", pos=(20, 20))
        clicked = ui.button("Go")
        rects["btn"] = ui._prev_item_rect
        ui.end()
        return clicked

    ui_frame(ctx, build)
    cx, cy = center(rects["btn"])
    ctx.io.add_mouse_pos_event(cx, cy)
    ui_frame(ctx, build)
    ctx.io.add_mouse_button_event(0, True)
    ctx.io.add_mouse_button_event(0, False)
    # press registers this frame (clicked flag), release too: the widget
    # becomes active and releases inside → click in ONE frame.
    assert ui_frame(ctx, build) is True


def test_checkbox_toggles():
    ctx = make_ctx()
    state = {"v": False}
    rects = {}

    def build(ui):
        ui.begin("Win", pos=(20, 20))
        changed, state["v"] = ui.checkbox("opt", state["v"])
        rects["cb"] = ui._prev_item_rect
        ui.end()
        return changed

    ui_frame(ctx, build)
    cx, cy = center(rects["cb"])
    ctx.io.add_mouse_pos_event(cx, cy)
    ctx.io.add_mouse_button_event(0, True)
    ui_frame(ctx, build)
    ctx.io.add_mouse_button_event(0, False)
    assert ui_frame(ctx, build) is True
    assert state["v"] is True
    ctx.io.add_mouse_button_event(0, True)
    ui_frame(ctx, build)
    ctx.io.add_mouse_button_event(0, False)
    ui_frame(ctx, build)
    assert state["v"] is False


def test_slider_tracks_mouse_x_while_held():
    ctx = make_ctx()
    state = {"v": 0.0}
    rects = {}
    width = 100.0

    def build(ui):
        ui.begin("Win", pos=(20, 20))
        _, state["v"] = ui.slider_float("s", state["v"], 0.0, 10.0,
                                        width=width)
        rects["sl"] = ui._prev_item_rect
        ui.end()

    ui_frame(ctx, build)
    r = rects["sl"]
    frame_x0 = r[0]
    # grab at 50% of the track
    ctx.io.add_mouse_pos_event(frame_x0 + width * 0.5, center(r)[1])
    ctx.io.add_mouse_button_event(0, True)
    ui_frame(ctx, build)
    assert abs(state["v"] - 5.0) < 0.3
    # drag to the far right; still held
    ctx.io.add_mouse_pos_event(frame_x0 + width + 50, center(r)[1])
    ui_frame(ctx, build)
    assert state["v"] == 10.0  # clamped
    ctx.io.add_mouse_button_event(0, False)
    ui_frame(ctx, build)
    assert state["v"] == 10.0


def test_slider_int_rounds():
    ctx = make_ctx()
    out = {}

    def build(ui):
        ui.begin("Win", pos=(20, 20))
        out["res"] = ui.slider_int("n", 3, 0, 8)
        ui.end()

    ui_frame(ctx, build)
    changed, v = out["res"]
    assert changed is False and v == 3


def test_ids_differ_between_windows_and_hash_suffix():
    ctx = make_ctx()
    ids = {}

    def build(ui):
        ui.begin("A", pos=(10, 10))
        ui.button("Go")
        ids["a"] = ui._id("Go")
        ui.end()
        ui.begin("B", pos=(200, 10))
        ui.button("Go")
        ids["b"] = ui._id("Go")
        ids["b2"] = ui._id("Go##2")
        ui.end()

    ui_frame(ctx, build)
    assert ids["a"] != ids["b"]
    assert ids["b"] != ids["b2"]
    assert Context._visible_label("Go##2") == "Go"


def test_collapsing_header_state_persists():
    ctx = make_ctx()
    rects = {}
    seen = {}

    def build(ui):
        ui.begin("Win", pos=(20, 20))
        open_now = ui.collapsing_header("Section")
        rects["hdr"] = ui._prev_item_rect
        seen["open"] = open_now
        if open_now:
            ui.text("inner")
        ui.end()

    ui_frame(ctx, build)
    assert seen["open"] is False
    cx, cy = center(rects["hdr"])
    ctx.io.add_mouse_pos_event(cx, cy)
    ctx.io.add_mouse_button_event(0, True)
    ui_frame(ctx, build)
    ctx.io.add_mouse_button_event(0, False)
    ui_frame(ctx, build)
    assert seen["open"] is True
    ui_frame(ctx, build)  # persists with no further input
    assert seen["open"] is True


# ---------------------------------------------------------------------------
# windows
# ---------------------------------------------------------------------------


def test_window_drag_by_title_bar():
    ctx = make_ctx()

    def build(ui):
        ui.begin("Win", pos=(50, 50), size=(120, 80))
        ui.end()

    ui_frame(ctx, build)
    w = ctx.windows["Win"]
    assert w.pos == [50, 50]
    # grab the title bar (avoid the collapse arrow on the left)
    ctx.io.add_mouse_pos_event(110, 58)
    ctx.io.add_mouse_button_event(0, True)
    ui_frame(ctx, build)
    ctx.io.add_mouse_pos_event(140, 98)  # +30, +40
    ui_frame(ctx, build)
    ctx.io.add_mouse_button_event(0, False)
    ui_frame(ctx, build)
    assert w.pos == [80, 90]
    ui_frame(ctx, build)
    assert w.pos == [80, 90]  # stays put


def test_collapse_arrow_toggles_and_hides_body():
    ctx = make_ctx()
    counts = {}

    def build(ui):
        vis = ui.begin("Win", pos=(50, 50), size=(120, 80))
        if vis:
            ui.text("body")
        counts["vis"] = vis
        counts["tris"] = len(ui._cur.dl) if ui._cur else 0
        ui.end()

    ui_frame(ctx, build)
    assert counts["vis"] is True
    # click the collapse arrow (top-left of title bar)
    ctx.io.add_mouse_pos_event(58, 58)
    ctx.io.add_mouse_button_event(0, True)
    ui_frame(ctx, build)
    ctx.io.add_mouse_button_event(0, False)
    ui_frame(ctx, build)
    assert counts["vis"] is False
    assert ctx.windows["Win"].collapsed is True
    # hit-test rect shrinks to the title bar
    assert ctx.windows["Win"].rect[3] - ctx.windows["Win"].rect[1] == \
        ctx.style.title_bar_h


def test_close_box_reports_and_window_reopens():
    ctx = make_ctx()
    state = {"show": True}

    def build(ui):
        if state["show"]:
            ui.begin("Tool", pos=(50, 50), size=(120, 80), closable=True)
            ui.end()
            if ui.was_closed("Tool"):
                state["show"] = False

    ui_frame(ctx, build)
    r = ctx.windows["Tool"].rect
    # close box: right end of the title bar
    ctx.io.add_mouse_pos_event(r[2] - 8, r[1] + 11)
    ctx.io.add_mouse_button_event(0, True)
    ui_frame(ctx, build)
    assert state["show"] is False
    ctx.io.add_mouse_button_event(0, False)
    ui_frame(ctx, build)  # window not submitted
    assert "Tool" not in ctx.focus_order
    state["show"] = True
    ui_frame(ctx, build)  # re-opened: rejoins the z-order
    assert "Tool" in ctx.focus_order


def test_overlap_routes_to_topmost_and_click_raises():
    ctx = make_ctx()
    clicks = {}
    rects = {}

    def build(ui):
        ui.begin("Back", pos=(20, 20), size=(150, 100))
        clicks["back"] = ui.button("B")
        rects["back"] = ui._prev_item_rect
        ui.end()
        ui.begin("Front", pos=(60, 40), size=(150, 100))
        clicks["front"] = ui.button("F")
        rects["front"] = ui._prev_item_rect
        ui.end()

    ui_frame(ctx, build)
    assert ctx.focus_order == ["Back", "Front"]
    # Click inside Front's body where Back also lies underneath.
    cx, cy = center(rects["front"])
    assert rects["back"][0] < cx  # sanity: genuinely overlapping region?
    ctx.io.add_mouse_pos_event(cx, cy)
    ctx.io.add_mouse_button_event(0, True)
    ui_frame(ctx, build)
    ctx.io.add_mouse_button_event(0, False)
    ui_frame(ctx, build)
    assert clicks["front"] is True
    assert clicks["back"] is False

    # Click Back's title bar: raises it above Front.
    ctx.io.add_mouse_pos_event(100, 28)
    ctx.io.add_mouse_button_event(0, True)
    ui_frame(ctx, build)
    ctx.io.add_mouse_button_event(0, False)
    ui_frame(ctx, build)
    assert ctx.focus_order == ["Front", "Back"]


def test_want_capture_mouse():
    ctx = make_ctx()

    def build(ui):
        ui.begin("Win", pos=(50, 50), size=(120, 80))
        ui.end()

    ui_frame(ctx, build)
    ctx.io.add_mouse_pos_event(5, 5)  # outside any window
    ui_frame(ctx, build)
    assert ctx.want_capture_mouse is False
    ctx.io.add_mouse_pos_event(100, 100)  # inside
    ui_frame(ctx, build)
    assert ctx.want_capture_mouse is True


def test_scroll_wheel_clamped():
    ctx = make_ctx()

    def build(ui):
        ui.begin("List", pos=(20, 20), size=(140, 80))
        for k in range(30):
            ui.text(f"row {k}")
        ui.end()

    ui_frame(ctx, build)
    w = ctx.windows["List"]
    assert w.scroll_y == 0.0
    assert w.content_h > 80  # taller than the window → scrollable
    ctx.io.add_mouse_pos_event(80, 60)  # inside the content region
    ctx.io.add_mouse_wheel_event(0.0, -2.0)  # wheel down = scroll down
    ui_frame(ctx, build)
    assert w.scroll_y > 0.0
    ctx.io.add_mouse_wheel_event(0.0, -1000.0)
    ui_frame(ctx, build)
    view_h = 80 - ctx.style.title_bar_h - 2 * ctx.style.window_padding - 1
    assert w.scroll_y <= w.content_h  # clamped to max_scroll
    prev = w.scroll_y
    ctx.io.add_mouse_wheel_event(0.0, 1000.0)  # wheel up → back to top
    ui_frame(ctx, build)
    assert w.scroll_y == 0.0 and prev > 0.0
    assert view_h > 0


def test_same_line_layout():
    ctx = make_ctx()
    rects = {}

    def build(ui):
        ui.begin("Win", pos=(20, 20))
        ui.text("aa")
        rects["t1"] = ui._prev_item_rect
        ui.same_line()
        ui.text("bb")
        rects["t2"] = ui._prev_item_rect
        ui.text("cc")
        rects["t3"] = ui._prev_item_rect
        ui.end()

    ui_frame(ctx, build)
    assert rects["t2"][1] == rects["t1"][1]  # same row
    assert rects["t2"][0] > rects["t1"][2]  # to the right
    assert rects["t3"][1] > rects["t1"][3]  # next row
    assert rects["t3"][0] == rects["t1"][0]  # back to line start


def test_bullet_text_and_outliner_shapes():
    """The scene-outliner pattern from the reference app
    (zrenderer.zig:246-254): igBulletText + igSameLine + igTextColored."""
    ctx = make_ctx()

    def build(ui):
        ui.begin("Scene Outliner", pos=(8, 8))
        for name in ("Cube", "Cube.002"):
            ui.bullet_text("")
            ui.same_line()
            ui.text_colored((0.0, 0.8, 0.0, 1.0), name)
        ui.end()
        return ui.render()

    dl = ui_frame(ctx, build)
    assert len(dl) > 10  # chrome + bullets + glyphs


# ---------------------------------------------------------------------------
# draw data → compositor
# ---------------------------------------------------------------------------


def test_render_composites_through_oracle():
    ctx = make_ctx()

    def build(ui):
        ui.begin("Back", pos=(20, 20), size=(150, 100))
        ui.text("hello")
        ui.button("Go")
        ui.end()
        ui.begin("Front", pos=(60, 40), size=(150, 100))
        _, _ = ui.checkbox("opt", True)
        ui.slider_float("s", 5.0, 0.0, 10.0, width=80)
        ui.end()
        return ui.render()

    dl = ui_frame(ctx, build)
    frame = np.zeros((H, W, 4), np.uint8)
    verts, scissors = dl.build()
    out = composite_overlay_cpu(frame, verts, scissors, ctx.atlas.data)
    # Front window's region must show Front's translucent bg over Back's.
    assert out.shape == frame.shape
    inside = out[60:130, 70:200, :3]
    assert inside.any(), "window chrome did not composite"
    # Pixels outside every window stay untouched.
    assert not out[200:, 250:, :3].any()


def test_collapsed_window_clips_careless_submission():
    """A caller that ignores begin()'s False and submits widgets anyway
    must not paint them over the scene — the empty collapsed scissor."""
    ctx = make_ctx()

    def build(ui):
        ui.begin("Win", pos=(20, 20), size=(120, 80))
        ui.text("SHOULD NOT SHOW WHEN COLLAPSED")
        ui.end()
        return ui.render()

    ui_frame(ctx, build)
    ctx.windows["Win"].collapsed = True
    dl = ui_frame(ctx, build)
    frame = np.zeros((H, W, 4), np.uint8)
    verts, scissors = dl.build()
    out = composite_overlay_cpu(frame, verts, scissors, ctx.atlas.data)
    # Title bar drawn, but nothing below it (the body region stays black).
    assert out[20:42, 20:140, :3].any()
    assert not out[44:, :, :3].any()


def test_mouse_leave_mid_drag_does_not_teleport():
    """A leave event parks the cursor offscreen; the next frame's delta
    must be zero (else windows teleport by ~1e30 px)."""
    ctx = make_ctx()

    def build(ui):
        ui.begin("Win", pos=(50, 50), size=(120, 80))
        ui.end()

    ui_frame(ctx, build)
    w = ctx.windows["Win"]
    ctx.io.add_mouse_pos_event(110, 58)
    ctx.io.add_mouse_button_event(0, True)
    ui_frame(ctx, build)
    ctx.io.mouse_leave()
    ui_frame(ctx, build)
    assert w.pos == [50, 50]
    ctx.io.add_mouse_pos_event(110, 58)  # re-enter
    ui_frame(ctx, build)
    assert w.pos == [50, 50]


def test_window_content_clipped_to_body():
    ctx = make_ctx()

    def build(ui):
        ui.begin("Win", pos=(20, 20), size=(100, 60))
        ui.text("X" * 50)  # far wider than the window
        ui.end()
        return ui.render()

    dl = ui_frame(ctx, build)
    frame = np.zeros((H, W, 4), np.uint8)
    verts, scissors = dl.build()
    out = composite_overlay_cpu(frame, verts, scissors, ctx.atlas.data)
    # Nothing drawn right of the window edge (x >= 120).
    assert not out[:, 122:, :3].any()
