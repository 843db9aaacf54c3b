"""Interactive viewer (app/viewer.py) — the window/message-pump analog.

Exercises the HTTP surface and the input routing end-to-end on the CPU
backend: page + frame + state endpoints, browser events driving imgui
windows (drag) and the fly camera (mouse-look, WASD), and /quit.
"""

import json
import urllib.request

import numpy as np
import pytest

from zrenderer_tpu.engine.config import RenderConfig
from zrenderer_tpu.scene.procedural import make_test_scene
from zrenderer_tpu.utils.png import decode_png

pytestmark = pytest.mark.slow  # heavyweight; excluded from the smoke tier

W, H = 320, 240  # large enough that the bottom-right corner is UI-free


@pytest.fixture()
def viewer():
    from zrenderer_tpu.app.viewer import Viewer

    scene, mesh_data = make_test_scene()
    v = Viewer(scene, mesh_data,
               RenderConfig(width=W, height=H, backend="xla"), port=0)
    yield v
    v.close()


def _get(viewer, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{viewer.port}{path}", timeout=10) as r:
        return r.status, r.read()


def _post_events(viewer, events):
    req = urllib.request.Request(
        f"http://127.0.0.1:{viewer.port}/events",
        data=json.dumps(events).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        assert r.status == 200


def test_page_frame_and_state_endpoints(viewer):
    status, body = _get(viewer, "/")
    assert status == 200 and b"zrenderer-tpu" in body
    viewer.step()
    status, png = _get(viewer, "/frame.png")
    assert status == 200
    img = decode_png(png)
    assert img.shape == (H, W, 4)
    assert (img[..., :3].sum(axis=-1) > 0).mean() > 0.1  # scene visible
    status, body = _get(viewer, "/state")
    state = json.loads(body)
    assert state["frame"] == 1 and "stats" in state


def test_events_drag_moves_ui_window(viewer):
    viewer.step()  # UI laid out; Stats window at (8, 8)
    w = viewer.ctx.windows["Stats"]
    x0, y0 = w.pos
    # Drag the title bar (right of the collapse arrow) by (30, 20).
    tx, ty = x0 + 60, y0 + 10
    _post_events(viewer, [{"t": "move", "x": tx, "y": ty},
                          {"t": "down", "b": 0}])
    viewer.step()
    _post_events(viewer, [{"t": "move", "x": tx + 30, "y": ty + 20},
                          {"t": "up", "b": 0}])
    viewer.step()
    assert w.pos == [x0 + 30, y0 + 20]


def test_mouse_look_rotates_camera_outside_ui(viewer):
    viewer.step()
    yaw0 = viewer.camera.camera.yaw
    # Drag in an empty area (bottom-right corner, no UI window there).
    _post_events(viewer, [{"t": "move", "x": W - 30, "y": H - 30},
                          {"t": "down", "b": 0}])
    viewer.step()
    _post_events(viewer, [{"t": "move", "x": W - 60, "y": H - 30}])
    viewer.step()
    assert viewer.camera.camera.yaw != yaw0
    _post_events(viewer, [{"t": "up", "b": 0}])
    viewer.step()


def test_drag_over_ui_does_not_rotate_camera(viewer):
    viewer.step()
    yaw0 = viewer.camera.camera.yaw
    w = viewer.ctx.windows["Stats"]
    tx, ty = w.pos[0] + 60, w.pos[1] + 10
    _post_events(viewer, [{"t": "move", "x": tx, "y": ty},
                          {"t": "down", "b": 0}])
    viewer.step()
    _post_events(viewer, [{"t": "move", "x": tx + 25, "y": ty},
                          {"t": "up", "b": 0}])
    viewer.step()
    assert viewer.camera.camera.yaw == yaw0  # UI captured the drag


def test_wasd_flies_camera(viewer):
    viewer.step()
    pos0 = np.asarray(viewer.camera.camera.position).copy()
    _post_events(viewer, [{"t": "key", "k": "w", "down": True}])
    viewer.step()
    viewer.step()
    _post_events(viewer, [{"t": "key", "k": "w", "down": False}])
    viewer.step()
    moved = np.linalg.norm(
        np.asarray(viewer.camera.camera.position) - pos0)
    assert moved > 0.0


def test_quit_stops_run_loop(viewer):
    req = urllib.request.Request(
        f"http://127.0.0.1:{viewer.port}/quit", data=b"", method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        assert r.status == 200
    viewer.run(max_frames=100, target_fps=0.0)  # returns immediately
    assert viewer.shared.stop is True
    assert viewer.shared.frame_index == 0
