"""Camera controller tests."""

import numpy as np
import pytest

from zrenderer_tpu.app.camera import CameraController, forward_from_pitch_yaw
from zrenderer_tpu.scene.scene import Camera


def test_forward_zero_angles_is_minus_z():
    np.testing.assert_allclose(
        forward_from_pitch_yaw(0, 0), [0, 0, -1], atol=1e-6
    )


def test_forward_pitch_up():
    f = forward_from_pitch_yaw(np.pi / 4, 0)
    assert f[1] == pytest.approx(np.sin(np.pi / 4), abs=1e-5)
    assert f[2] < 0


def test_forward_yaw_quarter():
    f = forward_from_pitch_yaw(0, np.pi / 2)
    # 90 deg yaw turns -Z into -X for this convention.
    np.testing.assert_allclose(f, [-1, 0, 0], atol=1e-5)


def test_controller_roundtrips_from_forward():
    cam = Camera(forward=np.array([0, -0.5, -np.sqrt(0.75)], np.float32))
    ctl = CameraController(cam)
    np.testing.assert_allclose(
        cam.forward, [0, -0.5, -np.sqrt(0.75)], atol=1e-5
    )
    assert cam.pitch == pytest.approx(np.arcsin(-0.5), abs=1e-5)


def test_look_clamps_pitch():
    ctl = CameraController(Camera())
    ctl.look(dpitch=10.0, dyaw=0.0)
    assert ctl.camera.pitch <= 1.55
    assert np.linalg.norm(ctl.camera.forward) == pytest.approx(1.0, abs=1e-5)


def test_move_along_basis():
    ctl = CameraController(Camera(position=np.zeros(3, np.float32)))
    ctl.move(forward=2.0)
    np.testing.assert_allclose(ctl.camera.position, [0, 0, -2], atol=1e-5)
    # cross(-Z, +Y up) = +X: "right" is +X when looking down -Z.
    ctl.move(right=1.0)
    assert ctl.camera.position[0] == pytest.approx(1.0, abs=1e-5)


def test_orbit_looks_at_target():
    ctl = CameraController(Camera())
    ctl.orbit(target=(1, 2, 3), radius=5.0, azimuth=0.7, elevation=0.3)
    to_target = np.array([1, 2, 3]) - ctl.camera.position
    to_target = to_target / np.linalg.norm(to_target)
    np.testing.assert_allclose(ctl.camera.forward, to_target, atol=1e-5)
    assert np.linalg.norm(ctl.camera.position - [1, 2, 3]) == pytest.approx(5.0, abs=1e-4)
