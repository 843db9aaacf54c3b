"""Headless app CLI smoke tests (main() analog) on the CPU backend."""

import os

import numpy as np
import pytest

from zrenderer_tpu.app.main import main as app_main, scene_outliner
from zrenderer_tpu.scene.procedural import make_test_scene
from zrenderer_tpu.utils.png import read_png

pytestmark = pytest.mark.slow  # heavyweight; excluded from the smoke tier


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene")
    scene, mesh_data = make_test_scene()
    scene.save(d / "scene.bin")
    mesh_data.save(d / "meshes.bin")
    return d


def test_app_renders_frames_to_png(scene_dir, tmp_path):
    rc = app_main([
        "--scene", str(scene_dir), "--width", "160", "--height", "96",
        "--frames", "2", "--out", str(tmp_path), "--backend", "xla",
    ])
    assert rc == 0
    img = read_png(tmp_path / "frame_0001.png")
    assert img.shape == (96, 160, 4)
    assert (img[..., :3].sum(axis=-1) > 0).mean() > 0.1  # scene visible


def test_app_overlay_burns_in_stats(scene_dir, tmp_path):
    rc = app_main([
        "--scene", str(scene_dir), "--width", "256", "--height", "128",
        "--frames", "1", "--out", str(tmp_path), "--backend", "xla",
        "--overlay",
    ])
    assert rc == 0
    img = read_png(tmp_path / "frame_0000.png")
    # The overlay panel dims the top-left corner region.
    greens = (img[..., 1] > 150) & (img[..., 0] < 100)
    assert greens.sum() > 20


def test_app_imgui_ui_burns_in_windows(scene_dir, tmp_path):
    rc = app_main([
        "--scene", str(scene_dir), "--width", "256", "--height", "160",
        "--frames", "1", "--out", str(tmp_path), "--backend", "xla",
        "--ui",
    ])
    assert rc == 0
    img = read_png(tmp_path / "frame_0000.png")
    # Outliner node names render in the imgui green; title bars in blue.
    greens = (img[..., 1] > 150) & (img[..., 0] < 100)
    assert greens.sum() > 20
    blues = (img[..., 2] > 90) & (img[..., 2] > img[..., 1])
    assert blues.sum() > 100  # two title bars


def test_app_orbit_moves_camera(scene_dir, tmp_path):
    rc = app_main([
        "--scene", str(scene_dir), "--width", "128", "--height", "64",
        "--frames", "3", "--out", str(tmp_path), "--backend", "xla",
        "--orbit",
    ])
    assert rc == 0
    a = read_png(tmp_path / "frame_0000.png")
    b = read_png(tmp_path / "frame_0002.png")
    assert (a != b).any()  # camera actually moved


def test_scene_outliner_lists_nodes():
    scene, _ = make_test_scene()
    text = scene_outliner(scene)
    assert "Cube" in text and "Cube.002" in text


def test_app_taa_smooths_frames(scene_dir, tmp_path):
    rc = app_main([
        "--scene", str(scene_dir), "--width", "128", "--height", "64",
        "--frames", "4", "--out", str(tmp_path), "--backend", "xla",
        "--taa",
    ])
    assert rc == 0
    img = read_png(tmp_path / "frame_0003.png")
    assert img.shape == (64, 128, 4)
    assert (img[..., :3].sum(axis=-1) > 0).mean() > 0.1
