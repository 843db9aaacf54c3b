"""Meshlet (cluster) culling — the mesh-shader-pipeline analog
(zd3d12.zig:1147-1205): conservative frustum-sphere + backface-cone
tests must kill a large fraction of a sphere field's 128-triangle
clusters while changing at most a bounded handful of pixels (the
standard cone-culling contract: conservative wrt FLOAT geometry;
subpixel-snap winding flips of sub-pixel slivers may differ — see
ops/geometry.py meshlet_keep_mask)."""

import numpy as np
import pytest

from zrenderer_tpu.engine.config import RenderConfig
from zrenderer_tpu.engine.renderer import Renderer
from zrenderer_tpu.ops import geometry as g
from zrenderer_tpu.scene.procedural import make_sphere_field

pytestmark = pytest.mark.slow  # heavyweight; excluded from the smoke tier

W, H = 128, 64


def _renderers():
    scene, md = make_sphere_field(32768)  # 2 x 16K-tri spheres
    rs = []
    for cull in (False, True):
        r = Renderer(RenderConfig(width=W, height=H, backend="pallas",
                                  debug=True, tri_align=128,
                                  meshlet_cull=cull))
        r.load_scene(scene, md)
        rs.append(r)
    return rs


def test_meshlet_cull_bit_exact_and_engaged():
    r_off, r_on = _renderers()
    img_off, depth_off = r_off.render_and_read()
    img_on, depth_on = r_on.render_and_read()
    depth_off = np.asarray(depth_off)
    depth_on = np.asarray(depth_on)
    assert (depth_off < 1).mean() > 0.02  # spheres visible
    npx = depth_off.size
    d_diff = (depth_on != depth_off).sum()
    c_diff = (np.asarray(img_on) != np.asarray(img_off)).any(axis=-1).sum()
    # Bounded deviation: only snap-flipped backfacing slivers may differ.
    assert d_diff <= max(2, npx // 1000), d_diff
    assert c_diff <= max(2, npx // 1000), c_diff

    # The cull actually engages: a closed sphere field has ~half its
    # clusters back-facing (plus off-frustum spheres).
    bounds, mdraw, enabled = (np.asarray(x) for x in r_on._meshlet_table)
    mats = r_on.camera_matrices()
    cam_local = r_on.cam_local_constants()
    keep = np.asarray(g.meshlet_keep_mask(
        np, bounds, mdraw, enabled.astype(bool), mats, cam_local))
    assert enabled.mean() > 0.9  # single-draw blocks dominate
    assert keep.mean() < 0.85, (
        f"expected a real cull fraction, kept {keep.mean():.2f}"
    )


def test_meshlet_cull_animation_digests_match():
    r_off, r_on = _renderers()
    import math

    cams = []
    base = r_off.scene.active_camera
    for k in range(2):
        from zrenderer_tpu.scene.scene import Camera

        ang = 0.5 * k
        d = np.linalg.norm(np.asarray(base.position, np.float32))
        eye = np.array([d * math.cos(ang), d * 0.4, d * math.sin(ang)],
                       np.float32)
        fwd = -eye / np.linalg.norm(eye)
        cams.append(Camera(position=eye, forward=fwd, yfov=0.9,
                           znear=0.5, zfar=base.zfar, name="orbit"))
    d_off, _ = r_off.render_animation(cameras=cams)
    d_on, _ = r_on.render_animation(cameras=cams)
    d_off, d_on = np.asarray(d_off), np.asarray(d_on)
    # Digests are frame sums of u8 color: a handful of sliver pixels
    # bounds the deviation to a few hundred counts out of ~1e6.
    assert np.all(np.abs(d_off - d_on) <= 4096.0), (d_off, d_on)
