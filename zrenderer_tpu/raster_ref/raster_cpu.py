"""CPU reference rasterizer — the pixel-exactness oracle.

A direct, scalar-loop transcription of docs/RASTER_SPEC.md §2-§4 in NumPy.
This is the "fake backend" of the test strategy (SURVEY.md §4): golden
images and the TPU kernels are validated against it bit-for-bit.  It shares
the geometry stage (transform/clip/snap/setup, ops/geometry.py) with the
device path — by design, so both backends consume identical triangle setup
data — and implements the per-pixel loop independently and as simply as
possible.

Replaces, as the correctness oracle, what the reference gets from the D3D12
fixed-function rasterizer + depth unit + uber.hlsl's pixel stage
(zrenderer/src/hlsl/uber.hlsl:31-38).
"""

from __future__ import annotations

import numpy as np

from zrenderer_tpu.ops import geometry as g

CLEAR_COLOR = np.array([0.0, 0.0, 0.0, 1.0], np.float32)  # zrenderer.zig:288-294
CLEAR_DEPTH = np.float32(1.0)  # zrenderer.zig:294


def rasterize_setup(tri_i32: np.ndarray, tri_f32: np.ndarray,
                    width: int, height: int):
    """Rasterize pre-setup triangles; returns (rgba_f32 (H,W,4), depth (H,W)).

    Triangles are processed in array order — the canonical submission order
    for depth ties (RASTER_SPEC.md §3).
    """
    zbuf = np.full((height, width), CLEAR_DEPTH, np.float32)
    # Latched per-pixel numerator/denominator of the winning triangle.
    nr = np.zeros((height, width), np.float32)
    ng = np.zeros((height, width), np.float32)
    nb = np.zeros((height, width), np.float32)
    den = np.zeros((height, width), np.float32)

    half = g.SUBPIXEL // 2
    for t in range(tri_i32.shape[0]):
        ti = tri_i32[t]
        if ti[g.I_VALID] == 0:
            continue
        jmin, jmax = int(ti[g.I_JMIN]), int(ti[g.I_JMAX])
        imin, imax = int(ti[g.I_IMIN]), int(ti[g.I_IMAX])
        if jmin > jmax or imin > imax:
            continue
        tf = tri_f32[t]
        x0, y0, x1, y1, x2, y2 = (int(v) for v in ti[0:6])
        dx0, dy0, dx1, dy1, dx2, dy2 = (int(v) for v in ti[6:12])
        b0, b1, b2 = (int(v) for v in ti[12:15])

        for i in range(imin, imax + 1):
            py = g.SUBPIXEL * i + half
            for j in range(jmin, jmax + 1):
                px = g.SUBPIXEL * j + half
                # int32 wrap-around semantics match the device path exactly.
                e0 = np.int32(dx0) * np.int32(py - y1) - np.int32(dy0) * np.int32(px - x1)
                e1 = np.int32(dx1) * np.int32(py - y2) - np.int32(dy1) * np.int32(px - x2)
                e2 = np.int32(dx2) * np.int32(py - y0) - np.int32(dy2) * np.int32(px - x0)
                if e0 < b0 or e1 < b1 or e2 < b2:
                    continue
                ef0, ef1, ef2 = np.float32(e0), np.float32(e1), np.float32(e2)
                z = ef0 * tf[g.F_ZA0] + ef1 * tf[g.F_ZA1] + ef2 * tf[g.F_ZA2]
                if not (z >= 0.0 and z < zbuf[i, j]):
                    continue
                zbuf[i, j] = z
                den[i, j] = ef0 * tf[g.F_RW0] + ef1 * tf[g.F_RW1] + ef2 * tf[g.F_RW2]
                nr[i, j] = ef0 * tf[g.F_CR0] + ef1 * tf[g.F_CR1] + ef2 * tf[g.F_CR2]
                ng[i, j] = ef0 * tf[g.F_CG0] + ef1 * tf[g.F_CG1] + ef2 * tf[g.F_CG2]
                nb[i, j] = ef0 * tf[g.F_CB0] + ef1 * tf[g.F_CB1] + ef2 * tf[g.F_CB2]

    covered = den > 0
    safe_den = np.where(covered, den, np.float32(1.0))
    rgba = np.empty((height, width, 4), np.float32)
    rgba[..., 0] = np.where(covered, nr / safe_den, CLEAR_COLOR[0])
    rgba[..., 1] = np.where(covered, ng / safe_den, CLEAR_COLOR[1])
    rgba[..., 2] = np.where(covered, nb / safe_den, CLEAR_COLOR[2])
    rgba[..., 3] = 1.0
    return rgba, zbuf


def render_scene_cpu(scene, mesh_data, width: int, height: int,
                     camera=None):
    """End-to-end CPU reference render of a Scene at (width, height).

    Returns (rgba_u8 (H,W,4), depth (H,W) f32).
    """
    from zrenderer_tpu.engine.upload import flatten_scene  # host-side packer

    flat = flatten_scene(scene, mesh_data, pad=False)
    camera = camera if camera is not None else scene.active_camera
    vp = g.view_proj_from_camera(camera, width, height)

    matrices = np.stack(
        [m.astype(np.float32) @ vp for m in flat.node_to_world], axis=0
    ).astype(np.float32)
    tri_i32, tri_f32 = g.geometry_pipeline(
        np, flat.positions, flat.attrs, flat.tri_vidx, matrices,
        flat.vert_node, width, height,
    )
    rgba, depth = rasterize_setup(tri_i32, tri_f32, width, height)
    return pack_u8(rgba), depth


def pack_u8(rgba_f32: np.ndarray) -> np.ndarray:
    """RASTER_SPEC.md §4: u8 = floor(clamp(c, 0, 1) * 255 + 0.5)."""
    c = np.clip(rgba_f32, 0.0, 1.0).astype(np.float32)
    return np.floor(c * np.float32(255.0) + np.float32(0.5)).astype(np.uint8)
