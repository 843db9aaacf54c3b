"""Capped-subset clipping (ops/geometry.py clip_triangles_capped).

The production geometry path gives every triangle one slot-0 row and runs
the real Sutherland-Hodgman clipper only on a top-k subset of triangles
that actually cross a clip plane (reference behavior anchor: the D3D12
fixed-function clipper, which zrenderer relies on implicitly via the
rasterizer; gltf-era scenes clip a thin frustum silhouette only).  These
tests pin the layout contract, the np/jnp agreement, and the documented
overflow-drop semantics.
"""

import numpy as np

import jax.numpy as jnp

from zrenderer_tpu.engine.upload import flatten_scene
from zrenderer_tpu.ops import geometry as g
from zrenderer_tpu.raster_ref import raster_cpu
from zrenderer_tpu.scene.procedural import make_triangle_soup


def _soup_setup(n=96, seed=7, behind=0.5, width=128, height=96):
    scene, md = make_triangle_soup(
        n, seed=seed, extent=8.0, behind_camera_fraction=behind
    )
    flat = flatten_scene(scene, md, pad=True, tri_align=32)
    vp = g.view_proj_from_camera(scene.active_camera, width, height)
    matrices = np.einsum(
        "nij,jk->nik", flat.node_to_world, vp
    ).astype(np.float32)
    return flat, matrices


def test_head_count_inverts_capped_rows():
    for t in (32, 64, 120, 1024, 4096, 65536, 1 << 20):
        assert g.head_count(g.capped_rows(t)) == t


def test_capped_np_jnp_rows_agree():
    width = height = 96
    flat, matrices = _soup_setup(width=width, height=height)
    args = (flat.positions, flat.attrs, flat.tri_vidx, matrices,
            flat.vert_node, width, height)
    ti_np, tf_np = g.geometry_pipeline(np, *args)
    ti_jx, tf_jx = g.geometry_pipeline(jnp, *args)
    np.testing.assert_array_equal(ti_np, np.asarray(ti_jx))
    # f32 setup within ulp slack (XLA reciprocal refinement, RASTER_SPEC §5).
    live = ti_np[:, g.I_VALID] > 0
    assert live.any()
    d = np.abs(tf_np[live] - np.asarray(tf_jx)[live])
    assert np.nanmax(d / np.maximum(np.abs(tf_np[live]), 1e-20)) < 1e-5


def test_capped_image_matches_dense_clipping():
    """The capped layout must produce the same image as the legacy dense
    slot-major clipper: same triangles survive, same submission order for
    depth resolution."""
    width, height = 128, 96
    flat, matrices = _soup_setup(width=width, height=height)
    args = (flat.positions, flat.attrs, flat.tri_vidx, matrices,
            flat.vert_node, width, height)
    ti_c, tf_c = g.geometry_pipeline(np, *args, clip_cap="auto")
    ti_d, tf_d = g.geometry_pipeline(np, *args, clip_cap=None)
    img_c, dep_c = raster_cpu.rasterize_setup(ti_c, tf_c, width, height)
    img_d, dep_d = raster_cpu.rasterize_setup(ti_d, tf_d, width, height)
    assert (dep_c < 1.0).mean() > 0.005, "clipping scene unexpectedly empty"
    np.testing.assert_array_equal(dep_c, dep_d)
    np.testing.assert_array_equal(img_c, img_d)


def test_capped_overflow_drops_by_input_order():
    """With cap < #crossing triangles, the FIRST cap crossing triangles (by
    input id) are clipped and the overflow is dropped — deterministically,
    and identically in np and jnp."""
    width = height = 96
    flat, matrices = _soup_setup(n=64, behind=1.0, width=width, height=height)
    args = (flat.positions, flat.attrs, flat.tri_vidx, matrices,
            flat.vert_node, width, height)
    cap = 4
    ti_np, _ = g.geometry_pipeline(np, *args, clip_cap=cap)
    ti_jx, _ = g.geometry_pipeline(jnp, *args, clip_cap=cap)
    np.testing.assert_array_equal(ti_np, np.asarray(ti_jx))
    t = flat.tri_vidx.shape[0]
    assert ti_np.shape[0] == t + g.FAN_SLOTS * cap
    # Fan rows hold only subset triangles; subset indices ascend.
    tris = g.assemble_triangles(
        np,
        g.transform_positions(np, flat.positions, matrices, flat.vert_node),
        flat.attrs, flat.tri_vidx,
    )
    _, _, idx = g.clip_triangles_capped(np, tris, width, height, cap)
    assert (np.diff(idx[idx > 0]) > 0).all()
