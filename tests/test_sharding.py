"""Multi-chip tile+geometry sharding on the virtual 8-device CPU mesh:
the sharded frame must match the single-device render exactly."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from zrenderer_tpu.engine.upload import flatten_scene
from zrenderer_tpu.ops import geometry as g
from zrenderer_tpu.ops import raster_xla
from zrenderer_tpu.parallel.tiles import make_sharded_frame
from zrenderer_tpu.scene.procedural import make_test_scene

pytestmark = [
    pytest.mark.skipif(
        len(jax.devices()) < 8, reason="needs 8 virtual devices"
    ),
    pytest.mark.slow,  # heavyweight; excluded from the smoke tier
]

W, H = 128, 64


def _inputs():
    scene, mesh_data = make_test_scene()
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=64)
    vp = g.view_proj_from_camera(scene.active_camera, W, H)
    matrices = np.einsum("nij,jk->nik", flat.node_to_world, vp).astype(np.float32)
    return flat, matrices


def test_sharded_frame_matches_single_device():
    flat, matrices = _inputs()
    mesh = Mesh(np.array(jax.devices()[:8]), ("tiles",))
    frame_fn, shard_inputs = make_sharded_frame(mesh, W, H, use_pallas=False)
    args = shard_inputs(
        flat.positions, flat.attrs, flat.tri_vidx, matrices, flat.vert_node
    )
    rgba_sh, depth_sh = frame_fn(*args)
    rgba_sh = np.asarray(rgba_sh)
    depth_sh = np.asarray(depth_sh)

    rgba_1, depth_1 = raster_xla.render_frame_jit(
        flat.positions, flat.attrs, flat.tri_vidx, matrices, flat.vert_node,
        W, H,
    )
    assert (np.asarray(depth_1) < 1).mean() > 0.2
    np.testing.assert_array_equal(depth_sh.view(np.uint32),
                                  np.asarray(depth_1).view(np.uint32))
    np.testing.assert_array_equal(rgba_sh, np.asarray(rgba_1))


def test_sharded_output_is_band_sharded():
    flat, matrices = _inputs()
    mesh = Mesh(np.array(jax.devices()[:4]), ("tiles",))
    frame_fn, shard_inputs = make_sharded_frame(mesh, W, H, use_pallas=False)
    args = shard_inputs(
        flat.positions, flat.attrs, flat.tri_vidx, matrices, flat.vert_node
    )
    rgba, depth = frame_fn(*args)
    # Output really is sharded by row band across the mesh.
    assert len(rgba.sharding.device_set) == 4


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_2d_mesh_geom_x_tiles_matches_single_device():
    from zrenderer_tpu.parallel.tiles import make_sharded_frame_2d

    flat, matrices = _inputs()
    mesh = Mesh(
        np.array(jax.devices()[:8]).reshape(2, 4), ("geom", "tiles")
    )
    frame_fn, shard_inputs = make_sharded_frame_2d(mesh, W, H, use_pallas=False)
    args = shard_inputs(
        flat.positions, flat.attrs, flat.tri_vidx, matrices, flat.vert_node
    )
    rgba_sh, depth_sh = frame_fn(*args)

    rgba_1, depth_1 = raster_xla.render_frame_jit(
        flat.positions, flat.attrs, flat.tri_vidx, matrices, flat.vert_node,
        W, H,
    )
    np.testing.assert_array_equal(
        np.asarray(depth_sh).view(np.uint32),
        np.asarray(depth_1).view(np.uint32),
    )
    np.testing.assert_array_equal(np.asarray(rgba_sh), np.asarray(rgba_1))


def test_canonical_perm_restores_exact_setup_order():
    """The static permutation restores the EXACT single-device setup-row
    order (not just tie behavior) on a clip-heavy scene — clipping is what
    makes per-shard-major differ from fan-slot-major."""
    from zrenderer_tpu.parallel.tiles import canonical_order_perm

    from zrenderer_tpu.scene.procedural import make_material_scene

    rng = np.random.default_rng(5)
    n_tris = 64
    # Triangles straddling the near plane so fan slots >= 1 populate
    # (vertex 1 sits BEHIND the camera at z=7 looking -z).
    v0 = rng.uniform(-1, 1, (n_tris, 3)).astype(np.float32)
    verts = np.ones((3 * n_tris, 4), np.float32)
    verts[0::3, :3] = v0 + [0, 0, 2.0]   # in front
    verts[1::3, :3] = v0 + [0.3, 0.2, 9.0]  # behind the camera (clips)
    verts[2::3, :3] = v0 + [1.0, 0, 2.0]
    attrs = rng.uniform(0, 1, (3 * n_tris, 12)).astype(np.float32)
    tri_vidx = np.arange(3 * n_tris, dtype=np.int32).reshape(-1, 3)
    node_ids = np.zeros(3 * n_tris, np.int32)
    cam = make_material_scene()[0].active_camera
    vp = g.view_proj_from_camera(cam, W, H)
    matrices = np.einsum("ij,jk->ik", np.eye(4, dtype=np.float32), vp)[None]

    ti_full, tf_full = g.geometry_pipeline(
        np, verts, attrs, tri_vidx, matrices, node_ids, W, H
    )
    # Capped layout: [n_tris slot-0 rows][FAN_SLOTS * cap subset rows].
    cap = g.clip_cap_for(n_tris)
    fan_valid = (ti_full[n_tris:, g.I_VALID] > 0).reshape(g.FAN_SLOTS, cap)
    assert fan_valid[1].sum() > 0, "clipping must populate fan slot 1"

    n_shards, ts = 4, n_tris // 4
    ti_parts, tf_parts = [], []
    for s in range(n_shards):
        ti_s, tf_s = g.geometry_pipeline(
            np, verts, attrs, tri_vidx[s * ts : (s + 1) * ts], matrices,
            node_ids, W, H,
        )
        ti_parts.append(ti_s)
        tf_parts.append(tf_s)
    gathered_ti = np.concatenate(ti_parts, axis=0)
    gathered_tf = np.concatenate(tf_parts, axis=0)
    # Per-shard-major really differs from canonical here (the bug existed).
    assert not np.array_equal(gathered_ti, ti_full)

    perm = np.asarray(canonical_order_perm(n_shards, ts))
    np.testing.assert_array_equal(gathered_ti[perm], ti_full)
    np.testing.assert_array_equal(gathered_tf[perm], tf_full)


def test_sharded_depth_tie_matches_single_device():
    """Constructed exact depth tie across shard boundaries: two coplanar
    quads with different colors submitted in order, split so they land in
    different shards, plus near-clipped geometry that perturbs the gathered
    order.  The sharded image must still equal the single-device image."""
    rng = np.random.default_rng(11)
    verts = []
    attrs = []
    # Quad A (red) then quad B (green): IDENTICAL geometry -> every covered
    # pixel is an exact z tie; submission order (A first) must win.
    quad = np.array(
        [[-1, -1, 2.0], [1, -1, 2.0], [1, 1, 2.0],
         [-1, -1, 2.0], [1, 1, 2.0], [-1, 1, 2.0]], np.float32
    )
    for color in ([1, 0, 0, 1], [0, 1, 0, 1]):
        verts.append(quad)
        a = np.zeros((6, 12), np.float32)
        a[:, 0:4] = color
        attrs.append(a)
    # Filler triangles crossing the near plane (forces fan-slot-1 rows that
    # reorder the per-shard gather).
    for _ in range(10):
        base = rng.uniform(-1, 1, 3).astype(np.float32)
        tri = np.stack([
            base + [0, 0, 2.0], base + [0.5, 0.2, 9.0], base + [1.0, 0.2, 2.0]
        ])
        verts.append(tri.astype(np.float32))
        a = np.zeros((3, 12), np.float32)
        a[:, 0:4] = rng.uniform(0, 1, 4)
        attrs.append(a)

    pos = np.ones((sum(len(v) for v in verts), 4), np.float32)
    pos[:, :3] = np.concatenate(verts)
    attrs = np.concatenate(attrs).astype(np.float32)
    n_all = len(pos) // 3
    pad = (-n_all) % 4
    if pad:  # pad to the shard count with degenerate triangles
        pos = np.concatenate([pos, np.ones((3 * pad, 4), np.float32)])
        attrs = np.concatenate([attrs, np.zeros((3 * pad, 12), np.float32)])
        n_all += pad
    tri_vidx = np.arange(3 * n_all, dtype=np.int32).reshape(-1, 3)
    node_ids = np.zeros(len(pos), np.int32)
    from zrenderer_tpu.scene.procedural import make_material_scene

    cam = make_material_scene()[0].active_camera
    vp = g.view_proj_from_camera(cam, W, H)
    matrices = np.eye(4, dtype=np.float32)[None] @ vp

    rgba_1, depth_1 = raster_xla.render_frame_jit(
        pos, attrs, tri_vidx, matrices.astype(np.float32), node_ids, W, H
    )
    rgba_1 = np.asarray(rgba_1)
    covered = np.asarray(depth_1) < 1.0
    assert covered.mean() > 0.2
    # Exact ties really exist and submission order decides them: swapping
    # the two quads' colors changes the single-device image.
    attrs_swapped = attrs.copy()
    attrs_swapped[0:6, 0:4] = [0, 1, 0, 1]
    attrs_swapped[6:12, 0:4] = [1, 0, 0, 1]
    rgba_sw, _ = raster_xla.render_frame_jit(
        pos, attrs_swapped, tri_vidx, matrices.astype(np.float32), node_ids,
        W, H,
    )
    assert not np.array_equal(rgba_1, np.asarray(rgba_sw))

    mesh = Mesh(np.array(jax.devices()[:4]), ("tiles",))
    frame_fn, shard_inputs = make_sharded_frame(mesh, W, H, use_pallas=False)
    args = shard_inputs(pos, attrs, tri_vidx, matrices.astype(np.float32),
                        node_ids)
    rgba_sh, depth_sh = frame_fn(*args)
    np.testing.assert_array_equal(np.asarray(rgba_sh), rgba_1)
    np.testing.assert_array_equal(
        np.asarray(depth_sh).view(np.uint32), np.asarray(depth_1).view(np.uint32)
    )


def test_sharded_pallas_interpret_matches_single_device():
    """The PRODUCTION Pallas band kernel under shard_map (VERDICT r2 weak
    #3): the same _band_kernel the TPU runs, through the HLO interpreter on
    the virtual CPU mesh, bit-equal to the single-device XLA reference."""
    flat, matrices = _inputs()
    mesh = Mesh(np.array(jax.devices()[:2]), ("tiles",))
    frame_fn, shard_inputs = make_sharded_frame(
        mesh, W, H, use_pallas="interpret"
    )
    args = shard_inputs(
        flat.positions, flat.attrs, flat.tri_vidx, matrices, flat.vert_node
    )
    rgba_sh, depth_sh = frame_fn(*args)
    rgba_sh = np.asarray(rgba_sh)
    depth_sh = np.asarray(depth_sh)

    rgba_1, depth_1 = raster_xla.render_frame_jit(
        flat.positions, flat.attrs, flat.tri_vidx, matrices, flat.vert_node,
        W, H,
    )
    assert (np.asarray(depth_1) < 1).mean() > 0.2
    np.testing.assert_array_equal(depth_sh.view(np.uint32),
                                  np.asarray(depth_1).view(np.uint32))
    np.testing.assert_array_equal(rgba_sh, np.asarray(rgba_1))


def test_sharded_binned_band_interpret_matches_single_device():
    """The record-streaming binned BAND kernel under shard_map (the
    round-4 large-scene default's multi-chip form), through the HLO
    interpreter on the virtual CPU mesh — bit-equal to the single-device
    XLA reference (forced at small size via binning='tile_lists')."""
    flat, matrices = _inputs()
    mesh = Mesh(np.array(jax.devices()[:2]), ("tiles",))
    frame_fn, shard_inputs = make_sharded_frame(
        mesh, W, H, use_pallas="interpret", binning="tile_lists"
    )
    args = shard_inputs(
        flat.positions, flat.attrs, flat.tri_vidx, matrices, flat.vert_node
    )
    rgba_sh, depth_sh = frame_fn(*args)
    rgba_sh = np.asarray(rgba_sh)
    depth_sh = np.asarray(depth_sh)

    rgba_1, depth_1 = raster_xla.render_frame_jit(
        flat.positions, flat.attrs, flat.tri_vidx, matrices, flat.vert_node,
        W, H,
    )
    assert (np.asarray(depth_1) < 1).mean() > 0.2
    np.testing.assert_array_equal(depth_sh.view(np.uint32),
                                  np.asarray(depth_1).view(np.uint32))
    np.testing.assert_array_equal(rgba_sh, np.asarray(rgba_1))


def test_sharded_binned_band_head_count_layout_regression():
    """ADVICE r4 (high): the gathered row layout of 2 shards x 1056
    triangles inverts via head_count to a WRONG head count (8256 vs the
    true 2112) — the binned band path must thread the true count and
    stay bit-equal to the single-device reference at a shard size past
    the small forced-tile_lists sizes the round-4 tests covered."""
    from zrenderer_tpu.scene.procedural import make_triangle_soup

    scene, mesh_data = make_triangle_soup(
        2112, seed=11, extent=2.0, behind_camera_fraction=0.03,
        triangle_size=0.3,
    )
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=64)
    assert flat.tri_vidx.shape[0] == 2112  # 2 shards x 1056 (> 1024)
    assert g.head_count(2 * g.capped_rows(1056)) != 2112
    vp = g.view_proj_from_camera(scene.active_camera, W, H)
    matrices = np.einsum(
        "nij,jk->nik", flat.node_to_world, vp
    ).astype(np.float32)

    mesh = Mesh(np.array(jax.devices()[:2]), ("tiles",))
    frame_fn, shard_inputs = make_sharded_frame(
        mesh, W, H, use_pallas="interpret", binning="tile_lists"
    )
    args = shard_inputs(
        flat.positions, flat.attrs, flat.tri_vidx, matrices, flat.vert_node
    )
    rgba_sh, depth_sh = frame_fn(*args)

    rgba_1, depth_1 = raster_xla.render_frame_jit(
        flat.positions, flat.attrs, flat.tri_vidx, matrices, flat.vert_node,
        W, H,
    )
    assert (np.asarray(depth_1) < 1).mean() > 0.05
    np.testing.assert_array_equal(
        np.asarray(depth_sh).view(np.uint32),
        np.asarray(depth_1).view(np.uint32),
    )
    np.testing.assert_array_equal(np.asarray(rgba_sh), np.asarray(rgba_1))


def test_sharded_dist_binning_matches_single_device():
    """The fully distributed streaming prepare (binning='dist'): each
    device bins only its own triangle shard, one all_to_all
    redistributes per-band record slabs + the listed mask, and the
    multi-source band kernel streams n_src spans per tile.  Must be
    bit-equal to the single-device XLA reference."""
    from zrenderer_tpu.scene.procedural import make_triangle_soup

    scene, mesh_data = make_triangle_soup(
        512, seed=13, extent=2.0, behind_camera_fraction=0.05,
        triangle_size=0.5,
    )
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=64)
    vp = g.view_proj_from_camera(scene.active_camera, W, H)
    matrices = np.einsum(
        "nij,jk->nik", flat.node_to_world, vp
    ).astype(np.float32)

    mesh = Mesh(np.array(jax.devices()[:2]), ("tiles",))
    frame_fn, shard_inputs = make_sharded_frame(
        mesh, W, H, use_pallas="interpret", binning="dist"
    )
    args = shard_inputs(
        flat.positions, flat.attrs, flat.tri_vidx, matrices, flat.vert_node
    )
    rgba_sh, depth_sh = frame_fn(*args)

    rgba_1, depth_1 = raster_xla.render_frame_jit(
        flat.positions, flat.attrs, flat.tri_vidx, matrices, flat.vert_node,
        W, H,
    )
    assert (np.asarray(depth_1) < 1).mean() > 0.05
    np.testing.assert_array_equal(
        np.asarray(depth_sh).view(np.uint32),
        np.asarray(depth_1).view(np.uint32),
    )
    np.testing.assert_array_equal(np.asarray(rgba_sh), np.asarray(rgba_1))


def test_sharded_dist_binning_slab_overflow_demotes():
    """With a tiny per-(src,dst) slab budget some in-band candidates must
    demote to the band owner's hierarchy — and the image must not
    change (exact prefix clamp, whole-triangle-per-band granularity)."""
    import jax.numpy as jnp

    from zrenderer_tpu.ops import raster_pallas as rp
    from zrenderer_tpu.scene.procedural import make_triangle_soup

    scene, mesh_data = make_triangle_soup(
        2048, seed=17, extent=2.0, triangle_size=0.5,
    )
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=64)
    vp = g.view_proj_from_camera(scene.active_camera, W, H)
    matrices = np.einsum(
        "nij,jk->nik", flat.node_to_world, vp
    ).astype(np.float32)

    # The tiny slab really does demote in-band candidates (direct check
    # on shard 0's local prepare: valid, cap-fitting, band-overlapping
    # triangles with listed_send == False exist).
    ti0, tf0 = g.geometry_pipeline(
        np, flat.positions, flat.attrs, flat.tri_vidx[:1024], matrices,
        flat.vert_node, W, H,
    )
    _, _, offs0, listed_send = rp.prepare_binned_dist_local(
        jnp.asarray(ti0), jnp.asarray(tf0), W, H, n_bands=2,
        shard_index=0, shard_head=1024, slab_records=16,
    )
    head = ti0[:1024]
    valid = head[:, g.I_VALID] > 0
    sent = np.asarray(listed_send)
    assert valid.sum() > 300  # enough candidates to overflow a 256 slab
    demoted = valid & ~(sent[0] | sent[1])
    assert demoted.sum() > 0, "tiny slab must demote some candidates"
    assert int(np.asarray(offs0).max()) <= 256  # clamped spans

    mesh = Mesh(np.array(jax.devices()[:2]), ("tiles",))
    rgba_ref, depth_ref = raster_xla.render_frame_jit(
        flat.positions, flat.attrs, flat.tri_vidx, matrices, flat.vert_node,
        W, H,
    )
    old = rp.DIST_SLAB_RECORDS
    try:
        rp.DIST_SLAB_RECORDS = 16  # rounds up to REC_ALIGN internally
        frame_fn, shard_inputs = make_sharded_frame(
            mesh, W, H, use_pallas="interpret", binning="dist"
        )
        args = shard_inputs(
            flat.positions, flat.attrs, flat.tri_vidx, matrices,
            flat.vert_node,
        )
        rgba_sh, depth_sh = frame_fn(*args)
    finally:
        rp.DIST_SLAB_RECORDS = old
    np.testing.assert_array_equal(
        np.asarray(depth_sh).view(np.uint32),
        np.asarray(depth_ref).view(np.uint32),
    )
    np.testing.assert_array_equal(np.asarray(rgba_sh), np.asarray(rgba_ref))
