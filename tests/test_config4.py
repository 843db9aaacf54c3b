"""BASELINE config 4 composed end-to-end on the virtual CPU mesh:
dense-lattice scene, geometry-sharded setup + band-sharded raster
(the sharded binning), TAA resolve with cross-band neighborhood reads —
one jitted step per frame, bit-exact vs the single-device composition.

The 1M-triangle single-chip perf row for this workload lives in
benchmarks/config4.py (hardware); this proves the multi-chip semantics.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from zrenderer_tpu.engine.upload import flatten_scene
from zrenderer_tpu.ops import geometry as g
from zrenderer_tpu.ops import raster_xla
from zrenderer_tpu.ops import taa
from zrenderer_tpu.parallel.tiles import make_sharded_taa_frame
from zrenderer_tpu.scene.procedural import make_stress_scene

pytestmark = [
    pytest.mark.skipif(
        len(jax.devices()) < 8, reason="needs 8 virtual devices"
    ),
    pytest.mark.slow,  # heavyweight; excluded from the smoke tier
]

W, H = 128, 64


def _scene_inputs(tris=512):
    scene, mesh_data = make_stress_scene(tris)
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=64)
    vp = g.view_proj_from_camera(scene.active_camera, W, H)
    return flat, vp


def _frame_mats(flat, vp, jitter):
    jvp = taa.jittered_view_proj(vp, jitter, W, H)
    return np.einsum("nij,jk->nik", flat.node_to_world, jvp).astype(
        np.float32)


def _single_device_taa(flat, vp, jitters):
    history = None
    frames = []
    for j in jitters:
        mats = _frame_mats(flat, vp, j)
        rgba, depth = raster_xla.render_frame_jit(
            flat.positions, flat.attrs, flat.tri_vidx, mats,
            flat.vert_node, W, H,
        )
        if history is None:
            history = np.asarray(taa.taa_init_history(rgba))
        history, resolved = taa.taa_resolve(
            np.asarray(history), np.asarray(rgba))
        history = np.asarray(history)
        frames.append((np.asarray(resolved), np.asarray(depth)))
    return frames


def test_config4_sharded_taa_matches_single_device():
    """3 jittered frames, history carried across frames on device,
    sharded 8 ways: resolved frames and depth bit-equal to single-chip."""
    flat, vp = _scene_inputs()
    jitters = taa.jitter_sequence(3)
    oracle = _single_device_taa(flat, vp, jitters)

    mesh = Mesh(np.array(jax.devices()[:8]), ("tiles",))
    taa_frame, shard_inputs = make_sharded_taa_frame(
        mesh, W, H, use_pallas=False)

    history = None
    for k, j in enumerate(jitters):
        mats = _frame_mats(flat, vp, j)
        args = shard_inputs(
            flat.positions, flat.attrs, flat.tri_vidx, mats, flat.vert_node)
        if history is None:
            # taa_resolve contract: first frame's history = current frame.
            rgba0, _ = raster_xla.render_frame_jit(
                flat.positions, flat.attrs, flat.tri_vidx, mats,
                flat.vert_node, W, H)
            history = jax.device_put(
                np.asarray(taa.taa_init_history(rgba0)),
                jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec("tiles", None, None)),
            )
        resolved, depth, history = taa_frame(*args, history)
        ref_resolved, ref_depth = oracle[k]
        assert (ref_depth < 1.0).mean() > 0.05
        np.testing.assert_array_equal(np.asarray(resolved), ref_resolved)
        np.testing.assert_array_equal(
            np.asarray(depth).view(np.uint32), ref_depth.view(np.uint32))
        # History stays band-sharded on device between frames.
        shards = history.sharding.device_set
        assert len(shards) == 8


def test_config4_sharded_taa_pallas_interpret():
    """One jittered frame through the PRODUCTION Pallas band kernel
    (interpret mode) + sharded TAA resolve — the full config-4 stack."""
    flat, vp = _scene_inputs(tris=256)
    jitters = taa.jitter_sequence(1)
    oracle = _single_device_taa(flat, vp, jitters)

    mesh = Mesh(np.array(jax.devices()[:2]), ("tiles",))
    taa_frame, shard_inputs = make_sharded_taa_frame(
        mesh, W, H, use_pallas="interpret")
    mats = _frame_mats(flat, vp, jitters[0])
    args = shard_inputs(
        flat.positions, flat.attrs, flat.tri_vidx, mats, flat.vert_node)
    rgba0, _ = raster_xla.render_frame_jit(
        flat.positions, flat.attrs, flat.tri_vidx, mats, flat.vert_node,
        W, H)
    history = np.asarray(taa.taa_init_history(rgba0))
    resolved, depth, _ = taa_frame(*args, history)
    ref_resolved, ref_depth = oracle[0]
    np.testing.assert_array_equal(np.asarray(resolved), ref_resolved)
    np.testing.assert_array_equal(
        np.asarray(depth).view(np.uint32), ref_depth.view(np.uint32))
