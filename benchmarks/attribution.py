"""Stage attribution for the large-scene flat frame (config 4 analysis).

    python benchmarks/attribution.py [num_triangles] [--frames N]

Times cumulative stage prefixes of the flat pipeline in ONE device
dispatch each (lax.scan over per-frame matrices, digest-materialization
fence — the honest methodology, see docs/PERFORMANCE.md):

    A  geometry_pipeline            (transform + capped clip + setup)
    B  A + prepare_raster_inputs    (+ compaction sort + block/super bboxes)
    C  B + HBM raster kernel        (= the full frame's device work)

and reports per-stage deltas.  Each scan step consumes a different
view-projection matrix so no stage can be hoisted out of the loop.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    os.environ.setdefault("ZRENDERER_QUIET", "1")
    tris = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 1_000_000
    frames = 10
    if "--frames" in sys.argv:
        frames = int(sys.argv[sys.argv.index("--frames") + 1])

    import jax
    import jax.numpy as jnp

    from zrenderer_tpu.engine.config import RenderConfig
    from zrenderer_tpu.engine.renderer import Renderer
    from zrenderer_tpu.ops import geometry as g
    from zrenderer_tpu.ops import raster_pallas as rp
    from zrenderer_tpu.ops.experiments import raster_vis_trans as rvt
    from zrenderer_tpu.scene.procedural import make_stress_scene

    cfg = RenderConfig(width=1920, height=1080)
    W, H = cfg.pad_width, cfg.pad_height  # raster grid resolution
    scene, mesh_data = make_stress_scene(tris)
    r = Renderer(cfg)
    r.load_scene(scene, mesh_data)
    b = r._buffers()
    n = r.flat.num_triangles
    compact = n <= rp.VMEM_RESIDENT_MAX_TRIS

    # Per-frame matrices: tiny rotations so every step's geometry differs.
    mats = np.stack([r.camera_matrices() for _ in range(frames)])
    mats += np.random.default_rng(0).normal(0, 1e-6, mats.shape)
    mats = jnp.asarray(mats.astype(np.float32))

    def geom(m):
        # Production geometry: the column (SoA) per-corner pipeline.
        return g.geometry_pipeline(
            jnp, b["corner_cols"], None, None, m, b["tri_node"], W, H
        )

    def stage_a(m):
        ti, tf = geom(m)
        return jnp.float32(ti.sum()) + tf.sum()

    def stage_b(m):
        ti, tf = geom(m)
        supers, blocks, ti, tf = rp.prepare_raster_inputs(
            ti, tf, compact=compact)
        return (jnp.float32(supers.sum()) + jnp.float32(blocks.sum())
                + jnp.float32(ti.sum()) + tf.sum())

    def stage_c(m):
        ti, tf = geom(m)
        color, depth = rp.rasterize_setup_pallas_hbm(
            ti, tf, W, H, compact=compact)
        return jnp.float32(color.sum()) + depth.sum()

    def stage_v(m):
        # Visibility-buffer z+id kernel ONLY (no color resolve).
        import jax.experimental.pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401
        ti, tf = geom(m)
        supers, blocks, ti, tf = rp.prepare_raster_inputs(
            ti, tf, compact=compact)
        import jax as _jax
        tile_spec = pl.BlockSpec((rp.TILE_H, rp.TILE_W),
                                 lambda i, j: (i, j),
                                 memory_space=pltpu.VMEM)
        depth, idx = rp._pallas_call(
            rvt._hbm_vis_kernel,
            grid=(H // rp.TILE_H, W // rp.TILE_W),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[tile_spec, tile_spec],
            out_shape=[
                _jax.ShapeDtypeStruct((H, W), jnp.float32),
                _jax.ShapeDtypeStruct((H, W), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((rp.TILE_H, rp.TILE_W), jnp.float32),
                pltpu.VMEM((rp.TILE_H, rp.TILE_W), jnp.int32),
            ] + list(rp._HBM_SLABS),
        )(supers, blocks, *rp._hbm_flat_inputs(ti, tf))
        return depth.sum() + jnp.float32(idx.sum())

    def stage_w(m):
        ti, tf = geom(m)
        color, depth = rvt.rasterize_setup_pallas_vis(
            ti, tf, W, H, compact=compact)
        return jnp.float32(color.sum()) + depth.sum()

    def timed(fn, name):
        @jax.jit
        def run(ms):
            def step(carry, m):
                return carry + fn(m), None
            out, _ = jax.lax.scan(step, jnp.float32(0.0), ms)
            return out

        t0 = time.perf_counter()
        np.asarray(run(mats))
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(mats))
            best = min(best, (time.perf_counter() - t0) / frames)
        return best * 1000

    a = timed(stage_a, "A geometry")
    bt = timed(stage_b, "B +prepare")
    c = timed(stage_c, "C +raster")
    v = timed(stage_v, "V +vis-kernel")
    wt = timed(stage_w, "W +vis+resolve")
    print(f"tris={n} frames={frames} platform={jax.devices()[0].platform}")
    print(f"A geometry            : {a:8.2f} ms/frame")
    print(f"B +prepare (delta)    : {bt:8.2f} ms/frame  (+{bt - a:.2f})")
    print(f"C +hbm raster (delta) : {c:8.2f} ms/frame  (+{c - bt:.2f})")
    print(f"V +vis kernel (delta) : {v:8.2f} ms/frame  (+{v - bt:.2f})")
    print(f"W +vis+resolve (delta): {wt:8.2f} ms/frame  (+{wt - v:.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
