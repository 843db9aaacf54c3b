"""A/B: HBM hierarchy raster (hbm1, the measured 1M champion at 312 ms)
vs the block-grouped lane-parallel kernel (ops/experiments/raster_vec.py) — the
round-4 attack on the ~250 ns/visit scalar floor.

Honest methodology (docs/PERFORMANCE.md): each variant runs as a lax.scan
of ``reps`` kernel invocations with an optimization_barrier tying the
carry to the inputs (no LICM hoisting), one device dispatch, digest
materialized (true fence on the axon runtime).  Prepare stages timed the
same way; full frames compared bit-for-bit once.

    python benchmarks/vec_ab.py [num_triangles] [--reps N] [--gbuffer]
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
    reps = 5
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    gbuffer = "--gbuffer" in sys.argv

    import jax
    import jax.numpy as jnp

    from zrenderer_tpu.engine.config import RenderConfig
    from zrenderer_tpu.engine.renderer import Renderer
    from zrenderer_tpu.ops import geometry as g
    from zrenderer_tpu.ops import raster_pallas as rp
    from zrenderer_tpu.ops.experiments import raster_vec as rv
    from zrenderer_tpu.scene.procedural import make_stress_scene

    cfg = RenderConfig(width=1920, height=1080)
    W, H = cfg.pad_width, cfg.pad_height
    scene, mesh_data = make_stress_scene(tris)
    r = Renderer(cfg)
    r.load_scene(scene, mesh_data)
    b = r._buffers()
    mats = jnp.asarray(r.camera_matrices())

    ti, tf = g.geometry_pipeline(
        jnp, b["positions"], b["attrs"], b["tri_vidx"], mats,
        b["vert_node"], W, H)
    ti, tf = jax.block_until_ready(jax.device_put((ti, tf)))
    alive = np.asarray(ti[:, g.I_VALID] > 0)
    print(f"tris={ti.shape[0]} alive={alive.sum()} gbuffer={gbuffer}",
          flush=True)

    def timed(name, fn, *args):
        try:
            t0 = time.perf_counter()
            out = np.asarray(fn(*args))
            compile_s = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            return None
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = np.asarray(fn(*args))
            best = min(best, (time.perf_counter() - t0) / reps)
        print(f"{name:28s}: {best*1e3:9.2f} ms/frame"
              f"  (compile+first {compile_s:.1f}s, digest {float(out):.1f})",
              flush=True)
        return best

    if gbuffer:
        call_h = lambda a, c: rp.rasterize_gbuffer_pallas_hbm(a, c, W, H)[:2]
        call_v = lambda a, c: rv.rasterize_gbuffer_pallas_vec(a, c, W, H)[:2]
    else:
        call_h = lambda a, c: rp.rasterize_setup_pallas_hbm(
            a, c, W, H, compact=False)
        call_v = lambda a, c: rv.rasterize_setup_pallas_vec(a, c, W, H)

    def scan_digest(call):
        @jax.jit
        def run(ti_in, tf_in):
            def step(c, _):
                c2, t_i, t_f = jax.lax.optimization_barrier((c, ti_in, tf_in))
                color, depth = call(t_i, t_f)
                return c2 + depth[0, 0] + depth[H // 2, W // 2] \
                    + color[H // 2, W // 2].astype(jnp.float32), None
            out, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(reps))
            return out
        return run

    # Bit-exactness first: full frames compared once.
    c1, d1 = jax.jit(call_h)(ti, tf)
    c2, d2 = jax.jit(call_v)(ti, tf)
    d_eq = np.array_equal(np.asarray(d1).view(np.uint32),
                          np.asarray(d2).view(np.uint32))
    c_eq = np.array_equal(np.asarray(c1), np.asarray(c2))
    cov = float((np.asarray(d1) < 1.0).mean())
    print(f"exactness: depth {'OK' if d_eq else 'MISMATCH'}, "
          f"color {'OK' if c_eq else 'MISMATCH'}, coverage {cov:.3f}",
          flush=True)

    t1 = timed("hbm1 full-tile", scan_digest(call_h), ti, tf)
    t2 = timed("vec block-grouped", scan_digest(call_v), ti, tf)

    @jax.jit
    def prep_v(ti_in, tf_in):
        def step(c, _):
            c2, t_i, t_f = jax.lax.optimization_barrier((c, ti_in, tf_in))
            supers, blocks, rec = rv.prepare_vec_inputs(t_i, t_f)
            return c2 + supers[0, 0].astype(jnp.float32) \
                + blocks[0, 0].astype(jnp.float32) \
                + rec[0, 0].astype(jnp.float32), None
        out, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(reps))
        return out

    timed("prepare vec (tables+rec)", prep_v, ti, tf)
    if t1 and t2:
        print(f"speedup: {t1/t2:.2f}x", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
