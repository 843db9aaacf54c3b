"""A/B: single-class full-tile HBM raster (hbm1) vs two-class windowed
(hbm2) at large triangle counts — VERDICT r3 item 1.

Honest methodology (docs/PERFORMANCE.md): each variant runs as a lax.scan
of ``reps`` kernel invocations with an optimization_barrier tying the
carry to the inputs (no LICM hoisting), one device dispatch, digest
materialized (true fence on the axon runtime).  Geometry + prepare are
timed separately the same way.

    python benchmarks/hbm2_ab.py [num_triangles] [--reps N]
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

    import jax
    import jax.numpy as jnp

    from zrenderer_tpu.engine.config import RenderConfig
    from zrenderer_tpu.engine.renderer import Renderer
    from zrenderer_tpu.ops import geometry as g
    from zrenderer_tpu.ops import raster_pallas as rp
    from zrenderer_tpu.ops.experiments import raster_hbm2 as rh2
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
    short = np.asarray(rp._classify_short(jnp, ti))
    alive = np.asarray(ti[:, g.I_VALID] > 0)
    print(f"tris={ti.shape[0]} alive={alive.sum()} "
          f"short={short.sum()} ({short.sum()/max(alive.sum(),1):.1%} "
          f"of alive)", flush=True)

    def timed(name, fn, *args):
        try:
            t0 = time.perf_counter()
            out = np.asarray(fn(*args))
            compile_s = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s}: FAILED {type(e).__name__}: {str(e)[:200]}",
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

    t1 = timed("hbm1 full-tile", scan_digest(
        lambda a, c: rp.rasterize_setup_pallas_hbm(a, c, W, H, compact=False)
    ), ti, tf)
    t2 = timed("hbm2 two-class windowed", scan_digest(
        lambda a, c: rh2.rasterize_setup_pallas_hbm2(a, c, W, H)
    ), ti, tf)

    # Prepare-stage deltas (tables + packing), same barrier'd scan.
    @jax.jit
    def prep1(ti_in, tf_in):
        def step(c, _):
            c2, t_i, t_f = jax.lax.optimization_barrier((c, ti_in, tf_in))
            s, bl, a2, c2f = rp.prepare_raster_inputs(t_i, t_f, compact=False)
            ap, cp = rp._hbm_flat_inputs(a2, c2f)
            return c2 + s[0, 0].astype(jnp.float32) + ap[0, 0].astype(
                jnp.float32) + cp[0, 0], None
        out, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(reps))
        return out

    @jax.jit
    def prep2(ti_in, tf_in):
        def step(c, _):
            c2, t_i, t_f = jax.lax.optimization_barrier((c, ti_in, tf_in))
            (ss, bs, tis, st, bt, tit, tf2) = \
                rh2.prepare_raster_inputs_2class(t_i, t_f)
            ap, cp = rp._hbm_flat_inputs(tis, tf2)
            bp, _ = rp._hbm_flat_inputs(tit, tf2)
            return c2 + ss[0, 0].astype(jnp.float32) + st[0, 0].astype(
                jnp.float32) + ap[0, 0].astype(jnp.float32) \
                + bp[0, 0].astype(jnp.float32) + cp[0, 0], None
        out, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(reps))
        return out

    timed("prepare hbm1 (tables+pack)", prep1, ti, tf)
    timed("prepare hbm2 (2x tables)", prep2, ti, tf)
    if t1 and t2:
        print(f"speedup: {t1/t2:.2f}x", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
