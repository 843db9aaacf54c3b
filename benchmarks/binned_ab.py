"""A/B: HBM hierarchy raster (hbm1) vs the pair-ordered record-streaming
binned kernel (tile_lists at HBM scale) on the 1M stress lattice — does
killing the per-(tile, block, triangle) bbox-scan machinery (~108 ms of
the 312 ms frame per benchmarks/hbm_attr.py) pay for the pair sort +
record gather prepare?

Honest methodology (docs/PERFORMANCE.md): barrier'd lax.scan, one
dispatch, digest fence; prepare and kernel timed separately; full frames
compared bit-for-bit once (the id tie-break and sequential strict-less
are outcome-equivalent).

    python benchmarks/binned_ab.py [num_triangles] [--reps N] [--cap N]
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
    reps = 3
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    cap = None
    if "--cap" in sys.argv:
        cap = int(sys.argv[sys.argv.index("--cap") + 1])
    gbuffer = "--gbuffer" in sys.argv

    import jax
    import jax.numpy as jnp

    from zrenderer_tpu.engine.config import RenderConfig
    from zrenderer_tpu.engine.renderer import Renderer
    from zrenderer_tpu.ops import geometry as g
    from zrenderer_tpu.ops import raster_pallas as rp
    from zrenderer_tpu.scene.procedural import make_stress_scene

    cfg = RenderConfig(width=1920, height=1080)
    W, H = cfg.pad_width, cfg.pad_height
    scene, mesh_data = make_stress_scene(tris)
    r = Renderer(cfg)
    r.load_scene(scene, mesh_data)
    b = r._buffers()
    mats = jnp.asarray(r.camera_matrices())

    # Jit the setup: eager op-by-op dispatch pays ~35 ms tunnel latency
    # PER OP through axon — hundreds of geometry/prepare ops took tens of
    # minutes before any timed stage started.
    ti, tf = jax.jit(
        lambda cc, m, tn: g.geometry_pipeline(jnp, cc, None, None, m, tn,
                                              W, H)
    )(b["corner_cols"], mats, b["tri_node"])
    ti, tf = jax.block_until_ready((ti, tf))
    eff_cap = cap if cap is not None else rp.bin_cap_for(
        g.head_count(ti.shape[0]))
    offs = np.asarray(jax.jit(
        lambda a, c: rp.prepare_binned_hbm_inputs(a, c, W, H, cap=cap)[0]
    )(ti, tf))
    print(f"tris={ti.shape[0]} alive={int((np.asarray(ti[:, g.I_VALID]) > 0).sum())} "
          f"cap={eff_cap} listed_pairs={offs[-1]} "
          f"max_span={np.diff(offs).max()}", flush=True)

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
        call_b = lambda a, c: rp.rasterize_gbuffer_pallas_binned_hbm(
            a, c, W, H, cap=cap)[:2]
    else:
        call_h = lambda a, c: rp.rasterize_setup_pallas_hbm(
            a, c, W, H, compact=False)
        call_b = lambda a, c: rp.rasterize_setup_pallas_binned_hbm(
            a, c, W, H, cap=cap)

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

    # Bit-exactness first (id tie-break == sequential strict-less).
    c1, d1 = jax.jit(call_h)(ti, tf)
    c2, d2 = jax.jit(call_b)(ti, tf)
    d_eq = np.array_equal(np.asarray(d1).view(np.uint32),
                          np.asarray(d2).view(np.uint32))
    c_eq = np.array_equal(np.asarray(c1), np.asarray(c2))
    print(f"exactness: depth {'OK' if d_eq else 'MISMATCH'}, "
          f"color {'OK' if c_eq else 'MISMATCH'}, "
          f"coverage {float((np.asarray(d1) < 1.0).mean()):.3f}", flush=True)

    t1 = timed("hbm1 hierarchy", scan_digest(call_h), ti, tf)
    t2 = timed("binned_hbm record stream", scan_digest(call_b), ti, tf)

    @jax.jit
    def prep(ti_in, tf_in):
        def step(c, _):
            c2, t_i, t_f = jax.lax.optimization_barrier((c, ti_in, tf_in))
            offsets, prec_i, prec_f, supers, blocks, hti, htf = \
                rp.prepare_binned_hbm_inputs(t_i, t_f, W, H, cap=cap)
            return c2 + offsets[-1].astype(jnp.float32) \
                + prec_i[0, 0].astype(jnp.float32) + prec_f[0, 0] \
                + supers[0, 0].astype(jnp.float32), None
        out, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(reps))
        return out

    timed("prepare (sort+gather+tables)", prep, ti, tf)
    if t1 and t2:
        print(f"speedup: {t1/t2:.2f}x", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
