"""A/B: band-local vs full-frame streaming-binned prepare (VERDICT r4 #1).

The round-4 multi-chip binned band ran the ENTIRE pair build (keys, sort,
record gather) over the full framebuffer on every device — ~40 ms of
replicated work at 1M that made the v5e-8 projection dishonest.  The
band-local prepare scopes keys, sort sentinels, and the record gather to
one band's tiles.  This measures both variants single-chip on one band
(band_h = H/8, the v5e-8 share) at 1M: the delta is exactly the per-device
work the multi-chip step no longer repeats.

Honest methodology (docs/PERFORMANCE.md): barrier'd lax.scan, one
dispatch, digest fence; band frames compared bit-for-bit once.

    python benchmarks/band_prepare_ab.py [num_triangles] [--reps N]
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

    import jax
    import jax.numpy as jnp

    from zrenderer_tpu.engine.config import RenderConfig
    from zrenderer_tpu.engine.renderer import Renderer
    from zrenderer_tpu.ops import geometry as g
    from zrenderer_tpu.ops import raster_pallas as rp
    from zrenderer_tpu.scene.procedural import make_stress_scene

    cfg = RenderConfig(width=1920, height=1080)
    W, H = cfg.pad_width, cfg.pad_height
    # The padded 1088-row frame is 34 tile rows — not divisible by 8, so
    # the v5e-8 proxy band is 4 tile rows (128 px ~= 1/8.5 of the frame).
    band_h = 4 * rp.TILE_H
    row0 = 512  # an interior band (sees mid-screen density)
    scene, mesh_data = make_stress_scene(tris)
    r = Renderer(cfg)
    r.load_scene(scene, mesh_data)
    b = r._buffers()
    mats = jnp.asarray(r.camera_matrices())

    ti, tf = jax.jit(
        lambda cc, m, tn: g.geometry_pipeline(jnp, cc, None, None, m, tn,
                                              W, H)
    )(b["corner_cols"], mats, b["tri_node"])
    ti, tf = jax.block_until_ready((ti, tf))

    def timed(name, fn, *args):
        try:
            t0 = time.perf_counter()
            out = np.asarray(fn(*args))
            compile_s = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            return None
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = np.asarray(fn(*args))
            best = min(best, (time.perf_counter() - t0) / reps)
        print(f"{name:32s}: {best*1e3:9.2f} ms/frame"
              f"  (compile+first {compile_s:.1f}s, digest {float(out):.1f})",
              flush=True)
        return best

    # The gather pays per STATIC row (benchmarks/sort_scale_probe.py), so
    # the band-local win requires shrinking the static pair budget with
    # the band: full-frame budget / n_bands (x2 headroom).
    band_budget = max(rp.HBM_PAIR_BUDGET // 8 * 2, 1 << 17)
    call_full = lambda a, c: rp.rasterize_setup_pallas_binned_band(
        a, c, W, H, band_h, row0, band_local=False)
    call_band = lambda a, c: rp.rasterize_setup_pallas_binned_band(
        a, c, W, H, band_h, row0, band_local=True,
        pair_budget=band_budget)

    def scan_digest(call):
        @jax.jit
        def run(ti_in, tf_in):
            def step(ca, _):
                c2, t_i, t_f = jax.lax.optimization_barrier(
                    (ca, ti_in, tf_in))
                color, depth = call(t_i, t_f)
                return c2 + depth[0, 0] + depth[band_h // 2, W // 2] \
                    + color[band_h // 2, W // 2].astype(jnp.float32), None
            out, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(reps))
            return out
        return run

    c1, d1 = jax.jit(call_full)(ti, tf)
    c2, d2 = jax.jit(call_band)(ti, tf)
    d_eq = np.array_equal(np.asarray(d1).view(np.uint32),
                          np.asarray(d2).view(np.uint32))
    c_eq = np.array_equal(np.asarray(c1), np.asarray(c2))
    print(f"exactness: depth {'OK' if d_eq else 'MISMATCH'}, "
          f"color {'OK' if c_eq else 'MISMATCH'}, "
          f"coverage {float((np.asarray(d1) < 1.0).mean()):.3f}", flush=True)

    t_full = timed("band raster, FULL prepare", scan_digest(call_full),
                   ti, tf)
    t_band = timed("band raster, BAND prepare", scan_digest(call_band),
                   ti, tf)

    def prep_digest(band_kw):
        @jax.jit
        def run(ti_in, tf_in):
            def step(ca, _):
                c2, t_i, t_f = jax.lax.optimization_barrier(
                    (ca, ti_in, tf_in))
                offsets, prec_i, prec_f, supers, blocks, hti, htf = \
                    rp.prepare_binned_hbm_inputs(t_i, t_f, W, H, **band_kw)
                return c2 + offsets[-1].astype(jnp.float32) \
                    + prec_i[0, 0].astype(jnp.float32) + prec_f[0, 0] \
                    + supers[0, 0].astype(jnp.float32), None
            out, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(reps))
            return out
        return run

    timed("prepare FULL frame", prep_digest({}), ti, tf)
    band_kw = dict(band_ty0=row0 // rp.TILE_H,
                   band_tiles_y=band_h // rp.TILE_H)
    timed("prepare BAND full-budget", prep_digest(band_kw), ti, tf)
    for bud in (1 << 18, 1 << 17):
        timed(f"prepare BAND budget={bud>>10}k",
              prep_digest(dict(band_kw, pair_budget=bud)), ti, tf)
    if t_full and t_band:
        print(f"band-local speedup on the band step: {t_full/t_band:.2f}x",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
