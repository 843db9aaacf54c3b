"""Group8 raster vs the scalar HBM hierarchy at large triangle counts.

Times FULL frames (geometry + binning prep + kernel) for both paths as
one lax.scan over stacked per-step view matrices (no frame is loop-
invariant — docs/PERFORMANCE.md methodology), plus a prep-only variant
to attribute sort/gather cost.

    python benchmarks/group8_probe.py [num_triangles] [--reps N]
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
    reps = 4
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])

    import jax
    import jax.numpy as jnp

    from zrenderer_tpu.engine.config import RenderConfig
    from zrenderer_tpu.engine.renderer import Renderer
    from zrenderer_tpu.ops import geometry as g
    from zrenderer_tpu.ops import raster_pallas as rp
    from zrenderer_tpu.ops.experiments import raster_group8 as g8
    from zrenderer_tpu.scene.procedural import make_stress_scene

    cfg = RenderConfig(width=1920, height=1080)
    W, H = cfg.pad_width, cfg.pad_height
    scene, mesh_data = make_stress_scene(tris)
    r = Renderer(cfg)
    r.load_scene(scene, mesh_data)
    b = r._buffers()
    base = np.asarray(r.camera_matrices())
    # Tiny per-step scale jitter keeps every frame distinct.
    mats = np.stack([base * (1.0 + 1e-4 * k) for k in range(reps)], 0)
    mats = jnp.asarray(mats.astype(np.float32))

    def timed(name, frame):
        @jax.jit
        def run(mats_, pos, attrs, tvi, vnode):
            def step(carry, m):
                return carry + frame(m, pos, attrs, tvi, vnode), None
            out, _ = jax.lax.scan(step, jnp.float32(0.0), mats_)
            return out

        args = (mats, b["positions"], b["attrs"], b["tri_vidx"],
                b["vert_node"])
        np.asarray(run(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(*args))
            best = min(best, (time.perf_counter() - t0) / reps)
        print(f"{name:34s}: {best * 1000:9.2f} ms/frame", flush=True)
        return best

    def geom(m, pos, attrs, tvi, vnode):
        return g.geometry_pipeline(jnp, pos, attrs, tvi, m, vnode, W, H)

    def digest(arrs):
        return sum(jnp.sum(a.astype(jnp.float32) if a.dtype != jnp.uint32
                           else a.astype(jnp.float32)) for a in arrs)

    def frame_geom(m, pos, attrs, tvi, vnode):
        ti, tf = geom(m, pos, attrs, tvi, vnode)
        return digest([ti[:, 0], tf[:, 0]])

    def frame_hbm(m, pos, attrs, tvi, vnode):
        ti, tf = geom(m, pos, attrs, tvi, vnode)
        c, d = rp.rasterize_setup_pallas_hbm(ti, tf, W, H, compact=False)
        return digest([c, d])

    def frame_g8(m, pos, attrs, tvi, vnode):
        ti, tf = geom(m, pos, attrs, tvi, vnode)
        c, d = g8.rasterize_setup_pallas_group8(ti, tf, W, H)
        return digest([c, d])

    def frame_g8_prep(m, pos, attrs, tvi, vnode):
        ti, tf = geom(m, pos, attrs, tvi, vnode)
        inp = g8.prepare_group8_inputs(ti, tf, W, H)
        return digest([inp.rows[:, 0], inp.offs, inp.tile_any,
                       inp.blocks[:, 0]])

    def frame_g8_gbuf(m, pos, attrs, tvi, vnode):
        ti, tf = geom(m, pos, attrs, tvi, vnode)
        outs = g8.rasterize_gbuffer_pallas_group8(ti, tf, W, H)
        return digest(outs)

    def frame_hbm_gbuf(m, pos, attrs, tvi, vnode):
        ti, tf = geom(m, pos, attrs, tvi, vnode)
        outs = rp.rasterize_gbuffer_pallas_hbm(ti, tf, W, H, compact=False)
        return digest(outs)

    timed("geometry only", frame_geom)
    timed("g8 prep only (geom+sort+gather)", frame_g8_prep)
    timed("group8 flat frame", frame_g8)
    timed("hbm hierarchy flat frame", frame_hbm)
    timed("group8 gbuffer frame", frame_g8_gbuf)
    timed("hbm gbuffer frame", frame_hbm_gbuf)

    # Parity on hardware: one frame both ways, compare bits.
    ti, tf = geom(mats[0], b["positions"], b["attrs"], b["tri_vidx"],
                  b["vert_node"])
    c1, d1 = rp.rasterize_setup_pallas_hbm(ti, tf, W, H, compact=False)
    c2, d2 = g8.rasterize_setup_pallas_group8(ti, tf, W, H)
    c1, d1, c2, d2 = (np.asarray(x) for x in (c1, d1, c2, d2))
    print("parity color px diff:", int((c1 != c2).sum()),
          " depth bit diff:", int((d1.view(np.uint32)
                                   != d2.view(np.uint32)).sum()),
          " coverage:", float((d1 < 1).mean()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
