"""Config-4 tail attribution (VERDICT r4 #7): where do the non-raster
~16 ms of the composed 1M+TAA frame go?

Cumulative stage prefixes, each a barrier'd lax.scan over per-frame
jittered matrices (honest methodology, docs/PERFORMANCE.md):

    A  geometry + binned raster, digest the PACKED u32 plane directly
    B  A + crop + unpack to (H, W, 4) u8
    C  B + TAA resolve (the full config-4 composition)
    D  like C but TAA on the PADDED frame, crop at digest (isolates the
       pre-TAA crop materialization)

    python benchmarks/tail_attr.py [num_triangles] [--frames N]
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
    from zrenderer_tpu.ops import taa
    from zrenderer_tpu.scene.procedural import make_stress_scene

    W, H = 1920, 1080
    PW, PH = 1920, 1088
    scene, mesh_data = make_stress_scene(tris)
    r = Renderer(RenderConfig(width=W, height=H))
    r.load_scene(scene, mesh_data)
    b = r._buffers()
    ccols, tri_node = b["corner_cols"], b["tri_node"]
    jitters = taa.jitter_sequence(8)
    mats = jnp.asarray(np.stack([
        r.camera_matrices(jitter=jitters[k % 8]) for k in range(frames)
    ]).astype(np.float32))

    def raster(m):
        ti, tf = g.geometry_pipeline(jnp, ccols, None, None, m, tri_node,
                                     W, H)
        return rp.rasterize_setup_pallas_binned_hbm(ti, tf, PW, PH)

    def make_run(step_fn, init_fn=None):
        @jax.jit
        def run(ms):
            if init_fn is None:
                carry0 = jnp.float32(0.0)
            else:
                carry0 = init_fn(ms[0])

            def step(carry, m):
                carry2, m2 = jax.lax.optimization_barrier((carry, m))
                return step_fn(carry2, m2), None

            carry, _ = jax.lax.scan(step, carry0, ms)
            return jax.tree.leaves(carry)[-1]
        return run

    def stage_a(acc, m):
        color, depth = raster(m)
        return acc + jnp.sum(color, dtype=jnp.float32) + depth[0, 0]

    def stage_b(acc, m):
        color, depth = raster(m)
        rgba = rp.unpack_rgba8(color[:H, :W])
        return acc + jnp.sum(rgba, dtype=jnp.float32) + depth[0, 0]

    def init_c(m0):
        color, _ = raster(m0)
        rgba0 = rp.unpack_rgba8(color[:H, :W])
        return (taa.taa_init_history(rgba0), jnp.float32(0.0))

    def stage_c(carry, m):
        hist, acc = carry
        color, depth = raster(m)
        rgba = rp.unpack_rgba8(color[:H, :W])
        hist2, resolved = taa.taa_resolve(hist, rgba)
        return (hist2,
                acc + resolved[H // 2, W // 2].astype(jnp.float32).sum()
                + depth[H // 2, W // 2])

    def init_d(m0):
        color, _ = raster(m0)
        return (taa.taa_init_history(rp.unpack_rgba8(color)),
                jnp.float32(0.0))

    def stage_d(carry, m):
        hist, acc = carry
        color, depth = raster(m)
        rgba = rp.unpack_rgba8(color)  # padded, no crop
        hist2, resolved = taa.taa_resolve(hist, rgba)
        return (hist2,
                acc + resolved[H // 2, W // 2].astype(jnp.float32).sum()
                + depth[H // 2, W // 2])

    def init_e(m0):
        color, _ = raster(m0)
        return (taa.taa_init_history_packed(color[:H, :W]),
                jnp.float32(0.0))

    def stage_e(carry, m):
        hist, acc = carry
        color, depth = raster(m)
        hist2, resolved = taa.taa_resolve_packed(hist, color[:H, :W])
        return (hist2,
                acc + resolved[H // 2, W // 2].astype(jnp.float32)
                + depth[H // 2, W // 2])

    results = {}
    for name, fn, init in (
        ("A raster+digest(packed)", stage_a, None),
        ("B + crop/unpack u8", stage_b, None),
        ("C + TAA resolve (config4)", stage_c, init_c),
        ("D TAA on padded frame", stage_d, init_d),
        ("E packed/planar TAA", stage_e, init_e),
    ):
        run = make_run(fn, init)
        t0 = time.perf_counter()
        out = np.asarray(run(mats))
        comp = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = np.asarray(run(mats))
            best = min(best, (time.perf_counter() - t0) / frames)
        results[name] = best
        print(f"{name:28s}: {best*1e3:8.2f} ms/frame "
              f"(compile {comp:.1f}s, digest {float(out):.1f})", flush=True)
    ks = list(results)
    for prev, cur in zip(ks, ks[1:3]):
        print(f"delta {cur} - {prev}: "
              f"{(results[cur]-results[prev])*1e3:+.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
