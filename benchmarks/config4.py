"""BASELINE config 4 single-chip perf row: 1M-triangle dense lattice +
TAA resolve at 1080p, rendered as one jitted step per frame with the
history carried on device (the multi-chip semantics of the same
composition are proven bit-exact in tests/test_config4.py).

Honest methodology (docs/PERFORMANCE.md): frames run as a lax.scan over
the per-frame jittered matrices with an optimization_barrier tying the
carry to the inputs, one device dispatch, digest materialized.

    python benchmarks/config4.py [num_triangles] [--frames N]
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
    frames = 8
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
    PW, PH = 1920, 1088  # tile-padded raster target
    scene, mesh_data = make_stress_scene(tris)
    # PRODUCTION geometry path: the column per-corner buffers the engine
    # uploads at load (geometry_pipeline_cols, ~50 ms at 1M on v5e) —
    # the first recorded config-4 number (597 ms, 2026-08-21) ran the
    # legacy row-mode geometry (~207 ms) by mistake.
    r = Renderer(RenderConfig(width=W, height=H))
    r.load_scene(scene, mesh_data)
    b = r._buffers()
    ccols, tri_node = b["corner_cols"], b["tri_node"]
    jitters = taa.jitter_sequence(8)
    mats = jnp.asarray(np.stack([
        r.camera_matrices(jitter=jitters[k % 8]) for k in range(frames)
    ]).astype(np.float32))

    def frame(m):
        ti, tf = g.geometry_pipeline(jnp, ccols, None, None, m, tri_node,
                                     W, H)
        # Production large-scene default: the record-streaming binned
        # kernel (111.8 vs hbm1's 315.5 ms at 1M, benchmarks/binned_ab).
        color, depth = rp.rasterize_setup_pallas_binned_hbm(
            ti, tf, PW, PH)
        return color[:H, :W], depth

    @jax.jit
    def run(ms):
        def step(carry, m):
            hist, acc = carry
            hist2, m2 = jax.lax.optimization_barrier((hist, m))
            packed, depth = frame(m2)
            # Packed/planar TAA (round 5): same integer resolve on u32
            # frames + (3, H, W) history planes — the channel-minor
            # (H, W, 3) form wasted 125/128 TPU lanes (tail_attr.py).
            hist3, resolved = taa.taa_resolve_packed(hist2, packed)
            dig = (resolved[H // 2, W // 2].astype(jnp.float32)
                   + depth[H // 2, W // 2])
            return (hist3, acc + dig), None
        packed0, _ = frame(ms[0])
        hist0 = taa.taa_init_history_packed(packed0)
        (hist, acc), _ = jax.lax.scan(step, (hist0, jnp.float32(0.0)), ms)
        return acc

    t0 = time.perf_counter()
    out = np.asarray(run(mats))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s "
          f"(digest {float(out):.2f})", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = np.asarray(run(mats))
        best = min(best, (time.perf_counter() - t0) / frames)
    print(f"config4 1M+TAA @1080p: {best*1e3:9.2f} ms/frame "
          f"({1.0/best:.2f} FPS)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
