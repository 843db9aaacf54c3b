"""Stretch benchmark: ~1M-triangle lattice at 1080p (BASELINE.json config 4).

    python benchmarks/stress.py [num_triangles]

Reports geometry+raster frame time on the current device (TPU via Pallas,
CPU via XLA fallback), with the superblock/block binning hierarchy doing
the heavy lifting.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    tris = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    import jax

    from zrenderer_tpu.engine.config import RenderConfig
    from zrenderer_tpu.engine.renderer import Renderer
    from zrenderer_tpu.scene.procedural import make_stress_scene

    t0 = time.perf_counter()
    scene, mesh_data = make_stress_scene(tris)
    print(f"scene build: {time.perf_counter() - t0:.2f}s "
          f"({len(mesh_data.index_data) // 3} tris)")

    config = RenderConfig(width=1920, height=1080)
    r = Renderer(config)
    t0 = time.perf_counter()
    r.load_scene(scene, mesh_data)
    print(f"upload: {time.perf_counter() - t0:.2f}s")

    # Honest device rate (bench.py methodology): N frames in ONE dispatch
    # via render_animation, digest materialization as the true fence — a
    # per-frame render/present loop measures host dispatch rate on the
    # remote axon runtime (block_until_ready resolves at enqueue there).
    frames = 10
    t0 = time.perf_counter()
    digests, (color, depth) = r.render_animation(num_frames=frames)
    np.asarray(digests)
    print(f"compile + first dispatch: {time.perf_counter() - t0:.2f}s")

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        digests, (color, depth) = r.render_animation(num_frames=frames)
        np.asarray(digests)
        best = min(best, time.perf_counter() - t0)
    dt = best / frames
    cov = (np.asarray(depth[::8, ::8]) < 1.0).mean()
    n = r.flat.num_triangles
    print(
        f"steady: {dt * 1000:.2f} ms/frame = {1 / dt:.1f} FPS, "
        f"{n / 1e6 * (1 / dt):.1f} Mtri/s submitted, coverage {cov:.3f}, "
        f"platform={jax.devices()[0].platform}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
