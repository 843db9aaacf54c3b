"""A/B: meshlet (cluster) culling on the sphere field (VERDICT r4 #6).

A 1M-triangle field of closed UV spheres has ~half its 128-triangle
clusters back-facing from any camera — the case the lattice never
exercises (its quads all face the camera).  Culling kills those blocks
before binning, so the pair lists, block tables, and raster phase all
shrink; the image is bit-identical (conservative tests).

Honest methodology: render_animation (barrier'd scan over per-frame
constants), digest fence; images compared bit-for-bit once.

    python benchmarks/meshlet_ab.py [num_triangles] [--frames N]
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

    from zrenderer_tpu.engine.config import RenderConfig
    from zrenderer_tpu.engine.renderer import Renderer
    from zrenderer_tpu.ops import geometry as g
    from zrenderer_tpu.scene.procedural import make_sphere_field

    scene, md = make_sphere_field(tris)

    def measure(cull: bool):
        r = Renderer(RenderConfig(width=1920, height=1080,
                                  meshlet_cull=cull))
        r.load_scene(scene, md)
        digests, (color, depth) = r.render_animation(num_frames=frames)
        d0 = np.asarray(digests)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            digests, _ = r.render_animation(num_frames=frames)
            np.asarray(digests)
            best = min(best, (time.perf_counter() - t0) / frames)
        img = np.asarray(color)
        return best, d0, img, r

    t_off, d_off, img_off, _ = measure(False)
    t_on, d_on, img_on, r_on = measure(True)
    same = np.array_equal(d_off, d_on) and np.array_equal(img_off, img_on)
    print(f"exactness: {'OK' if same else 'MISMATCH'}", flush=True)

    bounds, mdraw, enabled = (np.asarray(x) for x in r_on._meshlet_table)
    keep = np.asarray(g.meshlet_keep_mask(
        np, bounds, mdraw, enabled.astype(bool),
        r_on.camera_matrices(), r_on.cam_local_constants()))
    print(f"clusters: {len(keep)}  kept: {keep.mean()*100:.1f}%", flush=True)
    print(f"meshlet cull OFF: {t_off*1e3:8.2f} ms/frame", flush=True)
    print(f"meshlet cull ON : {t_on*1e3:8.2f} ms/frame "
          f"({t_off/t_on:.2f}x)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
