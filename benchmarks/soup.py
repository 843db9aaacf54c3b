"""Dense unordered-soup binning A/B: hierarchy vs tile_lists (vs small).

The round-1 VERDICT item-4 claim (17.6x for per-tile lists on a dense
soup) was measured with the broken enqueue-fence and withdrawn; this is
the honest re-measurement.  A triangle soup has no spatial coherence, so
block/superblock union bboxes degenerate and hierarchy tiles scan most
of the triangle list; per-tile lists restore O(own triangles) per tile.

    python benchmarks/soup.py [num_triangles] [--frames N]

Uses the single-dispatch scan + digest fence (docs/PERFORMANCE.md).
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
        else 20_000
    frames = 10
    if "--frames" in sys.argv:
        frames = int(sys.argv[sys.argv.index("--frames") + 1])
    cap = None
    if "--cap" in sys.argv:
        cap = int(sys.argv[sys.argv.index("--cap") + 1])
    budget = None
    if "--budget" in sys.argv:
        budget = int(sys.argv[sys.argv.index("--budget") + 1])
    coarse = None
    if "--coarse" in sys.argv:
        i = sys.argv.index("--coarse") + 1
        coarse = int(sys.argv[i]) if i < len(sys.argv) \
            and sys.argv[i].isdigit() else 8
    only = None
    if "--only" in sys.argv:
        # e.g. --only tile_lists: skip the hierarchy run (at 1M soup the
        # hierarchy frame is minutes long and trips the device watchdog).
        only = sys.argv[sys.argv.index("--only") + 1]

    import jax
    import jax.numpy as jnp

    from zrenderer_tpu.engine.upload import flatten_scene
    from zrenderer_tpu.ops import geometry as g
    from zrenderer_tpu.ops import raster_pallas as rp
    from zrenderer_tpu.scene.procedural import make_triangle_soup

    W, H = 1920, 1088
    scene, mesh_data = make_triangle_soup(tris, seed=5, extent=6.0)
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=64)
    vp = g.view_proj_from_camera(scene.active_camera, W, H)
    base = np.einsum("nij,jk->nik", flat.node_to_world, vp)
    mats = jnp.asarray(np.stack(
        [base * (1.0 + 1e-5 * k) for k in range(frames)], 0
    ).astype(np.float32))
    pos = jnp.asarray(flat.positions)
    attrs = jnp.asarray(flat.attrs)
    tvi = jnp.asarray(flat.tri_vidx)
    vnode = jnp.asarray(flat.vert_node)

    def run_for(raster):
        @jax.jit
        def run(ms):
            def step(carry, m):
                ti, tf = g.geometry_pipeline(
                    jnp, pos, attrs, tvi, m, vnode, W, H)
                color, depth = raster(ti, tf, W, H)
                return carry + jnp.sum(color, dtype=jnp.float32) \
                    + jnp.sum(depth), None
            out, _ = jax.lax.scan(step, jnp.float32(0.0), ms)
            return out

        t0 = time.perf_counter()
        r0 = np.asarray(run(mats))
        print(f"  compile+first {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(mats))
            best = min(best, (time.perf_counter() - t0) / frames)
        return best * 1000, float(r0)

    n_rows = g.capped_rows(len(flat.tri_vidx))
    print(f"soup: {tris} tris, {n_rows} setup rows, "
          f"platform={jax.devices()[0].platform}")
    results = {}
    if n_rows > rp.VMEM_RESIDENT_MAX_TRIS:
        # Past the VMEM-resident bound: hierarchy streams from HBM and
        # tile_lists streams pair-ordered records (the VMEM binned
        # kernel cannot compile here — whole-VMEM ti/tf operands).
        variants = [
            ("hierarchy", rp.rasterize_setup_pallas_hbm),
            ("tile_lists",
             lambda a, c, w, h: rp.rasterize_setup_pallas_binned_hbm(
                 a, c, w, h, cap=cap, pair_budget=budget)),
        ]
        if coarse is not None:
            variants.append(
                ("tl+coarse",
                 lambda a, c, w, h: rp.rasterize_setup_pallas_binned_hbm(
                     a, c, w, h, cap=cap, pair_budget=budget,
                     coarse_cap=coarse, coarse_budget=budget)))
    else:
        variants = [("hierarchy", rp.rasterize_setup_pallas),
                    ("tile_lists", rp.rasterize_setup_pallas_binned)]
    if g.head_count(n_rows) <= rp.SMALL_BIN_MAX_ROWS:
        variants.append(("small", rp.rasterize_setup_pallas_small))
    if only is not None:
        variants = [v for v in variants if v[0] == only]
    for name, fn in variants:
        ms, digest = run_for(fn)
        results[name] = (ms, digest)
        print(f"{name:11s}: {ms:8.2f} ms/frame  digest={digest}")
    digests = {d for _, d in results.values()}
    print("digests equal:", len(digests) == 1)
    if "hierarchy" in results and "tile_lists" in results:
        print(f"tile_lists speedup vs hierarchy: "
              f"{results['hierarchy'][0] / results['tile_lists'][0]:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
