"""Geometry-pipeline stage attribution at large triangle counts.

The group8 raster probe showed geometry_pipeline alone costs ~170 ms
at 1M triangles @1080p — more than the binned raster kernel it feeds.
This times cumulative prefixes of the pipeline (transform, assemble,
clip-classify, capped-clip top_k+gather, setup) to find the cost.

    python benchmarks/geom_attr.py [num_triangles] [--reps N]
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
    reps = 6
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])

    import jax
    import jax.numpy as jnp

    from zrenderer_tpu.engine.config import RenderConfig
    from zrenderer_tpu.engine.renderer import Renderer
    from zrenderer_tpu.ops import geometry as g
    from zrenderer_tpu.scene.procedural import make_stress_scene

    cfg = RenderConfig(width=1920, height=1080)
    W, H = cfg.pad_width, cfg.pad_height
    scene, mesh_data = make_stress_scene(tris)
    r = Renderer(cfg)
    r.load_scene(scene, mesh_data)
    b = r._buffers()
    base = np.asarray(r.camera_matrices())
    mats = jnp.asarray(np.stack(
        [base * (1.0 + 1e-4 * k) for k in range(reps)], 0
    ).astype(np.float32))

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
        print(f"{name:36s}: {best * 1000:9.2f} ms/frame", flush=True)
        return best

    def upto_transform(m, pos, attrs, tvi, vnode):
        cp = g.transform_positions(jnp, pos, m, vnode)
        return jnp.sum(cp[:, 0])

    def upto_assemble(m, pos, attrs, tvi, vnode):
        cp = g.transform_positions(jnp, pos, m, vnode)
        tr = g.assemble_triangles(jnp, cp, attrs, tvi)
        return jnp.sum(tr[:, 0, 0])

    def upto_clip(m, pos, attrs, tvi, vnode):
        cp = g.transform_positions(jnp, pos, m, vnode)
        tr = g.assemble_triangles(jnp, cp, attrs, tvi)
        cap = g.clip_cap_for(tvi.shape[0])
        fan, valid, idx = g.clip_triangles_capped(jnp, tr, W, H, cap)
        return jnp.sum(fan[:, 0, 0]) + jnp.sum(valid) + jnp.sum(idx)

    def upto_classify(m, pos, attrs, tvi, vnode):
        cp = g.transform_positions(jnp, pos, m, vnode)
        tr = g.assemble_triangles(jnp, cp, attrs, tvi)
        gx = jnp.float32(1.0 + 2.0 * g.guard_px(W) / float(W))
        gy = jnp.float32(1.0 + 2.0 * g.guard_px(H) / float(H))
        crossing = jnp.zeros(tr.shape[0], bool)
        fully_out = jnp.zeros(tr.shape[0], bool)
        for plane in range(5):
            dk = g._plane_distance(jnp, tr, plane, gx, gy)
            neg = dk < 0
            fully_out = fully_out | neg.all(axis=1)
            crossing = crossing | (neg.any(axis=1) & ~neg.all(axis=1))
        return jnp.sum(crossing) + jnp.sum(fully_out)

    def upto_select(m, pos, attrs, tvi, vnode):
        cp = g.transform_positions(jnp, pos, m, vnode)
        tr = g.assemble_triangles(jnp, cp, attrs, tvi)
        gx = jnp.float32(1.0 + 2.0 * g.guard_px(W) / float(W))
        gy = jnp.float32(1.0 + 2.0 * g.guard_px(H) / float(H))
        crossing = jnp.zeros(tr.shape[0], bool)
        fully_out = jnp.zeros(tr.shape[0], bool)
        for plane in range(5):
            dk = g._plane_distance(jnp, tr, plane, gx, gy)
            neg = dk < 0
            fully_out = fully_out | neg.all(axis=1)
            crossing = crossing | (neg.any(axis=1) & ~neg.all(axis=1))
        needs = crossing & ~fully_out
        cap = g.clip_cap_for(tvi.shape[0])
        c = jnp.cumsum(needs.astype(jnp.int32))
        j = jnp.arange(cap, dtype=jnp.int32)
        idx = jnp.searchsorted(c, j + 1, side="left").astype(jnp.int32)
        return jnp.sum(idx) + jnp.sum(c[-1])

    def upto_subclip(m, pos, attrs, tvi, vnode):
        cp = g.transform_positions(jnp, pos, m, vnode)
        tr = g.assemble_triangles(jnp, cp, attrs, tvi)
        gx = jnp.float32(1.0 + 2.0 * g.guard_px(W) / float(W))
        gy = jnp.float32(1.0 + 2.0 * g.guard_px(H) / float(H))
        crossing = jnp.zeros(tr.shape[0], bool)
        fully_out = jnp.zeros(tr.shape[0], bool)
        for plane in range(5):
            dk = g._plane_distance(jnp, tr, plane, gx, gy)
            neg = dk < 0
            fully_out = fully_out | neg.all(axis=1)
            crossing = crossing | (neg.any(axis=1) & ~neg.all(axis=1))
        needs = crossing & ~fully_out
        cap = g.clip_cap_for(tvi.shape[0])
        c = jnp.cumsum(needs.astype(jnp.int32))
        j = jnp.arange(cap, dtype=jnp.int32)
        idx = jnp.searchsorted(c, j + 1, side="left").astype(jnp.int32)
        live = j < c[-1]
        idx = jnp.where(live, jnp.minimum(idx, tr.shape[0] - 1), 0)
        sub = tr[idx]
        fan_s, valid_s = g.clip_triangles(jnp, sub, W, H)
        return jnp.sum(fan_s) + jnp.sum(valid_s) + jnp.sum(crossing)

    def full(m, pos, attrs, tvi, vnode):
        ti, tf = g.geometry_pipeline(jnp, pos, attrs, tvi, m, vnode, W, H)
        return jnp.sum(ti[:, 0]) + jnp.sum(tf[:, 0])

    # Column per-corner (gather-free, AoS-free) pipeline.
    cpb = (b["corner_cols"], b["tri_node"])

    def timed_corner(name):
        @jax.jit
        def run(mats_, ccols, tri_node):
            def step(carry, m):
                ti, tf = g.geometry_pipeline(
                    jnp, ccols, None, None, m, tri_node, W, H)
                return carry + jnp.sum(ti[:, 0]) + jnp.sum(tf[:, 0]), None
            out, _ = jax.lax.scan(step, jnp.float32(0.0), mats_)
            return out

        args = (mats,) + cpb
        np.asarray(run(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(*args))
            best = min(best, (time.perf_counter() - t0) / reps)
        print(f"{name:36s}: {best * 1000:9.2f} ms/frame", flush=True)
        return best

    stages = {
        "transform": upto_transform,
        "assemble": upto_assemble,
        "classify": upto_classify,
        "select": upto_select,
        "subclip": upto_subclip,
        "clip": upto_clip,
        "full": full,
    }
    want = [a for a in sys.argv[1:] if a in stages or a == "fullc"]
    want = want or list(stages) + ["fullc"]
    for name in want:
        if name == "fullc":
            timed_corner("full per-corner (gather-free)")
        else:
            timed(name, stages[name])
    return 0


if __name__ == "__main__":
    sys.exit(main())
