"""Stage attribution for prepare_binned_hbm_inputs at 1M triangles —
the binned_ab run measured the full prepare at 248 ms while the probe
costs of its parts (sort 10, searchsorted 5, 1M-row gather 15-25) sum
to ~45 ms.  Times cumulative prefixes of the prepare with the barrier'd
scan methodology to find the pathological stage.

    python benchmarks/prepare_attr.py [num_triangles] [--reps N]
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
    from zrenderer_tpu.scene.procedural import make_stress_scene

    cfg = RenderConfig(width=1920, height=1080)
    W, H = cfg.pad_width, cfg.pad_height
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

    tiles_x = W // rp.TILE_W
    num_tiles = (H // rp.TILE_H) * tiles_x
    cap = rp.bin_cap_for(g.head_count(ti.shape[0]))
    n_input = g.head_count(ti.shape[0])
    k_budget = min(rp.HBM_PAIR_BUDGET, n_input * cap)
    print(f"rows={ti.shape[0]} n_input={n_input} cap={cap} "
          f"k_budget={k_budget}", flush=True)

    def stage_keys(t_i, t_f):
        head = t_i[:n_input]
        valid = head[:, g.I_VALID] > 0
        tj0 = head[:, g.I_JMIN] // rp.TILE_W
        tj1 = head[:, g.I_JMAX] // rp.TILE_W
        ty0 = head[:, g.I_IMIN] // rp.TILE_H
        ty1 = head[:, g.I_IMAX] // rp.TILE_H
        ntx = tj1 - tj0 + 1
        nty = ty1 - ty0 + 1
        foot = ntx * nty
        listed = valid & (foot <= cap)
        listed = listed & (
            jnp.cumsum(jnp.where(listed, foot, 0), dtype=jnp.int32)
            <= k_budget)
        keys = []
        for e in range(cap):
            dx = e % ntx
            dy = e // ntx
            pvalid = listed & (e < foot)
            keys.append(jnp.where(
                pvalid, (ty0 + dy) * tiles_x + (tj0 + dx), num_tiles))
        return jnp.stack(keys, axis=1).reshape(-1)

    p0 = n_input * cap
    idx_bits = max(1, (p0 - 1).bit_length())

    def stage_sort(t_i, t_f):
        keys = stage_keys(t_i, t_f)
        packed = (keys << idx_bits) | jnp.arange(p0, dtype=jnp.int32)
        return jnp.sort(packed)

    def stage_offsets(t_i, t_f):
        sp = stage_sort(t_i, t_f)
        return sp, jnp.searchsorted(
            sp, (jnp.arange(num_tiles + 1, dtype=jnp.int32) << idx_bits)
        ).astype(jnp.int32)

    def stage_gather(t_i, t_f):
        sp, offsets = stage_offsets(t_i, t_f)
        sorted_tri = (sp & ((1 << idx_bits) - 1)) // cap
        pad_p = (-k_budget) % rp.REC_ALIGN + rp.REC_CHUNK
        st = jnp.concatenate(
            [sorted_tri[:k_budget], jnp.zeros(pad_p, jnp.int32)])
        comb = jnp.concatenate(
            [
                jnp.pad(t_i, ((0, 0), (0, rp.I32_LANES - g.NI32))),
                jax.lax.bitcast_convert_type(
                    jnp.pad(t_f, ((0, 0), (0, rp.F32_LANES - g.NF32))),
                    jnp.int32),
            ], axis=1)
        crec = comb[st].at[:, rp.L_PID].set(st)
        return offsets, crec

    def stage_full(t_i, t_f):
        return rp.prepare_binned_hbm_inputs(t_i, t_f, W, H)

    def digest_of(out):
        leaves = jax.tree_util.tree_leaves(out)
        return sum(x.reshape(-1)[0].astype(jnp.float32) for x in leaves)

    def timed(name, fn):
        @jax.jit
        def run(a, c):
            def step(carry, _):
                c2, t_i, t_f = jax.lax.optimization_barrier((carry, a, c))
                return c2 + digest_of(fn(t_i, t_f)), None
            out, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(reps))
            return out
        t0 = time.perf_counter()
        np.asarray(run(ti, tf))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(ti, tf))
            best = min(best, (time.perf_counter() - t0) / reps)
        print(f"{name:32s}: {best*1e3:9.2f} ms  "
              f"(compile+first {compile_s:.1f}s)", flush=True)
        return best

    timed("keys+clamp", stage_keys)
    timed("+ packed sort", stage_sort)
    timed("+ searchsorted offsets", lambda a, c: stage_offsets(a, c)[1])
    timed("+ record gather (96-lane comb)", stage_gather)
    timed("full prepare (incl. hier tables)", stage_full)
    return 0


if __name__ == "__main__":
    sys.exit(main())
