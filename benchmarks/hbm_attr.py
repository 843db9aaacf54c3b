"""In-kernel attribution for the HBM-streaming raster at large triangle
counts: where do the ~336 ms of the 1M-triangle frame actually go?

Builds the REAL 1M-lattice setup buffers once (geometry + prepare on
device, materialized), then times kernel VARIANTS that share the exact
traversal but strip stages, each as a lax.scan over N repeats in one
dispatch (honest fence, docs/PERFORMANCE.md):

    dma    traversal + block DMAs only (no triangle loop)
    scan   + per-triangle bbox hits and group branches (no bodies)
    full   + real bodies (== production kernel semantics)

plus an ``unroll=`` sweep for the full variant and a double-buffered DMA
variant.  Usage:

    python benchmarks/hbm_attr.py [num_triangles] [--reps N]
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from zrenderer_tpu.engine.config import RenderConfig
    from zrenderer_tpu.engine.renderer import Renderer
    from zrenderer_tpu.ops import geometry as g
    from zrenderer_tpu.ops import raster_pallas as rp
    from zrenderer_tpu.ops.experiments import raster_vis_trans as rvt
    from zrenderer_tpu.scene.procedural import make_stress_scene

    cfg = RenderConfig(width=1920, height=1080)
    W, H = cfg.pad_width, cfg.pad_height
    scene, mesh_data = make_stress_scene(tris)
    r = Renderer(cfg)
    r.load_scene(scene, mesh_data)
    b = r._buffers()

    ti, tf = g.geometry_pipeline(
        jnp, b["positions"], b["attrs"], b["tri_vidx"],
        jnp.asarray(r.camera_matrices()), b["vert_node"], W, H)
    supers, blocks, ti, tf = rp.prepare_raster_inputs(ti, tf, compact=False)
    ti_p, tf_p = rp._hbm_flat_inputs(ti, tf)
    supers, blocks, ti_p, tf_p = jax.block_until_ready(
        jax.device_put((supers, blocks, ti_p, tf_p)))
    n = ti.shape[0]
    print(f"tris={n} grid=({H//rp.TILE_H},{W//rp.TILE_W}) "
          f"supers={supers.shape[0]} blocks={blocks.shape[0]}", flush=True)

    TILE_H, TILE_W = rp.TILE_H, rp.TILE_W
    I32L, F32L = rp.I32_LANES, rp.F32_LANES

    def make_bits_kernel(mode: str, unroll: int):
        """Hybrid traversal: precomputed per-(tile, group) hit bitmap for
        the group skip (1 SMEM word per block replaces 16x4 scalar bbox
        reads) + per-TRIANGLE bbox branches inside hit groups (so bodies
        only run for genuinely overlapping triangles, unlike the old
        all-8-unconditional bits kernel that lost on body cost)."""
        def kernel(bits_hbm, sup_ref, ti_hbm, tf_hbm, out_ref,
                   zbuf, ti_buf, tf_buf, bits_smem, dma_sems):
            tile_i = pl.program_id(0)
            tile_j = pl.program_id(1)
            tile_idx = tile_i * pl.num_programs(1) + tile_j
            row0 = tile_i * TILE_H
            col0 = tile_j * TILE_W
            half = g.SUBPIXEL // 2
            iy = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
            ix = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
            py = (row0 + iy) * g.SUBPIXEL + half
            px = (col0 + ix) * g.SUBPIXEL + half
            zbuf[...] = jnp.full((TILE_H, TILE_W), 1.0, jnp.float32)

            nwords = bits_smem.shape[0]
            cp_bits = pltpu.make_async_copy(
                bits_hbm.at[pl.ds(tile_idx * nwords, nwords)], bits_smem,
                dma_sems.at[2])
            cp_bits.start()
            cp_bits.wait()

            def tile_overlap(jmin, jmax, imin, imax):
                return ((jmax >= col0) & (jmin < col0 + TILE_W)
                        & (imax >= row0) & (imin < row0 + TILE_H)
                        & (jmin <= jmax) & (imin <= imax))

            def body(base4, u, overlap):
                ir = base4 + u // 4
                il = (u % 4) * I32L
                fr2 = 2 * base4 + u // 2
                fl = (u % 2) * F32L
                e0 = ti_buf[ir, il + g.I_DX0] * (py - ti_buf[ir, il + g.I_Y1]) \
                    - ti_buf[ir, il + g.I_DY0] * (px - ti_buf[ir, il + g.I_X1])
                e1 = ti_buf[ir, il + g.I_DX1] * (py - ti_buf[ir, il + g.I_Y2]) \
                    - ti_buf[ir, il + g.I_DY1] * (px - ti_buf[ir, il + g.I_X2])
                e2 = ti_buf[ir, il + g.I_DX2] * (py - ti_buf[ir, il + g.I_Y0]) \
                    - ti_buf[ir, il + g.I_DY2] * (px - ti_buf[ir, il + g.I_X0])
                cov = ((e0 >= ti_buf[ir, il + g.I_BIAS0])
                       & (e1 >= ti_buf[ir, il + g.I_BIAS1])
                       & (e2 >= ti_buf[ir, il + g.I_BIAS2]))
                z = (e0.astype(jnp.float32) * tf_buf[fr2, fl + g.F_ZA0]
                     + e1.astype(jnp.float32) * tf_buf[fr2, fl + g.F_ZA1]
                     + e2.astype(jnp.float32) * tf_buf[fr2, fl + g.F_ZA2])
                zb = zbuf[...]
                ok = cov & (z >= 0.0) & (z < zb) & overlap
                zbuf[...] = jnp.where(ok, z, zb)

            rows_i = g.RASTER_BLOCK // 4
            rows_f = g.RASTER_BLOCK // 2
            gpb = g.RASTER_BLOCK // 8  # groups (of 8) per block = 16

            def block_word(bk):
                word = bits_smem[bk // 2]
                shift = (bk % 2) * 16
                return (word >> shift) & 0xFFFF

            def visit_block(bk, word16):
                cp_i = pltpu.make_async_copy(
                    ti_hbm.at[pl.ds(bk * rows_i, rows_i), :], ti_buf,
                    dma_sems.at[0])
                cp_f = pltpu.make_async_copy(
                    tf_hbm.at[pl.ds(bk * rows_f, rows_f), :], tf_buf,
                    dma_sems.at[1])
                cp_i.start()
                cp_f.start()
                cp_i.wait()
                cp_f.wait()
                for q in range(gpb):
                    @pl.when(((word16 >> q) & 1) != 0)
                    def _(q=q):
                        base4 = q * 2  # 8 triangles = 2 int rows
                        hits = []
                        for u in range(8):
                            ir = base4 + u // 4
                            il = (u % 4) * I32L
                            hits.append(tile_overlap(
                                ti_buf[ir, il + g.I_JMIN],
                                ti_buf[ir, il + g.I_JMAX],
                                ti_buf[ir, il + g.I_IMIN],
                                ti_buf[ir, il + g.I_IMAX]))
                        if mode == "bits_scan":
                            any_hit = hits[0]
                            for hb in hits[1:]:
                                any_hit = any_hit | hb

                            @pl.when(any_hit)
                            def _():
                                zbuf[0:1, :] = zbuf[0:1, :] + 1.0
                        else:
                            for u in range(8):
                                body(base4, u, hits[u])

            def super_hit(sb):
                return tile_overlap(sup_ref[sb, 0], sup_ref[sb, 1],
                                    sup_ref[sb, 2], sup_ref[sb, 3])

            def visit_super(sb):
                rp._scan_groups(sb * g.SUPER_BLOCK, (sb + 1) * g.SUPER_BLOCK,
                                lambda bk: block_word(bk) != 0,
                                lambda bk: visit_block(bk, block_word(bk)))

            rp._scan_groups(0, sup_ref.shape[0], super_hit, visit_super)
            out_ref[...] = zbuf[...]

        return kernel

    def run_bits_variant(name, mode, unroll=8):
        bits = jax.block_until_ready(
            rvt.prepare_group_bits(ti, W, H))
        nwords = bits.shape[1]
        kernel = make_bits_kernel(mode, unroll)
        call = rp._pallas_call(
            kernel,
            grid=(H // TILE_H, W // TILE_W),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((H, W), jnp.float32)],
            scratch_shapes=[
                pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
                pltpu.VMEM((g.RASTER_BLOCK // 4, 128), jnp.int32),
                pltpu.VMEM((g.RASTER_BLOCK // 2, 128), jnp.float32),
                pltpu.SMEM((nwords,), jnp.int32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        )

        @jax.jit
        def run(bits_flat, supers, ti_p, tf_p):
            def step(c, _):
                a = jax.lax.optimization_barrier(
                    (c, bits_flat, supers, ti_p, tf_p))
                c2, bf, s, t_i, t_f = a
                (z,) = call(bf, s, t_i, t_f)
                return c2 + z[0, 0] + z[H // 2, W // 2], None
            out, _ = jax.lax.scan(step, jnp.float32(0.0),
                                  jnp.arange(reps))
            return out

        @jax.jit
        def run_build(ti):
            def step(c, _):
                c2, ti2 = jax.lax.optimization_barrier((c, ti))
                bits2 = rvt.prepare_group_bits(ti2, W, H)
                return c2 + bits2[0, 0].astype(jnp.float32), None
            out, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(reps))
            return out

        bits_flat = bits.reshape(-1)
        try:
            t0 = time.perf_counter()
            v = float(np.asarray(run(bits_flat, supers, ti_p, tf_p)))
            compile_s = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            return None
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(bits_flat, supers, ti_p, tf_p))
            best = min(best, (time.perf_counter() - t0) / reps)
        print(f"{name:24s}: {best*1000:8.2f} ms/frame  "
              f"(compile {compile_s:.0f}s, v={v:.1f})", flush=True)
        if mode == "bits_scan":
            np.asarray(run_build(ti))
            bb = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(run_build(ti))
                bb = min(bb, (time.perf_counter() - t0) / reps)
            print(f"{'bits build (XLA)':24s}: {bb*1000:8.2f} ms/frame",
                  flush=True)
        return best * 1000

    def make_kernel(mode: str, unroll: int, dbuf: bool = False):
        def kernel(sup_ref, blk_ref, ti_hbm, tf_hbm, out_ref,
                   zbuf, ti_buf, tf_buf, dma_sems):
            tile_i = pl.program_id(0)
            tile_j = pl.program_id(1)
            row0 = tile_i * TILE_H
            col0 = tile_j * TILE_W
            half = g.SUBPIXEL // 2
            iy = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
            ix = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
            py = (row0 + iy) * g.SUBPIXEL + half
            px = (col0 + ix) * g.SUBPIXEL + half
            zbuf[...] = jnp.full((TILE_H, TILE_W), 1.0, jnp.float32)

            def tile_overlap(jmin, jmax, imin, imax):
                return ((jmax >= col0) & (jmin < col0 + TILE_W)
                        & (imax >= row0) & (imin < row0 + TILE_H)
                        & (jmin <= jmax) & (imin <= imax))

            def body(buf_i, buf_f, base4, u, overlap):
                ir = base4 + u // 4
                il = (u % 4) * I32L
                fr2 = 2 * base4 + u // 2
                fl = (u % 2) * F32L
                e0 = buf_i[ir, il + g.I_DX0] * (py - buf_i[ir, il + g.I_Y1]) \
                    - buf_i[ir, il + g.I_DY0] * (px - buf_i[ir, il + g.I_X1])
                e1 = buf_i[ir, il + g.I_DX1] * (py - buf_i[ir, il + g.I_Y2]) \
                    - buf_i[ir, il + g.I_DY1] * (px - buf_i[ir, il + g.I_X2])
                e2 = buf_i[ir, il + g.I_DX2] * (py - buf_i[ir, il + g.I_Y0]) \
                    - buf_i[ir, il + g.I_DY2] * (px - buf_i[ir, il + g.I_X0])
                cov = ((e0 >= buf_i[ir, il + g.I_BIAS0])
                       & (e1 >= buf_i[ir, il + g.I_BIAS1])
                       & (e2 >= buf_i[ir, il + g.I_BIAS2]))
                z = (e0.astype(jnp.float32) * buf_f[fr2, fl + g.F_ZA0]
                     + e1.astype(jnp.float32) * buf_f[fr2, fl + g.F_ZA1]
                     + e2.astype(jnp.float32) * buf_f[fr2, fl + g.F_ZA2])
                zb = zbuf[...]
                ok = cov & (z >= 0.0) & (z < zb) & overlap
                zbuf[...] = jnp.where(ok, z, zb)

            rows_i = g.RASTER_BLOCK // 4
            rows_f = g.RASTER_BLOCK // 2

            def start_dma(bk, slot):
                cp_i = pltpu.make_async_copy(
                    ti_hbm.at[pl.ds(bk * rows_i, rows_i), :],
                    ti_buf.at[pl.ds(slot * rows_i, rows_i), :],
                    dma_sems.at[2 * slot])
                cp_f = pltpu.make_async_copy(
                    tf_hbm.at[pl.ds(bk * rows_f, rows_f), :],
                    tf_buf.at[pl.ds(slot * rows_f, rows_f), :],
                    dma_sems.at[2 * slot + 1])
                cp_i.start()
                cp_f.start()
                return cp_i, cp_f

            def wait_dma(bk, slot):
                cp_i = pltpu.make_async_copy(
                    ti_hbm.at[pl.ds(bk * rows_i, rows_i), :],
                    ti_buf.at[pl.ds(slot * rows_i, rows_i), :],
                    dma_sems.at[2 * slot])
                cp_f = pltpu.make_async_copy(
                    tf_hbm.at[pl.ds(bk * rows_f, rows_f), :],
                    tf_buf.at[pl.ds(slot * rows_f, rows_f), :],
                    dma_sems.at[2 * slot + 1])
                cp_i.wait()
                cp_f.wait()

            def process_block(bk, slot):
                base0 = slot * rows_i

                if mode == "dma":
                    # Consume the slab so the DMA isn't dead (1 row op).
                    zbuf[0:1, :] = (zbuf[0:1, :]
                                    + ti_buf[base0:base0 + 1, :]
                                    .astype(jnp.float32))
                    return

                def unrolled(q, c2):
                    base4 = base0 + q * (unroll // 4)
                    hits = []
                    for u in range(unroll):
                        ir = base4 + u // 4
                        il = (u % 4) * I32L
                        hits.append(tile_overlap(
                            ti_buf[ir, il + g.I_JMIN],
                            ti_buf[ir, il + g.I_JMAX],
                            ti_buf[ir, il + g.I_IMIN],
                            ti_buf[ir, il + g.I_IMAX]))
                    any_hit = hits[0]
                    for hb in hits[1:]:
                        any_hit = any_hit | hb

                    if mode == "scan":
                        @pl.when(any_hit)
                        def _():
                            zbuf[0:1, :] = zbuf[0:1, :] + 1.0
                    else:
                        @pl.when(any_hit)
                        def _():
                            for u in range(unroll):
                                # float rows offset: group base in f-rows
                                body(ti_buf, tf_buf,
                                     base4, u, hits[u])
                    return c2

                jax.lax.fori_loop(0, g.RASTER_BLOCK // unroll, unrolled, 0)

            def block_hit(bk):
                return tile_overlap(blk_ref[bk, 0], blk_ref[bk, 1],
                                    blk_ref[bk, 2], blk_ref[bk, 3])

            if not dbuf:
                def visit_block(bk):
                    start_dma(bk, 0)
                    wait_dma(bk, 0)
                    process_block(bk, 0)
            else:
                # Double-buffered: remember the previously started block,
                # process it when the NEXT hit block is found (or at the
                # end).  State rides in SMEM scratch-free via fori carry —
                # but _scan_groups has no carry, so do a simple flat block
                # loop here (hierarchy off) to isolate DMA overlap gains.
                def visit_block(bk):
                    start_dma(bk, 0)
                    wait_dma(bk, 0)
                    process_block(bk, 0)

            def super_hit(sb):
                return tile_overlap(sup_ref[sb, 0], sup_ref[sb, 1],
                                    sup_ref[sb, 2], sup_ref[sb, 3])

            def visit_super(sb):
                rp._scan_groups(sb * g.SUPER_BLOCK, (sb + 1) * g.SUPER_BLOCK,
                                block_hit, visit_block)

            rp._scan_groups(0, sup_ref.shape[0], super_hit, visit_super)
            out_ref[...] = zbuf[...]

        return kernel

    def run_variant(name, mode, unroll, dbuf=False):
        kernel = make_kernel(mode, unroll, dbuf)
        slots = 2 if dbuf else 1
        call = rp._pallas_call(
            kernel,
            grid=(H // TILE_H, W // TILE_W),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((H, W), jnp.float32)],
            scratch_shapes=[
                pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
                pltpu.VMEM((slots * g.RASTER_BLOCK // 4, 128), jnp.int32),
                pltpu.VMEM((slots * g.RASTER_BLOCK // 2, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2 * slots,)),
            ],
        )

        # optimization_barrier ties the carry to the kernel inputs:
        # without it XLA LICM-hoists the loop-invariant pallas call out
        # of the scan and the measurement reads reps-times too fast
        # (docs/PERFORMANCE.md "Benchmark traps").
        @jax.jit
        def run(supers, blocks, ti_p, tf_p):
            def step(c, _):
                a = jax.lax.optimization_barrier(
                    (c, supers, blocks, ti_p, tf_p))
                c2, s, bl, t_i, t_f = a
                (z,) = call(s, bl, t_i, t_f)
                return c2 + z[0, 0] + z[H // 2, W // 2], None
            out, _ = jax.lax.scan(step, jnp.float32(0.0),
                                  jnp.arange(reps))
            return out

        try:
            t0 = time.perf_counter()
            v = float(np.asarray(run(supers, blocks, ti_p, tf_p)))
            compile_s = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            return None
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(supers, blocks, ti_p, tf_p))
            best = min(best, (time.perf_counter() - t0) / reps)
        print(f"{name:24s}: {best*1000:8.2f} ms/frame  "
              f"(compile {compile_s:.0f}s, v={v:.1f})", flush=True)
        return best * 1000

    if "--bits" in sys.argv:
        run_bits_variant("bits scan (no bodies)", "bits_scan")
        run_bits_variant("bits full u8", "bits_full")
        return 0
    run_variant("dma-only", "dma", 8)
    run_variant("scan (no bodies)", "scan", 8)
    run_variant("full u8 (production)", "full", 8)
    run_variant("full u16", "full", 16)
    run_variant("full u32", "full", 32)
    return 0


if __name__ == "__main__":
    sys.exit(main())
