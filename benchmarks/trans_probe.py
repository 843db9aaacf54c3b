"""Probe: TRANSPOSED group raster — triangles in sublanes, tile columns in
lanes — against the production HBM hierarchy kernel at large triangle
counts.

OUTCOME (measured, v5e, 1M tris @1080p): NEGATIVE.  The transposed
kernel costs ~433 ms + ~124 ms resolve vs the scalar hierarchy kernel's
336 ms total; the static-row-band variant ~750 ms.  Early runs of this
probe reported 3x better numbers because the timing scans were
loop-invariant and XLA LICM-hoisted the pallas call out of the scan
(custom-call sits in ENTRY in the compiled HLO; total time constant in
reps).  The loops below now tie the carry to the kernel inputs with
optimization_barrier; see docs/PERFORMANCE.md "Benchmark traps".

The production kernels pay ~300+ ns per (tile, triangle) visit, and the
probes show why: the cost is per-triangle SCALAR machinery (16-30 scalar
reads each feeding a scalar->vector splat, plus loop/branch overhead),
not the vector math (measured ~2 ns marginal for a full-tile op set,
benchmarks/band_probe.py) and not bandwidth.  This kernel removes the
scalar work entirely:

* a group of 8 consecutive triangles' setup columns load as ALIGNED
  (8, 1) sublane vectors (zero scalar reads, zero splats);
* edge functions for all 8 triangles evaluate at once over one tile row
  span as (8, 128) int32 ops — triangle index rides the SUBLANE dim,
  tile column rides the LANE dim;
* rows iterate over the group's union-bbox row chunks (R rows per
  chunk), so tiny triangles don't pay full-tile evaluation;
* the in-group depth merge is a cross-sublane min with the min-id tie
  rule (== submission-order first-wins, since setup rows are in
  submission order), then ONE read-modify-write of the framebuffer row;
* output is a visibility buffer (z + winning id); flat color resolves
  through the existing exact XLA pass (resolve_flat_vis).

    python benchmarks/trans_probe.py [num_triangles] [--reps N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GROUP = 8  # triangles per transposed group (sublane count)


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
    T = ti.shape[0]

    # Transposed-path inputs: one 128-lane row per record (HBM DMA slices
    # must span full 128-lane rows) + group bounds packed 16 groups/row.
    ti_t = jnp.pad(ti, ((0, 0), (0, 128 - g.NI32)))
    tf_t = jnp.pad(tf, ((0, 0), (0, 128 - g.NF32)))
    ngroups = T // GROUP
    live = (ti[:, g.I_JMIN] <= ti[:, g.I_JMAX]) \
        & (ti[:, g.I_IMIN] <= ti[:, g.I_IMAX])
    big = jnp.int32(1 << 29)

    def seg(col, neutral, mi):
        v = jnp.where(live, ti[:, col], neutral).reshape(ngroups, GROUP)
        return v.min(axis=1) if mi else v.max(axis=1)

    gb = jnp.stack([
        seg(g.I_JMIN, big, True), seg(g.I_JMAX, -big, False),
        seg(g.I_IMIN, big, True), seg(g.I_IMAX, -big, False),
    ], axis=1)
    gb = jnp.pad(gb, ((0, 0), (0, 4)))  # (ngroups, 8)
    GPB = g.RASTER_BLOCK // GROUP  # groups per block (= 16)
    gb = gb.reshape(ngroups // GPB, GPB * 8)  # one 128-lane row per block

    table = rvt._vis_resolve_table(ti, tf)
    inputs = jax.block_until_ready(jax.device_put(
        (supers, blocks, ti_t, tf_t, gb, table)))
    supers, blocks, ti_t, tf_t, gb, table = inputs
    print(f"tris={T} groups={ngroups} grid=({H//rp.TILE_H},{W//rp.TILE_W})",
          flush=True)

    TILE_H, TILE_W = rp.TILE_H, rp.TILE_W

    def make_kernel(R: int, STATIC_BANDS: bool = False):
        def kernel(sup_ref, blk_ref, ti_hbm, tf_hbm, gb_hbm,
                   depth_ref, idx_ref,
                   zbuf, idxbuf, ti_buf, tf_buf, gb_buf, dma_sems):
            tile_i = pl.program_id(0)
            tile_j = pl.program_id(1)
            row0 = tile_i * TILE_H
            col0 = tile_j * TILE_W

            half = g.SUBPIXEL // 2
            # Tile-column pixel x coords as one lane row (1, 128).
            jx = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_W), 1)
            px_row = (col0 + jx) * g.SUBPIXEL + half

            zbuf[...] = jnp.full((TILE_H, TILE_W), 1.0, jnp.float32)
            idxbuf[...] = jnp.full((TILE_H, TILE_W), -1, jnp.int32)

            def tile_overlap(jmin, jmax, imin, imax):
                return ((jmax >= col0) & (jmin < col0 + TILE_W)
                        & (imax >= row0) & (imin < row0 + TILE_H)
                        & (jmin <= jmax) & (imin <= imax))

            def col8(buf, base, c):
                # (8, 1) sublane vector of one setup column for the group.
                return buf[pl.ds(base, GROUP), c:c + 1]

            def visit_group(bk, q):
                base = q * GROUP  # row base within the block slab
                gid0 = bk * g.RASTER_BLOCK + base
                jmin = gb_buf[0, q * 8 + 0]
                jmax = gb_buf[0, q * 8 + 1]
                imin = gb_buf[0, q * 8 + 2]
                imax = gb_buf[0, q * 8 + 3]

                @pl.when(tile_overlap(jmin, jmax, imin, imax))
                def _():
                    x0 = col8(ti_buf, base, g.I_X0)
                    y0 = col8(ti_buf, base, g.I_Y0)
                    x1 = col8(ti_buf, base, g.I_X1)
                    y1 = col8(ti_buf, base, g.I_Y1)
                    x2 = col8(ti_buf, base, g.I_X2)
                    y2 = col8(ti_buf, base, g.I_Y2)
                    dx0 = col8(ti_buf, base, g.I_DX0)
                    dy0 = col8(ti_buf, base, g.I_DY0)
                    dx1 = col8(ti_buf, base, g.I_DX1)
                    dy1 = col8(ti_buf, base, g.I_DY1)
                    dx2 = col8(ti_buf, base, g.I_DX2)
                    dy2 = col8(ti_buf, base, g.I_DY2)
                    b0 = col8(ti_buf, base, g.I_BIAS0)
                    b1 = col8(ti_buf, base, g.I_BIAS1)
                    b2 = col8(ti_buf, base, g.I_BIAS2)
                    za0 = col8(tf_buf, base, g.F_ZA0)
                    za1 = col8(tf_buf, base, g.F_ZA1)
                    za2 = col8(tf_buf, base, g.F_ZA2)
                    ids = gid0 + jax.lax.broadcasted_iota(
                        jnp.int32, (GROUP, 1), 0)

                    # Lane-parallel terms shared across rows.
                    tx0 = dy0 * (px_row - x1)  # (8, 128)
                    tx1 = dy1 * (px_row - x2)
                    tx2 = dy2 * (px_row - x0)

                    lo = jnp.maximum(imin - row0, 0)
                    hi = jnp.minimum(imax - row0, TILE_H - 1)
                    if STATIC_BANDS:
                        # Static row bands: fully static aligned (R, 128)
                        # framebuffer RMW, no dynamic-trip loops.  Each
                        # band runs only when the group bbox touches it.
                        for cc in range(TILE_H // R):
                            band0 = cc * R

                            @pl.when((hi >= band0) & (lo < band0 + R))
                            def _(band0=band0):
                                zrows = []
                                idrows = []
                                for rr in range(R):
                                    py = (row0 + band0 + rr) * g.SUBPIXEL \
                                        + half
                                    e0 = dx0 * (py - y1) - tx0
                                    e1 = dx1 * (py - y2) - tx1
                                    e2 = dx2 * (py - y0) - tx2
                                    cov = (e0 >= b0) & (e1 >= b1) & (e2 >= b2)
                                    z = (e0.astype(jnp.float32) * za0
                                         + e1.astype(jnp.float32) * za1
                                         + e2.astype(jnp.float32) * za2)
                                    zc = jnp.where(cov & (z >= 0.0), z,
                                                   jnp.float32(2.0))
                                    zmin = jnp.min(zc, axis=0, keepdims=True)
                                    idw = jnp.min(
                                        jnp.where(zc == zmin, ids,
                                                  jnp.int32(0x7FFFFFFF)),
                                        axis=0, keepdims=True)
                                    zrows.append(zmin)
                                    idrows.append(idw)
                                znew = jnp.concatenate(zrows, axis=0)
                                idnew = jnp.concatenate(idrows, axis=0)
                                zb = zbuf[band0:band0 + R, :]
                                upd = znew < zb
                                zbuf[band0:band0 + R, :] = jnp.where(
                                    upd, znew, zb)
                                ib = idxbuf[band0:band0 + R, :]
                                idxbuf[band0:band0 + R, :] = jnp.where(
                                    upd, idnew, ib)
                        return

                    nch = (hi - lo) // R + 1

                    def chunk(c, carry):
                        rc = jnp.minimum(lo + c * R, TILE_H - R)
                        for rr in range(R):
                            py = (row0 + rc + rr) * g.SUBPIXEL + half
                            e0 = dx0 * (py - y1) - tx0
                            e1 = dx1 * (py - y2) - tx1
                            e2 = dx2 * (py - y0) - tx2
                            cov = (e0 >= b0) & (e1 >= b1) & (e2 >= b2)
                            z = (e0.astype(jnp.float32) * za0
                                 + e1.astype(jnp.float32) * za1
                                 + e2.astype(jnp.float32) * za2)
                            zc = jnp.where(cov & (z >= 0.0), z,
                                           jnp.float32(2.0))
                            zmin = jnp.min(zc, axis=0, keepdims=True)
                            idw = jnp.min(
                                jnp.where(zc == zmin, ids,
                                          jnp.int32(0x7FFFFFFF)),
                                axis=0, keepdims=True)
                            zb = zbuf[pl.ds(rc + rr, 1), :]
                            upd = zmin < zb
                            zbuf[pl.ds(rc + rr, 1), :] = jnp.where(
                                upd, zmin, zb)
                            ib = idxbuf[pl.ds(rc + rr, 1), :]
                            idxbuf[pl.ds(rc + rr, 1), :] = jnp.where(
                                upd, idw, ib)
                        return carry

                    jax.lax.fori_loop(0, nch, chunk, 0)

            def visit_block(bk):
                cp_i = pltpu.make_async_copy(
                    ti_hbm.at[pl.ds(bk * g.RASTER_BLOCK, g.RASTER_BLOCK), :],
                    ti_buf, dma_sems.at[0])
                cp_f = pltpu.make_async_copy(
                    tf_hbm.at[pl.ds(bk * g.RASTER_BLOCK, g.RASTER_BLOCK), :],
                    tf_buf, dma_sems.at[1])
                cp_g = pltpu.make_async_copy(
                    gb_hbm.at[pl.ds(bk, 1), :], gb_buf,
                    dma_sems.at[2])
                cp_i.start()
                cp_f.start()
                cp_g.start()
                cp_i.wait()
                cp_f.wait()
                cp_g.wait()
                for q in range(GPB):
                    visit_group(bk, q)

            def block_hit(bk):
                return tile_overlap(blk_ref[bk, 0], blk_ref[bk, 1],
                                    blk_ref[bk, 2], blk_ref[bk, 3])

            def super_hit(sb):
                return tile_overlap(sup_ref[sb, 0], sup_ref[sb, 1],
                                    sup_ref[sb, 2], sup_ref[sb, 3])

            def visit_super(sb):
                rp._scan_groups(sb * g.SUPER_BLOCK, (sb + 1) * g.SUPER_BLOCK,
                                block_hit, visit_block)

            rp._scan_groups(0, sup_ref.shape[0], super_hit, visit_super)
            depth_ref[...] = zbuf[...]
            idx_ref[...] = idxbuf[...]

        return kernel

    tile_spec = pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)

    def make_call(R, static_bands=False):
        return rp._pallas_call(
            make_kernel(R, static_bands),
            grid=(H // TILE_H, W // TILE_W),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[tile_spec, tile_spec],
            out_shape=[
                jax.ShapeDtypeStruct((H, W), jnp.float32),
                jax.ShapeDtypeStruct((H, W), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
                pltpu.VMEM((TILE_H, TILE_W), jnp.int32),
                pltpu.VMEM((g.RASTER_BLOCK, 128), jnp.int32),
                pltpu.VMEM((g.RASTER_BLOCK, 128), jnp.float32),
                pltpu.VMEM((1, GPB * 8), jnp.int32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        )

    # Reference: existing production path (bit-exactness target).
    @jax.jit
    def ref_run(ti, tf):
        color, depth = rp.rasterize_setup_pallas_hbm(
            ti, tf, W, H, compact=False)
        return color, depth

    ref_color, ref_depth = jax.block_until_ready(ref_run(ti, tf))

    if "--all-r" in sys.argv:
        variants = [(4, False), (8, False), (8, True), (4, True)]
    elif "--static" in sys.argv:
        variants = [(8, True), (4, True)]
    else:
        variants = [(4, False)]
    for R, static_bands in variants:
        call = make_call(R, static_bands)

        @jax.jit
        def once(supers, blocks, ti_t, tf_t, gb, table):
            depth, idx = call(supers, blocks, ti_t, tf_t, gb)
            color = rvt.resolve_flat_vis(depth, idx, table)
            return color, depth

        try:
            color, depth = jax.block_until_ready(
                once(supers, blocks, ti_t, tf_t, gb, table))
        except Exception as e:  # noqa: BLE001
            print(f"R={R} sb={static_bands}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        dmax = float(jnp.max(jnp.abs(depth - ref_depth)))
        cdiff = int(jnp.sum((color != ref_color).astype(jnp.int32)))
        print(f"R={R} sb={static_bands}: depth max|diff|={dmax}  color px differing={cdiff}",
              flush=True)

        # CRITICAL: tie the scan carry to the kernel inputs each step with
        # an optimization_barrier — XLA LICM-hoists loop-invariant pallas
        # calls out of the scan (the kernel runs ONCE regardless of reps,
        # verified in compiled HLO), silently dividing measured times.
        @jax.jit
        def run(supers, blocks, ti_t, tf_t, gb, table):
            def step(c, _):
                a = jax.lax.optimization_barrier(
                    (c, supers, blocks, ti_t, tf_t, gb, table))
                c2, s, bl, t_i, t_f, g2, tab = a
                depth, idx = call(s, bl, t_i, t_f, g2)
                color = rvt.resolve_flat_vis(depth, idx, tab)
                return c2 + depth[0, 0] + color[0, 0].astype(jnp.float32), None
            out, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(reps))
            return out

        @jax.jit
        def run_nores(supers, blocks, ti_t, tf_t, gb):
            def step(c, _):
                a = jax.lax.optimization_barrier(
                    (c, supers, blocks, ti_t, tf_t, gb))
                c2, s, bl, t_i, t_f, g2 = a
                depth, idx = call(s, bl, t_i, t_f, g2)
                return c2 + depth[0, 0] + idx[0, 0].astype(jnp.float32), None
            out, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(reps))
            return out

        for name, fn, args in (
                ("kernel", run_nores, (supers, blocks, ti_t, tf_t, gb)),
                ("kernel+resolve", run,
                 (supers, blocks, ti_t, tf_t, gb, table))):
            np.asarray(fn(*args))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fn(*args))
                best = min(best, (time.perf_counter() - t0) / reps)
            print(f"R={R} sb={static_bands} {name:15s}: {best*1000:8.2f} ms/frame", flush=True)

    # Production baseline timing.
    @jax.jit
    def run_ref(ti, tf):
        def step(c, _):
            c2, ti2, tf2 = jax.lax.optimization_barrier((c, ti, tf))
            color, depth = rp.rasterize_setup_pallas_hbm(
                ti2, tf2, W, H, compact=False)
            return c2 + depth[0, 0] + color[0, 0].astype(jnp.float32), None
        out, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(reps))
        return out

    np.asarray(run_ref(ti, tf))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run_ref(ti, tf))
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"production hbm kernel  : {best*1000:8.2f} ms/frame", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
