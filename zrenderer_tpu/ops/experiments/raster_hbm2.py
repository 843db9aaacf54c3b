"""Two-class windowed HBM raster (hbm2) — MEASURED NEGATIVE RESULT.

Quarantined from the production module after the 1M A/B
(benchmarks/hbm2_ab.py, v5e, honest barrier'd-scan):

    hbm1 full-tile          312.02 ms/frame
    hbm2 two-class windowed 537.64 ms/frame   (0.58x -- SLOWER)
    (earlier 200K measurement: 0.62x, commit 17c39f4)

The 4x per-visit vector-work reduction for short triangles does not pay:
the dynamic 8-row sublane windows defeat Mosaic's static vreg addressing
and the two-pass structure doubles traversal overhead, while only 33.6%
of alive 1M-lattice triangles classify short.  Bit-identical to hbm1
(digest-equal on hardware).  Tests opt-in via ZRENDERER_RUN_EXPERIMENTS=1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zrenderer_tpu.ops import geometry as g
from zrenderer_tpu.ops.raster_pallas import (
    TILE_H,
    TILE_W,
    _HBM_SLABS,
    _classify_short,
    _hbm_flat_inputs,
    _kill_rows,
    _pallas_call,
    _scan_groups,
    SHORT_ROWS,
)

def prepare_raster_inputs_2class(tri_i32, tri_f32):
    """Pad, split short/tall views, build per-class hierarchy tables."""
    t = tri_i32.shape[0]
    pad = (-t) % g.RASTER_BLOCK
    if pad:
        tri_i32 = jnp.concatenate(
            [tri_i32, jnp.zeros((pad, g.NI32), jnp.int32)
             .at[:, g.I_JMIN].set(1)
             .at[:, g.I_BIAS0].set(2**31 - 1)
             .at[:, g.I_BIAS1].set(2**31 - 1)
             .at[:, g.I_BIAS2].set(2**31 - 1)], axis=0
        )
        tri_f32 = jnp.concatenate(
            [tri_f32, jnp.zeros((pad, g.NF32), jnp.float32)], axis=0
        )
    short = _classify_short(jnp, tri_i32)
    ti_short = _kill_rows(jnp, tri_i32, ~short)
    ti_tall = _kill_rows(jnp, tri_i32, short)
    blocks_s = g.block_bounds(jnp, ti_short)
    blocks_s, supers_s = g.super_bounds(jnp, blocks_s)
    blocks_t = g.block_bounds(jnp, ti_tall)
    blocks_t, supers_t = g.super_bounds(jnp, blocks_t)
    return supers_s, blocks_s, ti_short, supers_t, blocks_t, ti_tall, tri_f32


def _hbm2_kernel(sup_s, blk_s, sup_t, blk_t, tis_hbm, tit_hbm, tf_hbm,
                 color_ref, depth_ref,
                 zbuf, tidbuf, nr, ng, nb, den, ti_buf, tf_buf, dma_sems):
    tile_i = pl.program_id(0)
    tile_j = pl.program_id(1)
    row0 = tile_i * TILE_H
    col0 = tile_j * TILE_W

    half = g.SUBPIXEL // 2
    iy = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    py = (row0 + iy) * g.SUBPIXEL + half
    px = (col0 + ix) * g.SUBPIXEL + half
    # Window-pass pixel coordinates: the (SHORT_ROWS, 128) base grid; a
    # visit at row offset rb adds rb*SUBPIXEL to py8 (one scalar-vec add).
    iy8 = jax.lax.broadcasted_iota(jnp.int32, (SHORT_ROWS, TILE_W), 0)
    ix8 = jax.lax.broadcasted_iota(jnp.int32, (SHORT_ROWS, TILE_W), 1)
    py8 = (row0 + iy8) * g.SUBPIXEL + half
    px8 = (col0 + ix8) * g.SUBPIXEL + half

    zbuf[...] = jnp.full((TILE_H, TILE_W), 1.0, jnp.float32)
    tidbuf[...] = jnp.full((TILE_H, TILE_W), _INT_MAX, jnp.int32)
    nr[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    ng[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    nb[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    den[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)

    def tile_overlap(jmin, jmax, imin, imax):
        return (
            (jmax >= col0)
            & (jmin < col0 + TILE_W)
            & (imax >= row0)
            & (imin < row0 + TILE_H)
            & (jmin <= jmax)
            & (imin <= imax)
        )

    def tri_body(tid, base4, u, short, overlap):
        ir = base4 + u // 4
        il = (u % 4) * I32_LANES
        fr2 = 2 * base4 + u // 2
        fl = (u % 2) * F32_LANES
        if short:
            rb = jnp.clip(
                ti_buf[ir, il + g.I_IMIN] - row0, 0, TILE_H - SHORT_ROWS
            )
            pyv = py8 + rb * g.SUBPIXEL
            pxv = px8
            zb = zbuf[pl.ds(rb, SHORT_ROWS), :]
            tb = tidbuf[pl.ds(rb, SHORT_ROWS), :]
        else:
            pyv = py
            pxv = px
            zb = zbuf[...]
            tb = tidbuf[...]
        e0 = ti_buf[ir, il + g.I_DX0] * (pyv - ti_buf[ir, il + g.I_Y1]) - \
             ti_buf[ir, il + g.I_DY0] * (pxv - ti_buf[ir, il + g.I_X1])
        e1 = ti_buf[ir, il + g.I_DX1] * (pyv - ti_buf[ir, il + g.I_Y2]) - \
             ti_buf[ir, il + g.I_DY1] * (pxv - ti_buf[ir, il + g.I_X2])
        e2 = ti_buf[ir, il + g.I_DX2] * (pyv - ti_buf[ir, il + g.I_Y0]) - \
             ti_buf[ir, il + g.I_DY2] * (pxv - ti_buf[ir, il + g.I_X0])
        cov = (
            (e0 >= ti_buf[ir, il + g.I_BIAS0])
            & (e1 >= ti_buf[ir, il + g.I_BIAS1])
            & (e2 >= ti_buf[ir, il + g.I_BIAS2])
        )
        ef0 = e0.astype(jnp.float32)
        ef1 = e1.astype(jnp.float32)
        ef2 = e2.astype(jnp.float32)
        z = ef0 * tf_buf[fr2, fl + g.F_ZA0] + ef1 * tf_buf[fr2, fl + g.F_ZA1] \
            + ef2 * tf_buf[fr2, fl + g.F_ZA2]
        # Id tie-break (ascending == submission order, the binned-kernel
        # rule): exactness across the two passes does not depend on pass
        # order.  ``overlap`` (group-branch bbox bit) folds into the mask.
        ok = (
            cov & (z >= 0.0)
            & ((z < zb) | ((z == zb) & (tid < tb))) & overlap
        )

        def latch(buf, c0):
            v = ef0 * tf_buf[fr2, fl + c0] + ef1 * tf_buf[fr2, fl + c0 + 1] \
                + ef2 * tf_buf[fr2, fl + c0 + 2]
            if short:
                buf[pl.ds(rb, SHORT_ROWS), :] = jnp.where(
                    ok, v, buf[pl.ds(rb, SHORT_ROWS), :])
            else:
                buf[...] = jnp.where(ok, v, buf[...])

        if short:
            zbuf[pl.ds(rb, SHORT_ROWS), :] = jnp.where(ok, z, zb)
            tidbuf[pl.ds(rb, SHORT_ROWS), :] = jnp.where(ok, tid, tb)
        else:
            zbuf[...] = jnp.where(ok, z, zb)
            tidbuf[...] = jnp.where(ok, tid, tb)
        latch(den, g.F_RW0)
        latch(nr, g.F_CR0)
        latch(ng, g.F_CG0)
        latch(nb, g.F_CB0)

    def make_pass(ti_hbm, short):
        def visit_block(bk):
            rows_i = g.RASTER_BLOCK // 4
            rows_f = g.RASTER_BLOCK // 2
            cp_i = pltpu.make_async_copy(
                ti_hbm.at[pl.ds(bk * rows_i, rows_i), :], ti_buf,
                dma_sems.at[0],
            )
            cp_f = pltpu.make_async_copy(
                tf_hbm.at[pl.ds(bk * rows_f, rows_f), :], tf_buf,
                dma_sems.at[1],
            )
            cp_i.start()
            cp_f.start()
            cp_i.wait()
            cp_f.wait()

            tu = _tri_unroll()

            def unrolled(q, c2):
                # Group-branched unrolled loop (see _hbm_kernel_body): one
                # any-hit branch per tu triangles, each triangle's bbox bit
                # folded into its write mask.  Index arithmetic supports
                # tu < 4 (interpret mode) and tu multiples of 4.
                base4 = q * (tu // 4) if tu >= 4 else (q * tu) // 4
                ubase = 0 if tu >= 4 else (q * tu) % 4
                hits = []
                for du in range(tu):
                    u = ubase + du
                    ir = base4 + u // 4
                    il = (u % 4) * I32_LANES
                    hits.append(tile_overlap(
                        ti_buf[ir, il + g.I_JMIN], ti_buf[ir, il + g.I_JMAX],
                        ti_buf[ir, il + g.I_IMIN], ti_buf[ir, il + g.I_IMAX],
                    ))
                any_hit = hits[0]
                for hb in hits[1:]:
                    any_hit = any_hit | hb

                @pl.when(any_hit)
                def _():
                    for du in range(tu):
                        tri_body(
                            bk * g.RASTER_BLOCK + q * tu + du,
                            base4, ubase + du, short, hits[du],
                        )

                return c2

            jax.lax.fori_loop(0, g.RASTER_BLOCK // tu, unrolled, 0)

        return visit_block

    for sup_ref, blk_ref, ti_hbm, short in (
        (sup_s, blk_s, tis_hbm, True),
        (sup_t, blk_t, tit_hbm, False),
    ):
        visit_block = make_pass(ti_hbm, short)

        def block_hit(bk, blk_ref=blk_ref):
            return tile_overlap(
                blk_ref[bk, 0], blk_ref[bk, 1], blk_ref[bk, 2], blk_ref[bk, 3]
            )

        def super_hit(sb, sup_ref=sup_ref):
            return tile_overlap(
                sup_ref[sb, 0], sup_ref[sb, 1], sup_ref[sb, 2], sup_ref[sb, 3]
            )

        def visit_super(sb, block_hit=block_hit, visit_block=visit_block):
            _scan_groups(sb * g.SUPER_BLOCK, (sb + 1) * g.SUPER_BLOCK,
                         block_hit, visit_block)

        _scan_groups(0, sup_ref.shape[0], super_hit, visit_super)

    d = den[...]
    covered = d > 0
    inv = jnp.float32(1.0) / jnp.where(covered, d, jnp.float32(1.0))

    def chan(numer):
        c = jnp.where(covered, numer * inv, jnp.float32(0.0))
        c = jnp.clip(c, 0.0, 1.0)
        q = jnp.floor(c * jnp.float32(255.0) + jnp.float32(0.5))
        return q.astype(jnp.int32).astype(jnp.uint32)

    a = jnp.full((TILE_H, TILE_W), 255, jnp.uint32)
    color_ref[...] = (
        chan(nr[...]) | (chan(ng[...]) << 8) | (chan(nb[...]) << 16)
        | (a << 24)
    )
    depth_ref[...] = zbuf[...]


def rasterize_setup_pallas_hbm2(tri_i32, tri_f32, width: int, height: int,
                                interpret: bool = False):
    """Two-class HBM-streaming raster: short triangles (bbox <= 8 rows) on
    dynamic 8-row windows, talls full-tile — the 1M-triangle flat path."""
    assert height % TILE_H == 0 and width % TILE_W == 0
    grid = (height // TILE_H, width // TILE_W)
    (supers_s, blocks_s, ti_short, supers_t, blocks_t, ti_tall,
     tri_f32) = prepare_raster_inputs_2class(tri_i32, tri_f32)
    tis_p, tf_p = _hbm_flat_inputs(ti_short, tri_f32)
    tit_p, _ = _hbm_flat_inputs(ti_tall, tri_f32)

    color, depth = _pallas_call(
        _hbm2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # supers short
            pl.BlockSpec(memory_space=pltpu.VMEM),  # blocks short
            pl.BlockSpec(memory_space=pltpu.VMEM),  # supers tall
            pl.BlockSpec(memory_space=pltpu.VMEM),  # blocks tall
            pl.BlockSpec(memory_space=pl.ANY),  # ti short (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # ti tall (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # tf (HBM, shared)
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((height, width), jnp.uint32),
            jax.ShapeDtypeStruct((height, width), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),  # zbuf
            pltpu.VMEM((TILE_H, TILE_W), jnp.int32),  # tidbuf
        ] + [
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32) for _ in range(4)
        ] + list(_HBM_SLABS),
        interpret=interpret,
    )(supers_s, blocks_s, supers_t, blocks_t, tis_p, tit_p, tf_p)
    return color, depth
