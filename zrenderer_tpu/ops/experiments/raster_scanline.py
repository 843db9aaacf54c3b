"""Scanline-grouped Pallas raster: the million-tiny-triangle flat path.

Replaces the per-(tile, triangle) SCALAR visit loop — measured at a
~250 ns floor per visit at 1M triangles (docs/PERFORMANCE.md, three
failed restructures recorded) — with a design where ONE wide vector op
processes 32 triangles at once and no per-triangle scalar load exists
at all:

* PREP (all vectorized XLA, no Python loops): classify short triangles
  (bbox spans <= SHORT_ROWS pixel rows), sort them by first covered row
  WITHIN each RASTER_BLOCK (one stable u32 argsort — the permutation
  never crosses a block, so the existing block/superblock bbox tables
  are unchanged), and build a (T, 128) "wide" table: one 128-lane row
  per triangle holding edge-at-row-origin values, per-row edge steps,
  biases (i32 bitcast into f32 lanes) and the f32 interpolation
  coefficients.
* KERNEL: the block/superblock hierarchy skip is reused unchanged.  A
  visited block DMAs its (RASTER_BLOCK, 128) wide slab; each group of
  32 consecutive (row-sorted) triangles is evaluated as (32, 128)
  vectors — sublane s = triangle s, lanes = the tile's 128 columns —
  for each row offset dh in [0, group max height): edge functions,
  coverage, depth and Gouraud channels for 32 triangles per vector op.
* Same-row conflicts (sublanes targeting the same framebuffer row) are
  resolved in-register: rows are sorted, so equal-row runs are
  contiguous and a 5-step masked suffix roll-min (pltpu.roll along
  sublanes) leaves the per-lane (z, id)-lexicographic winner of each
  run at the run's first sublane.
* Winners scatter to their framebuffer rows via an EXACT one-hot f32
  matmul on the MXU (precision=HIGHEST: a one-hot contraction sums one
  value against 1.0 and the rest against 0.0 — every step exact), then
  one full-tile read-modify-write applies the depth test.  Depth ties
  break by triangle id == submission order (the binned-kernel rule),
  bit-equal to the sequential oracle.

Tall triangles (> SHORT_ROWS rows) run through the existing full-tile
scalar pass (the hbm2 structure) before the scanline pass; cross-class
ties break by id, so pass order does not matter.

Reference anchor: replaces the D3D12 fixed-function rasterizer +
depth-test stage for dense scenes (zrenderer/src/zrenderer.zig draw
loop); the reference leans on dedicated raster hardware, this leans on
the MXU/VPU — same contract, TPU-native structure.
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
    SHORT_ROWS,
    I32_LANES,
    F32_LANES,
    _classify_short,
    _kill_rows,
    _hbm_flat_inputs,
    _pallas_call,
    _scan_groups,
    _tri_unroll,
)

# Triangles per scanline group: one group = one (32, 128) vector step.
GROUP = 32

# Sentinels.  BIGZ > any valid NDC depth (z in [0, 1]); BIGID (f32-exact)
# > any shifted triangle id.  Ids are carried as f32 (id + 1): exact for
# id < 2**24 - 1, asserted at prepare time.
BIGZ = 2.0
BIGID = float(2 ** 27)

# Wide-table lane map.  Lanes 0..11 are int32 BITCAST into the f32 row
# (edge math must stay exact i32; values reach 2^30 which f32 cannot
# represent).  Lanes 12+ are plain f32 (all values f32-exact).
WL_A0, WL_A1, WL_A2 = 0, 1, 2        # edge value at (row imin, px col 0)
WL_D0, WL_D1, WL_D2 = 3, 4, 5        # per-pixel-column edge step (8*dy)
WL_S0, WL_S1, WL_S2 = 6, 7, 8        # per-pixel-row edge step (8*dx)
WL_B0, WL_B1, WL_B2 = 9, 10, 11      # coverage biases
WL_IMIN, WL_H = 12, 13               # first covered row, row span - 1
WL_JMINF, WL_JMAXF = 14, 15          # lane bbox (f32-exact)
WL_IDF = 16                          # original submission id + 1
WL_ZA0 = 17                          # 17..19 za, 20..22 rw,
WL_RW0 = 20                          # 23..25 cr, 26..28 cg, 29..31 cb
WL_CR0, WL_CG0, WL_CB0 = 23, 26, 29
WIDE_LANES = 128


def _bc(x):
    """(32, 1) column -> (32, TILE_W) broadcast."""
    return jnp.broadcast_to(x, (GROUP, TILE_W))


def prepare_scanline_inputs(tri_i32, tri_f32):
    """Classify, block-local row sort, wide-table build.

    Returns (supers_s, blocks8_s, wide_p, supers_t, blocks_t, tit_p, tf_p):
    blocks8_s is the short-class block bbox table extended with the
    per-group pass counts (group max row span + 1) in lanes 4..4+G.
    """
    t = tri_i32.shape[0]
    pad = (-t) % g.RASTER_BLOCK
    if pad:
        tri_i32 = jnp.concatenate(
            [tri_i32, jnp.zeros((pad, g.NI32), jnp.int32)
             .at[:, g.I_JMIN].set(1)
             .at[:, g.I_IMIN].set(1)
             .at[:, g.I_BIAS0].set(2 ** 31 - 1)
             .at[:, g.I_BIAS1].set(2 ** 31 - 1)
             .at[:, g.I_BIAS2].set(2 ** 31 - 1)], axis=0
        )
        tri_f32 = jnp.concatenate(
            [tri_f32, jnp.zeros((pad, g.NF32), jnp.float32)], axis=0
        )
    t = tri_i32.shape[0]
    assert t < 2 ** 23, "f32 id carry requires id + 1 < 2**24"

    short = _classify_short(jnp, tri_i32)
    ti_short = _kill_rows(jnp, tri_i32, ~short)
    ti_tall = _kill_rows(jnp, tri_i32, short)

    blocks_t = g.block_bounds(jnp, ti_tall)
    blocks_t, supers_t = g.super_bounds(jnp, blocks_t)
    # The short permutation stays inside each block, so the block bbox
    # tables of the UNPERMUTED short view are already correct.
    blocks_s = g.block_bounds(jnp, ti_short)
    blocks_s, supers_s = g.super_bounds(jnp, blocks_s)

    # Wide table in submission order (pure elementwise — no gather).
    c = lambda k: ti_short[:, k]
    imin = c(g.I_IMIN)
    # _kill_rows empties the horizontal bbox (jmin > jmax) but leaves the
    # row span intact, so a killed tall row would carry h >= SHORT_ROWS
    # and force every group containing one to run all 8 passes with the
    # lane fully masked.  Zero the span for non-short rows instead so the
    # per-group pass count reflects only live short work.
    h = jnp.where(short, c(g.I_IMAX) - imin, -1)
    py0 = imin * g.SUBPIXEL + g.SUBPIXEL // 2
    half = g.SUBPIXEL // 2
    sub = g.SUBPIXEL

    def edge(dxk, dyk, xk, yk):
        dx, dy = c(dxk), c(dyk)
        # e(row, x) = dx*(py(row) - y1) - dy*(px(x) - x1)
        #           = A + (8*dx)*dh - (8*dy)*x   with A at (imin, x=0).
        a = dx * (py0 - c(yk)) - dy * (half - c(xk))
        return a, dy * sub, dx * sub

    a0, d0, s0 = edge(g.I_DX0, g.I_DY0, g.I_X1, g.I_Y1)
    a1, d1, s1 = edge(g.I_DX1, g.I_DY1, g.I_X2, g.I_Y2)
    a2, d2, s2 = edge(g.I_DX2, g.I_DY2, g.I_X0, g.I_Y0)

    bits = lambda v: jax.lax.bitcast_convert_type(v, jnp.float32)
    f32 = lambda v: v.astype(jnp.float32)
    idf = jnp.arange(1, t + 1, dtype=jnp.float32)
    cols = [
        bits(a0), bits(a1), bits(a2),
        bits(d0), bits(d1), bits(d2),
        bits(s0), bits(s1), bits(s2),
        bits(c(g.I_BIAS0)), bits(c(g.I_BIAS1)), bits(c(g.I_BIAS2)),
        f32(imin), f32(h), f32(c(g.I_JMIN)), f32(c(g.I_JMAX)), idf,
    ] + [tri_f32[:, k] for k in range(g.F_ZA0, g.F_CB2 + 1)]
    wide = jnp.stack(cols, axis=1)
    wide = jnp.pad(wide, ((0, 0), (0, WIDE_LANES - wide.shape[1])))

    # Block-local row sort: one stable u32 argsort of (block << 12 | imin).
    # imin is screen-clamped (>= 0, < 4096 for any supported height).
    key = (jnp.arange(t, dtype=jnp.int32) // g.RASTER_BLOCK) << 12
    key = key | jnp.clip(imin, 0, 4095)
    perm = jnp.argsort(key, stable=True)
    wide_p = jnp.take(wide, perm, axis=0)

    # Per-group pass counts from the SORTED row spans.
    hs = wide_p[:, WL_H].astype(jnp.int32)
    passes = jnp.clip(hs + 1, 0, SHORT_ROWS)
    gmax = passes.reshape(-1, g.RASTER_BLOCK // GROUP, GROUP).max(axis=2)
    # The (B, 8) block table's lanes 4..7 (any_valid + spare, only read by
    # super_bounds which already ran) carry the per-group pass counts.
    # super_bounds padded the table to a SUPER_BLOCK multiple; pad to match
    # (0 passes = the group never runs).
    gmax = jnp.pad(gmax, ((0, blocks_s.shape[0] - gmax.shape[0]), (0, 0)))
    blocks8_s = blocks_s.at[:, 4:4 + gmax.shape[1]].set(gmax)

    tit_p, tf_p = _hbm_flat_inputs(ti_tall, tri_f32)
    return supers_s, blocks8_s, wide_p, supers_t, blocks_t, tit_p, tf_p


def _roll(x, shift):
    """Sublane roll: y[i] = x[(i + shift) % GROUP]."""
    return pltpu.roll(x, (-shift) % GROUP, 0)


def _scanline_kernel(sup_s, blk_s, wide_hbm, sup_t, blk_t, tit_hbm, tf_hbm,
                     color_ref, depth_ref,
                     zbuf, tidbuf, nr, ng, nb, den,
                     wide_buf, ti_buf, tf_buf, dma_sems):
    tile_i = pl.program_id(0)
    tile_j = pl.program_id(1)
    row0 = tile_i * TILE_H
    col0 = tile_j * TILE_W

    f32 = jnp.float32
    i32 = jnp.int32

    zbuf[...] = jnp.full((TILE_H, TILE_W), 1.0, f32)
    tidbuf[...] = jnp.full((TILE_H, TILE_W), BIGID, f32)
    nr[...] = jnp.zeros((TILE_H, TILE_W), f32)
    ng[...] = jnp.zeros((TILE_H, TILE_W), f32)
    nb[...] = jnp.zeros((TILE_H, TILE_W), f32)
    den[...] = jnp.zeros((TILE_H, TILE_W), f32)

    def tile_overlap(jmin, jmax, imin, imax):
        return (
            (jmax >= col0)
            & (jmin < col0 + TILE_W)
            & (imax >= row0)
            & (imin < row0 + TILE_H)
            & (jmin <= jmax)
            & (imin <= imax)
        )

    # ---- tall pass: full-tile scalar body (the hbm2 structure) ----
    half = g.SUBPIXEL // 2
    iy = jax.lax.broadcasted_iota(i32, (TILE_H, TILE_W), 0)
    ix = jax.lax.broadcasted_iota(i32, (TILE_H, TILE_W), 1)
    py = (row0 + iy) * g.SUBPIXEL + half
    px = (col0 + ix) * g.SUBPIXEL + half

    def tall_tri_body(tid, base4, u, overlap):
        ir = base4 + u // 4
        il = (u % 4) * I32_LANES
        fr2 = 2 * base4 + u // 2
        fl = (u % 2) * F32_LANES
        e0 = ti_buf[ir, il + g.I_DX0] * (py - ti_buf[ir, il + g.I_Y1]) - \
            ti_buf[ir, il + g.I_DY0] * (px - ti_buf[ir, il + g.I_X1])
        e1 = ti_buf[ir, il + g.I_DX1] * (py - ti_buf[ir, il + g.I_Y2]) - \
            ti_buf[ir, il + g.I_DY1] * (px - ti_buf[ir, il + g.I_X2])
        e2 = ti_buf[ir, il + g.I_DX2] * (py - ti_buf[ir, il + g.I_Y0]) - \
            ti_buf[ir, il + g.I_DY2] * (px - ti_buf[ir, il + g.I_X0])
        cov = (
            (e0 >= ti_buf[ir, il + g.I_BIAS0])
            & (e1 >= ti_buf[ir, il + g.I_BIAS1])
            & (e2 >= ti_buf[ir, il + g.I_BIAS2])
        )
        ef0 = e0.astype(f32)
        ef1 = e1.astype(f32)
        ef2 = e2.astype(f32)
        z = ef0 * tf_buf[fr2, fl + g.F_ZA0] + ef1 * tf_buf[fr2, fl + g.F_ZA1] \
            + ef2 * tf_buf[fr2, fl + g.F_ZA2]
        zb = zbuf[...]
        tb = tidbuf[...]
        tidf = (tid + 1).astype(f32)
        ok = (
            cov & (z >= 0.0)
            & ((z < zb) | ((z == zb) & (tidf < tb))) & overlap
        )
        zbuf[...] = jnp.where(ok, z, zb)
        tidbuf[...] = jnp.where(ok, tidf, tb)
        for buf, c0 in ((den, g.F_RW0), (nr, g.F_CR0), (ng, g.F_CG0),
                        (nb, g.F_CB0)):
            v = ef0 * tf_buf[fr2, fl + c0] + ef1 * tf_buf[fr2, fl + c0 + 1] \
                + ef2 * tf_buf[fr2, fl + c0 + 2]
            buf[...] = jnp.where(ok, v, buf[...])

    def tall_visit_block(bk):
        rows_i = g.RASTER_BLOCK // 4
        rows_f = g.RASTER_BLOCK // 2
        cp_i = pltpu.make_async_copy(
            tit_hbm.at[pl.ds(bk * rows_i, rows_i), :], ti_buf, dma_sems.at[0]
        )
        cp_f = pltpu.make_async_copy(
            tf_hbm.at[pl.ds(bk * rows_f, rows_f), :], tf_buf, dma_sems.at[1]
        )
        cp_i.start()
        cp_f.start()
        cp_i.wait()
        cp_f.wait()
        tu = _tri_unroll()

        def unrolled(q, c2):
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
                    tall_tri_body(bk * g.RASTER_BLOCK + q * tu + du,
                                  base4, ubase + du, hits[du])

            return c2

        jax.lax.fori_loop(0, g.RASTER_BLOCK // tu, unrolled, 0)

    def tall_block_hit(bk):
        return tile_overlap(
            blk_t[bk, 0], blk_t[bk, 1], blk_t[bk, 2], blk_t[bk, 3]
        )

    def tall_super_hit(sb):
        return tile_overlap(
            sup_t[sb, 0], sup_t[sb, 1], sup_t[sb, 2], sup_t[sb, 3]
        )

    def tall_visit_super(sb):
        _scan_groups(sb * g.SUPER_BLOCK, (sb + 1) * g.SUPER_BLOCK,
                     tall_block_hit, tall_visit_block)

    _scan_groups(0, sup_t.shape[0], tall_super_hit, tall_visit_super)

    # ---- short pass: 32 row-sorted triangles per vector step ----
    xsf = (col0 + jax.lax.broadcasted_iota(i32, (GROUP, TILE_W), 1)) \
        .astype(f32)
    xsi = col0 + jax.lax.broadcasted_iota(i32, (GROUP, TILE_W), 1)
    iota_col = jax.lax.broadcasted_iota(i32, (GROUP, 1), 0)
    lane32 = jax.lax.broadcasted_iota(i32, (GROUP, TILE_H), 1)
    row0f = f32(0) + row0  # traced scalar as f32

    def group_body(q, passes):
        base = q * GROUP
        blk = wide_buf[base:base + GROUP, :]
        coli = lambda k: jax.lax.bitcast_convert_type(
            blk[:, k:k + 1], i32)
        colf = lambda k: blk[:, k:k + 1]

        a0c, a1c, a2c = coli(WL_A0), coli(WL_A1), coli(WL_A2)
        d0c, d1c, d2c = coli(WL_D0), coli(WL_D1), coli(WL_D2)
        s0c, s1c, s2c = coli(WL_S0), coli(WL_S1), coli(WL_S2)
        b0c, b1c, b2c = coli(WL_B0), coli(WL_B1), coli(WL_B2)
        iminf = colf(WL_IMIN)
        hf = colf(WL_H)
        jminf = colf(WL_JMINF)
        jmaxf = colf(WL_JMAXF)
        idc = colf(WL_IDF)
        za0, za1, za2 = colf(WL_ZA0), colf(WL_ZA0 + 1), colf(WL_ZA0 + 2)
        rw0, rw1, rw2 = colf(WL_RW0), colf(WL_RW0 + 1), colf(WL_RW0 + 2)
        cr0, cr1, cr2 = colf(WL_CR0), colf(WL_CR0 + 1), colf(WL_CR0 + 2)
        cg0, cg1, cg2 = colf(WL_CG0), colf(WL_CG0 + 1), colf(WL_CG0 + 2)
        cb0, cb1, cb2 = colf(WL_CB0), colf(WL_CB0 + 1), colf(WL_CB0 + 2)

        lane_ok = (_bc(jminf) <= xsf) & (xsf <= _bc(jmaxf))
        prev_row = _roll(iminf, -1)
        lead = (iminf != prev_row) | (iota_col == 0)

        def pass_body(dh, carry):
            dhf = dh.astype(f32)
            rowf = iminf + dhf - row0f  # (32, 1) target tile row
            # In-tile is uniform across an equal-imin run; the height test
            # is NOT (runs mix heights), so it must only mask the item's
            # own fragment (m below), never the run's scatter gate.
            tilerow = (rowf >= 0.0) & (rowf < f32(TILE_H))
            rowok = tilerow & (dhf <= hf)
            e0 = _bc(a0c + s0c * dh) - _bc(d0c) * xsi
            e1 = _bc(a1c + s1c * dh) - _bc(d1c) * xsi
            e2 = _bc(a2c + s2c * dh) - _bc(d2c) * xsi
            cov = (e0 >= _bc(b0c)) & (e1 >= _bc(b1c)) & (e2 >= _bc(b2c))
            ef0 = e0.astype(f32)
            ef1 = e1.astype(f32)
            ef2 = e2.astype(f32)
            z = ef0 * _bc(za0) + ef1 * _bc(za1) + ef2 * _bc(za2)
            m = cov & lane_ok & (z >= 0.0) & rowok
            zm = jnp.where(m, z, f32(BIGZ))
            sid = jnp.where(m, _bc(idc), f32(BIGID))
            dv = ef0 * _bc(rw0) + ef1 * _bc(rw1) + ef2 * _bc(rw2)
            rv = ef0 * _bc(cr0) + ef1 * _bc(cr1) + ef2 * _bc(cr2)
            gv = ef0 * _bc(cg0) + ef1 * _bc(cg1) + ef2 * _bc(cg2)
            bv = ef0 * _bc(cb0) + ef1 * _bc(cb1) + ef2 * _bc(cb2)

            # Masked suffix roll-min over contiguous equal-row runs:
            # after steps 1,2,4,8,16 the first sublane of each run holds
            # the per-lane lexicographic (z, id) run minimum.  A strict
            # z compare keeps the EARLIER sublane on exact ties, which
            # (ids ascend within a run — the sort is stable) is the
            # lowest id, the oracle rule.
            cz, ci, cd, crr, cgg, cbb = zm, sid, dv, rv, gv, bv
            for dstep in (1, 2, 4, 8, 16):
                rz = _roll(cz, dstep)
                ri = _roll(ci, dstep)
                rd = _roll(cd, dstep)
                rr = _roll(crr, dstep)
                rg = _roll(cgg, dstep)
                rb = _roll(cbb, dstep)
                same = _roll(iminf, dstep) == iminf  # (32, 1)
                better = same & (rz < cz)
                cz = jnp.where(better, rz, cz)
                ci = jnp.where(better, ri, ci)
                cd = jnp.where(better, rd, cd)
                crr = jnp.where(better, rr, crr)
                cgg = jnp.where(better, rg, cgg)
                cbb = jnp.where(better, rb, cbb)

            # One-hot row scatter (exact: one value x 1.0 + zeros).
            okrow = lead & tilerow
            # i32 bit math (Mosaic has no f32<->u32 casts); the arithmetic
            # right shift still bit-tests correctly for row 31 (sign fill
            # sits above bit 0).
            rowi = jnp.clip(rowf, 0.0, f32(TILE_H - 1)).astype(i32)
            rowbit = jnp.where(okrow, jnp.int32(1) << rowi, jnp.int32(0))
            rh = ((jnp.broadcast_to(rowbit, (GROUP, TILE_H)) >> lane32)
                  & jnp.int32(1)).astype(f32)
            okf = okrow.astype(f32)
            dot = lambda p: jax.lax.dot_general(
                rh, p * okf, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)
            sz = dot(cz)
            si = dot(ci)
            sd = dot(cd)
            sr = dot(crr)
            sg = dot(cgg)
            sb2 = dot(cbb)

            zb = zbuf[...]
            tb = tidbuf[...]
            ok = (
                (si >= 1.0) & (si < f32(BIGID))
                & ((sz < zb) | ((sz == zb) & (si < tb)))
            )
            zbuf[...] = jnp.where(ok, sz, zb)
            tidbuf[...] = jnp.where(ok, si, tb)
            den[...] = jnp.where(ok, sd, den[...])
            nr[...] = jnp.where(ok, sr, nr[...])
            ng[...] = jnp.where(ok, sg, ng[...])
            nb[...] = jnp.where(ok, sb2, nb[...])
            return carry

        jax.lax.fori_loop(0, passes, pass_body, 0)

    def short_visit_block(bk):
        cp = pltpu.make_async_copy(
            wide_hbm.at[pl.ds(bk * g.RASTER_BLOCK, g.RASTER_BLOCK), :],
            wide_buf, dma_sems.at[2],
        )
        cp.start()
        cp.wait()
        for q in range(g.RASTER_BLOCK // GROUP):
            group_body(q, blk_s[bk, 4 + q])

    def short_block_hit(bk):
        return tile_overlap(
            blk_s[bk, 0], blk_s[bk, 1], blk_s[bk, 2], blk_s[bk, 3]
        )

    def short_super_hit(sb):
        return tile_overlap(
            sup_s[sb, 0], sup_s[sb, 1], sup_s[sb, 2], sup_s[sb, 3]
        )

    def short_visit_super(sb):
        _scan_groups(sb * g.SUPER_BLOCK, (sb + 1) * g.SUPER_BLOCK,
                     short_block_hit, short_visit_block)

    _scan_groups(0, sup_s.shape[0], short_super_hit, short_visit_super)

    # ---- epilogue: identical to the hbm kernels ----
    d = den[...]
    covered = d > 0
    inv = f32(1.0) / jnp.where(covered, d, f32(1.0))

    def chan(numer):
        c = jnp.where(covered, numer * inv, f32(0.0))
        c = jnp.clip(c, 0.0, 1.0)
        q = jnp.floor(c * f32(255.0) + f32(0.5))
        return q.astype(i32).astype(jnp.uint32)

    a = jnp.full((TILE_H, TILE_W), 255, jnp.uint32)
    color_ref[...] = (
        chan(nr[...]) | (chan(ng[...]) << 8) | (chan(nb[...]) << 16)
        | (a << 24)
    )
    depth_ref[...] = zbuf[...]


def rasterize_setup_pallas_scanline(tri_i32, tri_f32, width: int,
                                    height: int, interpret: bool = False):
    """Scanline-grouped two-class raster (short scanline + tall scalar)."""
    assert TILE_H == GROUP, "scanline kernel requires 32-row tiles"
    assert height % TILE_H == 0 and width % TILE_W == 0
    # The block-local row-sort key packs imin into 12 bits; a taller
    # target would alias distinct rows and silently corrupt output.
    assert height <= 4096, "scanline row-sort key packs imin into 12 bits"
    grid = (height // TILE_H, width // TILE_W)
    (supers_s, blocks8_s, wide_p, supers_t, blocks_t, tit_p,
     tf_p) = prepare_scanline_inputs(tri_i32, tri_f32)

    color, depth = _pallas_call(
        _scanline_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # supers short
            pl.BlockSpec(memory_space=pltpu.VMEM),  # blocks short (+passes)
            pl.BlockSpec(memory_space=pl.ANY),      # wide table (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # supers tall
            pl.BlockSpec(memory_space=pltpu.VMEM),  # blocks tall
            pl.BlockSpec(memory_space=pl.ANY),      # ti tall (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # tf (HBM)
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
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),  # tidbuf (f32 ids)
        ] + [
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32) for _ in range(4)
        ] + [
            pltpu.VMEM((g.RASTER_BLOCK, WIDE_LANES), jnp.float32),
            pltpu.VMEM((g.RASTER_BLOCK // 4, 128), jnp.int32),
            pltpu.VMEM((g.RASTER_BLOCK // 2, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(supers_s, blocks8_s, wide_p, supers_t, blocks_t, tit_p, tf_p)
    return color, depth
