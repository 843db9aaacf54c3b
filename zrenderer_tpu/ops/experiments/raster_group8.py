"""Group-vectorized binned raster: 8 triangles per VPU op.

The scalar raster kernels (raster_pallas.py) pay ~0.25-0.7 us of scalar
machinery per (tile, triangle) visit — at 1M triangles that floor alone
is hundreds of ms/frame (measured attribution: docs/PERFORMANCE.md).
This kernel removes the scalar floor for dense many-small-triangle
scenes by making the TRIANGLE a vector lane:

* screen tiles are (8, 128) pixels — one pixel ROW per VPU sublane row;
* triangles are binned to tiles on device (u32 packed-key sort: key =
  (tile << id_bits) | triangle_id, so a single-operand UNSTABLE sort
  yields per-tile lists in ascending-id order; offsets by searchsorted);
* triangle setup rows are gathered into list order as 128-lane rows, so
  the kernel streams each tile's span with plain row-slice DMAs and
  loads each field of a GROUP of 8 consecutive triangles as one (8, 1)
  vector — no per-triangle scalar reads, no per-triangle branches;
* each group evaluates all 8 triangles against one 128-pixel row per
  step (triangle index in sublanes, pixel x in lanes) into TILE-LOCAL
  per-sublane accumulators acc[row*8 + sublane] — the cross-sublane z/id
  merge happens ONCE per tile at the end, not per row visit (the per-row
  merge + framebuffer RMW is what sank the earlier transposed-group
  experiment, docs/PERFORMANCE.md);
* triangles whose bbox covers more than ``pair_cap`` tiles, clipped-fan
  rows, and list-budget overflow ride the existing scalar block/super/
  mega-block hierarchy as a phase-2 scan against the merged tile — the
  same leftover contract as the Cap-E binned kernels, with a per-tile
  any-leftover prefetch gate so leftover-free tiles pay one scalar read.

Exactness: the edge functions use the algebraically identical form
e = dx*py - dy*px + c with c = dy*x_ref - dx*y_ref precomputed in i32
(two's-complement arithmetic makes the regrouping exact), and depth
ties break by global triangle id in both phases — bit-identical to the
sequential strict-less oracle (raster_ref/raster_cpu.py) and to
rasterize_setup_pallas.  Reference capability anchor: the D3D12
fixed-function rasterizer + depth unit the reference relies on
(zrenderer/src/zrenderer.zig draw loop; uber.hlsl pixel stage).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zrenderer_tpu.ops import geometry as g
from zrenderer_tpu.ops import raster_pallas as rp

GT_H = 8    # group-tile height (one sublane row per pixel row)
GT_W = 128  # group-tile width (one lane per pixel column)
GROUP = 8   # triangles per vector group (sublane count)
CHUNK = 256  # list rows per slab DMA

PAIR_CAP = 4  # max bbox tile footprint for a listed triangle

_INT_MAX = jnp.iinfo(jnp.int32).max

# Column layout of the gathered list rows ((L, 128) f32; integer fields
# are bitcast).  Edge k uses reference vertex (k+1) mod 3 — matching
# raster_pallas's (Y1,X1)/(Y2,X2)/(Y0,X0) pairing.
C_DX0, C_DY0, C_C0 = 0, 1, 2
C_DX1, C_DY1, C_C1 = 3, 4, 5
C_DX2, C_DY2, C_C2 = 6, 7, 8
C_BIAS = 9   # bit k = edge-k top-left bias (biases are {0,1} for live rows)
C_ID = 10    # global triangle id (row index in the setup arrays)
C_ZA = 11    # 3 cols
C_RW = 14    # 3 cols
C_CR, C_CG, C_CB = 17, 20, 23
C_U, C_V = 26, 29
C_NX, C_NY, C_NZ = 32, 35, 38
C_MET, C_RGH, C_EMR, C_EMG, C_EMB, C_TEX = 41, 42, 43, 44, 45, 46
ROW_LANES = 128  # HBM row-slice DMAs require full 128-lane rows


class Group8Inputs(NamedTuple):
    offs: jax.Array       # (num_tiles + 1,) i32 list spans
    tile_any: jax.Array   # (num_tiles,) i32 leftover gate
    rows: jax.Array       # (L + CHUNK, 128) i32 gathered list rows
    megas: jax.Array      # (M, 8) i32 leftover level-2 bboxes
    supers: jax.Array     # (S, 8) i32 leftover level-1 bboxes
    blocks: jax.Array     # (B, 8) i32 leftover level-0 bboxes
    ti_hbm: jax.Array     # packed leftover i32 rows (rp._hbm_flat_inputs)
    tf_hbm: jax.Array     # packed leftover f32 rows


def list_budget_for(n_head: int, chunk: int = CHUNK) -> int:
    """Static list capacity: bbox footprints average ~1.2 tiles for small
    triangles, so 1.5x input count is ample; overflow degrades gracefully
    to the leftover hierarchy (never drops triangles)."""
    base = max((3 * n_head) // 2, 4096)
    return -(-base // chunk) * chunk


def prepare_group8_inputs(tri_i32, tri_f32, width: int, height: int,
                          pair_cap: int = PAIR_CAP,
                          list_budget: int | None = None,
                          chunk: int = CHUNK) -> Group8Inputs:
    """Device-side binning + gather for the group8 kernels."""
    tiles_x = width // GT_W
    tiles_y = height // GT_H
    num_tiles = tiles_x * tiles_y
    tile_bits = max(int(num_tiles).bit_length(), 1)
    id_bits = 32 - tile_bits

    t_total = tri_i32.shape[0]
    n_head = g.head_count(t_total)
    head = tri_i32[:n_head]

    if list_budget is None:
        list_budget = list_budget_for(n_head, chunk)
    L = -(-list_budget // chunk) * chunk

    if n_head >= (1 << id_bits):
        # Key packing envelope exceeded (huge scene at huge resolution):
        # everything rides the hierarchy; the lists are empty but valid.
        listed = jnp.zeros((n_head,), bool)
    else:
        valid = head[:, g.I_VALID] > 0
        tj0 = head[:, g.I_JMIN] // GT_W
        tj1 = head[:, g.I_JMAX] // GT_W
        ty0 = head[:, g.I_IMIN] // GT_H
        ty1 = head[:, g.I_IMAX] // GT_H
        ntx = tj1 - tj0 + 1
        nty = ty1 - ty0 + 1
        foot = ntx * nty
        listed = valid & (foot <= pair_cap)
        # Clamp the listed set so the live pair total provably fits the
        # static budget; overflow triangles fall back to the hierarchy.
        cum = jnp.cumsum(jnp.where(listed, foot, 0))
        listed = listed & (cum <= L)

    if listed.shape[0] and int(n_head < (1 << id_bits)):
        sentinel = jnp.uint32(0xFFFFFFFF)
        ids_u32 = jnp.arange(n_head, dtype=jnp.uint32)
        keys = []
        for e in range(pair_cap):
            dx = e % ntx
            dy = e // ntx
            pvalid = listed & (e < foot)
            tile_lin = ((ty0 + dy) * tiles_x + (tj0 + dx)).astype(jnp.uint32)
            keys.append(jnp.where(
                pvalid, (tile_lin << id_bits) | ids_u32, sentinel))
        keys = jnp.stack(keys, axis=1).reshape(-1)
        sorted_keys = jnp.sort(keys)
        bounds = (jnp.arange(num_tiles + 1, dtype=jnp.uint32)
                  .astype(jnp.uint32) << id_bits)
        offs = jnp.searchsorted(sorted_keys, bounds).astype(jnp.int32)
        take_n = min(L, sorted_keys.shape[0])
        ids = (sorted_keys[:take_n]
               & jnp.uint32((1 << id_bits) - 1)).astype(jnp.int32)
        ids = jnp.minimum(ids, n_head - 1)
        if take_n < L:
            ids = jnp.pad(ids, (0, L - take_n))
    else:
        offs = jnp.zeros((num_tiles + 1,), jnp.int32)
        ids = jnp.zeros((L,), jnp.int32)

    table = _build_table(head, tri_f32[:n_head])
    rows = jnp.take(table, ids, axis=0)
    rows = jnp.pad(rows, ((0, chunk), (0, 0)))

    # Leftover hierarchy: empty the listed rows' bboxes so the scalar
    # phase skips everything the lists own (identical to the Cap-E path).
    row_listed = jnp.concatenate(
        [listed, jnp.zeros(t_total - n_head, bool)])
    hier = tri_i32
    hier = hier.at[:, g.I_JMIN].set(
        jnp.where(row_listed, 1, hier[:, g.I_JMIN]))
    hier = hier.at[:, g.I_JMAX].set(
        jnp.where(row_listed, 0, hier[:, g.I_JMAX]))
    hier = hier.at[:, g.I_VALID].set(
        jnp.where(row_listed, 0, hier[:, g.I_VALID]))
    pad = (-t_total) % g.RASTER_BLOCK
    hier_f = tri_f32
    if pad:
        dead = jnp.zeros((pad, g.NI32), jnp.int32)
        dead = dead.at[:, g.I_JMIN].set(1)
        dead = dead.at[:, g.I_BIAS0].set(_INT_MAX)
        dead = dead.at[:, g.I_BIAS1].set(_INT_MAX)
        dead = dead.at[:, g.I_BIAS2].set(_INT_MAX)
        hier = jnp.concatenate([hier, dead], axis=0)
        hier_f = jnp.concatenate(
            [hier_f, jnp.zeros((pad, g.NF32), jnp.float32)], axis=0)
    blocks = g.block_bounds(jnp, hier)
    blocks, supers = g.super_bounds(jnp, blocks)
    supers, megas = g.super_bounds(jnp, supers)

    # Per-tile leftover gate from the super bboxes (coarse but cheap).
    ty = jnp.arange(num_tiles, dtype=jnp.int32) // tiles_x
    tx = jnp.arange(num_tiles, dtype=jnp.int32) % tiles_x
    col0 = (tx * GT_W)[:, None]
    row0 = (ty * GT_H)[:, None]
    sj0, sj1 = supers[None, :, 0], supers[None, :, 1]
    si0, si1 = supers[None, :, 2], supers[None, :, 3]
    ov = ((sj1 >= col0) & (sj0 < col0 + GT_W)
          & (si1 >= row0) & (si0 < row0 + GT_H)
          & (sj0 <= sj1) & (si0 <= si1))
    tile_any = ov.any(axis=1).astype(jnp.int32)

    ti_hbm, tf_hbm = rp._hbm_flat_inputs(hier, hier_f)
    return Group8Inputs(offs, tile_any, rows, megas, supers, blocks,
                        ti_hbm, tf_hbm)


def _build_table(head_i32, head_f32):
    """(n_head, 128) i32 list-row table (f32 fields bitcast)."""
    n = head_i32.shape[0]
    i32 = head_i32

    def edge_c(dx_col, dy_col, x_col, y_col):
        return i32[:, dy_col] * i32[:, x_col] - i32[:, dx_col] * i32[:, y_col]

    cols_i = jnp.stack([
        i32[:, g.I_DX0], i32[:, g.I_DY0],
        edge_c(g.I_DX0, g.I_DY0, g.I_X1, g.I_Y1),
        i32[:, g.I_DX1], i32[:, g.I_DY1],
        edge_c(g.I_DX1, g.I_DY1, g.I_X2, g.I_Y2),
        i32[:, g.I_DX2], i32[:, g.I_DY2],
        edge_c(g.I_DX2, g.I_DY2, g.I_X0, g.I_Y0),
        (i32[:, g.I_BIAS0] & 1) | ((i32[:, g.I_BIAS1] & 1) << 1)
        | ((i32[:, g.I_BIAS2] & 1) << 2),
        jnp.arange(n, dtype=jnp.int32),
    ], axis=1)
    f = head_f32
    cols_f = jnp.concatenate([
        f[:, g.F_ZA0:g.F_ZA0 + 3],
        f[:, g.F_RW0:g.F_RW0 + 3],
        f[:, g.F_CR0:g.F_CR0 + 3],
        f[:, g.F_CG0:g.F_CG0 + 3],
        f[:, g.F_CB0:g.F_CB0 + 3],
        f[:, g.F_U0:g.F_U0 + 3],
        f[:, g.F_V0:g.F_V0 + 3],
        f[:, g.F_NX0:g.F_NX0 + 3],
        f[:, g.F_NY0:g.F_NY0 + 3],
        f[:, g.F_NZ0:g.F_NZ0 + 3],
        f[:, g.F_MET:g.F_MET + 6],
    ], axis=1)
    # The table is INT32 with the float fields bitcast in: i32 bit
    # patterns stored as f32 hit NaN encodings that backends canonicalize
    # to 0x7FC00000 in transit (measured on XLA:CPU), destroying the
    # payload — while genuine f32 values survive an i32 round-trip
    # unchanged (integer ops never canonicalize).
    table = jnp.concatenate([
        cols_i,
        jax.lax.bitcast_convert_type(cols_f, jnp.int32),
        jnp.zeros((n, ROW_LANES - 11 - cols_f.shape[1]), jnp.int32),
    ], axis=1)
    return table


# Accumulator plane ids (phase-1 scratch (GT_H * GROUP, 128) each).
_FLAT_PLANES = 6       # z, id, den, r, g, b
_GBUF_INTERP = 5       # u, v, nx, ny, nz  (perspective interpolants)
_GBUF_CONST = 6        # met, rgh, emr, emg, emb, tex (latched constants)


def _group8_body(offs_ref, tany_ref, rows_hbm, mega_ref, sup_ref, blk_ref,
                 ti_hbm, tf_hbm, outs, accs, merged, slab, slab_sem,
                 ti_buf, tf_buf, blk_sems, *, chunk: int,
                 mode: str):
    """Shared kernel body.  ``mode`` in {"flat", "gbuffer", "depth"}."""
    depth_only = mode == "depth"
    gbuffer = mode == "gbuffer"

    tile_i = pl.program_id(0)
    tile_j = pl.program_id(1)
    tiles_x = pl.num_programs(1)
    lin = tile_i * tiles_x + tile_j
    row0 = tile_i * GT_H
    col0 = tile_j * GT_W

    half = g.SUBPIXEL // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (GROUP, GT_W), 1)
    px = (col0 + lane) * g.SUBPIXEL + half  # (8, 128), same for all rows
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1), 0)

    if depth_only:
        acc_z, = accs
        mz, = merged
    elif gbuffer:
        (acc_z, acc_id, acc_den, acc_r, acc_g, acc_b,
         acc_u, acc_v, acc_nx, acc_ny, acc_nz,
         acc_met, acc_rgh, acc_emr, acc_emg, acc_emb, acc_tex) = accs
        (mz, mid, mden, mr, mg, mb, mu, mv, mnx, mny, mnz,
         mmet, mrgh, memr, memg, memb, mtex) = merged
    else:
        acc_z, acc_id, acc_den, acc_r, acc_g, acc_b = accs
        mz, mid, mden, mr, mg, mb = merged

    acc_z[...] = jnp.ones_like(acc_z)
    if not depth_only:
        acc_id[...] = jnp.full_like(acc_id, _INT_MAX)
        for a in accs[2:]:
            a[...] = jnp.zeros_like(a)

    # ---- Phase 1: this tile's triangle lists, 8 triangles per step ----
    start = offs_ref[lin]
    end = offs_ref[lin + 1]
    n = end - start

    def cols_i32(base, col):
        return slab[pl.ds(base, GROUP), col:col + 1]

    def cols_f32(base, col):
        return jax.lax.bitcast_convert_type(
            slab[pl.ds(base, GROUP), col:col + 1], jnp.float32)

    def eval_group(base, first_row):
        """Evaluate slab rows [base, base+8) against all 8 tile rows."""
        dx0 = cols_i32(base, C_DX0); dy0 = cols_i32(base, C_DY0)
        c0 = cols_i32(base, C_C0)
        dx1 = cols_i32(base, C_DX1); dy1 = cols_i32(base, C_DY1)
        c1 = cols_i32(base, C_C1)
        dx2 = cols_i32(base, C_DX2); dy2 = cols_i32(base, C_DY2)
        c2 = cols_i32(base, C_C2)
        bias = cols_i32(base, C_BIAS)
        b0 = bias & 1
        b1 = (bias >> 1) & 1
        b2 = (bias >> 2) & 1
        za0 = cols_f32(base, C_ZA)
        za1 = cols_f32(base, C_ZA + 1)
        za2 = cols_f32(base, C_ZA + 2)
        m = (first_row + sub8) < n  # (8, 1): inside this tile's span
        if not depth_only:
            tid = cols_i32(base, C_ID)

            def interp_cols(c):
                return (cols_f32(base, c), cols_f32(base, c + 1),
                        cols_f32(base, c + 2))

        # dy * px is the only (8,128) multiply per edge; the rest are
        # (8,1) column ops broadcast at the subtract.
        ex0 = dy0 * px
        ex1 = dy1 * px
        ex2 = dy2 * px
        for r in range(GT_H):
            py_r = (row0 + r) * g.SUBPIXEL + half
            e0 = (dx0 * py_r + c0) - ex0
            e1 = (dx1 * py_r + c1) - ex1
            e2 = (dx2 * py_r + c2) - ex2
            cov = (e0 >= b0) & (e1 >= b1) & (e2 >= b2)
            ef0 = e0.astype(jnp.float32)
            ef1 = e1.astype(jnp.float32)
            ef2 = e2.astype(jnp.float32)
            z = ef0 * za0 + ef1 * za1 + ef2 * za2
            az = acc_z[r * GROUP:(r + 1) * GROUP, :]
            if depth_only:
                ok = cov & (z >= 0.0) & (z < az) & m
                acc_z[r * GROUP:(r + 1) * GROUP, :] = jnp.where(ok, z, az)
                continue
            aid = acc_id[r * GROUP:(r + 1) * GROUP, :]
            ok = cov & (z >= 0.0) & m & (
                (z < az) | ((z == az) & (tid < aid)))
            acc_z[r * GROUP:(r + 1) * GROUP, :] = jnp.where(ok, z, az)
            acc_id[r * GROUP:(r + 1) * GROUP, :] = jnp.where(ok, tid, aid)

            def latch(acc, c0i):
                w0, w1, w2 = interp_cols(c0i)
                old = acc[r * GROUP:(r + 1) * GROUP, :]
                acc[r * GROUP:(r + 1) * GROUP, :] = jnp.where(
                    ok, ef0 * w0 + ef1 * w1 + ef2 * w2, old)

            latch(acc_den, C_RW)
            latch(acc_r, C_CR)
            latch(acc_g, C_CG)
            latch(acc_b, C_CB)
            if gbuffer:
                latch(acc_u, C_U)
                latch(acc_v, C_V)
                latch(acc_nx, C_NX)
                latch(acc_ny, C_NY)
                latch(acc_nz, C_NZ)
                for acc, col in ((acc_met, C_MET), (acc_rgh, C_RGH),
                                 (acc_emr, C_EMR), (acc_emg, C_EMG),
                                 (acc_emb, C_EMB), (acc_tex, C_TEX)):
                    cv = cols_f32(base, col)
                    old = acc[r * GROUP:(r + 1) * GROUP, :]
                    acc[r * GROUP:(r + 1) * GROUP, :] = jnp.where(
                        ok, cv, old)

    # Chunk loop, unrolled by 2 for static double-buffered slab halves.
    nchunks = pl.cdiv(n, chunk)
    half_rows = chunk

    def make_dma(c, slot):
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(start + c * chunk, chunk), :],
            slab.at[pl.ds(slot * half_rows, half_rows), :],
            slab_sem.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        make_dma(0, 0).start()

    def chunk_pair(p, carry):
        c0i = 2 * p
        c1i = 2 * p + 1

        @pl.when(c1i < nchunks)
        def _():
            make_dma(c1i, 1).start()

        make_dma(c0i, 0).wait()
        for q in range(chunk // GROUP):
            eval_group(q * GROUP, c0i * chunk + q * GROUP)

        @pl.when(c1i < nchunks)
        def _():
            @pl.when(c1i + 1 < nchunks)
            def _():
                make_dma(c1i + 1, 0).start()

            make_dma(c1i, 1).wait()
            for q in range(chunk // GROUP):
                eval_group(half_rows + q * GROUP, c1i * chunk + q * GROUP)

        return carry

    jax.lax.fori_loop(0, pl.cdiv(nchunks, 2), chunk_pair, 0)

    # ---- Merge: reduce the 8 per-sublane slots once per pixel row ----
    for r in range(GT_H):
        bz = acc_z[r * GROUP:(r + 1) * GROUP, :]
        if depth_only:
            for sh in (4, 2, 1):
                bz = jnp.minimum(bz, pltpu.roll(bz, sh, axis=0))
            mz[r:r + 1, :] = bz[0:1, :]
            continue
        bi = acc_id[r * GROUP:(r + 1) * GROUP, :]
        pays = [a[r * GROUP:(r + 1) * GROUP, :] for a in accs[2:]]
        for sh in (4, 2, 1):
            z2 = pltpu.roll(bz, sh, axis=0)
            i2 = pltpu.roll(bi, sh, axis=0)
            take = (z2 < bz) | ((z2 == bz) & (i2 < bi))
            bz = jnp.where(take, z2, bz)
            bi = jnp.where(take, i2, bi)
            pays = [jnp.where(take, pltpu.roll(pv, sh, axis=0), pv)
                    for pv in pays]
        mz[r:r + 1, :] = bz[0:1, :]
        mid[r:r + 1, :] = bi[0:1, :]
        for mref, pv in zip(merged[2:], pays):
            mref[r:r + 1, :] = pv[0:1, :]

    # ---- Phase 2: leftover triangles via the scalar hierarchy ----
    py = (row0 + jax.lax.broadcasted_iota(jnp.int32, (GT_H, GT_W), 0)) \
        * g.SUBPIXEL + half
    px_t = (col0 + jax.lax.broadcasted_iota(jnp.int32, (GT_H, GT_W), 1)) \
        * g.SUBPIXEL + half

    def tile_overlap(jmin, jmax, imin, imax):
        return ((jmax >= col0) & (jmin < col0 + GT_W)
                & (imax >= row0) & (imin < row0 + GT_H)
                & (jmin <= jmax) & (imin <= imax))

    def visit_block(bk):
        rows_i = g.RASTER_BLOCK // 4
        rows_f = g.RASTER_BLOCK // 2
        cp_i = pltpu.make_async_copy(
            ti_hbm.at[pl.ds(bk * rows_i, rows_i), :], ti_buf,
            blk_sems.at[0])
        cp_f = pltpu.make_async_copy(
            tf_hbm.at[pl.ds(bk * rows_f, rows_f), :], tf_buf,
            blk_sems.at[1])
        cp_i.start()
        cp_f.start()
        cp_i.wait()
        cp_f.wait()

        # Static unroll (rp.TRI_UNROLL divides 4, keeping the packed-row
        # lane bases static) — same policy as rp._hbm_kernel_body.
        tu = rp.TRI_UNROLL

        def eval_leftover(base4, u, overlap, t_global):
            ir = base4 + u // 4
            il = (u % 4) * rp.I32_LANES
            fr2 = 2 * base4 + u // 2
            fl = (u % 2) * rp.F32_LANES
            e0 = ti_buf[ir, il + g.I_DX0] * (py - ti_buf[ir, il + g.I_Y1]) \
                - ti_buf[ir, il + g.I_DY0] * (px_t - ti_buf[ir, il + g.I_X1])
            e1 = ti_buf[ir, il + g.I_DX1] * (py - ti_buf[ir, il + g.I_Y2]) \
                - ti_buf[ir, il + g.I_DY1] * (px_t - ti_buf[ir, il + g.I_X2])
            e2 = ti_buf[ir, il + g.I_DX2] * (py - ti_buf[ir, il + g.I_Y0]) \
                - ti_buf[ir, il + g.I_DY2] * (px_t - ti_buf[ir, il + g.I_X0])
            cov = ((e0 >= ti_buf[ir, il + g.I_BIAS0])
                   & (e1 >= ti_buf[ir, il + g.I_BIAS1])
                   & (e2 >= ti_buf[ir, il + g.I_BIAS2]))
            ef0 = e0.astype(jnp.float32)
            ef1 = e1.astype(jnp.float32)
            ef2 = e2.astype(jnp.float32)
            z = ef0 * tf_buf[fr2, fl + g.F_ZA0] \
                + ef1 * tf_buf[fr2, fl + g.F_ZA1] \
                + ef2 * tf_buf[fr2, fl + g.F_ZA2]
            zb = mz[...]
            if depth_only:
                ok = cov & (z >= 0.0) & (z < zb) & overlap
                mz[...] = jnp.where(ok, z, zb)
                return
            tb = mid[...]
            ok = cov & (z >= 0.0) & overlap & (
                (z < zb) | ((z == zb) & (t_global < tb)))
            mz[...] = jnp.where(ok, z, zb)
            mid[...] = jnp.where(ok, t_global, tb)

            def latchl(mref, c0i):
                mref[...] = jnp.where(
                    ok,
                    ef0 * tf_buf[fr2, fl + c0i]
                    + ef1 * tf_buf[fr2, fl + c0i + 1]
                    + ef2 * tf_buf[fr2, fl + c0i + 2],
                    mref[...])

            latchl(mden, g.F_RW0)
            latchl(mr, g.F_CR0)
            latchl(mg, g.F_CG0)
            latchl(mb, g.F_CB0)
            if gbuffer:
                latchl(mu, g.F_U0)
                latchl(mv, g.F_V0)
                latchl(mnx, g.F_NX0)
                latchl(mny, g.F_NY0)
                latchl(mnz, g.F_NZ0)
                for mref, col in ((mmet, g.F_MET), (mrgh, g.F_RGH),
                                  (memr, g.F_EMR), (memg, g.F_EMG),
                                  (memb, g.F_EMB), (mtex, g.F_TEX)):
                    mref[...] = jnp.where(ok, tf_buf[fr2, fl + col],
                                          mref[...])

        def unrolled(q, c2):
            base4 = q * (tu // 4)
            hits = []
            for u in range(tu):
                ir = base4 + u // 4
                il = (u % 4) * rp.I32_LANES
                hits.append(tile_overlap(
                    ti_buf[ir, il + g.I_JMIN], ti_buf[ir, il + g.I_JMAX],
                    ti_buf[ir, il + g.I_IMIN], ti_buf[ir, il + g.I_IMAX]))
            any_hit = hits[0]
            for hb in hits[1:]:
                any_hit = any_hit | hb

            @pl.when(any_hit)
            def _():
                for u in range(tu):
                    eval_leftover(
                        base4, u, hits[u],
                        bk * g.RASTER_BLOCK + q * tu + u)

            return c2

        jax.lax.fori_loop(0, g.RASTER_BLOCK // tu, unrolled, 0)

    def block_hit(bk):
        return tile_overlap(blk_ref[bk, 0], blk_ref[bk, 1],
                            blk_ref[bk, 2], blk_ref[bk, 3])

    def super_hit(sb):
        return tile_overlap(sup_ref[sb, 0], sup_ref[sb, 1],
                            sup_ref[sb, 2], sup_ref[sb, 3])

    def mega_hit(mb):
        return tile_overlap(mega_ref[mb, 0], mega_ref[mb, 1],
                            mega_ref[mb, 2], mega_ref[mb, 3])

    def visit_super(sb):
        rp._scan_groups(sb * g.SUPER_BLOCK, (sb + 1) * g.SUPER_BLOCK,
                        block_hit, visit_block)

    def visit_mega(mb):
        rp._scan_groups(mb * g.SUPER_BLOCK, (mb + 1) * g.SUPER_BLOCK,
                        super_hit, visit_super)

    @pl.when(tany_ref[lin] > 0)
    def _():
        rp._scan_groups(0, mega_ref.shape[0], mega_hit, visit_mega)

    # ---- Resolve ----
    if depth_only:
        outs[0][...] = mz[...]
        return
    d = mden[...]
    covered = d > 0
    inv = jnp.float32(1.0) / jnp.where(covered, d, jnp.float32(1.0))

    def chan(numer):
        c = jnp.where(covered, numer * inv, jnp.float32(0.0))
        c = jnp.clip(c, 0.0, 1.0)
        q = jnp.floor(c * jnp.float32(255.0) + jnp.float32(0.5))
        return q.astype(jnp.int32).astype(jnp.uint32)

    a = jnp.full((GT_H, GT_W), 255, jnp.uint32)
    outs[0][...] = (chan(mr[...]) | (chan(mg[...]) << 8)
                    | (chan(mb[...]) << 16) | (a << 24))
    outs[1][...] = mz[...]
    if gbuffer:
        inv_cov = jnp.where(covered, inv, jnp.float32(0.0))
        for oref, mref in zip(outs[2:7], (mu, mv, mnx, mny, mnz)):
            oref[...] = mref[...] * inv_cov
        for oref, mref in zip(outs[7:13],
                              (mmet, mrgh, memr, memg, memb, mtex)):
            oref[...] = mref[...]


def _scratch_shapes(mode: str, chunk: int):
    planes = {"flat": _FLAT_PLANES, "depth": 1,
              "gbuffer": _FLAT_PLANES + _GBUF_INTERP + _GBUF_CONST}[mode]
    accs = []
    merged = []
    for p in range(planes):
        dt = jnp.int32 if (p == 1 and mode != "depth") else jnp.float32
        accs.append(pltpu.VMEM((GT_H * GROUP, GT_W), dt))
        merged.append(pltpu.VMEM((GT_H, GT_W), dt))
    rest = [
        pltpu.VMEM((2 * chunk, ROW_LANES), jnp.int32),  # list slab
        pltpu.SemaphoreType.DMA((2,)),                    # slab sems
        pltpu.VMEM((g.RASTER_BLOCK // 4, 128), jnp.int32),
        pltpu.VMEM((g.RASTER_BLOCK // 2, 128), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    return accs + merged + rest, planes


def _make_kernel(mode: str, chunk: int, num_outs: int):
    def kernel(offs_ref, tany_ref, rows_hbm, mega_ref, sup_ref, blk_ref,
               ti_hbm, tf_hbm, *rest):
        outs = rest[:num_outs]
        planes = {"flat": _FLAT_PLANES, "depth": 1,
                  "gbuffer": _FLAT_PLANES + _GBUF_INTERP + _GBUF_CONST}[mode]
        accs = rest[num_outs:num_outs + planes]
        merged = rest[num_outs + planes:num_outs + 2 * planes]
        slab, slab_sem, ti_buf, tf_buf, blk_sems = rest[num_outs + 2 * planes:]
        _group8_body(offs_ref, tany_ref, rows_hbm, mega_ref, sup_ref,
                     blk_ref, ti_hbm, tf_hbm, outs, accs, merged, slab,
                     slab_sem, ti_buf, tf_buf, blk_sems,
                     chunk=chunk, mode=mode)
    return kernel


def _out_shapes(mode: str, width: int, height: int):
    plane = lambda dt: jax.ShapeDtypeStruct((height, width), dt)
    if mode == "depth":
        return [plane(jnp.float32)]
    if mode == "flat":
        return [plane(jnp.uint32), plane(jnp.float32)]
    return [plane(jnp.uint32)] + [plane(jnp.float32)] * 12


def _run(mode: str, tri_i32, tri_f32, width: int, height: int,
         interpret: bool = False, pair_cap: int = PAIR_CAP,
         list_budget: int | None = None, chunk: int = CHUNK):
    assert height % GT_H == 0 and width % GT_W == 0, (width, height)
    grid = (height // GT_H, width // GT_W)
    inp = prepare_group8_inputs(tri_i32, tri_f32, width, height,
                                pair_cap=pair_cap,
                                list_budget=list_budget, chunk=chunk)
    out_shape = _out_shapes(mode, width, height)
    scratch, _ = _scratch_shapes(mode, chunk)
    tile_spec = pl.BlockSpec((GT_H, GT_W), lambda i, j, *_: (i, j),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # offs, tile_any -> SMEM
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # rows (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # megas
            pl.BlockSpec(memory_space=pltpu.VMEM),  # supers
            pl.BlockSpec(memory_space=pltpu.VMEM),  # blocks
            pl.BlockSpec(memory_space=pl.ANY),   # ti packed (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # tf packed (HBM)
        ],
        out_specs=[tile_spec] * len(out_shape),
        scratch_shapes=scratch,
    )
    outs = rp._pallas_call(
        _make_kernel(mode, chunk, len(out_shape)),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        # XLA's memory-space-assignment may keep the full-frame outputs
        # VMEM-resident (S(1)) when the consumer is a reduction; that is
        # a win, but it busts the default 16 MB scoped-vmem ceiling at
        # 1080p (2 planes x 8.4 MB).  Raise the per-call limit.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(inp.offs, inp.tile_any, inp.rows, inp.megas, inp.supers, inp.blocks,
      inp.ti_hbm, inp.tf_hbm)
    return outs


def rasterize_setup_pallas_group8(tri_i32, tri_f32, width: int, height: int,
                                  interpret: bool = False,
                                  pair_cap: int = PAIR_CAP,
                                  list_budget: int | None = None,
                                  chunk: int = CHUNK):
    """Group-vectorized flat raster -> (color u32, depth f32)."""
    color, depth = _run("flat", tri_i32, tri_f32, width, height,
                        interpret=interpret, pair_cap=pair_cap,
                        list_budget=list_budget, chunk=chunk)
    return color, depth


def rasterize_gbuffer_pallas_group8(tri_i32, tri_f32, width: int,
                                    height: int, interpret: bool = False,
                                    pair_cap: int = PAIR_CAP,
                                    list_budget: int | None = None,
                                    chunk: int = CHUNK):
    """Group-vectorized G-buffer raster — same 13 planes as
    rasterize_gbuffer_pallas."""
    return _run("gbuffer", tri_i32, tri_f32, width, height,
                interpret=interpret, pair_cap=pair_cap,
                list_budget=list_budget, chunk=chunk)


def rasterize_depth_pallas_group8(tri_i32, tri_f32, width: int, height: int,
                                  interpret: bool = False,
                                  pair_cap: int = PAIR_CAP,
                                  list_budget: int | None = None,
                                  chunk: int = CHUNK):
    """Group-vectorized depth-only raster (shadow-map pass)."""
    (depth,) = _run("depth", tri_i32, tri_f32, width, height,
                    interpret=interpret, pair_cap=pair_cap,
                    list_budget=list_budget, chunk=chunk)
    return depth
