"""Visibility-buffer and transposed-group raster experiments.

MEASURED NEGATIVE RESULTS, quarantined out of the production module
(VERDICT r3 weak #7): both designs are bit-identical to the production
HBM hierarchy kernels and both measured SLOWER at 1M triangles @1080p
on v5e with the honest barrier'd-scan methodology:

* per-triangle visibility split (``rasterize_setup_pallas_vis``):
  377 ms plain / 580 ms with the hit-bitmap traversal vs 336 ms — the
  per-(tile, triangle) cost is scalar loop/branch machinery, which the
  split does not remove;
* transposed-group kernel (``rasterize_setup_pallas_trans``): ~433 ms
  kernel + ~124 ms resolve vs 336 ms total — aligned (8,1) sublane
  vector loads do NOT pay: the per-row cross-sublane z/id merges and
  dynamic row RMWs cost more than the scalar machinery they replace.

Tests: tests/test_raster_pallas.py (opt-in via
ZRENDERER_RUN_EXPERIMENTS=1).  Benchmarks: benchmarks/attribution.py,
benchmarks/trans_probe.py.
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
    TRI_UNROLL,
    _pallas_call,
    _scan_groups,
    _hbm_flat_inputs,
    prepare_raster_inputs,
)

def _hbm_vis_kernel(sup_ref, blk_ref, ti_hbm, tf_hbm, depth_ref, idx_ref,
                    zbuf, idxbuf, ti_buf, tf_buf, dma_sems):
    """Visibility-buffer pass for very large scenes: identical traversal,
    coverage, and z semantics to _hbm_kernel_body, but the per-visit work
    latches only (z, winning triangle id) — no attribute interpolation, no
    packing.  With ~1M one-pixel triangles each paying a full-tile vector
    evaluation, the dropped per-visit planes (den + 3 color numerators,
    each a 3-FMA interpolation plus a select) are most of the frame; the
    winner's color is recomputed EXACTLY once per pixel in the XLA
    resolve pass (resolve_flat_vis) from the latched id."""
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
    idxbuf[...] = jnp.full((TILE_H, TILE_W), -1, jnp.int32)

    def tile_overlap(jmin, jmax, imin, imax):
        return (
            (jmax >= col0)
            & (jmin < col0 + TILE_W)
            & (imax >= row0)
            & (imin < row0 + TILE_H)
            & (jmin <= jmax)
            & (imin <= imax)
        )

    def tri_body(base4, u, gid, overlap):
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
        z = (e0.astype(jnp.float32) * tf_buf[fr2, fl + g.F_ZA0]
             + e1.astype(jnp.float32) * tf_buf[fr2, fl + g.F_ZA1]
             + e2.astype(jnp.float32) * tf_buf[fr2, fl + g.F_ZA2])
        zb = zbuf[...]
        ok = cov & (z >= 0.0) & (z < zb) & overlap
        zbuf[...] = jnp.where(ok, z, zb)
        idxbuf[...] = jnp.where(ok, gid, idxbuf[...])

    def block_hit(bk):
        return tile_overlap(
            blk_ref[bk, 0], blk_ref[bk, 1], blk_ref[bk, 2], blk_ref[bk, 3]
        )

    def visit_block(bk):
        rows_i = g.RASTER_BLOCK // 4
        rows_f = g.RASTER_BLOCK // 2
        cp_i = pltpu.make_async_copy(
            ti_hbm.at[pl.ds(bk * rows_i, rows_i), :], ti_buf, dma_sems.at[0],
        )
        cp_f = pltpu.make_async_copy(
            tf_hbm.at[pl.ds(bk * rows_f, rows_f), :], tf_buf, dma_sems.at[1],
        )
        cp_i.start()
        cp_f.start()
        cp_i.wait()
        cp_f.wait()
        gid0 = bk * g.RASTER_BLOCK

        def unrolled(q, c2):
            base4 = q * (TRI_UNROLL // 4)
            hits = []
            for u in range(TRI_UNROLL):
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
                for u in range(TRI_UNROLL):
                    tri_body(base4, u, gid0 + q * TRI_UNROLL + u, hits[u])

            return c2

        jax.lax.fori_loop(0, g.RASTER_BLOCK // TRI_UNROLL, unrolled, 0)

    def super_hit(sb):
        return tile_overlap(
            sup_ref[sb, 0], sup_ref[sb, 1], sup_ref[sb, 2], sup_ref[sb, 3]
        )

    def visit_super(sb):
        _scan_groups(sb * g.SUPER_BLOCK, (sb + 1) * g.SUPER_BLOCK,
                     block_hit, visit_block)

    _scan_groups(0, sup_ref.shape[0], super_hit, visit_super)

    depth_ref[...] = zbuf[...]
    idx_ref[...] = idxbuf[...]


GROUP = 8  # triangles per hit-bit (and per unconditional body group)


def prepare_group_bits(tri_i32, width: int, height: int):
    """Per-(tile, triangle-group) hit bitmap, computed VECTORIZED in XLA.

    Returns (tiles, ceil(G/32)) int32 where bit g of row t says: some
    triangle in group-of-8 g has a pixel bbox overlapping tile t.  The
    kernel then reads ONE scalar word per block (16 group bits) instead
    of doing ~8x12 scalar bbox ops per group — the dominant machinery
    cost of the million-triangle scan (docs/PERFORMANCE.md).  Bits are
    conservative by group-bbox union; correctness never depends on them
    (dead slots carry bias=INT32_MAX since geometry.setup_triangles)."""
    t = tri_i32.shape[0]
    assert t % g.RASTER_BLOCK == 0
    ngroups = t // GROUP
    ty, tx = height // TILE_H, width // TILE_W
    # Group union bboxes (segment min/max over 8; dead slots have inverted
    # bboxes which union away unless the whole group is dead).
    jmin = tri_i32[:, g.I_JMIN].reshape(ngroups, GROUP)
    jmax = tri_i32[:, g.I_JMAX].reshape(ngroups, GROUP)
    imin = tri_i32[:, g.I_IMIN].reshape(ngroups, GROUP)
    imax = tri_i32[:, g.I_IMAX].reshape(ngroups, GROUP)
    live = (jmin <= jmax) & (imin <= imax)
    big = jnp.int32(1 << 29)
    gjmin = jnp.where(live, jmin, big).min(axis=1)
    gjmax = jnp.where(live, jmax, -big).max(axis=1)
    gimin = jnp.where(live, imin, big).min(axis=1)
    gimax = jnp.where(live, imax, -big).max(axis=1)
    # Tile index ranges per group.
    tx0 = gjmin // TILE_W
    tx1 = gjmax // TILE_W
    ty0 = gimin // TILE_H
    ty1 = gimax // TILE_H
    rows = jnp.arange(ty, dtype=jnp.int32)[:, None, None]
    cols = jnp.arange(tx, dtype=jnp.int32)[None, :, None]
    ghit = ((rows >= ty0) & (rows <= ty1)
            & (cols >= tx0) & (cols <= tx1))  # (ty, tx, G)
    # Word count padded to a multiple of 1024: the kernel DMAs each
    # tile's row as a 1-D slice (2-D sublane slicing would need 8-row
    # alignment), and 1-D VMEM refs are tiled (1024,) — both the slice
    # length and its offset must be 1024-aligned.
    nwords = -(-ngroups // 32)
    nwords = -(-nwords // 1024) * 1024
    pad = nwords * 32 - ngroups
    if pad:
        ghit = jnp.pad(ghit, ((0, 0), (0, 0), (0, pad)))
    bits = (ghit.reshape(ty * tx, nwords, 32).astype(jnp.uint32)
            << jnp.arange(32, dtype=jnp.uint32)[None, None, :]).sum(
        axis=-1, dtype=jnp.uint32)
    tiles_pad = -(-(ty * tx) // 8) * 8 - ty * tx
    if tiles_pad:
        bits = jnp.pad(bits, ((0, tiles_pad), (0, 0)))
    return jax.lax.bitcast_convert_type(bits, jnp.int32)


def _hbm_vis_bits_kernel(bits_hbm, sup_ref, ti_hbm, tf_hbm,
                         depth_ref, idx_ref,
                         zbuf, idxbuf, ti_buf, tf_buf, bits_smem, dma_sems):
    """Visibility pass driven by the precomputed hit bitmap: per visited
    block, ONE scalar word read yields the block-skip test and all 16
    group bits; group bodies run UNCONDITIONALLY over their 8 triangles
    (dead slots cannot cover — bias=INT32_MAX — and a bbox-missing
    triangle covers no pixel of this tile by geometry), so the per-visit
    scalar machinery is gone.  Superblock skip keeps the coarse bbox
    test (few entries)."""
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
    idxbuf[...] = jnp.full((TILE_H, TILE_W), -1, jnp.int32)

    # This tile's bitmap row -> SMEM (scalar reads at dynamic word index
    # need SMEM; dynamic lane-dim VMEM indexing does not compile).  The
    # bitmap is 1-D flattened: 2-D row slices would need 8-row-aligned
    # sublane slices, while a 1-D slice only needs its 128-aligned offset
    # (nwords is padded to a multiple of 128).
    nwords = bits_smem.shape[0]
    cp_bits = pltpu.make_async_copy(
        bits_hbm.at[pl.ds(tile_idx * nwords, nwords)], bits_smem,
        dma_sems.at[2],
    )
    cp_bits.start()
    cp_bits.wait()

    def tri_body(base4, u, gid):
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
        z = (e0.astype(jnp.float32) * tf_buf[fr2, fl + g.F_ZA0]
             + e1.astype(jnp.float32) * tf_buf[fr2, fl + g.F_ZA1]
             + e2.astype(jnp.float32) * tf_buf[fr2, fl + g.F_ZA2])
        zb = zbuf[...]
        ok = cov & (z >= 0.0) & (z < zb)
        zbuf[...] = jnp.where(ok, z, zb)
        idxbuf[...] = jnp.where(ok, gid, idxbuf[...])

    groups_per_block = g.RASTER_BLOCK // GROUP  # 16: half a bitmap word

    def block_word(bk):
        word = bits_smem[bk // 2]
        shift = (bk % 2) * 16
        return (word >> shift) & 0xFFFF

    def visit_block(bk, word16):
        rows_i = g.RASTER_BLOCK // 4
        rows_f = g.RASTER_BLOCK // 2
        cp_i = pltpu.make_async_copy(
            ti_hbm.at[pl.ds(bk * rows_i, rows_i), :], ti_buf, dma_sems.at[0],
        )
        cp_f = pltpu.make_async_copy(
            tf_hbm.at[pl.ds(bk * rows_f, rows_f), :], tf_buf, dma_sems.at[1],
        )
        cp_i.start()
        cp_f.start()
        cp_i.wait()
        cp_f.wait()
        gid0 = bk * g.RASTER_BLOCK
        for q in range(groups_per_block):
            @pl.when(((word16 >> q) & 1) != 0)
            def _(q=q):
                base4 = q * (GROUP // 4)
                for u in range(GROUP):
                    tri_body(base4, u, gid0 + q * GROUP + u)

    def tile_overlap(jmin, jmax, imin, imax):
        return (
            (jmax >= col0)
            & (jmin < col0 + TILE_W)
            & (imax >= row0)
            & (imin < row0 + TILE_H)
            & (jmin <= jmax)
            & (imin <= imax)
        )

    def super_hit(sb):
        return tile_overlap(
            sup_ref[sb, 0], sup_ref[sb, 1], sup_ref[sb, 2], sup_ref[sb, 3]
        )

    def visit_super(sb):
        _scan_groups(sb * g.SUPER_BLOCK, (sb + 1) * g.SUPER_BLOCK,
                     lambda bk: block_word(bk) != 0,
                     lambda bk: visit_block(bk, block_word(bk)))

    _scan_groups(0, sup_ref.shape[0], super_hit, visit_super)

    depth_ref[...] = zbuf[...]
    idx_ref[...] = idxbuf[...]


def _vis_resolve_table(tri_i32, tri_f32):
    """(T, 32) i32 resolve rows for the visibility-buffer pass: the 12
    edge ints + the 12 flat-color f32 coefficients (bitcast) the XLA
    resolve needs — ONE aligned pow2-lane row-gather per pixel."""
    ints = jnp.stack(
        [tri_i32[:, c] for c in (
            g.I_DX0, g.I_DY0, g.I_X1, g.I_Y1,
            g.I_DX1, g.I_DY1, g.I_X2, g.I_Y2,
            g.I_DX2, g.I_DY2, g.I_X0, g.I_Y0,
        )], axis=1,
    )
    flts = jnp.stack(
        [tri_f32[:, c] for c in (
            g.F_RW0, g.F_RW1, g.F_RW2,
            g.F_CR0, g.F_CR1, g.F_CR2,
            g.F_CG0, g.F_CG1, g.F_CG2,
            g.F_CB0, g.F_CB1, g.F_CB2,
        )], axis=1,
    )
    t = tri_i32.shape[0]
    return jnp.concatenate(
        [ints, jax.lax.bitcast_convert_type(flts, jnp.int32),
         jnp.zeros((t, 8), jnp.int32)], axis=1,
    )


def resolve_flat_vis(depth, idx, table):
    """XLA resolve of the visibility buffer: recompute the winning
    triangle's color at each pixel with EXACTLY the raster kernel's
    arithmetic (int32 edge functions at pixel centers, f32 interpolation
    FMAs, the spec's u8 rounding) — the output is bit-identical to the
    single-pass kernel's packed color."""
    h, w = idx.shape
    rows = jnp.take(table, jnp.maximum(idx, 0).reshape(-1), axis=0)
    rows = rows.reshape(h, w, table.shape[1])
    ints = rows[..., :12]
    flts = jax.lax.bitcast_convert_type(rows[..., 12:24], jnp.float32)
    half = g.SUBPIXEL // 2
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    jx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    py = iy * g.SUBPIXEL + half
    px = jx * g.SUBPIXEL + half
    e0 = ints[..., 0] * (py - ints[..., 3]) - ints[..., 1] * (px - ints[..., 2])
    e1 = ints[..., 4] * (py - ints[..., 7]) - ints[..., 5] * (px - ints[..., 6])
    e2 = ints[..., 8] * (py - ints[..., 11]) - ints[..., 9] * (px - ints[..., 10])
    ef0 = e0.astype(jnp.float32)
    ef1 = e1.astype(jnp.float32)
    ef2 = e2.astype(jnp.float32)
    den = ef0 * flts[..., 0] + ef1 * flts[..., 1] + ef2 * flts[..., 2]
    covered = (idx >= 0) & (den > 0)
    inv = jnp.float32(1.0) / jnp.where(covered, den, jnp.float32(1.0))

    def chan(k):
        c0 = 3 + 3 * k
        numer = (ef0 * flts[..., c0] + ef1 * flts[..., c0 + 1]
                 + ef2 * flts[..., c0 + 2])
        c = jnp.where(covered, numer * inv, jnp.float32(0.0))
        c = jnp.clip(c, 0.0, 1.0)
        q = jnp.floor(c * jnp.float32(255.0) + jnp.float32(0.5))
        return q.astype(jnp.int32).astype(jnp.uint32)

    a = jnp.full((h, w), 255, jnp.uint32)
    return chan(0) | (chan(1) << 8) | (chan(2) << 16) | (a << 24)


def rasterize_setup_pallas_vis(tri_i32, tri_f32, width: int, height: int,
                               interpret: bool = False, compact: bool = True):
    """Visibility-buffer raster for very large scenes: Pallas z+id pass,
    then the XLA color resolve.  Same (packed color, depth) contract as
    rasterize_setup_pallas_hbm, bit-identical output."""
    assert height % TILE_H == 0 and width % TILE_W == 0
    tx = width // TILE_W
    grid = (height // TILE_H, tx)
    supers, blocks, tri_i32, tri_f32 = prepare_raster_inputs(
        tri_i32, tri_f32, compact=compact
    )
    del blocks  # block skip rides the bitmap words instead
    table = _vis_resolve_table(tri_i32, tri_f32)
    bits = prepare_group_bits(tri_i32, width, height)

    tile_spec = pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    depth, idx = _pallas_call(
        _hbm_vis_bits_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # bitmap rows (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # superblock bboxes
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[tile_spec, tile_spec],
        out_shape=[
            jax.ShapeDtypeStruct((height, width), jnp.float32),
            jax.ShapeDtypeStruct((height, width), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((TILE_H, TILE_W), jnp.int32),
            pltpu.VMEM((g.RASTER_BLOCK // 4, 128), jnp.int32),
            pltpu.VMEM((g.RASTER_BLOCK // 2, 128), jnp.float32),
            pltpu.SMEM((bits.shape[1],), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(bits.reshape(-1), supers, *_hbm_flat_inputs(tri_i32, tri_f32))
    color = resolve_flat_vis(depth, idx, table)
    return color, depth


# Above this count the flat HBM path switches to the visibility-buffer
# kernel: the XLA resolve pays a fixed ~6 ms row-gather at 1080p, which
# the dropped per-visit interpolation work amortizes once scenes carry
# hundreds of thousands of triangles.
VIS_BUFFER_MIN_TRIS = 131072


# ---------------------------------------------------------------------------
# Transposed-group raster: triangles ride the SUBLANE dim.
#
# The per-(tile, triangle) cost of every kernel above is per-triangle
# SCALAR machinery — 16-30 scalar VMEM reads each feeding a scalar->vector
# splat, plus branch/loop overhead (~300+ ns/visit measured; the vector
# math itself is ~2 ns marginal, benchmarks/band_probe.py).  This kernel
# removes it: a group of TRANS_GROUP=8 consecutive triangles' setup
# columns load as ALIGNED (8, 1) sublane vectors (zero scalar reads, zero
# splats), edge functions for all 8 triangles evaluate at once over one
# tile row as (8, 128) int32 ops — triangle index in SUBLANES, tile
# column in LANES — and rows iterate over the group's union-bbox span in
# TRANS_R-row chunks so tiny triangles don't pay full-tile evaluation.
# The in-group depth merge is a cross-sublane min with a min-id tie rule
# (== submission-order first-wins, since rows are in submission order).
# Output is a visibility buffer (z + winning id); color resolves through
# the exact XLA pass (resolve_flat_vis), bit-identical to the single-pass
# kernels.
#
# MEASURED NEGATIVE RESULT (kept as a tested experiment, not selected):
# at 1M triangles @1080p on v5e the kernel costs ~433 ms + ~124 ms
# resolve vs the scalar HBM hierarchy kernel's 336 ms total — the
# per-row cross-sublane z/id merges and dynamic single-row framebuffer
# RMWs cost more than the per-triangle scalar reads they replace.  The
# static-row-band variant is ~1.7x worse still (row over-evaluation),
# and scatter/sub-band alternatives lose by larger margins
# (benchmarks/trans_probe.py, docs/PERFORMANCE.md).  Timing caveat that
# initially hid this: loop-invariant scan benchmarks are LICM-hoisted by
# XLA (the pallas call runs ONCE regardless of scan length) — honest
# numbers need jax.lax.optimization_barrier tying the carry to the
# kernel inputs each step.
#
# Layout: HBM DMA row-slices must span full 128-lane rows, so each
# triangle record is ONE 128-lane int row: lanes [0, NI32) the int setup,
# lanes [TRANS_ZA, TRANS_ZA+3) the bitcast f32 z-plane coefficients (no
# separate float buffer — halves the DMA).  Group union bboxes pack 16
# groups x 8 lanes into one 128-lane row per RASTER_BLOCK.

TRANS_GROUP = 8  # triangles per transposed group (= f32 sublane count)
TRANS_R = 4      # rows per chunk of the group row loop (measured best)
TRANS_ZA = 24    # lane base of the bitcast z-plane coefficients


def prepare_trans_inputs(tri_i32, tri_f32, compact: bool = True):
    """Pack setup for the transposed-group kernel: (supers, blocks,
    ti128 (T, 128) i32, gbounds (T/RASTER_BLOCK, 128) i32, resolve
    table)."""
    supers, blocks, tri_i32, tri_f32 = prepare_raster_inputs(
        tri_i32, tri_f32, compact=compact
    )
    t = tri_i32.shape[0]
    za = jax.lax.bitcast_convert_type(
        tri_f32[:, g.F_ZA0:g.F_ZA0 + 3], jnp.int32
    )
    ti128 = jnp.concatenate(
        [tri_i32, jnp.zeros((t, TRANS_ZA - g.NI32), jnp.int32), za,
         jnp.zeros((t, 128 - TRANS_ZA - 3), jnp.int32)], axis=1,
    )

    ngroups = t // TRANS_GROUP
    live = (tri_i32[:, g.I_JMIN] <= tri_i32[:, g.I_JMAX]) \
        & (tri_i32[:, g.I_IMIN] <= tri_i32[:, g.I_IMAX])
    big = jnp.int32(1 << 29)

    def seg(col, neutral, take_min):
        v = jnp.where(live, tri_i32[:, col], neutral)
        v = v.reshape(ngroups, TRANS_GROUP)
        return v.min(axis=1) if take_min else v.max(axis=1)

    gb = jnp.stack([
        seg(g.I_JMIN, big, True), seg(g.I_JMAX, -big, False),
        seg(g.I_IMIN, big, True), seg(g.I_IMAX, -big, False),
    ], axis=1)
    gb = jnp.pad(gb, ((0, 0), (0, 4)))  # (ngroups, 8)
    gpb = g.RASTER_BLOCK // TRANS_GROUP  # groups per block (16)
    gb = gb.reshape(ngroups // gpb, gpb * 8)  # one 128-lane row per block

    table = _vis_resolve_table(tri_i32, tri_f32)
    return supers, blocks, ti128, gb, table


def _trans_vis_kernel(sup_ref, blk_ref, ti_hbm, gb_hbm, depth_ref, idx_ref,
                      zbuf, idxbuf, ti_buf, gb_buf, dma_sems):
    tile_i = pl.program_id(0)
    tile_j = pl.program_id(1)
    row0 = tile_i * TILE_H
    col0 = tile_j * TILE_W

    half = g.SUBPIXEL // 2
    # Tile-column pixel x coordinates as one lane row (1, 128).
    jx = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_W), 1)
    px_row = (col0 + jx) * g.SUBPIXEL + half

    zbuf[...] = jnp.full((TILE_H, TILE_W), 1.0, jnp.float32)
    idxbuf[...] = jnp.full((TILE_H, TILE_W), -1, jnp.int32)

    def tile_overlap(jmin, jmax, imin, imax):
        return ((jmax >= col0) & (jmin < col0 + TILE_W)
                & (imax >= row0) & (imin < row0 + TILE_H)
                & (jmin <= jmax) & (imin <= imax))

    def visit_group(bk, q):
        base = q * TRANS_GROUP  # row base within the block slab
        gid0 = bk * g.RASTER_BLOCK + base
        jmin = gb_buf[0, q * 8 + 0]
        jmax = gb_buf[0, q * 8 + 1]
        imin = gb_buf[0, q * 8 + 2]
        imax = gb_buf[0, q * 8 + 3]

        @pl.when(tile_overlap(jmin, jmax, imin, imax))
        def _():
            def col8(c):
                return ti_buf[pl.ds(base, TRANS_GROUP), c:c + 1]

            def colf(c):
                return jax.lax.bitcast_convert_type(col8(c), jnp.float32)

            x0 = col8(g.I_X0)
            y0 = col8(g.I_Y0)
            x1 = col8(g.I_X1)
            y1 = col8(g.I_Y1)
            x2 = col8(g.I_X2)
            y2 = col8(g.I_Y2)
            dx0 = col8(g.I_DX0)
            dy0 = col8(g.I_DY0)
            dx1 = col8(g.I_DX1)
            dy1 = col8(g.I_DY1)
            dx2 = col8(g.I_DX2)
            dy2 = col8(g.I_DY2)
            b0 = col8(g.I_BIAS0)
            b1 = col8(g.I_BIAS1)
            b2 = col8(g.I_BIAS2)
            za0 = colf(TRANS_ZA + 0)
            za1 = colf(TRANS_ZA + 1)
            za2 = colf(TRANS_ZA + 2)
            ids = gid0 + jax.lax.broadcasted_iota(
                jnp.int32, (TRANS_GROUP, 1), 0
            )

            # Lane-parallel edge terms shared across all rows.
            tx0 = dy0 * (px_row - x1)  # (8, 128)
            tx1 = dy1 * (px_row - x2)
            tx2 = dy2 * (px_row - x0)

            lo = jnp.maximum(imin - row0, 0)
            hi = jnp.minimum(imax - row0, TILE_H - 1)
            nch = (hi - lo) // TRANS_R + 1

            def chunk(c, carry):
                rc = jnp.minimum(lo + c * TRANS_R, TILE_H - TRANS_R)
                for rr in range(TRANS_R):
                    py = (row0 + rc + rr) * g.SUBPIXEL + half
                    e0 = dx0 * (py - y1) - tx0
                    e1 = dx1 * (py - y2) - tx1
                    e2 = dx2 * (py - y0) - tx2
                    cov = (e0 >= b0) & (e1 >= b1) & (e2 >= b2)
                    z = (e0.astype(jnp.float32) * za0
                         + e1.astype(jnp.float32) * za1
                         + e2.astype(jnp.float32) * za2)
                    # Dead lanes (z<0 or no coverage) park at 2.0 > any zb.
                    zc = jnp.where(cov & (z >= 0.0), z, jnp.float32(2.0))
                    zmin = jnp.min(zc, axis=0, keepdims=True)
                    # Min id among the z-tied sublanes == submission-order
                    # first-wins (rows are in submission order).
                    idw = jnp.min(
                        jnp.where(zc == zmin, ids, jnp.int32(0x7FFFFFFF)),
                        axis=0, keepdims=True,
                    )
                    zb = zbuf[pl.ds(rc + rr, 1), :]
                    upd = zmin < zb
                    zbuf[pl.ds(rc + rr, 1), :] = jnp.where(upd, zmin, zb)
                    ib = idxbuf[pl.ds(rc + rr, 1), :]
                    idxbuf[pl.ds(rc + rr, 1), :] = jnp.where(upd, idw, ib)
                return carry

            jax.lax.fori_loop(0, nch, chunk, 0)

    def visit_block(bk):
        cp_i = pltpu.make_async_copy(
            ti_hbm.at[pl.ds(bk * g.RASTER_BLOCK, g.RASTER_BLOCK), :],
            ti_buf, dma_sems.at[0],
        )
        cp_g = pltpu.make_async_copy(
            gb_hbm.at[pl.ds(bk, 1), :], gb_buf, dma_sems.at[1],
        )
        cp_i.start()
        cp_g.start()
        cp_i.wait()
        cp_g.wait()
        for q in range(g.RASTER_BLOCK // TRANS_GROUP):
            visit_group(bk, q)

    def block_hit(bk):
        return tile_overlap(blk_ref[bk, 0], blk_ref[bk, 1],
                            blk_ref[bk, 2], blk_ref[bk, 3])

    def super_hit(sb):
        return tile_overlap(sup_ref[sb, 0], sup_ref[sb, 1],
                            sup_ref[sb, 2], sup_ref[sb, 3])

    def visit_super(sb):
        _scan_groups(sb * g.SUPER_BLOCK, (sb + 1) * g.SUPER_BLOCK,
                     block_hit, visit_block)

    _scan_groups(0, sup_ref.shape[0], super_hit, visit_super)
    depth_ref[...] = zbuf[...]
    idx_ref[...] = idxbuf[...]


def rasterize_setup_pallas_trans(tri_i32, tri_f32, width: int, height: int,
                                 interpret: bool = False,
                                 compact: bool = True):
    """Transposed-group visibility raster + exact XLA color resolve.
    Same (packed color, depth) contract as rasterize_setup_pallas_hbm,
    bit-identical output (verified at 10K and 1M triangles on hardware,
    benchmarks/trans_probe.py)."""
    assert height % TILE_H == 0 and width % TILE_W == 0
    grid = (height // TILE_H, width // TILE_W)
    supers, blocks, ti128, gbounds, table = prepare_trans_inputs(
        tri_i32, tri_f32, compact=compact
    )

    tile_spec = pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    depth, idx = _pallas_call(
        _trans_vis_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # superblock bboxes
            pl.BlockSpec(memory_space=pltpu.VMEM),  # block bboxes
            pl.BlockSpec(memory_space=pl.ANY),      # ti128 rows (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # group bounds (HBM)
        ],
        out_specs=[tile_spec, tile_spec],
        out_shape=[
            jax.ShapeDtypeStruct((height, width), jnp.float32),
            jax.ShapeDtypeStruct((height, width), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((TILE_H, TILE_W), jnp.int32),
            pltpu.VMEM((g.RASTER_BLOCK, 128), jnp.int32),
            pltpu.VMEM((1, (g.RASTER_BLOCK // TRANS_GROUP) * 8), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(supers, blocks, ti128, gbounds)
    color = resolve_flat_vis(depth, idx, table)
    return color, depth


# Selection threshold if the transposed path ever wins (kept for the
# experiment's API; currently never reached — the scalar HBM hierarchy
# kernel is faster at every measured size, see the negative result above).
TRANS_MIN_TRIS = 1 << 62
