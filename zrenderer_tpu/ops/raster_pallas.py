"""Pallas TPU rasterizer: tiled edge-function raster with VMEM-resident tiles.

The TPU-native replacement for the reference's D3D12 fixed-function
rasterizer + depth unit + uber.hlsl pixel stage.  Design (SURVEY.md §7.2
item 6, BASELINE.json north star):

* grid over (tile_rows, tile_cols) screen tiles; each tile's color/depth
  state lives in VMEM scratch for the whole triangle loop (the blockwise /
  "ring-attention analog" structure of SURVEY.md §5.7);
* triangles stream through every tile in submission order; a per-triangle
  bbox-vs-tile test (`@pl.when`) skips all vector work for non-overlapping
  triangles, which is what makes the brute-force loop scale to real scenes
  before proper binning lands;
* coverage is exact int32 edge-function arithmetic; depth/attribute
  interpolation matches docs/RASTER_SPEC.md §3 bit-for-bit with the CPU
  oracle (same expression shapes, f32);
* output is a packed RGBA8 u32 plane + f32 depth — one perspective divide
  per pixel at resolve time, u8 packing fused into the kernel epilogue.

Triangle setup data arrives row-major as (T, NI32) / (T, NF32): Mosaic
supports dynamic indexing along sublanes but not lanes, so the per-triangle
scalar loads index rows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

from zrenderer_tpu.ops import geometry as g

# Screen-tile shape.  TILE_W is the lane width (fixed by hardware).
# TILE_H is overridable for experiments (ZRENDERER_TILE_H): the
# per-triangle vector cost inside every kernel scales with TILE_H/8
# vregs per pass, while per-tile fixed costs and multi-tile triangle
# duplication scale inversely — 32 measured best for the demo scene,
# see docs/PERFORMANCE.md for the 1M-triangle sweep.
TILE_H = int(os.environ.get("ZRENDERER_TILE_H", "32"))
TILE_W = 128

# Triangle-loop unroll factor: a Mosaic fori_loop iteration costs ~120 ns
# of scalar loop machinery (measured on v5e; scalar VMEM reads are ~1.5 ns
# and the vector eval is cheap), so the per-(tile, triangle) loops unroll
# by this factor.  Must divide g.RASTER_BLOCK.
TRI_UNROLL = 8

# While tracing an interpret-mode kernel (CPU tests / config.debug), the
# unrolled group-branched loops below collapse to plain per-item loops:
# the Pallas HLO interpreter discharges each nested pl.when cond by
# re-tracing its subjaxpr, so the 8x8x8 super/block/triangle unrolling
# that buys 2-5x on Mosaic makes CPU lowering effectively hang (>10 min
# for one 128x64 frame, measured).  Compiled TPU kernels are unaffected.
_UNROLL_OVERRIDE = None


from contextlib import contextmanager


@contextmanager
def _interpret_unroll(interpret: bool):
    global _UNROLL_OVERRIDE
    prev = _UNROLL_OVERRIDE
    _UNROLL_OVERRIDE = 1 if interpret else prev
    try:
        yield
    finally:
        _UNROLL_OVERRIDE = prev


def _tri_unroll() -> int:
    return _UNROLL_OVERRIDE or TRI_UNROLL


def _pallas_call(*args, interpret: bool = False, **kw):
    """pl.pallas_call wrapper that traces the kernel under the interpret
    unroll override (see _UNROLL_OVERRIDE).  Drop-in: the kernel jaxpr is
    built when the returned callable runs, inside the context."""

    def run(*operands):
        with _interpret_unroll(interpret):
            return pl.pallas_call(*args, interpret=interpret, **kw)(*operands)

    return run


def _scan_groups(start, end, hit_of, visit, unroll: int | None = None):
    """Unrolled any-hit scan over [start, end): advance ``unroll`` items
    per fori_loop iteration, branch once on "any hit in the group", then
    branch per hit item inside.  Amortizes the ~120 ns/iteration loop cost
    over mostly-miss scans (superblock/block bbox tables).  A scalar tail
    loop covers the remainder; bounds may be traced scalars."""
    unroll = unroll or _tri_unroll()

    def group(q, c):
        base = start + q * unroll
        hits = [hit_of(base + u) for u in range(unroll)]
        any_hit = hits[0]
        for hb in hits[1:]:
            any_hit = any_hit | hb

        @pl.when(any_hit)
        def _():
            for u in range(unroll):
                @pl.when(hits[u])
                def _(u=u):
                    visit(base + u)

        return c

    def single(i, c):
        @pl.when(hit_of(i))
        def _():
            visit(i)

        return c

    if unroll == 1:
        jax.lax.fori_loop(start, end, single, 0)
        return

    groups = (end - start) // unroll
    jax.lax.fori_loop(0, groups, group, 0)
    jax.lax.fori_loop(start + groups * unroll, end, single, 0)


def _raster_kernel(sup_ref, blk_ref, ti_ref, tf_ref, color_ref, depth_ref,
                   zbuf, nr, ng, nb, den):
    """One screen tile: loop triangle blocks, keep tile state in VMEM scratch.

    sup_ref: (S, 8) int32 superblock union bboxes (geometry.super_bounds),
    blk_ref: (B, 8) int32 per-block union bboxes (geometry.block_bounds),
    ti_ref: (T, NI32) int32 setup, tf_ref: (T, NF32) f32 setup.
    color_ref: (TILE_H, TILE_W) uint32 out, depth_ref: (TILE_H, TILE_W) f32.
    """
    _kernel_body(sup_ref, blk_ref, ti_ref, tf_ref, color_ref, depth_ref,
                 zbuf, nr, ng, nb, den, row_base=0)


def _gbuffer_kernel(sup_ref, blk_ref, ti_ref, tf_ref,
                    color_ref, depth_ref, u_ref, v_ref,
                    nx_ref, ny_ref, nz_ref,
                    met_ref, rgh_ref, emr_ref, emg_ref, emb_ref, tex_ref,
                    zbuf, nr, ng, nb, den, nu, nv, nnx, nny, nnz,
                    smet, srgh, semr, semg, semb, stex):
    """G-buffer variant: additionally latches the winning triangle's
    uv and world-space-normal numerators (resolved to planes) plus its
    per-draw material constants (metallic, roughness, emissive, texture
    layer — the per-draw SRV/material binding analog, zd3d12.zig:1273-1356).
    Feeds the lit/deferred pipelines (ops/shading.py).  BASELINE configs 1-3.
    """
    _kernel_body(sup_ref, blk_ref, ti_ref, tf_ref, color_ref, depth_ref,
                 zbuf, nr, ng, nb, den, row_base=0,
                 gbuf_refs=(u_ref, v_ref, nx_ref, ny_ref, nz_ref),
                 gbuf_scratch=(nu, nv, nnx, nny, nnz),
                 const_refs=(met_ref, rgh_ref, emr_ref, emg_ref, emb_ref,
                             tex_ref),
                 const_scratch=(smet, srgh, semr, semg, semb, stex))


def _kernel_body(sup_ref, blk_ref, ti_ref, tf_ref, color_ref, depth_ref,
                 zbuf, nr, ng, nb, den, row_base,
                 gbuf_refs=None, gbuf_scratch=None,
                 const_refs=None, const_scratch=None):
    tile_i = pl.program_id(0)
    tile_j = pl.program_id(1)
    row0 = row_base + tile_i * TILE_H
    col0 = tile_j * TILE_W

    half = g.SUBPIXEL // 2
    iy = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    py = (row0 + iy) * g.SUBPIXEL + half
    px = (col0 + ix) * g.SUBPIXEL + half

    zbuf[...] = jnp.full((TILE_H, TILE_W), 1.0, jnp.float32)
    nr[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    ng[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    nb[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    den[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    if gbuf_scratch is not None:
        for buf in gbuf_scratch:
            buf[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    if const_scratch is not None:
        for buf in const_scratch:
            buf[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)

    num_supers = sup_ref.shape[0]

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
        # Level-1 binning: one bbox test skips SUPER_BLOCK*RASTER_BLOCK
        # (4096) triangles — what keeps million-triangle scenes from paying
        # per-block header costs on every tile.
        return tile_overlap(
            sup_ref[sb, 0], sup_ref[sb, 1], sup_ref[sb, 2], sup_ref[sb, 3]
        )

    def visit_super(sb):
        _scan_groups(sb * g.SUPER_BLOCK, (sb + 1) * g.SUPER_BLOCK,
                     block_hit, visit_block)

    def block_hit(bk):
        # Level-0 binning: skip a whole block of RASTER_BLOCK triangles when
        # its union bbox misses this tile.
        return tile_overlap(
            blk_ref[bk, 0], blk_ref[bk, 1], blk_ref[bk, 2], blk_ref[bk, 3]
        )

    def visit_block(bk):
        # UNROLLED triangle loop with GROUP-level branching: a Mosaic
        # fori_loop iteration costs ~120-140 ns of loop machinery and a
        # pl.when ~55 ns even when false (measured; scalar reads are
        # ~1.5 ns) — so the loop advances TRI_UNROLL triangles per
        # iteration, takes ONE branch on "any of the group's bboxes touch
        # this tile", and evaluates the whole group unconditionally with
        # each triangle's bbox bit folded into its write mask (a
        # dead/missed triangle writes nothing).
        tu = _tri_unroll()

        def unrolled(q, c2):
            base = q * tu
            hits = [
                tile_overlap(
                    ti_ref[base + u, g.I_JMIN],
                    ti_ref[base + u, g.I_JMAX],
                    ti_ref[base + u, g.I_IMIN],
                    ti_ref[base + u, g.I_IMAX],
                )
                for u in range(tu)
            ]
            any_hit = hits[0]
            for hb in hits[1:]:
                any_hit = any_hit | hb

            @pl.when(any_hit)
            def _():
                for u in range(tu):
                    body(base + u, hits[u])

            return c2

        jax.lax.fori_loop(
            bk * (g.RASTER_BLOCK // tu),
            (bk + 1) * (g.RASTER_BLOCK // tu), unrolled, 0
        )

    def body(t, overlap):
        x0 = ti_ref[t, g.I_X0]
        y0 = ti_ref[t, g.I_Y0]
        x1 = ti_ref[t, g.I_X1]
        y1 = ti_ref[t, g.I_Y1]
        x2 = ti_ref[t, g.I_X2]
        y2 = ti_ref[t, g.I_Y2]
        dx0 = ti_ref[t, g.I_DX0]
        dy0 = ti_ref[t, g.I_DY0]
        dx1 = ti_ref[t, g.I_DX1]
        dy1 = ti_ref[t, g.I_DY1]
        dx2 = ti_ref[t, g.I_DX2]
        dy2 = ti_ref[t, g.I_DY2]
        b0 = ti_ref[t, g.I_BIAS0]
        b1 = ti_ref[t, g.I_BIAS1]
        b2 = ti_ref[t, g.I_BIAS2]

        e0 = dx0 * (py - y1) - dy0 * (px - x1)
        e1 = dx1 * (py - y2) - dy1 * (px - x2)
        e2 = dx2 * (py - y0) - dy2 * (px - x0)
        cov = (e0 >= b0) & (e1 >= b1) & (e2 >= b2)

        ef0 = e0.astype(jnp.float32)
        ef1 = e1.astype(jnp.float32)
        ef2 = e2.astype(jnp.float32)
        z = ef0 * tf_ref[t, g.F_ZA0] + ef1 * tf_ref[t, g.F_ZA1] + ef2 * tf_ref[t, g.F_ZA2]
        zb = zbuf[...]
        # `overlap` (the triangle's scalar bbox-vs-tile bit) folds into
        # the write mask: a missed or dead-slot triangle (inverted
        # bbox) writes nothing even though it was evaluated.
        ok = cov & (z >= 0.0) & (z < zb) & overlap

        zbuf[...] = jnp.where(ok, z, zb)
        den[...] = jnp.where(
            ok,
            ef0 * tf_ref[t, g.F_RW0] + ef1 * tf_ref[t, g.F_RW1] + ef2 * tf_ref[t, g.F_RW2],
            den[...],
        )
        nr[...] = jnp.where(
            ok,
            ef0 * tf_ref[t, g.F_CR0] + ef1 * tf_ref[t, g.F_CR1] + ef2 * tf_ref[t, g.F_CR2],
            nr[...],
        )
        ng[...] = jnp.where(
            ok,
            ef0 * tf_ref[t, g.F_CG0] + ef1 * tf_ref[t, g.F_CG1] + ef2 * tf_ref[t, g.F_CG2],
            ng[...],
        )
        nb[...] = jnp.where(
            ok,
            ef0 * tf_ref[t, g.F_CB0] + ef1 * tf_ref[t, g.F_CB1] + ef2 * tf_ref[t, g.F_CB2],
            nb[...],
        )
        if gbuf_scratch is not None:
            nu, nv, nnx, nny, nnz = gbuf_scratch
            for buf, c0 in (
                (nu, g.F_U0), (nv, g.F_V0),
                (nnx, g.F_NX0), (nny, g.F_NY0), (nnz, g.F_NZ0),
            ):
                buf[...] = jnp.where(
                    ok,
                    ef0 * tf_ref[t, c0] + ef1 * tf_ref[t, c0 + 1]
                    + ef2 * tf_ref[t, c0 + 2],
                    buf[...],
                )
        if const_scratch is not None:
            # Per-triangle constants: latch the scalar, no interpolation.
            for buf, col in zip(
                const_scratch,
                (g.F_MET, g.F_RGH, g.F_EMR, g.F_EMG, g.F_EMB, g.F_TEX),
            ):
                buf[...] = jnp.where(ok, tf_ref[t, col], buf[...])

    _scan_groups(0, num_supers, super_hit, visit_super)

    # Resolve: one perspective divide per pixel, pack RGBA8 into a u32 lane.
    d = den[...]
    covered = d > 0
    inv = jnp.float32(1.0) / jnp.where(covered, d, jnp.float32(1.0))

    def chan(numer, clear):
        c = jnp.where(covered, numer * inv, jnp.float32(clear))
        c = jnp.clip(c, 0.0, 1.0)
        q = jnp.floor(c * jnp.float32(255.0) + jnp.float32(0.5))
        # Mosaic has no f32->u32 cast; values are in [0, 255] so go via i32.
        return q.astype(jnp.int32).astype(jnp.uint32)

    r = chan(nr[...], 0.0)
    gch = chan(ng[...], 0.0)
    b = chan(nb[...], 0.0)
    a = jnp.full((TILE_H, TILE_W), 255, jnp.uint32)
    color_ref[...] = r | (gch << 8) | (b << 16) | (a << 24)
    depth_ref[...] = zbuf[...]
    if gbuf_refs is not None:
        nu, nv, nnx, nny, nnz = gbuf_scratch
        for ref, buf in zip(gbuf_refs, (nu, nv, nnx, nny, nnz)):
            ref[...] = jnp.where(covered, buf[...] * inv, jnp.float32(0.0))
    if const_refs is not None:
        for ref, buf in zip(const_refs, const_scratch):
            ref[...] = buf[...]  # constants latched directly, no 1/w


def prepare_raster_inputs(tri_i32, tri_f32, compact: bool = True):
    """Compact live triangles to the front, pad to RASTER_BLOCK, and compute
    the two-level block/superblock union bboxes (the binning pass, all on
    device).  ``compact=False`` skips the global stable sort for very large
    triangle counts — the superblock hierarchy already skips the dead
    fan-overflow tail because slot-major layout clusters it."""
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
    if compact:
        tri_i32, tri_f32 = g.compact_triangles(jnp, tri_i32, tri_f32)
    blocks = g.block_bounds(jnp, tri_i32)
    blocks, supers = g.super_bounds(jnp, blocks)
    return supers, blocks, tri_i32, tri_f32


# Above this triangle-slot count the setup arrays stay in HBM and the
# kernel DMAs overlapping blocks into VMEM scratch (they no longer fit in
# the ~16 MB of VMEM as whole-array inputs).
VMEM_RESIDENT_MAX_TRIS = 32768

# HBM DMA row-slices must span full 128-lane rows, so triangle records are
# PACKED into 128-lane rows: 4 int records x 32 lanes, 2 float records x
# 64 lanes.  The block DMA is then a legal 2D row-slice straight into VMEM
# scratch, whose scalar reads cost ~1.5 ns (the previous 1D-flatten-into-
# SMEM layout paid ~1-2 us of SMEM scalar reads PER TRIANGLE — the reason
# the 1M-triangle frame measured ~11 s).
I32_LANES = 32   # NI32=20 padded to 32 lanes; 4 records per (.,128) row
F32_LANES = 64   # NF32=40 padded to 64 lanes; 2 records per (.,128) row


def _hbm_kernel_body(sup_ref, blk_ref, ti_hbm, tf_hbm, color_ref, depth_ref,
                     zbuf, nr, ng, nb, den, ti_buf, tf_buf, dma_sems,
                     gbuf_refs=None, gbuf_scratch=None,
                     const_refs=None, const_scratch=None):
    """Large-scene variant: triangle setup stays in HBM as FLATTENED 1D
    arrays (HBM DMA slices need 128-aligned minor dims, so (T, 20) slabs
    cannot be sliced directly); blocks whose union bbox overlaps the tile
    are DMA'd into SMEM slabs (scalar reads from SMEM have no lane-alignment
    restrictions).  Block/superblock bbox tables are small and stay VMEM.
    With gbuf/const refs it additionally latches uv/normal interpolants and
    material constants — the G-buffer path for million-triangle scenes."""
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
    nr[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    ng[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    nb[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    den[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    for buf in (gbuf_scratch or ()) + (const_scratch or ()):
        buf[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)

    def tile_overlap(jmin, jmax, imin, imax):
        return (
            (jmax >= col0)
            & (jmin < col0 + TILE_W)
            & (imax >= row0)
            & (imin < row0 + TILE_H)
            & (jmin <= jmax)
            & (imin <= imax)
        )

    def tri_body(base4, u, overlap):
        # Packed-row indexing (see I32_LANES): u is a PYTHON int from the
        # unrolled loop, so the lane bases are static; only the row index
        # is dynamic (sublane dim — the supported one).
        ir = base4 + u // 4
        il = (u % 4) * I32_LANES
        fr2 = 2 * base4 + u // 2
        fl = (u % 2) * F32_LANES
        if True:  # overlap folds into the write mask below
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
            ef0 = e0.astype(jnp.float32)
            ef1 = e1.astype(jnp.float32)
            ef2 = e2.astype(jnp.float32)
            z = ef0 * tf_buf[fr2, fl + g.F_ZA0] + ef1 * tf_buf[fr2, fl + g.F_ZA1] \
                + ef2 * tf_buf[fr2, fl + g.F_ZA2]
            zb = zbuf[...]
            ok = cov & (z >= 0.0) & (z < zb) & overlap
            zbuf[...] = jnp.where(ok, z, zb)
            den[...] = jnp.where(
                ok,
                ef0 * tf_buf[fr2, fl + g.F_RW0] + ef1 * tf_buf[fr2, fl + g.F_RW1]
                + ef2 * tf_buf[fr2, fl + g.F_RW2],
                den[...],
            )
            nr[...] = jnp.where(
                ok,
                ef0 * tf_buf[fr2, fl + g.F_CR0] + ef1 * tf_buf[fr2, fl + g.F_CR1]
                + ef2 * tf_buf[fr2, fl + g.F_CR2],
                nr[...],
            )
            ng[...] = jnp.where(
                ok,
                ef0 * tf_buf[fr2, fl + g.F_CG0] + ef1 * tf_buf[fr2, fl + g.F_CG1]
                + ef2 * tf_buf[fr2, fl + g.F_CG2],
                ng[...],
            )
            nb[...] = jnp.where(
                ok,
                ef0 * tf_buf[fr2, fl + g.F_CB0] + ef1 * tf_buf[fr2, fl + g.F_CB1]
                + ef2 * tf_buf[fr2, fl + g.F_CB2],
                nb[...],
            )
            if gbuf_scratch is not None:
                for buf, c0 in zip(
                    gbuf_scratch,
                    (g.F_U0, g.F_V0, g.F_NX0, g.F_NY0, g.F_NZ0),
                ):
                    buf[...] = jnp.where(
                        ok,
                        ef0 * tf_buf[fr2, fl + c0] + ef1 * tf_buf[fr2, fl + c0 + 1]
                        + ef2 * tf_buf[fr2, fl + c0 + 2],
                        buf[...],
                    )
            if const_scratch is not None:
                for buf, col in zip(
                    const_scratch,
                    (g.F_MET, g.F_RGH, g.F_EMR, g.F_EMG, g.F_EMB, g.F_TEX),
                ):
                    buf[...] = jnp.where(ok, tf_buf[fr2, fl + col], buf[...])

    def block_hit(bk):
        return tile_overlap(
            blk_ref[bk, 0], blk_ref[bk, 1], blk_ref[bk, 2], blk_ref[bk, 3]
        )

    def visit_block(bk):
        # 2D row-slice DMAs of the packed triangle rows into VMEM scratch.
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

        # Group-branched unrolled loop (see _kernel_body): one branch
        # per TRI_UNROLL triangles, bbox bit folded into each write.
        # base4 = VMEM int-row of the group's first record (u//4 offsets
        # within the group are static, see tri_body).
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
                    tri_body(base4, u, hits[u])

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
        chan(nr[...]) | (chan(ng[...]) << 8) | (chan(nb[...]) << 16) | (a << 24)
    )
    depth_ref[...] = zbuf[...]
    if gbuf_refs is not None:
        inv_cov = jnp.where(covered, inv, jnp.float32(0.0))
        for ref, buf in zip(gbuf_refs, gbuf_scratch):
            ref[...] = buf[...] * inv_cov
    if const_refs is not None:
        for ref, buf in zip(const_refs, const_scratch):
            ref[...] = buf[...]


def _hbm_kernel(sup_ref, blk_ref, ti_hbm, tf_hbm, color_ref, depth_ref,
                zbuf, nr, ng, nb, den, ti_buf, tf_buf, dma_sems):
    _hbm_kernel_body(sup_ref, blk_ref, ti_hbm, tf_hbm, color_ref, depth_ref,
                     zbuf, nr, ng, nb, den, ti_buf, tf_buf, dma_sems)


def _hbm_gbuffer_kernel(sup_ref, blk_ref, ti_hbm, tf_hbm,
                        color_ref, depth_ref, u_ref, v_ref,
                        nx_ref, ny_ref, nz_ref,
                        met_ref, rgh_ref, emr_ref, emg_ref, emb_ref, tex_ref,
                        zbuf, nr, ng, nb, den,
                        nu, nv, nnx, nny, nnz,
                        smet, srgh, semr, semg, semb, stex,
                        ti_buf, tf_buf, dma_sems):
    """HBM-streaming G-buffer: lit/shadowed/deferred past the VMEM-resident
    triangle budget (VERDICT r1 item 5)."""
    _hbm_kernel_body(
        sup_ref, blk_ref, ti_hbm, tf_hbm, color_ref, depth_ref,
        zbuf, nr, ng, nb, den, ti_buf, tf_buf, dma_sems,
        gbuf_refs=(u_ref, v_ref, nx_ref, ny_ref, nz_ref),
        gbuf_scratch=(nu, nv, nnx, nny, nnz),
        const_refs=(met_ref, rgh_ref, emr_ref, emg_ref, emb_ref, tex_ref),
        const_scratch=(smet, srgh, semr, semg, semb, stex),
    )


def _hbm_flat_inputs(tri_i32, tri_f32):
    """Pack setup records into full 128-lane rows (4 int records x
    I32_LANES, 2 float records x F32_LANES) so block DMAs are legal 2D
    row-slices and in-kernel reads are fast VMEM scalars."""
    t = tri_i32.shape[0]
    ti = jnp.pad(tri_i32, ((0, 0), (0, I32_LANES - g.NI32)))
    tf = jnp.pad(tri_f32, ((0, 0), (0, F32_LANES - g.NF32)))
    return ti.reshape(t // 4, 4 * I32_LANES), tf.reshape(t // 2, 2 * F32_LANES)


_HBM_SLABS = [
    pltpu.VMEM((g.RASTER_BLOCK // 4, 128), jnp.int32),
    pltpu.VMEM((g.RASTER_BLOCK // 2, 128), jnp.float32),
    pltpu.SemaphoreType.DMA((2,)),
]


def rasterize_setup_pallas_hbm(tri_i32, tri_f32, width: int, height: int,
                               interpret: bool = False, compact: bool = True):
    """HBM-streaming raster for large triangle counts."""
    assert height % TILE_H == 0 and width % TILE_W == 0
    grid = (height // TILE_H, width // TILE_W)
    supers, blocks, tri_i32, tri_f32 = prepare_raster_inputs(
        tri_i32, tri_f32, compact=compact
    )

    color, depth = _pallas_call(
        _hbm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # supers
            pl.BlockSpec(memory_space=pltpu.VMEM),  # blocks
            pl.BlockSpec(memory_space=pl.ANY),  # ti in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # tf in HBM
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
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32) for _ in range(5)
        ] + list(_HBM_SLABS),
        interpret=interpret,
    )(supers, blocks, *_hbm_flat_inputs(tri_i32, tri_f32))
    return color, depth


# ---------------------------------------------------------------------------
# Short-triangle classification (shared with experiments + stats)
# ---------------------------------------------------------------------------

SHORT_ROWS = 8  # bbox row span (imax - imin + 1) <= SHORT_ROWS -> "short"



def _classify_short(xp, tri_i32):
    """Live rows whose bbox fits an 8-row window."""
    alive = tri_i32[:, g.I_VALID] > 0
    span = tri_i32[:, g.I_IMAX] - tri_i32[:, g.I_IMIN]
    return alive & (span < SHORT_ROWS)


def _kill_rows(xp, tri_i32, mask):
    """Empty the bbox (jmin > jmax) and clear I_VALID where ``mask`` —
    the rows vanish from block tables and per-triangle bbox tests while
    staying in place (no record movement)."""
    ti = tri_i32
    ti = ti.at[:, g.I_JMIN].set(xp.where(mask, 1, ti[:, g.I_JMIN]))
    ti = ti.at[:, g.I_JMAX].set(xp.where(mask, 0, ti[:, g.I_JMAX]))
    ti = ti.at[:, g.I_VALID].set(xp.where(mask, 0, ti[:, g.I_VALID]))
    return ti



# The two-class windowed kernel (hbm2) measured 0.58x at 1M (slower) and
# lives in ops/experiments/raster_hbm2.py; see the A/B table in
# docs/PERFORMANCE.md.


# ---------------------------------------------------------------------------
# The visibility-buffer split and transposed-group kernels (both measured
# slower at 1M: 377-580 ms and ~557 ms vs 336 ms) live in
# ops/experiments/raster_vis_trans.py.
# ---------------------------------------------------------------------------




def rasterize_gbuffer_pallas_hbm(tri_i32, tri_f32, width: int, height: int,
                                 interpret: bool = False,
                                 compact: bool = True):
    """HBM-streaming G-buffer raster — same outputs as
    rasterize_gbuffer_pallas, for scenes past the VMEM triangle budget."""
    assert height % TILE_H == 0 and width % TILE_W == 0
    grid = (height // TILE_H, width // TILE_W)
    supers, blocks, tri_i32, tri_f32 = prepare_raster_inputs(
        tri_i32, tri_f32, compact=compact
    )

    plane = lambda dt: jax.ShapeDtypeStruct((height, width), dt)
    tile_spec = pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    outs = _pallas_call(
        _hbm_gbuffer_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[tile_spec] * 13,
        out_shape=[plane(jnp.uint32)] + [plane(jnp.float32)] * 12,
        scratch_shapes=[
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32) for _ in range(16)
        ] + list(_HBM_SLABS),
        interpret=interpret,
    )(supers, blocks, *_hbm_flat_inputs(tri_i32, tri_f32))
    return outs


def rasterize_setup_pallas(tri_i32, tri_f32, width: int, height: int,
                           interpret: bool = False, compact: bool = True):
    """Rasterize setup buffers from ops.geometry.

    tri_i32: (T, NI32) int32, tri_f32: (T, NF32) f32.  width/height must be
    multiples of (TILE_W, TILE_H); the engine pads the framebuffer and crops
    (viewport clamping in setup already restricts coverage to the true
    viewport).

    Returns (packed_rgba8 (H, W) uint32, depth (H, W) f32).
    """
    assert height % TILE_H == 0 and width % TILE_W == 0
    grid = (height // TILE_H, width // TILE_W)
    supers, blocks, tri_i32, tri_f32 = prepare_raster_inputs(
        tri_i32, tri_f32, compact=compact
    )

    color, depth = _pallas_call(
        _raster_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # (S, 8) superblock bboxes
            pl.BlockSpec(memory_space=pltpu.VMEM),  # (B, 8) block bboxes
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole (T, NI32)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole (T, NF32)
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
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),  # nr
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),  # ng
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),  # nb
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),  # den
        ],
        interpret=interpret,
    )(supers, blocks, tri_i32, tri_f32)
    return color, depth


def _depth_kernel(sup_ref, blk_ref, ti_ref, tf_ref, depth_ref, zbuf):
    """Depth-only tile raster — the shadow-map pass (zd3d12's depth-only
    PSO analog).  Identical traversal/coverage/z semantics to
    _kernel_body, but the per-visit work is the edge tests + z latch
    alone: no attribute interpolation, no perspective divide, no u8
    packing — about half the per-(tile, triangle) cost of the flat
    kernel, on the pass the shadowed pipeline runs every frame."""
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
                     block_hit, visit_block)

    def block_hit(bk):
        return tile_overlap(
            blk_ref[bk, 0], blk_ref[bk, 1], blk_ref[bk, 2], blk_ref[bk, 3]
        )

    def visit_block(bk):
        tu = _tri_unroll()

        def unrolled(q, c2):
            base = q * tu
            hits = [
                tile_overlap(
                    ti_ref[base + u, g.I_JMIN],
                    ti_ref[base + u, g.I_JMAX],
                    ti_ref[base + u, g.I_IMIN],
                    ti_ref[base + u, g.I_IMAX],
                )
                for u in range(tu)
            ]
            any_hit = hits[0]
            for hb in hits[1:]:
                any_hit = any_hit | hb

            @pl.when(any_hit)
            def _():
                for u in range(tu):
                    body(base + u, hits[u])

            return c2

        jax.lax.fori_loop(
            bk * (g.RASTER_BLOCK // tu),
            (bk + 1) * (g.RASTER_BLOCK // tu), unrolled, 0
        )

    def body(t, overlap):
        e0 = ti_ref[t, g.I_DX0] * (py - ti_ref[t, g.I_Y1]) \
            - ti_ref[t, g.I_DY0] * (px - ti_ref[t, g.I_X1])
        e1 = ti_ref[t, g.I_DX1] * (py - ti_ref[t, g.I_Y2]) \
            - ti_ref[t, g.I_DY1] * (px - ti_ref[t, g.I_X2])
        e2 = ti_ref[t, g.I_DX2] * (py - ti_ref[t, g.I_Y0]) \
            - ti_ref[t, g.I_DY2] * (px - ti_ref[t, g.I_X0])
        cov = (
            (e0 >= ti_ref[t, g.I_BIAS0])
            & (e1 >= ti_ref[t, g.I_BIAS1])
            & (e2 >= ti_ref[t, g.I_BIAS2])
        )
        z = (e0.astype(jnp.float32) * tf_ref[t, g.F_ZA0]
             + e1.astype(jnp.float32) * tf_ref[t, g.F_ZA1]
             + e2.astype(jnp.float32) * tf_ref[t, g.F_ZA2])
        zb = zbuf[...]
        ok = cov & (z >= 0.0) & (z < zb) & overlap
        zbuf[...] = jnp.where(ok, z, zb)

    _scan_groups(0, sup_ref.shape[0], super_hit, visit_super)
    depth_ref[...] = zbuf[...]


def rasterize_depth_pallas(tri_i32, tri_f32, width: int, height: int,
                           interpret: bool = False, compact: bool = True):
    """Depth-only raster (shadow-map pass).  Returns (H, W) f32 depth,
    bit-identical to rasterize_setup_pallas's depth plane."""
    assert height % TILE_H == 0 and width % TILE_W == 0
    grid = (height // TILE_H, width // TILE_W)
    supers, blocks, tri_i32, tri_f32 = prepare_raster_inputs(
        tri_i32, tri_f32, compact=compact
    )

    (depth,) = _pallas_call(
        _depth_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((height, width), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((TILE_H, TILE_W), jnp.float32)],
        interpret=interpret,
    )(supers, blocks, tri_i32, tri_f32)
    return depth


def render_depth_pallas(positions, attrs, tri_vidx, matrices, node_ids,
                        width: int, height: int,
                        interpret: bool = False, vertex_shader=None,
                        binning: str = "auto"):
    """Geometry pipeline + depth-only raster (the shadow-map pass).
    width/height must be tile multiples (shadow maps are pow2).  Scenes
    past the VMEM triangle budget fall back to the HBM-streaming kernel
    (which also produces depth)."""
    tri_i32, tri_f32 = g.geometry_pipeline(
        jnp, positions, attrs, tri_vidx, matrices, node_ids, width, height,
        vertex_shader=vertex_shader,
    )
    if _use_tile_lists(binning, tri_i32.shape[0]):
        raster_depth = (
            rasterize_depth_pallas_binned_hbm
            if tri_i32.shape[0] > VMEM_RESIDENT_MAX_TRIS
            else rasterize_depth_pallas_binned
        )
        return raster_depth(
            tri_i32, tri_f32, width, height, interpret=interpret
        )
    if tri_i32.shape[0] > VMEM_RESIDENT_MAX_TRIS:
        # Large-scene default: streaming binned depth (the flat and
        # G-buffer variants measured 2.82x / 2.25x over the hierarchy
        # at 1M; binning='hierarchy' keeps the old path).
        if binning != "hierarchy":
            return rasterize_depth_pallas_binned_hbm(
                tri_i32, tri_f32, width, height, interpret=interpret
            )
        _, depth = rasterize_setup_pallas_hbm(
            tri_i32, tri_f32, width, height, interpret=interpret
        )
        return depth
    if _use_small_bins(binning, tri_i32.shape[0]):
        return rasterize_depth_pallas_small(
            tri_i32, tri_f32, width, height, interpret=interpret
        )
    return rasterize_depth_pallas(
        tri_i32, tri_f32, width, height, interpret=interpret
    )


def _band_kernel(row0_ref, sup_ref, blk_ref, ti_ref, tf_ref, color_ref,
                 depth_ref, zbuf, nr, ng, nb, den):
    """Band variant for multi-chip tile sharding: identical to
    _raster_kernel but pixel rows are offset by a per-device scalar
    (the device's band start row) prefetched into SMEM."""
    _kernel_body(sup_ref, blk_ref, ti_ref, tf_ref, color_ref, depth_ref,
                 zbuf, nr, ng, nb, den, row_base=row0_ref[0])


def rasterize_setup_pallas_band(tri_i32, tri_f32, width: int, band_h: int,
                                row0, interpret: bool = False):
    """Rasterize a horizontal band starting at global row `row0` (traced
    scalar) — used inside shard_map for multi-chip tile sharding."""
    assert band_h % TILE_H == 0 and width % TILE_W == 0
    grid = (band_h // TILE_H, width // TILE_W)
    row0_arr = jnp.asarray(row0, jnp.int32).reshape(1)
    supers, blocks, tri_i32, tri_f32 = prepare_raster_inputs(tri_i32, tri_f32)

    color, depth = _pallas_call(
        _band_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((TILE_H, TILE_W), jnp.float32) for _ in range(5)
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((band_h, width), jnp.uint32),
            jax.ShapeDtypeStruct((band_h, width), jnp.float32),
        ],
        interpret=interpret,
    )(row0_arr, supers, blocks, tri_i32, tri_f32)
    return color, depth


def rasterize_gbuffer_pallas(tri_i32, tri_f32, width: int, height: int,
                             interpret: bool = False, compact: bool = True):
    """G-buffer raster: returns (color u32, depth, u, v, nx, ny, nz,
    metallic, roughness, emissive r/g/b, tex_layer) planes.

    color carries the resolved vertex-rgb (multiplied with the sampled
    texture at shade time); uv/normal/material planes feed ops/shading.py.
    """
    assert height % TILE_H == 0 and width % TILE_W == 0
    grid = (height // TILE_H, width // TILE_W)
    supers, blocks, tri_i32, tri_f32 = prepare_raster_inputs(
        tri_i32, tri_f32, compact=compact
    )

    plane = lambda dt: jax.ShapeDtypeStruct((height, width), dt)
    outs = _pallas_call(
        _gbuffer_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
        ] * 13,
        out_shape=[plane(jnp.uint32)] + [plane(jnp.float32)] * 12,
        scratch_shapes=[
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32) for _ in range(16)
        ],
        interpret=interpret,
    )(supers, blocks, tri_i32, tri_f32)
    return outs  # color, depth, u, v, nx, ny, nz, met, rgh, em r/g/b, tex


def render_gbuffer_pallas(positions, attrs, tri_vidx, matrices, node_ids,
                          normal_matrices,
                          width: int, height: int,
                          pad_height: int, pad_width: int,
                          interpret: bool = False, material_table=None,
                          vertex_shader=None, binning: str = "auto"):
    """Geometry pipeline + G-buffer raster; crops to the true viewport."""
    tri_i32, tri_f32 = g.geometry_pipeline(
        jnp, positions, attrs, tri_vidx, matrices, node_ids, width, height,
        normal_matrices=normal_matrices, material_table=material_table,
        vertex_shader=vertex_shader,
    )
    if _use_tile_lists(binning, tri_i32.shape[0]):
        raster = (
            rasterize_gbuffer_pallas_binned_hbm
            if tri_i32.shape[0] > VMEM_RESIDENT_MAX_TRIS
            else rasterize_gbuffer_pallas_binned
        )
    elif tri_i32.shape[0] > VMEM_RESIDENT_MAX_TRIS:
        # Large-scene default: record-streaming binned G-buffer —
        # 155.9 vs the hierarchy's 351.2 ms at 1M (2.25x, bit-equal,
        # benchmarks/binned_ab.py --gbuffer, v5e 2026-08-21).
        raster = (
            rasterize_gbuffer_pallas_hbm
            if binning == "hierarchy"
            else rasterize_gbuffer_pallas_binned_hbm
        )
    elif _use_small_bins(binning, tri_i32.shape[0]):
        raster = rasterize_gbuffer_pallas_small
    else:
        raster = rasterize_gbuffer_pallas
    outs = raster(
        tri_i32, tri_f32, pad_width, pad_height, interpret=interpret
    )
    return [o[:height, :width] for o in outs]


# ---------------------------------------------------------------------------
# Per-tile triangle lists (real sort-by-tile binning) — VERDICT r1 item 4
# ---------------------------------------------------------------------------
# The hierarchy path scans every triangle past every tile it might touch;
# for dense, high-overlap scenes (triangle soup concentrated on screen) the
# hot tiles still pay O(T).  The binned path builds per-tile triangle lists
# on device each frame (the CuRast sort-by-tile structure, PAPERS.md):
#
#  1. unclipped (fan-slot-0) triangles whose tile FOOTPRINT (bbox tile
#     count ntx*nty, any aspect ratio) fits ``cap`` pair slots emit one
#     (tile, triangle) pair per covered tile;
#  2. one stable argsort by tile id groups the pairs; searchsorted gives
#     per-tile offsets;
#  3. the kernel loops ONLY its own list (scalar-prefetched offsets) plus
#     the leftovers (clipped / cap-exceeding triangles) through the
#     existing block/superblock hierarchy.
#
# Processing order is no longer submission order, so the kernel breaks
# exact depth ties by triangle id (row index) — equivalent to the
# sequential strict-less rule (first-submitted minimal-z wins), keeping the
# oracle contract bit-exact.

def _use_tile_lists(binning: str, rows: int) -> bool:
    # Explicit only: the pair-argsort prep (~1.1 ms at 32K pairs) makes
    # this a loss for small scenes ("auto" uses the sort-free small-bin
    # path there instead, see prepare_binned_small) — tile_lists is the
    # right explicit choice for dense unordered soups past the small-bin
    # bound, where hot tiles otherwise scan most of the triangle list.
    return binning == "tile_lists"


# HBM list streaming: pair lists DMA into SMEM in LIST_CHUNK slices at
# 1024-aligned bases (1-D HBM slicing constraint, see _hbm_kernel_body).
LIST_CHUNK = 2048

BIN_CAP = 16  # default pair slots per listed triangle (bbox tile count)
# Static total-pair budget that auto-sizes ``cap``: pairs = n_input * cap
# trade prepare-sort time against leftover-hierarchy scans in the kernel.
BIN_PAIR_BUDGET = 1 << 20

_INT_MAX = jnp.iinfo(jnp.int32).max


def bin_cap_for(n_rows: int) -> int:
    """Auto cap: generous for small scenes (the 120-triangle demo's cube
    faces span up to ~170 tiles at 1080p and should all be listed — a
    leftover big triangle re-engages the per-tile block scan the lists
    exist to avoid), bounded by the pair budget for large ones."""
    return int(max(4, min(256, BIN_PAIR_BUDGET // max(n_rows, 1))))


def prepare_binned_inputs(tri_i32, tri_f32, width: int, height: int,
                          cap: int | None = None):
    """Device-side bin build.  Returns (offsets, pair_tri, supers, blocks,
    ti, tf) — offsets (NUM_TILES+1,) i32, pair_tri (P, 1) i32 row ids
    grouped by tile (ascending id within a tile)."""
    tiles_x = width // TILE_W
    tiles_y = height // TILE_H
    num_tiles = tiles_x * tiles_y
    if cap is None:
        cap = bin_cap_for(g.head_count(tri_i32.shape[0]))

    n_input = g.head_count(tri_i32.shape[0])  # leading slot-0 rows
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

    head = tri_i32[:n_input]
    valid = head[:, g.I_VALID] > 0
    tj0 = head[:, g.I_JMIN] // TILE_W
    tj1 = head[:, g.I_JMAX] // TILE_W
    ty0 = head[:, g.I_IMIN] // TILE_H
    ty1 = head[:, g.I_IMAX] // TILE_H
    ntx = tj1 - tj0 + 1
    nty = ty1 - ty0 + 1
    foot = ntx * nty  # bbox tile footprint (any aspect ratio)
    listed = valid & (foot <= cap)

    # Pairs, t-major so the stable sort keeps ascending ids per tile.
    # Slot e enumerates the bbox row-major: (dy, dx) = divmod(e, ntx) —
    # per-triangle dynamic, so a 1xN or Nx1 footprint uses all ``cap``
    # slots, not just a fixed window.
    keys = []
    for e in range(cap):
        dx = e % ntx
        dy = e // ntx
        pvalid = listed & (e < foot)
        keys.append(
            jnp.where(pvalid, (ty0 + dy) * tiles_x + (tj0 + dx), num_tiles)
        )
    keys = jnp.stack(keys, axis=1).reshape(-1)  # (n_input * cap,)
    pair_tri = jnp.repeat(jnp.arange(n_input, dtype=jnp.int32), cap)
    order = jnp.argsort(keys, stable=True)
    sorted_keys = keys[order]
    sorted_tri = pair_tri[order]
    offsets = jnp.searchsorted(
        sorted_keys, jnp.arange(num_tiles + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    # Flat 1-D for the kernel's HBM chunk streaming: pad to a 1024
    # multiple plus one extra LIST_CHUNK so the last aligned DMA window
    # never reads past the array (pad entries sit beyond every offset).
    pad_p = (-sorted_tri.shape[0]) % 1024 + LIST_CHUNK
    sorted_tri = jnp.concatenate(
        [sorted_tri, jnp.zeros(pad_p, jnp.int32)]
    )

    # Hierarchy over the leftovers: empty the listed rows' bboxes so the
    # block/superblock tables skip them.
    row_listed = jnp.concatenate(
        [listed, jnp.zeros(tri_i32.shape[0] - n_input, bool)]
    )
    hier = tri_i32
    hier = hier.at[:, g.I_JMIN].set(jnp.where(row_listed, 1, hier[:, g.I_JMIN]))
    hier = hier.at[:, g.I_JMAX].set(jnp.where(row_listed, 0, hier[:, g.I_JMAX]))
    hier = hier.at[:, g.I_VALID].set(
        jnp.where(row_listed, 0, hier[:, g.I_VALID])
    )
    blocks = g.block_bounds(jnp, hier)
    blocks, supers = g.super_bounds(jnp, blocks)
    # The kernel reads `hier` (listed rows' bboxes emptied) so the phase-2
    # per-triangle bbox test skips everything the lists own; the edge /
    # interpolation columns are untouched, so the list loop shares it.
    return offsets, sorted_tri, supers, blocks, hier, tri_f32


def _binned_body(offs_ref, sup_ref, blk_ref, list_ref, ti_ref, tf_ref,
                 color_ref, depth_ref, zbuf, tidbuf, nr, ng, nb, den,
                 gbuf_refs=None, gbuf_scratch=None,
                 const_refs=None, const_scratch=None,
                 depth_only=False, local_lists=False,
                 list_smem=None, list_sem=None):
    tile_i = pl.program_id(0)
    tile_j = pl.program_id(1)
    tiles_x = pl.num_programs(1)
    row0 = tile_i * TILE_H
    col0 = tile_j * TILE_W

    half = g.SUBPIXEL // 2
    iy = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    py = (row0 + iy) * g.SUBPIXEL + half
    px = (col0 + ix) * g.SUBPIXEL + half

    zbuf[...] = jnp.full((TILE_H, TILE_W), 1.0, jnp.float32)
    if not depth_only:
        tidbuf[...] = jnp.full((TILE_H, TILE_W), _INT_MAX, jnp.int32)
        nr[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        ng[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        nb[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        den[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    for buf in (gbuf_scratch or ()) + (const_scratch or ()):
        buf[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)

    def eval_triangle(t, emask=True):
        """Coverage + z-test with id tie-break (order-free semantics).
        ``emask``: scalar bool folded into the write mask (group-branched
        leftover loop passes the triangle's bbox-vs-tile bit).  The
        depth-only variant skips the id plane: on an exact z tie every
        candidate writes the same depth, so the tie-break cannot change
        the output (matches _depth_kernel's sequential strict-less)."""
        e0 = ti_ref[t, g.I_DX0] * (py - ti_ref[t, g.I_Y1]) - \
             ti_ref[t, g.I_DY0] * (px - ti_ref[t, g.I_X1])
        e1 = ti_ref[t, g.I_DX1] * (py - ti_ref[t, g.I_Y2]) - \
             ti_ref[t, g.I_DY1] * (px - ti_ref[t, g.I_X2])
        e2 = ti_ref[t, g.I_DX2] * (py - ti_ref[t, g.I_Y0]) - \
             ti_ref[t, g.I_DY2] * (px - ti_ref[t, g.I_X0])
        cov = (
            (e0 >= ti_ref[t, g.I_BIAS0])
            & (e1 >= ti_ref[t, g.I_BIAS1])
            & (e2 >= ti_ref[t, g.I_BIAS2])
        )
        ef0 = e0.astype(jnp.float32)
        ef1 = e1.astype(jnp.float32)
        ef2 = e2.astype(jnp.float32)
        z = ef0 * tf_ref[t, g.F_ZA0] + ef1 * tf_ref[t, g.F_ZA1] \
            + ef2 * tf_ref[t, g.F_ZA2]
        zb = zbuf[...]
        if depth_only:
            ok = cov & (z >= 0.0) & (z < zb) & emask
            zbuf[...] = jnp.where(ok, z, zb)
            return
        tb = tidbuf[...]
        ok = cov & (z >= 0.0) & ((z < zb) | ((z == zb) & (t < tb))) & emask
        zbuf[...] = jnp.where(ok, z, zb)
        tidbuf[...] = jnp.where(ok, t, tb)

        def latch(buf, c0):
            buf[...] = jnp.where(
                ok,
                ef0 * tf_ref[t, c0] + ef1 * tf_ref[t, c0 + 1]
                + ef2 * tf_ref[t, c0 + 2],
                buf[...],
            )

        latch(den, g.F_RW0)
        latch(nr, g.F_CR0)
        latch(ng, g.F_CG0)
        latch(nb, g.F_CB0)
        if gbuf_scratch is not None:
            for buf, c0 in zip(
                gbuf_scratch,
                (g.F_U0, g.F_V0, g.F_NX0, g.F_NY0, g.F_NZ0),
            ):
                latch(buf, c0)
        if const_scratch is not None:
            for buf, col in zip(
                const_scratch,
                (g.F_MET, g.F_RGH, g.F_EMR, g.F_EMG, g.F_EMB, g.F_TEX),
            ):
                buf[...] = jnp.where(ok, tf_ref[t, col], buf[...])

    # Phase 1: this tile's own triangle list.
    # local_lists=False: one flat list, shared boundaries (sorted-pair
    #   layout): span = offs[t] .. offs[t+1].
    # local_lists=True: list_ref is a PER-TILE block (the sort-free
    #   small-scene prep, prepare_binned_small): span = 0 .. counts[t].
    #   The per-tile BlockSpec slice keeps VMEM at one (n_head, 1) block
    #   instead of the whole (tiles*n_head, 1) array, whose 1->128 lane
    #   padding would otherwise need tens of MB of VMEM.
    tile_lin = tile_i * tiles_x + tile_j
    tu = _tri_unroll()
    if local_lists:
        start = 0
        end = offs_ref[tile_lin]
    else:
        start = offs_ref[tile_lin]
        end = offs_ref[tile_lin + 1]

    if list_smem is None:
        # Lists resident in VMEM (local_lists per-tile blocks).
        def list_body(k, carry):
            eval_triangle(list_ref[k, 0])
            return carry

        # Unrolled main span + scalar tail (see TRI_UNROLL): whole
        # K-groups first, then the < K remainder one at a time.
        n = end - start

        def list_unrolled(q, c2):
            base = start + q * tu
            for u in range(tu):
                list_body(base + u, 0)
            return c2

        jax.lax.fori_loop(0, n // tu, list_unrolled, 0)
        jax.lax.fori_loop(start + (n // tu) * tu, end, list_body, 0)
    else:
        # Lists stream from HBM: list_ref is the flat 1-D pair array
        # (1024-multiple length; whole-array VMEM residency would
        # lane-pad (P, 1) by 128x — 533 MB at the 1M-pair budget).  A
        # tile's span is CONTIGUOUS (pairs sorted by tile), so it DMAs
        # in LIST_CHUNK slices at 1024-aligned bases into SMEM (scalar
        # reads from SMEM have no lane restrictions), ~8 KB per chunk
        # amortized over up to 2048 triangle evaluations.
        def chunk_step(done):
            base = (done // 1024) * 1024
            cp = pltpu.make_async_copy(
                list_ref.at[pl.ds(base, LIST_CHUNK)], list_smem, list_sem
            )
            cp.start()
            cp.wait()
            lo = done - base
            hi = jnp.minimum(end - base, LIST_CHUNK)

            def body(k, c):
                eval_triangle(list_smem[k])
                return c

            def unrolled(q, c2):
                b2 = lo + q * tu
                for u in range(tu):
                    body(b2 + u, 0)
                return c2

            n2 = hi - lo
            jax.lax.fori_loop(0, n2 // tu, unrolled, 0)
            jax.lax.fori_loop(lo + (n2 // tu) * tu, hi, body, 0)
            return base + hi

        jax.lax.while_loop(
            lambda done: done < end, chunk_step, start
        )

    # Phase 2: leftovers (clipped fans, window-exceeding triangles) through
    # the block/superblock hierarchy.
    def tile_overlap(jmin, jmax, imin, imax):
        return (
            (jmax >= col0)
            & (jmin < col0 + TILE_W)
            & (imax >= row0)
            & (imin < row0 + TILE_H)
            & (jmin <= jmax)
            & (imin <= imax)
        )

    def block_hit(bk):
        return tile_overlap(
            blk_ref[bk, 0], blk_ref[bk, 1], blk_ref[bk, 2], blk_ref[bk, 3]
        )

    def visit_block(bk):
        # Group-branched unrolled loop (see _kernel_body).
        def unrolled(q, c2):
            base = bk * g.RASTER_BLOCK + q * tu
            hits = [
                tile_overlap(
                    ti_ref[base + u, g.I_JMIN],
                    ti_ref[base + u, g.I_JMAX],
                    ti_ref[base + u, g.I_IMIN],
                    ti_ref[base + u, g.I_IMAX],
                )
                for u in range(tu)
            ]
            any_hit = hits[0]
            for hb in hits[1:]:
                any_hit = any_hit | hb

            @pl.when(any_hit)
            def _():
                for u in range(tu):
                    eval_triangle(base + u, hits[u])

            return c2

        jax.lax.fori_loop(0, g.RASTER_BLOCK // tu, unrolled, 0)

    def super_hit(sb):
        return tile_overlap(
            sup_ref[sb, 0], sup_ref[sb, 1], sup_ref[sb, 2], sup_ref[sb, 3]
        )

    def visit_super(sb):
        _scan_groups(sb * g.SUPER_BLOCK, (sb + 1) * g.SUPER_BLOCK,
                     block_hit, visit_block)

    _scan_groups(0, sup_ref.shape[0], super_hit, visit_super)

    if depth_only:
        depth_ref[...] = zbuf[...]
        return

    # Resolve (identical to _kernel_body's epilogue).
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
    if gbuf_refs is not None:
        inv_cov = jnp.where(covered, inv, jnp.float32(0.0))
        for ref, buf in zip(gbuf_refs, gbuf_scratch):
            ref[...] = buf[...] * inv_cov
    if const_refs is not None:
        for ref, buf in zip(const_refs, const_scratch):
            ref[...] = buf[...]  # constants latched directly, no 1/w


def _binned_kernel(offs_ref, sup_ref, blk_ref, list_ref, ti_ref, tf_ref,
                   color_ref, depth_ref, zbuf, tidbuf, nr, ng, nb, den,
                   list_smem=None, list_sem=None, local_lists=False):
    _binned_body(offs_ref, sup_ref, blk_ref, list_ref, ti_ref, tf_ref,
                 color_ref, depth_ref, zbuf, tidbuf, nr, ng, nb, den,
                 local_lists=local_lists,
                 list_smem=list_smem, list_sem=list_sem)


def _binned_gbuffer_kernel(offs_ref, sup_ref, blk_ref, list_ref, ti_ref,
                           tf_ref, color_ref, depth_ref, u_ref, v_ref,
                           nx_ref, ny_ref, nz_ref,
                           met_ref, rgh_ref, emr_ref, emg_ref, emb_ref,
                           tex_ref, zbuf, tidbuf, nr, ng, nb, den,
                           nu, nv, nnx, nny, nnz,
                           smet, srgh, semr, semg, semb, stex,
                           list_smem=None, list_sem=None,
                           local_lists=False):
    _binned_body(offs_ref, sup_ref, blk_ref, list_ref, ti_ref, tf_ref,
                 color_ref, depth_ref, zbuf, tidbuf, nr, ng, nb, den,
                 gbuf_refs=(u_ref, v_ref, nx_ref, ny_ref, nz_ref),
                 gbuf_scratch=(nu, nv, nnx, nny, nnz),
                 const_refs=(met_ref, rgh_ref, emr_ref, emg_ref, emb_ref,
                             tex_ref),
                 const_scratch=(smet, srgh, semr, semg, semb, stex),
                 local_lists=local_lists,
                 list_smem=list_smem, list_sem=list_sem)


def _binned_depth_kernel(offs_ref, sup_ref, blk_ref, list_ref, ti_ref,
                         tf_ref, depth_ref, zbuf,
                         list_smem=None, list_sem=None, local_lists=False):
    _binned_body(offs_ref, sup_ref, blk_ref, list_ref, ti_ref, tf_ref,
                 None, depth_ref, zbuf, None, None, None, None, None,
                 depth_only=True, local_lists=local_lists,
                 list_smem=list_smem, list_sem=list_sem)


def _binned_grid_spec(grid, num_outs, extra_scratch):
    tile_spec = pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j),
                             memory_space=pltpu.VMEM)
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # offsets -> SMEM
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # supers
            pl.BlockSpec(memory_space=pltpu.VMEM),  # blocks (hier)
            pl.BlockSpec(memory_space=pl.ANY),  # flat pair list (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ti (full rows)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tf
        ],
        out_specs=[tile_spec] * num_outs,
        scratch_shapes=extra_scratch + [
            pltpu.SMEM((LIST_CHUNK,), jnp.int32),  # list chunk
            pltpu.SemaphoreType.DMA,
        ],
    )


def rasterize_setup_pallas_binned(tri_i32, tri_f32, width: int, height: int,
                                  interpret: bool = False,
                                  cap: int | None = None):
    """Per-tile-list raster: each tile loops only its own triangles.

    Wins whenever per-tile work is dominated by scanning triangles that do
    not touch the tile — dense high-overlap soups AND small scenes whose
    single 128-slot block otherwise scans past every covered tile.
    Bit-exact with the oracle (id tie-break == sequential LESS).
    """
    assert height % TILE_H == 0 and width % TILE_W == 0
    grid = (height // TILE_H, width // TILE_W)
    offsets, pair_tri, supers, blocks, ti, tf = prepare_binned_inputs(
        tri_i32, tri_f32, width, height, cap=cap
    )

    color, depth = _pallas_call(
        _binned_kernel,
        grid_spec=_binned_grid_spec(
            grid, 2,
            [
                pltpu.VMEM((TILE_H, TILE_W), jnp.float32),  # zbuf
                pltpu.VMEM((TILE_H, TILE_W), jnp.int32),  # tidbuf
            ] + [pltpu.VMEM((TILE_H, TILE_W), jnp.float32) for _ in range(4)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((height, width), jnp.uint32),
            jax.ShapeDtypeStruct((height, width), jnp.float32),
        ],
        interpret=interpret,
    )(offsets, supers, blocks, pair_tri, ti, tf)
    return color, depth


def rasterize_gbuffer_pallas_binned(tri_i32, tri_f32, width: int,
                                    height: int, interpret: bool = False,
                                    cap: int | None = None):
    """Per-tile-list G-buffer raster — same 13 output planes as
    rasterize_gbuffer_pallas, with the binned traversal (id tie-break)."""
    assert height % TILE_H == 0 and width % TILE_W == 0
    grid = (height // TILE_H, width // TILE_W)
    offsets, pair_tri, supers, blocks, ti, tf = prepare_binned_inputs(
        tri_i32, tri_f32, width, height, cap=cap
    )

    plane = lambda dt: jax.ShapeDtypeStruct((height, width), dt)
    outs = _pallas_call(
        _binned_gbuffer_kernel,
        grid_spec=_binned_grid_spec(
            grid, 13,
            [
                pltpu.VMEM((TILE_H, TILE_W), jnp.float32),  # zbuf
                pltpu.VMEM((TILE_H, TILE_W), jnp.int32),  # tidbuf
            ] + [pltpu.VMEM((TILE_H, TILE_W), jnp.float32)
                 for _ in range(15)],
        ),
        out_shape=[plane(jnp.uint32)] + [plane(jnp.float32)] * 12,
        interpret=interpret,
    )(offsets, supers, blocks, pair_tri, ti, tf)
    return outs


def rasterize_depth_pallas_binned(tri_i32, tri_f32, width: int, height: int,
                                  interpret: bool = False,
                                  cap: int | None = None):
    """Per-tile-list depth-only raster (shadow-map pass), bit-identical to
    rasterize_depth_pallas."""
    assert height % TILE_H == 0 and width % TILE_W == 0
    grid = (height // TILE_H, width // TILE_W)
    offsets, pair_tri, supers, blocks, ti, tf = prepare_binned_inputs(
        tri_i32, tri_f32, width, height, cap=cap
    )

    (depth,) = _pallas_call(
        _binned_depth_kernel,
        grid_spec=_binned_grid_spec(
            grid, 1, [pltpu.VMEM((TILE_H, TILE_W), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((height, width), jnp.float32)],
        interpret=interpret,
    )(offsets, supers, blocks, pair_tri, ti, tf)
    return depth


# ---------------------------------------------------------------------------
# HBM-scale per-tile lists: pair-ordered record streaming
# ---------------------------------------------------------------------------
# The VMEM-resident binned kernel above cannot COMPILE past
# VMEM_RESIDENT_MAX_TRIS (ti/tf as whole-VMEM operands are ~26 MB at 100K
# rows — the round-4 soup runs OOM'd at 100K and 1M).  This variant makes
# tile_lists work at any scale by changing WHAT streams: instead of pair
# INDICES into VMEM-resident triangle arrays, the prepare gathers each
# pair's full setup record into a PAIR-ORDERED packed array (4 int records
# per 128-lane row / 2 float records per row — the _hbm_flat_inputs
# layout, plus the triangle id in spare lane L_PID for the tie-break).  A
# tile's span is contiguous after the sort, so the kernel DMAs sequential
# (REC_CHUNK-record) slabs from HBM and pays ZERO bbox tests in the list
# phase — every streamed record is a guaranteed bbox hit.  Leftovers
# (clipped fans, cap-exceeding footprints) go through the standard HBM
# block hierarchy with the same (z, id) tie-break.
#
# Because the kernel breaks exact depth ties by triangle id (order-free
# semantics, same contract as the VMEM binned kernel), the pair sort
# needs NO stability: pairs sort as packed VALUES (tile_key << idx_bits |
# pair_idx, unique), which on TPU avoids the argsort's index gather.

REC_CHUNK = 512   # records per streamed slab (i-slab 128 rows, f-slab 256)
REC_ALIGN = 256   # slab base alignment in records (8-sublane-safe rows)
L_PID = g.NI32    # spare int lane carrying the triangle id (tie-break)
# Static record-slot budget for the pair-ordered gather: the gather pays
# per STATIC row (measured 15.1 ms per 1M 512-B rows, 46.2 ms at 4M —
# benchmarks/sort_scale_probe.py), so the prepare gathers only this many
# sorted slots and exactly demotes overflow triangles to the hierarchy
# via a prefix-sum clamp (valid pairs sort to the front; sentinels never
# need records).
HBM_PAIR_BUDGET = 1 << 20


def band_pair_budget(n_bands: int) -> int:
    """Per-band static pair budget for the band-local prepare: the
    full-frame budget split across bands with 2x headroom for density
    imbalance.  The record gather pays per STATIC row (measured,
    benchmarks/sort_scale_probe.py), so an unshrunk budget forfeits the
    band-local gather win entirely (benchmarks/band_prepare_ab.py)."""
    return max(2 * HBM_PAIR_BUDGET // max(n_bands, 1), 1 << 16)


def _pair_value_sort(keys, cap: int, num_tiles: int, force: str | None = None):
    """Sort (tile, pair) keys as VALUES — no stable argsort, no index
    gather (the kernel's (z, id) tie-break makes within-tile order free).
    Returns (sorted_tri, offsets): pair-ordered head-row ids and the
    (num_tiles+1,) span boundaries.

    Fast path packs (key << idx_bits | pair_idx) into one i32 (5.8-10.3 ms
    at 1M-4M pairs, benchmarks/sort_scale_probe.py).  Past i32 capacity
    (e.g. >4M pairs at 1080p's 510 tiles, or large shadow-map tile grids)
    it switches to a two-operand lexicographic lax.sort — still a value
    sort with a (keys, idx) key pair, NOT the argsort+gather the pair
    design exists to avoid."""
    p0 = keys.shape[0]
    idx_bits = max(1, (p0 - 1).bit_length())
    use_packed = (num_tiles + 1) << idx_bits <= 2**31
    if force is not None:  # branch override for parity tests
        use_packed = force == "packed"
    if use_packed:
        packed = (keys << idx_bits) | jnp.arange(p0, dtype=jnp.int32)
        sp = jnp.sort(packed)
        sorted_tri = (sp & ((1 << idx_bits) - 1)) // cap
        offsets = jnp.searchsorted(
            sp, (jnp.arange(num_tiles + 1, dtype=jnp.int32) << idx_bits)
        ).astype(jnp.int32)
    else:
        idx = jnp.arange(p0, dtype=jnp.int32)
        sorted_keys, sorted_idx = jax.lax.sort((keys, idx), num_keys=2)
        sorted_tri = sorted_idx // cap
        offsets = jnp.searchsorted(
            sorted_keys, jnp.arange(num_tiles + 1, dtype=jnp.int32)
        ).astype(jnp.int32)
    return sorted_tri, offsets


def prepare_binned_hbm_inputs(tri_i32, tri_f32, width: int, height: int,
                              cap: int | None = None,
                              pair_budget: int | None = None,
                              n_head: int | None = None,
                              band_ty0=None, band_tiles_y: int | None = None,
                              coarse_cap: int | None = None,
                              coarse_budget: int | None = None,
                              coarse_cb: int = 4):
    """Pair build + value-sort + record gather for the streaming binned
    kernel.  Returns (offsets, prec_i, prec_f, supers, blocks, hti, htf):
    offsets (NUM_TILES+1,) i32 span boundaries in RECORDS; prec_i
    (P//4, 128) i32 / prec_f (P//2, 128) f32 pair-ordered packed records;
    hti/htf the leftover hierarchy's packed HBM rows.

    ``n_head``: count of leading head (slot-0) rows.  Defaults to
    inverting the single-device capped layout (geometry.head_count);
    callers with a DIFFERENT layout — the multi-chip paths, whose
    all-gathered rows are ``n_shards * capped_rows(shard_tris)`` and do
    NOT invert as one device's ``capped_rows(T)`` — must pass the true
    statically-known head count (parallel/tiles.py does).

    ``band_ty0``/``band_tiles_y``: BAND-LOCAL prepare (VERDICT r4 #1) —
    build lists only for the ``band_tiles_y`` tile rows starting at tile
    row ``band_ty0`` (a traced scalar).  Keys are emitted in band-local
    tile indices, bboxes are clamped to the band (a triangle whose FULL
    footprint exceeds ``cap`` but whose in-band footprint fits is now
    listed), and the returned offsets span band_tiles_y*tiles_x tiles.
    Inside shard_map this deletes the replicated full-frame prepare each
    device used to run — each chip sorts/gathers only its own band's
    pairs, and the whole pair budget serves 1/n of the screen."""
    tiles_x = width // TILE_W
    tiles_y = height // TILE_H
    if band_tiles_y is None:
        num_tiles = tiles_x * tiles_y
    else:
        num_tiles = tiles_x * band_tiles_y
        assert band_ty0 is not None
    n_input = g.head_count(tri_i32.shape[0]) if n_head is None else n_head
    if cap is None:
        # Streaming auto-cap (measured, 2026-08-21): more generous than
        # the VMEM path's bin_cap_for because the budget clamp makes
        # over-listing safe and every unlisted big-footprint triangle
        # pays the leftover hierarchy's per-tile scan.  100K soup:
        # cap 10 -> 1314 ms, cap 32 -> 155 ms, cap 128 -> 215 ms; the
        # 1M lattice wants the small cap (key emission is n*cap).
        cap = int(min(256, max(4, (4 * HBM_PAIR_BUDGET)
                               // max(n_input, 1))))

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

    head = tri_i32[:n_input]
    valid = head[:, g.I_VALID] > 0
    tj0 = head[:, g.I_JMIN] // TILE_W
    tj1 = head[:, g.I_JMAX] // TILE_W
    ty0 = head[:, g.I_IMIN] // TILE_H
    ty1 = head[:, g.I_IMAX] // TILE_H
    if band_tiles_y is not None:
        # Clamp each bbox's tile-row range to the band; out-of-band
        # triangles never emit keys (and their hierarchy blocks never
        # overlap the band's tiles, so phase 2 skips them too).
        ty_off = jnp.asarray(band_ty0, jnp.int32)
        ty0 = jnp.maximum(ty0, ty_off)
        ty1 = jnp.minimum(ty1, ty_off + (band_tiles_y - 1))
        valid = valid & (ty0 <= ty1)
    ntx = tj1 - tj0 + 1
    nty = ty1 - ty0 + 1
    foot = ntx * nty
    listed = valid & (foot <= cap)
    # Exact budget clamp: keep the longest PREFIX of listed triangles
    # whose cumulative pair count fits the static record budget; the
    # demoted tail renders through the phase-2 hierarchy (graceful, and
    # the kernel never reads a record slot the gather didn't fill).
    if pair_budget is None:
        pair_budget = HBM_PAIR_BUDGET
    k_budget = min(pair_budget, n_input * cap)
    listed = listed & (
        jnp.cumsum(jnp.where(listed, foot, 0), dtype=jnp.int32) <= k_budget
    )

    ty_base = ty0 if band_tiles_y is None else ty0 - ty_off
    keys = []
    for e in range(cap):
        dx = e % ntx
        dy = e // ntx
        pvalid = listed & (e < foot)
        keys.append(
            jnp.where(pvalid, (ty_base + dy) * tiles_x + (tj0 + dx),
                      num_tiles)
        )
    keys = jnp.stack(keys, axis=1).reshape(-1)  # (P0,) tri-major
    sorted_tri, offsets = _pair_value_sort(keys, cap, num_tiles)

    # Valid pairs sort to the front (sentinel keys are num_tiles), and
    # the budget clamp guarantees there are at most k_budget of them —
    # so only k_budget slots (plus DMA margin) ever need records.  ONE
    # combined gather (ints + bitcast floats in a 96-lane row) instead
    # of two: the gather pays per row, not per byte.
    pad_p = (-k_budget) % REC_ALIGN + REC_CHUNK
    p = k_budget + pad_p
    sorted_tri = jnp.concatenate(
        [sorted_tri[:k_budget], jnp.zeros(pad_p, jnp.int32)]
    )
    comb = jnp.concatenate(
        [
            jnp.pad(tri_i32, ((0, 0), (0, I32_LANES - g.NI32))),
            jax.lax.bitcast_convert_type(
                jnp.pad(tri_f32, ((0, 0), (0, F32_LANES - g.NF32))),
                jnp.int32,
            ),
        ],
        axis=1,
    )  # (T, 96) i32
    crec = comb[sorted_tri].at[:, L_PID].set(sorted_tri)
    prec_i = crec[:, :I32_LANES].reshape(p // 4, 4 * I32_LANES)
    prec_f = jax.lax.bitcast_convert_type(
        crec[:, I32_LANES:], jnp.float32
    ).reshape(p // 2, 2 * F32_LANES)

    # Coarse second list class (VERDICT r4 #4): triangles too big (or
    # budget-demoted) for the fine lists get (coarse-bin, triangle)
    # records over coarse_cb x coarse_cb fine-tile bins.  The kernel
    # streams the bin's span with a per-record bbox mask — bounding the
    # leftover phase, which otherwise scans the per-tile hierarchy
    # (quadratic on incoherent soups: the 1M dense soup spent ~8 s
    # there).  Opt-in (static key emission + a second sort cost
    # n_head * coarse_cap slots even when no triangle qualifies).
    clisted = jnp.zeros_like(listed)
    coarse_out = None
    if coarse_cap is not None:
        assert band_tiles_y is None, "coarse class: full-frame only"
        ctiles_x = (tiles_x + coarse_cb - 1) // coarse_cb
        ctiles_yy = (tiles_y + coarse_cb - 1) // coarse_cb
        num_cbins = ctiles_x * ctiles_yy
        cj0 = tj0 // coarse_cb
        cj1 = tj1 // coarse_cb
        cy0 = ty0 // coarse_cb
        cy1 = ty1 // coarse_cb
        ncx = cj1 - cj0 + 1
        ncy = cy1 - cy0 + 1
        cfoot = ncx * ncy
        clisted = valid & ~listed & (cfoot <= coarse_cap)
        if coarse_budget is None:
            coarse_budget = pair_budget
        ck_budget = min(coarse_budget, n_input * coarse_cap)
        clisted = clisted & (
            jnp.cumsum(jnp.where(clisted, cfoot, 0), dtype=jnp.int32)
            <= ck_budget
        )
        ckeys = []
        for e in range(coarse_cap):
            dx = e % ncx
            dy = e // ncx
            cvalid = clisted & (e < cfoot)
            ckeys.append(
                jnp.where(cvalid, (cy0 + dy) * ctiles_x + (cj0 + dx),
                          num_cbins)
            )
        ckeys = jnp.stack(ckeys, axis=1).reshape(-1)
        sorted_ctri, coffsets = _pair_value_sort(ckeys, coarse_cap,
                                                 num_cbins)
        cpad = (-ck_budget) % REC_ALIGN + REC_CHUNK
        cp = ck_budget + cpad
        sorted_ctri = jnp.concatenate(
            [sorted_ctri[:ck_budget], jnp.zeros(cpad, jnp.int32)]
        )
        coarse_out = (coffsets, sorted_ctri, cp)

    # Leftover hierarchy: empty listed rows so the block tables skip them.
    row_listed = jnp.concatenate(
        [listed | clisted, jnp.zeros(tri_i32.shape[0] - n_input, bool)]
    )
    hier = tri_i32
    hier = hier.at[:, g.I_JMIN].set(
        jnp.where(row_listed, 1, hier[:, g.I_JMIN]))
    hier = hier.at[:, g.I_JMAX].set(
        jnp.where(row_listed, 0, hier[:, g.I_JMAX]))
    hier = hier.at[:, g.I_VALID].set(
        jnp.where(row_listed, 0, hier[:, g.I_VALID])
    )
    blocks = g.block_bounds(jnp, hier)
    blocks, supers = g.super_bounds(jnp, blocks)
    hti, htf = _hbm_flat_inputs(hier, tri_f32)
    if coarse_out is None:
        return offsets, prec_i, prec_f, supers, blocks, hti, htf
    coffsets, sorted_ctri, cp = coarse_out
    ccrec = comb[sorted_ctri].at[:, L_PID].set(sorted_ctri)
    cprec_i = ccrec[:, :I32_LANES].reshape(cp // 4, 4 * I32_LANES)
    cprec_f = jax.lax.bitcast_convert_type(
        ccrec[:, I32_LANES:], jnp.float32
    ).reshape(cp // 2, 2 * F32_LANES)
    return (offsets, prec_i, prec_f, supers, blocks, hti, htf,
            coffsets, cprec_i, cprec_f)


def _binned_hbm_body(offs_ref, sup_ref, blk_ref, prec_i_hbm, prec_f_hbm,
                     ti_hbm, tf_hbm, color_ref, depth_ref,
                     zbuf, tidbuf, nr, ng, nb, den,
                     rec_ibuf, rec_fbuf, rec_sems, ti_buf, tf_buf, dma_sems,
                     gbuf_refs=None, gbuf_scratch=None,
                     const_refs=None, const_scratch=None,
                     depth_only=False, row_base=0,
                     band_local_lists=False, n_sources=1,
                     coffs_ref=None, cprec_i_hbm=None, cprec_f_hbm=None,
                     coarse_cb=4):
    tile_i = pl.program_id(0)
    tile_j = pl.program_id(1)
    tiles_x = pl.num_programs(1)
    row0 = row_base + tile_i * TILE_H
    col0 = tile_j * TILE_W

    half = g.SUBPIXEL // 2
    iy = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    py = (row0 + iy) * g.SUBPIXEL + half
    px = (col0 + ix) * g.SUBPIXEL + half

    zbuf[...] = jnp.full((TILE_H, TILE_W), 1.0, jnp.float32)
    if not depth_only:
        tidbuf[...] = jnp.full((TILE_H, TILE_W), _INT_MAX, jnp.int32)
        nr[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        ng[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        nb[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        den[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    for buf in (gbuf_scratch or ()) + (const_scratch or ()):
        buf[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)

    def eval_at(ibuf, fbuf, ir, il, fr, fl, tid, emask):
        """Packed-slab evaluation with the (z, id) tie-break; lane bases
        il/fl are Python ints (static), rows ir/fr dynamic sublanes."""
        e0 = ibuf[ir, il + g.I_DX0] * (py - ibuf[ir, il + g.I_Y1]) - \
             ibuf[ir, il + g.I_DY0] * (px - ibuf[ir, il + g.I_X1])
        e1 = ibuf[ir, il + g.I_DX1] * (py - ibuf[ir, il + g.I_Y2]) - \
             ibuf[ir, il + g.I_DY1] * (px - ibuf[ir, il + g.I_X2])
        e2 = ibuf[ir, il + g.I_DX2] * (py - ibuf[ir, il + g.I_Y0]) - \
             ibuf[ir, il + g.I_DY2] * (px - ibuf[ir, il + g.I_X0])
        cov = (
            (e0 >= ibuf[ir, il + g.I_BIAS0])
            & (e1 >= ibuf[ir, il + g.I_BIAS1])
            & (e2 >= ibuf[ir, il + g.I_BIAS2])
        )
        ef0 = e0.astype(jnp.float32)
        ef1 = e1.astype(jnp.float32)
        ef2 = e2.astype(jnp.float32)
        z = ef0 * fbuf[fr, fl + g.F_ZA0] + ef1 * fbuf[fr, fl + g.F_ZA1] \
            + ef2 * fbuf[fr, fl + g.F_ZA2]
        zb = zbuf[...]
        if depth_only:
            # On an exact tie every candidate writes the same depth, so
            # the id plane cannot change the output (see _binned_body).
            ok = cov & (z >= 0.0) & (z < zb) & emask
            zbuf[...] = jnp.where(ok, z, zb)
            return
        tb = tidbuf[...]
        ok = cov & (z >= 0.0) & ((z < zb) | ((z == zb) & (tid < tb))) \
            & emask
        zbuf[...] = jnp.where(ok, z, zb)
        tidbuf[...] = jnp.where(ok, tid, tb)

        def latch(buf, c0):
            buf[...] = jnp.where(
                ok,
                ef0 * fbuf[fr, fl + c0] + ef1 * fbuf[fr, fl + c0 + 1]
                + ef2 * fbuf[fr, fl + c0 + 2],
                buf[...],
            )

        latch(den, g.F_RW0)
        latch(nr, g.F_CR0)
        latch(ng, g.F_CG0)
        latch(nb, g.F_CB0)
        if gbuf_scratch is not None:
            for buf, c0 in zip(
                gbuf_scratch,
                (g.F_U0, g.F_V0, g.F_NX0, g.F_NY0, g.F_NZ0),
            ):
                latch(buf, c0)
        if const_scratch is not None:
            for buf, col in zip(
                const_scratch,
                (g.F_MET, g.F_RGH, g.F_EMR, g.F_EMG, g.F_EMB, g.F_TEX),
            ):
                buf[...] = jnp.where(ok, fbuf[fr, fl + col], buf[...])

    # Phase 1: stream this tile's contiguous record span in REC_CHUNK
    # slabs.  No bbox tests — every in-span record is a guaranteed hit;
    # only the slab-edge records carry an in-span mask.
    if band_local_lists:
        # Band-local prepare: offsets span only this band's tiles
        # (row_base still positions the pixel math globally above).
        tile_lin = tile_i * tiles_x + tile_j
        num_list_tiles = (pl.num_programs(0)) * tiles_x
    else:
        tile_lin = (row_base // TILE_H + tile_i) * tiles_x + tile_j
        num_list_tiles = None  # single source, direct indexing

    def stream_span(start, end, src_i=None, src_f=None, masked=False):
        src_i = prec_i_hbm if src_i is None else src_i
        src_f = prec_f_hbm if src_f is None else src_f

        def window(done):
            wbase = (done // REC_ALIGN) * REC_ALIGN
            cp_i = pltpu.make_async_copy(
                src_i.at[pl.ds(wbase // 4, REC_CHUNK // 4), :],
                rec_ibuf, rec_sems.at[0],
            )
            cp_f = pltpu.make_async_copy(
                src_f.at[pl.ds(wbase // 2, REC_CHUNK // 2), :],
                rec_fbuf, rec_sems.at[1],
            )
            cp_i.start()
            cp_f.start()
            cp_i.wait()
            cp_f.wait()
            lo = done - wbase
            hi = jnp.minimum(end - wbase, REC_CHUNK)

            def rec8(r2, c):
                for u in range(8):
                    k = r2 * 8 + u
                    ir = r2 * 2 + u // 4
                    il = (u % 4) * I32_LANES
                    fr = r2 * 4 + u // 2
                    fl = (u % 2) * F32_LANES
                    emask = (k >= lo) & (k < hi)
                    if not masked:
                        eval_at(rec_ibuf, rec_fbuf, ir, il, fr, fl,
                                rec_ibuf[ir, il + L_PID], emask)
                    else:
                        # Coarse-class records are bin residents, not
                        # guaranteed tile hits: test the record's bbox
                        # against this tile and skip the vector body for
                        # misses (same per-record economics as the
                        # phase-2 hierarchy body, without its per-tile
                        # block/superblock scan).
                        hit = emask & (
                            (rec_ibuf[ir, il + g.I_JMAX] >= col0)
                            & (rec_ibuf[ir, il + g.I_JMIN]
                               < col0 + TILE_W)
                            & (rec_ibuf[ir, il + g.I_IMAX] >= row0)
                            & (rec_ibuf[ir, il + g.I_IMIN]
                               < row0 + TILE_H)
                        )

                        @pl.when(hit)
                        def _(ir=ir, il=il, fr=fr, fl=fl):
                            eval_at(rec_ibuf, rec_fbuf, ir, il, fr, fl,
                                    rec_ibuf[ir, il + L_PID], True)
                return c

            jax.lax.fori_loop(lo // 8, (hi + 7) // 8, rec8, 0)
            return wbase + hi

        jax.lax.while_loop(lambda d: d < end, window, start)

    if n_sources == 1:
        stream_span(offs_ref[tile_lin], offs_ref[tile_lin + 1])
        if coffs_ref is not None:
            # Phase 1.5: the COARSE list class — big-footprint leftovers
            # stream as (coarse-bin, triangle) records with a per-record
            # bbox mask, bounding the leftover phase without the
            # hierarchy's per-tile block scan (VERDICT r4 #4).
            ctiles_x = (tiles_x + coarse_cb - 1) // coarse_cb
            clin = ((row_base // TILE_H + tile_i) // coarse_cb) * ctiles_x \
                + tile_j // coarse_cb
            stream_span(coffs_ref[clin], coffs_ref[clin + 1],
                        src_i=cprec_i_hbm, src_f=cprec_f_hbm, masked=True)
    else:
        # Distributed prepare (multi-chip all_to_all): one span per
        # source shard, offsets laid out (n_sources, band_tiles+1) and
        # already rebased to the concatenated slab record rows.
        def src_body(src, c):
            base = src * (num_list_tiles + 1)
            stream_span(offs_ref[base + tile_lin],
                        offs_ref[base + tile_lin + 1])
            return c

        jax.lax.fori_loop(0, n_sources, src_body, 0)

    # Phase 2: leftovers through the HBM block hierarchy (same slab
    # machinery as _hbm_kernel_body, id-aware body).
    def tile_overlap(jmin, jmax, imin, imax):
        return (
            (jmax >= col0)
            & (jmin < col0 + TILE_W)
            & (imax >= row0)
            & (imin < row0 + TILE_H)
            & (jmin <= jmax)
            & (imin <= imax)
        )

    def block_hit(bk):
        return tile_overlap(
            blk_ref[bk, 0], blk_ref[bk, 1], blk_ref[bk, 2], blk_ref[bk, 3]
        )

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
                    gid = bk * g.RASTER_BLOCK + q * TRI_UNROLL + u
                    eval_at(ti_buf, tf_buf,
                            base4 + u // 4, (u % 4) * I32_LANES,
                            2 * base4 + u // 2, (u % 2) * F32_LANES,
                            gid, hits[u])

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

    if depth_only:
        depth_ref[...] = zbuf[...]
        return

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
    if gbuf_refs is not None:
        inv_cov = jnp.where(covered, inv, jnp.float32(0.0))
        for ref, buf in zip(gbuf_refs, gbuf_scratch):
            ref[...] = buf[...] * inv_cov
    if const_refs is not None:
        for ref, buf in zip(const_refs, const_scratch):
            ref[...] = buf[...]


def _binned_hbm_kernel(offs_ref, sup_ref, blk_ref, prec_i, prec_f,
                       ti_hbm, tf_hbm, color_ref, depth_ref,
                       zbuf, tidbuf, nr, ng, nb, den,
                       rec_ibuf, rec_fbuf, rec_sems,
                       ti_buf, tf_buf, dma_sems):
    _binned_hbm_body(offs_ref, sup_ref, blk_ref, prec_i, prec_f,
                     ti_hbm, tf_hbm, color_ref, depth_ref,
                     zbuf, tidbuf, nr, ng, nb, den,
                     rec_ibuf, rec_fbuf, rec_sems, ti_buf, tf_buf, dma_sems)


def _binned_hbm_gbuffer_kernel(offs_ref, sup_ref, blk_ref, prec_i, prec_f,
                               ti_hbm, tf_hbm, color_ref, depth_ref,
                               u_ref, v_ref, nx_ref, ny_ref, nz_ref,
                               met_ref, rgh_ref, emr_ref, emg_ref, emb_ref,
                               tex_ref, zbuf, tidbuf, nr, ng, nb, den,
                               nu, nv, nnx, nny, nnz,
                               smet, srgh, semr, semg, semb, stex,
                               rec_ibuf, rec_fbuf, rec_sems,
                               ti_buf, tf_buf, dma_sems):
    _binned_hbm_body(offs_ref, sup_ref, blk_ref, prec_i, prec_f,
                     ti_hbm, tf_hbm, color_ref, depth_ref,
                     zbuf, tidbuf, nr, ng, nb, den,
                     rec_ibuf, rec_fbuf, rec_sems, ti_buf, tf_buf, dma_sems,
                     gbuf_refs=(u_ref, v_ref, nx_ref, ny_ref, nz_ref),
                     gbuf_scratch=(nu, nv, nnx, nny, nnz),
                     const_refs=(met_ref, rgh_ref, emr_ref, emg_ref,
                                 emb_ref, tex_ref),
                     const_scratch=(smet, srgh, semr, semg, semb, stex))


def _binned_hbm_depth_kernel(offs_ref, sup_ref, blk_ref, prec_i, prec_f,
                             ti_hbm, tf_hbm, depth_ref, zbuf,
                             rec_ibuf, rec_fbuf, rec_sems,
                             ti_buf, tf_buf, dma_sems):
    _binned_hbm_body(offs_ref, sup_ref, blk_ref, prec_i, prec_f,
                     ti_hbm, tf_hbm, None, depth_ref,
                     zbuf, None, None, None, None, None,
                     rec_ibuf, rec_fbuf, rec_sems, ti_buf, tf_buf, dma_sems,
                     depth_only=True)


_REC_SLABS = [
    pltpu.VMEM((REC_CHUNK // 4, 128), jnp.int32),   # rec_ibuf
    pltpu.VMEM((REC_CHUNK // 2, 128), jnp.float32),  # rec_fbuf
    pltpu.SemaphoreType.DMA((2,)),
]


def _binned_hbm_grid_spec(grid, num_outs, extra_scratch):
    tile_spec = pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j),
                             memory_space=pltpu.VMEM)
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # offsets -> SMEM
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # supers
            pl.BlockSpec(memory_space=pltpu.VMEM),  # blocks (hier)
            pl.BlockSpec(memory_space=pl.ANY),  # prec_i (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # prec_f (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # hier ti rows (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # hier tf rows (HBM)
        ],
        out_specs=[tile_spec] * num_outs,
        scratch_shapes=extra_scratch + _REC_SLABS + list(_HBM_SLABS),
    )


def _binned_hbm_coarse_kernel(offs_ref, coffs_ref, sup_ref, blk_ref,
                              prec_i, prec_f, cprec_i, cprec_f,
                              ti_hbm, tf_hbm, color_ref, depth_ref,
                              zbuf, tidbuf, nr, ng, nb, den,
                              rec_ibuf, rec_fbuf, rec_sems,
                              ti_buf, tf_buf, dma_sems):
    _binned_hbm_body(offs_ref, sup_ref, blk_ref, prec_i, prec_f,
                     ti_hbm, tf_hbm, color_ref, depth_ref,
                     zbuf, tidbuf, nr, ng, nb, den,
                     rec_ibuf, rec_fbuf, rec_sems, ti_buf, tf_buf, dma_sems,
                     coffs_ref=coffs_ref, cprec_i_hbm=cprec_i,
                     cprec_f_hbm=cprec_f)


def rasterize_setup_pallas_binned_hbm(tri_i32, tri_f32, width: int,
                                      height: int, interpret: bool = False,
                                      cap: int | None = None,
                                      pair_budget: int | None = None,
                                      n_head: int | None = None,
                                      coarse_cap: int | None = None,
                                      coarse_budget: int | None = None):
    """Per-tile-list raster at HBM scale (pair-ordered record streaming).

    Same bit-exact contract as rasterize_setup_pallas_binned (oracle
    LESS == id tie-break), with no VMEM triangle-count ceiling.

    ``coarse_cap``: opt-in second list class — big-footprint leftovers
    stream as (coarse-bin, triangle) records with a per-record bbox mask
    instead of riding the per-tile hierarchy scan (the dense-soup
    leftover fix, VERDICT r4 #4).  Costs a second static
    n_head*coarse_cap key sort, so the caller enables it for incoherent
    scenes (benchmarks/soup.py --coarse)."""
    assert height % TILE_H == 0 and width % TILE_W == 0
    grid = (height // TILE_H, width // TILE_W)
    if coarse_cap is not None:
        (offsets, prec_i, prec_f, supers, blocks, hti, htf,
         coffsets, cprec_i, cprec_f) = prepare_binned_hbm_inputs(
            tri_i32, tri_f32, width, height, cap=cap,
            pair_budget=pair_budget, n_head=n_head,
            coarse_cap=coarse_cap, coarse_budget=coarse_budget)
        tile_spec = pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j),
                                 memory_space=pltpu.VMEM)
        color, depth = _pallas_call(
            _binned_hbm_coarse_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,  # offsets, coffsets -> SMEM
                grid=grid,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),  # supers
                    pl.BlockSpec(memory_space=pltpu.VMEM),  # blocks
                    pl.BlockSpec(memory_space=pl.ANY),  # prec_i
                    pl.BlockSpec(memory_space=pl.ANY),  # prec_f
                    pl.BlockSpec(memory_space=pl.ANY),  # cprec_i
                    pl.BlockSpec(memory_space=pl.ANY),  # cprec_f
                    pl.BlockSpec(memory_space=pl.ANY),  # hier ti
                    pl.BlockSpec(memory_space=pl.ANY),  # hier tf
                ],
                out_specs=[tile_spec] * 2,
                scratch_shapes=[
                    pltpu.VMEM((TILE_H, TILE_W), jnp.float32),  # zbuf
                    pltpu.VMEM((TILE_H, TILE_W), jnp.int32),  # tidbuf
                ] + [pltpu.VMEM((TILE_H, TILE_W), jnp.float32)
                     for _ in range(4)] + _REC_SLABS + list(_HBM_SLABS),
            ),
            out_shape=[
                jax.ShapeDtypeStruct((height, width), jnp.uint32),
                jax.ShapeDtypeStruct((height, width), jnp.float32),
            ],
            interpret=interpret,
        )(offsets, coffsets, supers, blocks, prec_i, prec_f,
          cprec_i, cprec_f, hti, htf)
        return color, depth
    offsets, prec_i, prec_f, supers, blocks, hti, htf = \
        prepare_binned_hbm_inputs(tri_i32, tri_f32, width, height, cap=cap,
                                  pair_budget=pair_budget, n_head=n_head)

    color, depth = _pallas_call(
        _binned_hbm_kernel,
        grid_spec=_binned_hbm_grid_spec(
            grid, 2,
            [
                pltpu.VMEM((TILE_H, TILE_W), jnp.float32),  # zbuf
                pltpu.VMEM((TILE_H, TILE_W), jnp.int32),  # tidbuf
            ] + [pltpu.VMEM((TILE_H, TILE_W), jnp.float32)
                 for _ in range(4)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((height, width), jnp.uint32),
            jax.ShapeDtypeStruct((height, width), jnp.float32),
        ],
        interpret=interpret,
    )(offsets, supers, blocks, prec_i, prec_f, hti, htf)
    return color, depth


def rasterize_gbuffer_pallas_binned_hbm(tri_i32, tri_f32, width: int,
                                        height: int,
                                        interpret: bool = False,
                                        cap: int | None = None,
                                        pair_budget: int | None = None,
                                        n_head: int | None = None):
    """Streaming per-tile-list G-buffer — same 13 planes as
    rasterize_gbuffer_pallas_hbm, no VMEM triangle ceiling."""
    assert height % TILE_H == 0 and width % TILE_W == 0
    grid = (height // TILE_H, width // TILE_W)
    offsets, prec_i, prec_f, supers, blocks, hti, htf = \
        prepare_binned_hbm_inputs(tri_i32, tri_f32, width, height, cap=cap,
                                  pair_budget=pair_budget, n_head=n_head)

    plane = lambda dt: jax.ShapeDtypeStruct((height, width), dt)
    outs = _pallas_call(
        _binned_hbm_gbuffer_kernel,
        grid_spec=_binned_hbm_grid_spec(
            grid, 13,
            [
                pltpu.VMEM((TILE_H, TILE_W), jnp.float32),  # zbuf
                pltpu.VMEM((TILE_H, TILE_W), jnp.int32),  # tidbuf
            ] + [pltpu.VMEM((TILE_H, TILE_W), jnp.float32)
                 for _ in range(15)],
        ),
        out_shape=[plane(jnp.uint32)] + [plane(jnp.float32)] * 12,
        interpret=interpret,
    )(offsets, supers, blocks, prec_i, prec_f, hti, htf)
    return outs


def rasterize_depth_pallas_binned_hbm(tri_i32, tri_f32, width: int,
                                      height: int, interpret: bool = False,
                                      cap: int | None = None,
                                      pair_budget: int | None = None,
                                      n_head: int | None = None):
    """Streaming per-tile-list depth-only raster (shadow pass at scale)."""
    assert height % TILE_H == 0 and width % TILE_W == 0
    grid = (height // TILE_H, width // TILE_W)
    offsets, prec_i, prec_f, supers, blocks, hti, htf = \
        prepare_binned_hbm_inputs(tri_i32, tri_f32, width, height, cap=cap,
                                  pair_budget=pair_budget, n_head=n_head)

    (depth,) = _pallas_call(
        _binned_hbm_depth_kernel,
        grid_spec=_binned_hbm_grid_spec(
            grid, 1, [pltpu.VMEM((TILE_H, TILE_W), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((height, width), jnp.float32)],
        interpret=interpret,
    )(offsets, supers, blocks, prec_i, prec_f, hti, htf)
    return depth


def _binned_hbm_band_kernel(row0_ref, offs_ref, sup_ref, blk_ref, prec_i,
                            prec_f, ti_hbm, tf_hbm, color_ref, depth_ref,
                            zbuf, tidbuf, nr, ng, nb, den,
                            rec_ibuf, rec_fbuf, rec_sems,
                            ti_buf, tf_buf, dma_sems):
    _binned_hbm_body(offs_ref, sup_ref, blk_ref, prec_i, prec_f,
                     ti_hbm, tf_hbm, color_ref, depth_ref,
                     zbuf, tidbuf, nr, ng, nb, den,
                     rec_ibuf, rec_fbuf, rec_sems, ti_buf, tf_buf, dma_sems,
                     row_base=row0_ref[0])


def _binned_hbm_band_local_kernel(row0_ref, offs_ref, sup_ref, blk_ref,
                                  prec_i, prec_f, ti_hbm, tf_hbm,
                                  color_ref, depth_ref,
                                  zbuf, tidbuf, nr, ng, nb, den,
                                  rec_ibuf, rec_fbuf, rec_sems,
                                  ti_buf, tf_buf, dma_sems):
    _binned_hbm_body(offs_ref, sup_ref, blk_ref, prec_i, prec_f,
                     ti_hbm, tf_hbm, color_ref, depth_ref,
                     zbuf, tidbuf, nr, ng, nb, den,
                     rec_ibuf, rec_fbuf, rec_sems, ti_buf, tf_buf, dma_sems,
                     row_base=row0_ref[0], band_local_lists=True)


def rasterize_setup_pallas_binned_band(tri_i32, tri_f32, width: int,
                                       full_height: int, band_h: int,
                                       row0, interpret: bool = False,
                                       cap: int | None = None,
                                       pair_budget: int | None = None,
                                       n_head: int | None = None,
                                       band_local: bool = True):
    """Record-streaming binned raster of one horizontal band starting at
    global row ``row0`` (traced scalar) — the multi-chip screen-tile
    variant (used inside shard_map like rasterize_setup_pallas_band).

    ``band_local=True`` (default, VERDICT r4 #1): the prepare builds
    pair lists only for THIS band's tiles — keys, sort sentinels, and
    the record gather all scope to the band, so inside shard_map no
    device repeats the full-frame binning and the whole pair budget
    serves its own band.  ``band_local=False`` keeps the round-4
    behavior (full-frame prepare, band consumes its spans) for A/B.
    Multi-chip callers MUST pass ``n_head`` (the all-gathered row layout
    does not invert as a single device's capped layout)."""
    assert full_height % TILE_H == 0 and width % TILE_W == 0
    assert band_h % TILE_H == 0
    grid = (band_h // TILE_H, width // TILE_W)
    if band_local:
        band_kw = dict(band_ty0=jnp.asarray(row0, jnp.int32) // TILE_H,
                       band_tiles_y=band_h // TILE_H)
    else:
        band_kw = {}
    offsets, prec_i, prec_f, supers, blocks, hti, htf = \
        prepare_binned_hbm_inputs(tri_i32, tri_f32, width, full_height,
                                  cap=cap, pair_budget=pair_budget,
                                  n_head=n_head, **band_kw)
    row0_arr = jnp.asarray(row0, jnp.int32).reshape(1)
    tile_spec = pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j),
                             memory_space=pltpu.VMEM)

    color, depth = _pallas_call(
        _binned_hbm_band_local_kernel if band_local
        else _binned_hbm_band_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # row0, offsets -> SMEM
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # supers
                pl.BlockSpec(memory_space=pltpu.VMEM),  # blocks (hier)
                pl.BlockSpec(memory_space=pl.ANY),  # prec_i (HBM)
                pl.BlockSpec(memory_space=pl.ANY),  # prec_f (HBM)
                pl.BlockSpec(memory_space=pl.ANY),  # hier ti rows
                pl.BlockSpec(memory_space=pl.ANY),  # hier tf rows
            ],
            out_specs=[tile_spec] * 2,
            scratch_shapes=[
                pltpu.VMEM((TILE_H, TILE_W), jnp.float32),  # zbuf
                pltpu.VMEM((TILE_H, TILE_W), jnp.int32),  # tidbuf
            ] + [pltpu.VMEM((TILE_H, TILE_W), jnp.float32)
                 for _ in range(4)] + _REC_SLABS + list(_HBM_SLABS),
        ),
        out_shape=[
            jax.ShapeDtypeStruct((band_h, width), jnp.uint32),
            jax.ShapeDtypeStruct((band_h, width), jnp.float32),
        ],
        interpret=interpret,
    )(row0_arr, offsets, supers, blocks, prec_i, prec_f, hti, htf)
    return color, depth


def _binned_hbm_gbuffer_band_kernel(row0_ref, offs_ref, sup_ref, blk_ref,
                                    prec_i, prec_f, ti_hbm, tf_hbm,
                                    color_ref, depth_ref,
                                    u_ref, v_ref, nx_ref, ny_ref, nz_ref,
                                    met_ref, rgh_ref, emr_ref, emg_ref,
                                    emb_ref, tex_ref,
                                    zbuf, tidbuf, nr, ng, nb, den,
                                    nu, nv, nnx, nny, nnz,
                                    smet, srgh, semr, semg, semb, stex,
                                    rec_ibuf, rec_fbuf, rec_sems,
                                    ti_buf, tf_buf, dma_sems):
    _binned_hbm_body(offs_ref, sup_ref, blk_ref, prec_i, prec_f,
                     ti_hbm, tf_hbm, color_ref, depth_ref,
                     zbuf, tidbuf, nr, ng, nb, den,
                     rec_ibuf, rec_fbuf, rec_sems, ti_buf, tf_buf, dma_sems,
                     gbuf_refs=(u_ref, v_ref, nx_ref, ny_ref, nz_ref),
                     gbuf_scratch=(nu, nv, nnx, nny, nnz),
                     const_refs=(met_ref, rgh_ref, emr_ref, emg_ref,
                                 emb_ref, tex_ref),
                     const_scratch=(smet, srgh, semr, semg, semb, stex),
                     row_base=row0_ref[0], band_local_lists=True)


def rasterize_gbuffer_pallas_binned_band(tri_i32, tri_f32, width: int,
                                         full_height: int, band_h: int,
                                         row0, interpret: bool = False,
                                         cap: int | None = None,
                                         pair_budget: int | None = None,
                                         n_head: int | None = None):
    """Record-streaming binned G-BUFFER raster of one horizontal band —
    the multi-chip deferred pipeline's raster stage (same 13 planes as
    rasterize_gbuffer_pallas_binned_hbm, band-local prepare like
    rasterize_setup_pallas_binned_band).  Multi-chip callers MUST pass
    ``n_head``."""
    assert full_height % TILE_H == 0 and width % TILE_W == 0
    assert band_h % TILE_H == 0
    grid = (band_h // TILE_H, width // TILE_W)
    offsets, prec_i, prec_f, supers, blocks, hti, htf = \
        prepare_binned_hbm_inputs(
            tri_i32, tri_f32, width, full_height,
            cap=cap, pair_budget=pair_budget, n_head=n_head,
            band_ty0=jnp.asarray(row0, jnp.int32) // TILE_H,
            band_tiles_y=band_h // TILE_H,
        )
    row0_arr = jnp.asarray(row0, jnp.int32).reshape(1)
    tile_spec = pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j),
                             memory_space=pltpu.VMEM)
    plane = lambda dt: jax.ShapeDtypeStruct((band_h, width), dt)

    outs = _pallas_call(
        _binned_hbm_gbuffer_band_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # row0, offsets -> SMEM
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # supers
                pl.BlockSpec(memory_space=pltpu.VMEM),  # blocks (hier)
                pl.BlockSpec(memory_space=pl.ANY),  # prec_i (HBM)
                pl.BlockSpec(memory_space=pl.ANY),  # prec_f (HBM)
                pl.BlockSpec(memory_space=pl.ANY),  # hier ti rows
                pl.BlockSpec(memory_space=pl.ANY),  # hier tf rows
            ],
            out_specs=[tile_spec] * 13,
            scratch_shapes=[
                pltpu.VMEM((TILE_H, TILE_W), jnp.float32),  # zbuf
                pltpu.VMEM((TILE_H, TILE_W), jnp.int32),  # tidbuf
            ] + [pltpu.VMEM((TILE_H, TILE_W), jnp.float32)
                 for _ in range(15)] + _REC_SLABS + list(_HBM_SLABS),
        ),
        out_shape=[plane(jnp.uint32)] + [plane(jnp.float32)] * 12,
        interpret=interpret,
    )(row0_arr, offsets, supers, blocks, prec_i, prec_f, hti, htf)
    return outs


# ---------------------------------------------------------------------------
# Distributed streaming prepare (multi-chip all_to_all binning)
# ---------------------------------------------------------------------------
# The band-local prepare above still pays O(total_tris * cap) keys + sort
# on every device.  The distributed prepare shards THAT too: each device
# emits/sorts/gathers pairs only for its own triangle shard (1/n of the
# keys and sort), packs per-destination-band record slabs, and ONE
# all_to_all redistributes them so every band owner holds its band's
# records from all shards.  The kernel streams n_sources spans per tile
# (order within a tile is free — (z, id) tie-break), so concatenating
# source slabs needs no merge.  Overflowing (slab budget) or
# cap-exceeding triangles are NOT listed; the owner is told via a listed
# mask riding the same all_to_all and renders them through its
# band-scoped phase-2 hierarchy — every (tile, triangle) visit happens
# exactly once, keeping the bit-exact oracle contract.

DIST_SLAB_RECORDS = 1 << 15  # per-(src, dst) record capacity (tunable)


def dist_slab_rows(slab_records: int) -> int:
    """Total rows per (src, dst) slab piece: usable records rounded up to
    REC_ALIGN plus one REC_CHUNK of DMA margin (the streaming window may
    read, masked, past a span's end)."""
    usable = -(-slab_records // REC_ALIGN) * REC_ALIGN
    return usable + REC_CHUNK


def prepare_binned_dist_local(ti_local, tf_local, width: int, height: int,
                              n_bands: int, shard_index, shard_head: int,
                              cap: int | None = None,
                              slab_records: int | None = None):
    """Per-shard half of the distributed streaming prepare (runs inside
    shard_map BEFORE any collective).

    ``ti_local``/``tf_local``: this shard's capped-layout setup rows
    (geometry_pipeline output for shard_head triangles).
    ``shard_index``: traced axis index (canonical head ids are
    ``shard_index * shard_head + row``).

    Returns (prec_i (n, R//4, 128) i32, prec_f (n, R//2, 128) f32,
    offs (n, band_tiles+1) i32 slab-local record spans, listed_send
    (n, shard_head) bool) — all shaped for lax.all_to_all over the mesh
    axis with split/concat axis 0."""
    tiles_x = width // TILE_W
    tiles_y = height // TILE_H
    num_tiles = tiles_x * tiles_y
    assert tiles_y % n_bands == 0
    bty = tiles_y // n_bands
    band_tiles = tiles_x * bty
    if slab_records is None:
        slab_records = DIST_SLAB_RECORDS
    slab_records = -(-slab_records // REC_ALIGN) * REC_ALIGN
    r_total = dist_slab_rows(slab_records)
    if cap is None:
        cap = int(min(256, max(4, (4 * HBM_PAIR_BUDGET)
                               // max(shard_head * n_bands, 1))))

    head = ti_local[:shard_head]
    valid = head[:, g.I_VALID] > 0
    tj0 = head[:, g.I_JMIN] // TILE_W
    tj1 = head[:, g.I_JMAX] // TILE_W
    ty0 = head[:, g.I_IMIN] // TILE_H
    ty1 = head[:, g.I_IMAX] // TILE_H
    ntx = tj1 - tj0 + 1
    nty = ty1 - ty0 + 1
    foot = ntx * nty
    listed = valid & (foot <= cap)

    # Per-destination-band footprints and exact slab-budget prefixes: a
    # triangle is listed FOR band b iff its whole (clamped) b-footprint
    # fits the remaining slab budget — no mid-tile truncation.
    band_lo = jnp.arange(n_bands, dtype=jnp.int32) * bty
    cty0 = jnp.maximum(ty0[:, None], band_lo[None, :])
    cty1 = jnp.minimum(ty1[:, None], band_lo[None, :] + (bty - 1))
    ntyb = cty1 - cty0 + 1
    footb = jnp.where(ntyb > 0, ntx[:, None] * ntyb, 0)
    cum_b = jnp.cumsum(
        jnp.where(listed[:, None], footb, 0), axis=0, dtype=jnp.int32
    )
    fits = cum_b <= slab_records
    listed_send = (listed[:, None] & fits).T  # (n_bands, shard_head)

    keys = []
    for e in range(cap):
        dx = e % ntx
        dy = e // ntx
        cell_ty = ty0 + dy
        cell_b = cell_ty // bty
        fit_e = jnp.zeros_like(listed)
        for b in range(n_bands):
            fit_e = fit_e | (fits[:, b] & (cell_b == b))
        pvalid = listed & (e < foot) & fit_e
        keys.append(
            jnp.where(pvalid, cell_ty * tiles_x + (tj0 + dx), num_tiles)
        )
    keys = jnp.stack(keys, axis=1).reshape(-1)
    sorted_tri, offsets_full = _pair_value_sort(keys, cap, num_tiles)
    p0 = keys.shape[0]

    # Per-destination slab spans: sorted pairs are band-contiguous.
    band_starts = offsets_full[
        jnp.arange(n_bands, dtype=jnp.int32) * band_tiles]
    seg_idx = (jnp.arange(n_bands, dtype=jnp.int32)[:, None] * band_tiles
               + jnp.arange(band_tiles + 1, dtype=jnp.int32)[None, :])
    offs = offsets_full[seg_idx] - band_starts[:, None]  # (n, bt+1)

    # ONE combined record gather straight into slab order (margin rows
    # clamp to the last pair; their spans never cover them).
    idx = jnp.clip(
        band_starts[:, None] + jnp.arange(r_total, dtype=jnp.int32)[None, :],
        0, p0 - 1,
    )
    tri_sel = sorted_tri[idx]  # (n, r_total) local head rows
    comb = jnp.concatenate(
        [
            jnp.pad(ti_local, ((0, 0), (0, I32_LANES - g.NI32))),
            jax.lax.bitcast_convert_type(
                jnp.pad(tf_local, ((0, 0), (0, F32_LANES - g.NF32))),
                jnp.int32,
            ),
        ],
        axis=1,
    )
    pid = tri_sel + jnp.asarray(shard_index, jnp.int32) * shard_head
    crec = comb[tri_sel].at[:, :, L_PID].set(pid)
    prec_i = crec[:, :, :I32_LANES].reshape(n_bands, r_total // 4,
                                            4 * I32_LANES)
    prec_f = jax.lax.bitcast_convert_type(
        crec[:, :, I32_LANES:], jnp.float32
    ).reshape(n_bands, r_total // 2, 2 * F32_LANES)
    return prec_i, prec_f, offs, listed_send


def _binned_hbm_band_dist_kernel_factory(n_sources: int):
    def kern(row0_ref, offs_ref, sup_ref, blk_ref, prec_i, prec_f,
             ti_hbm, tf_hbm, color_ref, depth_ref,
             zbuf, tidbuf, nr, ng, nb, den,
             rec_ibuf, rec_fbuf, rec_sems, ti_buf, tf_buf, dma_sems):
        _binned_hbm_body(offs_ref, sup_ref, blk_ref, prec_i, prec_f,
                         ti_hbm, tf_hbm, color_ref, depth_ref,
                         zbuf, tidbuf, nr, ng, nb, den,
                         rec_ibuf, rec_fbuf, rec_sems,
                         ti_buf, tf_buf, dma_sems,
                         row_base=row0_ref[0], band_local_lists=True,
                         n_sources=n_sources)
    return kern


def rasterize_setup_pallas_binned_band_dist(
        ti, tf, listed_mask, prec_i, prec_f, offs,
        width: int, full_height: int, band_h: int, row0,
        slab_records: int, interpret: bool = False):
    """Owner half of the distributed streaming raster: consume the
    all_to_all'd record slabs + spans + listed mask for THIS band.

    ``ti``/``tf``: the all-gathered, canonically-permuted setup rows
    (the hierarchy leftovers' source).  ``listed_mask`` (n_head,) bool in
    canonical head order: True rows render via the slabs and are killed
    from the phase-2 hierarchy.  ``prec_i``/``prec_f``/``offs``: the
    received (n_src, ...) slab stacks from prepare_binned_dist_local."""
    assert full_height % TILE_H == 0 and width % TILE_W == 0
    assert band_h % TILE_H == 0
    n_src = prec_i.shape[0]
    r_total = dist_slab_rows(slab_records)
    assert prec_i.shape[1] == r_total // 4, (prec_i.shape, r_total)
    grid = (band_h // TILE_H, width // TILE_W)

    # Rebase spans to the concatenated record rows (slot s at s*r_total)
    # and flatten for scalar prefetch.
    base = (jnp.arange(n_src, dtype=jnp.int32) * r_total)[:, None]
    offs_flat = (offs + base).reshape(-1)
    prec_i_all = prec_i.reshape(n_src * (r_total // 4), 4 * I32_LANES)
    prec_f_all = prec_f.reshape(n_src * (r_total // 2), 2 * F32_LANES)

    # Phase-2 hierarchy over everything the slabs don't own.
    t = ti.shape[0]
    n_head = listed_mask.shape[0]
    pad = (-t) % g.RASTER_BLOCK
    if pad:
        ti = jnp.concatenate(
            [ti, jnp.zeros((pad, g.NI32), jnp.int32)
             .at[:, g.I_JMIN].set(1)
             .at[:, g.I_BIAS0].set(2**31 - 1)
             .at[:, g.I_BIAS1].set(2**31 - 1)
             .at[:, g.I_BIAS2].set(2**31 - 1)], axis=0
        )
        tf = jnp.concatenate(
            [tf, jnp.zeros((pad, g.NF32), jnp.float32)], axis=0
        )
    row_listed = jnp.concatenate(
        [listed_mask, jnp.zeros(ti.shape[0] - n_head, bool)]
    )
    hier = ti
    hier = hier.at[:, g.I_JMIN].set(
        jnp.where(row_listed, 1, hier[:, g.I_JMIN]))
    hier = hier.at[:, g.I_JMAX].set(
        jnp.where(row_listed, 0, hier[:, g.I_JMAX]))
    hier = hier.at[:, g.I_VALID].set(
        jnp.where(row_listed, 0, hier[:, g.I_VALID]))
    blocks = g.block_bounds(jnp, hier)
    blocks, supers = g.super_bounds(jnp, blocks)
    hti, htf = _hbm_flat_inputs(hier, tf)

    row0_arr = jnp.asarray(row0, jnp.int32).reshape(1)
    tile_spec = pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j),
                             memory_space=pltpu.VMEM)
    color, depth = _pallas_call(
        _binned_hbm_band_dist_kernel_factory(n_src),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # row0, offsets -> SMEM
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # supers
                pl.BlockSpec(memory_space=pltpu.VMEM),  # blocks (hier)
                pl.BlockSpec(memory_space=pl.ANY),  # prec_i (HBM)
                pl.BlockSpec(memory_space=pl.ANY),  # prec_f (HBM)
                pl.BlockSpec(memory_space=pl.ANY),  # hier ti rows
                pl.BlockSpec(memory_space=pl.ANY),  # hier tf rows
            ],
            out_specs=[tile_spec] * 2,
            scratch_shapes=[
                pltpu.VMEM((TILE_H, TILE_W), jnp.float32),  # zbuf
                pltpu.VMEM((TILE_H, TILE_W), jnp.int32),  # tidbuf
            ] + [pltpu.VMEM((TILE_H, TILE_W), jnp.float32)
                 for _ in range(4)] + _REC_SLABS + list(_HBM_SLABS),
        ),
        out_shape=[
            jax.ShapeDtypeStruct((band_h, width), jnp.uint32),
            jax.ShapeDtypeStruct((band_h, width), jnp.float32),
        ],
        interpret=interpret,
    )(row0_arr, offs_flat, supers, blocks, prec_i_all, prec_f_all, hti, htf)
    return color, depth


# ---------------------------------------------------------------------------
# Sort-free small-scene binning (the demo-scene fast path)
# ---------------------------------------------------------------------------
# The binned kernel beats the hierarchy kernel ~5x on the 120-triangle demo
# (0.38 vs 1.86 ms kernel-only at 1080p: a hierarchy tile scans all 128
# block slots at ~25 ns of loop/branch machinery each, a listed tile loops
# only its own few triangles) — but prepare_binned_inputs' pair argsort
# (~1.1 ms at 32K pairs) used to eat the whole win, so "auto" resolved to
# the hierarchy.  At small row counts the per-tile lists don't need the
# pair expansion at all: the dense (tiles, rows) hit-mask fits comfortably,
# and one row-wise jnp.sort of where(hit, row_id, R) yields each tile's
# triangle ids ascending with R-valued padding at the end (~30x less sort
# work than the pair argsort).  No footprint cap, no leftovers: clipped
# fan rows are listed like everything else, so the phase-2 hierarchy
# receives a single dead superblock and never fires.

SMALL_BIN_MAX_ROWS = 1024  # dense-mask binning bound (HEAD setup rows)


def _use_small_bins(binning: str, rows: int) -> bool:
    if binning == "small":
        return True
    return binning == "auto" and g.head_count(rows) <= SMALL_BIN_MAX_ROWS


def prepare_binned_small(tri_i32, tri_f32, width: int, height: int):
    """Sort-free per-tile triangle lists for small scenes.

    Lists cover the HEAD rows (slot-0, unclipped triangles — the capped
    layout's 6x fan-slot tail would otherwise dominate the mask/sort
    cost); clipped-fan rows go through the phase-2 hierarchy exactly as
    in prepare_binned_inputs, which is all-dead (one superblock test per
    tile) whenever nothing clips.

    Returns (counts, lists, supers, blocks, ti, tf) in the LOCAL-lists
    contract (local_lists=True): lists is (num_tiles * n_head, 1) with
    tile t owning rows [t*n_head, (t+1)*n_head) — the kernel receives one
    (n_head, 1) block per tile via its BlockSpec and loops entries
    [0, counts[t]).  Per-tile rows are padded to n_head, so no global
    compaction (and no sort by tile) is ever needed.  List entries are
    ascending row ids; the kernel's id tie-break makes processing order
    immaterial (bit-exact with the sequential hierarchy kernels).
    """
    tiles_x = width // TILE_W
    tiles_y = height // TILE_H
    num_tiles = tiles_x * tiles_y
    n_head = g.head_count(tri_i32.shape[0])
    assert n_head <= SMALL_BIN_MAX_ROWS, (
        f"prepare_binned_small: {n_head} head rows > {SMALL_BIN_MAX_ROWS} "
        "(use prepare_binned_inputs / the hierarchy kernels)"
    )
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

    head = tri_i32[:n_head]
    live = (
        (head[:, g.I_VALID] > 0)
        & (head[:, g.I_JMIN] <= head[:, g.I_JMAX])
        & (head[:, g.I_IMIN] <= head[:, g.I_IMAX])
    )
    tj0 = head[:, g.I_JMIN] // TILE_W
    tj1 = head[:, g.I_JMAX] // TILE_W
    ty0 = head[:, g.I_IMIN] // TILE_H
    ty1 = head[:, g.I_IMAX] // TILE_H
    rows = jnp.arange(tiles_y, dtype=jnp.int32)[:, None, None]
    cols = jnp.arange(tiles_x, dtype=jnp.int32)[None, :, None]
    hit = ((rows >= ty0) & (rows <= ty1)
           & (cols >= tj0) & (cols <= tj1) & live)  # (ty, tx, n_head)
    hit = hit.reshape(num_tiles, n_head)
    counts = hit.sum(axis=1, dtype=jnp.int32)
    ids = jnp.arange(n_head, dtype=jnp.int32)
    lists = jnp.sort(
        jnp.where(hit, ids[None, :], jnp.int32(n_head)), axis=1
    )

    # Phase-2 hierarchy over the fan tail only: empty every head row so
    # the block/superblock tables skip them (the edge/interpolation
    # columns stay untouched — the list loop shares `hier`).
    row_listed = jnp.arange(tri_i32.shape[0]) < n_head
    hier = tri_i32
    hier = hier.at[:, g.I_JMIN].set(
        jnp.where(row_listed, 1, hier[:, g.I_JMIN]))
    hier = hier.at[:, g.I_JMAX].set(
        jnp.where(row_listed, 0, hier[:, g.I_JMAX]))
    hier = hier.at[:, g.I_VALID].set(
        jnp.where(row_listed, 0, hier[:, g.I_VALID]))
    blocks = g.block_bounds(jnp, hier)
    blocks, supers = g.super_bounds(jnp, blocks)
    return (counts, lists.reshape(num_tiles * n_head, 1), supers, blocks,
            hier, tri_f32)


def _small_grid_spec(grid, n_head, num_outs, extra_scratch):
    """Grid spec for the small-scene path: counts scalar-prefetched, the
    per-tile list delivered as ONE (n_head, 1) block per grid step (the
    whole (tiles*n_head, 1) array in VMEM would lane-pad 1 -> 128 and
    need tens of MB)."""
    tiles_x = grid[1]
    tile_spec = pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j),
                             memory_space=pltpu.VMEM)
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # counts -> SMEM
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # supers
            pl.BlockSpec(memory_space=pltpu.VMEM),  # blocks (fan hier)
            pl.BlockSpec((n_head, 1), lambda i, j, *_: (i * tiles_x + j, 0),
                         memory_space=pltpu.VMEM),  # this tile's list
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ti (full rows)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tf
        ],
        out_specs=[tile_spec] * num_outs,
        scratch_shapes=extra_scratch,
    )


def rasterize_setup_pallas_small(tri_i32, tri_f32, width: int, height: int,
                                 interpret: bool = False):
    """Small-scene per-tile-list raster (sort-free prep), bit-identical to
    rasterize_setup_pallas / rasterize_setup_pallas_binned."""
    assert height % TILE_H == 0 and width % TILE_W == 0
    grid = (height // TILE_H, width // TILE_W)
    counts, lists, supers, blocks, ti, tf = prepare_binned_small(
        tri_i32, tri_f32, width, height
    )
    n_head = lists.shape[0] // (grid[0] * grid[1])
    color, depth = _pallas_call(
        partial(_binned_kernel, local_lists=True),
        grid_spec=_small_grid_spec(
            grid, n_head, 2,
            [
                pltpu.VMEM((TILE_H, TILE_W), jnp.float32),  # zbuf
                pltpu.VMEM((TILE_H, TILE_W), jnp.int32),  # tidbuf
            ] + [pltpu.VMEM((TILE_H, TILE_W), jnp.float32) for _ in range(4)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((height, width), jnp.uint32),
            jax.ShapeDtypeStruct((height, width), jnp.float32),
        ],
        interpret=interpret,
    )(counts, supers, blocks, lists, ti, tf)
    return color, depth


def rasterize_gbuffer_pallas_small(tri_i32, tri_f32, width: int, height: int,
                                   interpret: bool = False):
    """Small-scene per-tile-list G-buffer raster — same 13 planes as
    rasterize_gbuffer_pallas, sort-free prep."""
    assert height % TILE_H == 0 and width % TILE_W == 0
    grid = (height // TILE_H, width // TILE_W)
    counts, lists, supers, blocks, ti, tf = prepare_binned_small(
        tri_i32, tri_f32, width, height
    )
    n_head = lists.shape[0] // (grid[0] * grid[1])
    plane = lambda dt: jax.ShapeDtypeStruct((height, width), dt)
    outs = _pallas_call(
        partial(_binned_gbuffer_kernel, local_lists=True),
        grid_spec=_small_grid_spec(
            grid, n_head, 13,
            [
                pltpu.VMEM((TILE_H, TILE_W), jnp.float32),  # zbuf
                pltpu.VMEM((TILE_H, TILE_W), jnp.int32),  # tidbuf
            ] + [pltpu.VMEM((TILE_H, TILE_W), jnp.float32)
                 for _ in range(15)],
        ),
        out_shape=[plane(jnp.uint32)] + [plane(jnp.float32)] * 12,
        interpret=interpret,
    )(counts, supers, blocks, lists, ti, tf)
    return outs


def rasterize_depth_pallas_small(tri_i32, tri_f32, width: int, height: int,
                                 interpret: bool = False):
    """Small-scene per-tile-list depth-only raster (shadow-map pass)."""
    assert height % TILE_H == 0 and width % TILE_W == 0
    grid = (height // TILE_H, width // TILE_W)
    counts, lists, supers, blocks, ti, tf = prepare_binned_small(
        tri_i32, tri_f32, width, height
    )
    n_head = lists.shape[0] // (grid[0] * grid[1])
    (depth,) = _pallas_call(
        partial(_binned_depth_kernel, local_lists=True),
        grid_spec=_small_grid_spec(
            grid, n_head, 1, [pltpu.VMEM((TILE_H, TILE_W), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((height, width), jnp.float32)],
        interpret=interpret,
    )(counts, supers, blocks, lists, ti, tf)
    return depth


def unpack_rgba8(packed_u32):
    """(H, W) u32 -> (H, W, 4) u8 (little-endian channel order r,g,b,a)."""
    p = packed_u32
    return jnp.stack(
        [
            (p & 0xFF).astype(jnp.uint8),
            ((p >> 8) & 0xFF).astype(jnp.uint8),
            ((p >> 16) & 0xFF).astype(jnp.uint8),
            ((p >> 24) & 0xFF).astype(jnp.uint8),
        ],
        axis=-1,
    )


def render_frame_pallas(positions, attrs, tri_vidx, matrices, node_ids,
                        width: int, height: int,
                        pad_height: int, pad_width: int,
                        interpret: bool = False, binning: str = "auto",
                        vertex_shader=None, raw_packed: bool = False,
                        meshlet_cull=None):
    """Full frame: shared geometry pipeline + Pallas raster.

    Geometry runs at the true (width, height) viewport; the raster target is
    padded to tile multiples and cropped by the caller.  Large scenes
    (> VMEM_RESIDENT_MAX_TRIS slots) automatically stream triangle data
    from HBM; small scenes keep it VMEM-resident.

    ``binning``: "hierarchy" (union-bbox block/superblock skip),
    "tile_lists" (per-tile sorted triangle lists via the pair-argsort
    prep — the explicit choice for dense soups), "small" (sort-free
    dense-mask per-tile lists, small scenes only), or "auto" (small up
    to SMALL_BIN_MAX_ROWS rows, hierarchy above; VMEM-resident scenes
    only, larger ones stream from HBM).
    """
    tri_i32, tri_f32 = g.geometry_pipeline(
        jnp, positions, attrs, tri_vidx, matrices, node_ids, width, height,
        vertex_shader=vertex_shader,
    )
    if meshlet_cull is not None:
        # Cluster culling (the mesh-shader-pipeline analog): kill every
        # head row of a provably-invisible meshlet (frustum sphere +
        # backface cone, both conservative — bit-exact image contract).
        # Killed rows vanish from the block/superblock tables AND the
        # pair lists, so the whole raster phase skips them; meshlets
        # align with RASTER_BLOCK (engine/upload.py build_meshlet_table).
        bounds, mdraw, enabled, cam_local = meshlet_cull
        keep = g.meshlet_keep_mask(jnp, bounds, mdraw, enabled,
                                   matrices, cam_local)
        n_tris = keep.shape[0] * g.RASTER_BLOCK
        kill = jnp.concatenate([
            jnp.repeat(~keep, g.RASTER_BLOCK),
            jnp.zeros(tri_i32.shape[0] - n_tris, bool),  # fans stay
        ])
        tri_i32 = _kill_rows(jnp, tri_i32, kill)
    # NOTE on the alternative large-scene kernels — both measured SLOWER
    # than the single-pass HBM hierarchy kernel at 1M triangles and kept
    # only as tested, bit-identical experiments:
    # * per-TRIANGLE visibility split (rasterize_setup_pallas_vis):
    #   377 ms plain / 580 ms with the hit-bitmap traversal vs 336 ms —
    #   the per-(tile, triangle) cost is scalar loop/branch machinery,
    #   which the split does not remove;
    # * TRANSPOSED-group visibility kernel
    #   (rasterize_setup_pallas_trans): ~433 ms kernel + ~124 ms resolve
    #   vs 336 ms total.  Replacing the per-triangle scalar reads with
    #   aligned (8,1) sublane-vector loads did NOT pay: the per-row
    #   cross-sublane z/id merges + dynamic row RMW cost more than the
    #   scalar machinery they replace (honest barrier'd-scan timing;
    #   CAUTION: un-barrier'd loop-invariant scan benchmarks are
    #   LICM-hoisted by XLA and read reps-times too fast — see
    #   docs/PERFORMANCE.md "Benchmark traps").
    if _use_tile_lists(binning, tri_i32.shape[0]):
        # Explicit tile_lists = the dense-soup choice: at HBM scale the
        # coarse second list class rides along (same-run 1M-soup A/B:
        # 8359 -> 1155 ms/frame, 7.2x, digests bit-equal — the leftover
        # phase no longer scans the per-tile hierarchy;
        # docs/PERFORMANCE.md round-5 section).
        raster = (
            partial(rasterize_setup_pallas_binned_hbm, coarse_cap=8)
            if tri_i32.shape[0] > VMEM_RESIDENT_MAX_TRIS
            else rasterize_setup_pallas_binned
        )
    elif tri_i32.shape[0] > VMEM_RESIDENT_MAX_TRIS:
        # Large-scene default: the pair-ordered record-streaming binned
        # kernel — 111.8 ms vs the hbm1 hierarchy's 315.5 ms at the 1M
        # lattice (2.82x, bit-equal, benchmarks/binned_ab.py on v5e,
        # 2026-08-21), and the hierarchy's per-tile block scan is
        # catastrophic on incoherent soups (watchdog-killed at a 1M
        # soup).  binning="hierarchy" keeps the old kernel reachable.
        raster = (
            rasterize_setup_pallas_hbm
            if binning == "hierarchy"
            else rasterize_setup_pallas_binned_hbm
        )
    elif _use_small_bins(binning, tri_i32.shape[0]):
        raster = rasterize_setup_pallas_small
    else:
        raster = rasterize_setup_pallas
    color, depth = raster(
        tri_i32, tri_f32, pad_width, pad_height, interpret=interpret
    )
    if raw_packed:
        # Benchmark/animation-scan form: the PADDED packed-u32 color and
        # depth, no crop and no u8 unpack — the per-frame digest reduces
        # the packed plane directly, saving several full-frame passes.
        return color, depth
    return color[:height, :width], depth[:height, :width]


render_frame_pallas_jit = partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))(
    render_frame_pallas
)
