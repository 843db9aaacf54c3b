"""Block-grouped lane-parallel raster — the round-4 attack on the
~250 ns/visit scalar floor.  MEASURED SLOWER (quarantined): 1116.0 ms
vs hbm1's 317.1 ms at 1M triangles @1080p on v5e (benchmarks/vec_ab.py,
2026-08-21, barrier'd-scan, depth bit-equal).  Post-mortem: each
chunk_eval keeps ~100 live (32, 8, 128) intermediates (~3200 vregs),
so Mosaic spills registers to VMEM throughout the unrolled 16-way
subgroup x chunk body — the spill traffic costs far more than the
amortized scalar machinery saves.  Second finding (fixed here, applies
to any future MXU-gather design): the MXU's DEFAULT f32 matmul path
truncates inputs to one bf16 pass, so the one-hot coefficient gather
was NOT bit-exact on hardware (depth OK / color MISMATCH in the A/B);
``precision=HIGHEST`` restores exactness (verified exact on-chip for
one-hot single-term sums).

Every prior large-scene kernel (hbm1/hbm2/group8/trans/scanline) pays
per-(tile, triangle) SCALAR machinery: 16-30 scalar VMEM reads feeding
scalar->vector splats plus branch/loop overhead, measured at ~250 ns per
visit while the vector math itself is ~2 ns (docs/PERFORMANCE.md).  Four
vectorization attacks failed by replacing it with something worse
(cross-sublane merges, dynamic-row RMW, row sorting).  This kernel
removes the scalar work by LAYOUT instead:

* triangle records live in HBM as one 128-lane row each ((T, 128) i32,
  ints + bitcast floats), so a RASTER_BLOCK of 128 records DMAs as one
  (128, 128) slab — no per-triangle loads at all;
* per 32-triangle SUBGROUP and per 8-row pixel CHUNK, every plane
  evaluates as a (32, 8, 128) array with the TRIANGLE in the leading
  (vreg-batch) dimension: coefficient columns are (32, 1, 1) lane
  slices of the slab broadcast against (1, 8, 128) coordinate planes —
  the per-visit cost becomes pure VPU throughput, amortized over 32
  triangles per op;
* the within-group depth winner is a leading-axis min (31 pairwise
  (8, 128) vector mins) with the oracle's (z, id)-lexicographic rule;
* the winner's attribute COEFFICIENTS come back through an exact
  one-hot MXU matmul ((32, 12) coeffs contracted with the (32, 1024)
  one-hot winner mask: each output column sums exactly one term, so the
  result is bit-exact regardless of MXU accumulation order), and its
  exact edge values through masked leading-axis sums (one nonzero term
  each).

Bit-exactness contract (docs/RASTER_SPEC.md): coverage is the same i32
edge arithmetic (wraparound-equivalent rearrangement with the per-record
folded constant a_k = dy_k*x_a - dx_k*y_a); z and the attribute
numerators use the identical f32 expressions and association as
ops/raster_pallas.py `_kernel_body`; group-winner-then-strict-less
framebuffer merge is outcome-equivalent to the sequential
process-in-id-order rule (ids ascend within and across subgroups).

Traversal reuses the production superblock/block union-bbox skip tables;
subgroup union bboxes ride in spare lanes of the record slab (lanes
24-27 of each subgroup's first row) and cost four scalar reads each.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zrenderer_tpu.ops import geometry as g
from zrenderer_tpu.ops.raster_pallas import (
    TILE_H,
    TILE_W,
    _pallas_call,
    _scan_groups,
)

SUBGROUP = 32            # triangles per vector subgroup (leading dim)
CHUNK_H = 8              # pixel rows per evaluated chunk (one f32 vreg)
REC_LANES = 128          # one record per 128-lane row
_F_BASE = 32             # lane base of the bitcast f32 columns
_A_BASE = 20             # lane base of the folded edge constants a_k
_SG_BBOX = 24            # lane base of the subgroup bbox (rows 0 mod 32)
BIG_Z = 2.0  # beyond any passing depth (z in [0, 1])
BIG_ID = 1 << 30

assert TILE_H % CHUNK_H == 0


def prepare_vec_inputs(tri_i32, tri_f32):
    """Pad to a RASTER_BLOCK multiple and build (supers, blocks, rec):
    rec (T, 128) i32 — lanes [0, 20) the ti columns, [20, 23) the folded
    a_k, [24, 28) the subgroup union bbox on every 32nd row, [32, 72)
    the bitcast tf columns."""
    t = tri_i32.shape[0]
    pad = (-t) % g.RASTER_BLOCK
    if pad:
        tri_i32 = jnp.concatenate(
            [tri_i32, jnp.zeros((pad, g.NI32), jnp.int32)
             .at[:, g.I_JMIN].set(1)], axis=0
        )
        tri_f32 = jnp.concatenate(
            [tri_f32, jnp.zeros((pad, g.NF32), jnp.float32)], axis=0
        )
    t = tri_i32.shape[0]

    blocks = g.block_bounds(jnp, tri_i32)
    blocks, supers = g.super_bounds(jnp, blocks)

    c = lambda k: tri_i32[:, k]
    a0 = c(g.I_DY0) * c(g.I_X1) - c(g.I_DX0) * c(g.I_Y1)
    a1 = c(g.I_DY1) * c(g.I_X2) - c(g.I_DX1) * c(g.I_Y2)
    a2 = c(g.I_DY2) * c(g.I_X0) - c(g.I_DX2) * c(g.I_Y0)

    # Subgroup union bboxes (empty = jmin > jmax for all-dead groups).
    ns = t // SUBGROUP
    valid = (c(g.I_VALID) > 0).reshape(ns, SUBGROUP)
    imax = jnp.iinfo(jnp.int32).max

    def seg(col, empty, red):
        v = jnp.where(valid, col.reshape(ns, SUBGROUP), empty)
        return red(v, axis=1)

    sj0 = seg(c(g.I_JMIN), imax, jnp.min)
    sj1 = seg(c(g.I_JMAX), -imax, jnp.max)
    si0 = seg(c(g.I_IMIN), imax, jnp.min)
    si1 = seg(c(g.I_IMAX), -imax, jnp.max)

    rec = jnp.zeros((t, REC_LANES), jnp.int32)
    rec = rec.at[:, : g.NI32].set(tri_i32)
    rec = rec.at[:, _A_BASE].set(a0)
    rec = rec.at[:, _A_BASE + 1].set(a1)
    rec = rec.at[:, _A_BASE + 2].set(a2)
    rec = rec.at[:, _F_BASE: _F_BASE + g.NF32].set(
        jax.lax.bitcast_convert_type(tri_f32, jnp.int32)
    )
    rec = rec.at[:: SUBGROUP, _SG_BBOX].set(sj0)
    rec = rec.at[:: SUBGROUP, _SG_BBOX + 1].set(sj1)
    rec = rec.at[:: SUBGROUP, _SG_BBOX + 2].set(si0)
    rec = rec.at[:: SUBGROUP, _SG_BBOX + 3].set(si1)
    return supers, blocks, rec


def _vec_kernel(sup_ref, blk_ref, rec_hbm, color_ref, depth_ref,
                zbuf, nr, ng, nb, den, slab, sem,
                gbuf_refs=None, gbuf_scratch=None,
                const_refs=None, const_scratch=None):
    tile_i = pl.program_id(0)
    tile_j = pl.program_id(1)
    row0 = tile_i * TILE_H
    col0 = tile_j * TILE_W

    f32 = jnp.float32
    i32 = jnp.int32
    half = g.SUBPIXEL // 2
    n_chunks = TILE_H // CHUNK_H
    n_sub = g.RASTER_BLOCK // SUBGROUP

    # Lane pixel centers (shared by every chunk): (1, 1, 128).
    ixl = jax.lax.broadcasted_iota(i32, (1, 1, TILE_W), 2)
    pxl = (col0 + ixl) * g.SUBPIXEL + half
    # Row offsets within a chunk: (1, 8, 1).
    iy8 = jax.lax.broadcasted_iota(i32, (1, CHUNK_H, 1), 1)
    # In-subgroup triangle ids: (32, 1, 1).
    tid = jax.lax.broadcasted_iota(i32, (SUBGROUP, 1, 1), 0)

    zbuf[...] = jnp.full((TILE_H, TILE_W), 1.0, f32)
    nr[...] = jnp.zeros((TILE_H, TILE_W), f32)
    ng[...] = jnp.zeros((TILE_H, TILE_W), f32)
    nb[...] = jnp.zeros((TILE_H, TILE_W), f32)
    den[...] = jnp.zeros((TILE_H, TILE_W), f32)
    for buf in (gbuf_scratch or ()) + (const_scratch or ()):
        buf[...] = jnp.zeros((TILE_H, TILE_W), f32)

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

    def chunk_eval(s, c):
        crow0 = row0 + c * CHUNK_H
        rows = slab[s * SUBGROUP:(s + 1) * SUBGROUP, :]

        def colI(k):
            return rows[:, k:k + 1].reshape(SUBGROUP, 1, 1)

        def colF(k):
            return pltpu.bitcast(
                rows[:, _F_BASE + k:_F_BASE + k + 1], f32
            ).reshape(SUBGROUP, 1, 1)

        py = (crow0 + iy8) * g.SUBPIXEL + half  # (1, 8, 1)

        # e_k = a_k + dx_k*py - dy_k*px — wraparound-equivalent to the
        # production dx_k*(py - y_k) - dy_k*(px - x_k) (i32, exact).
        e0 = colI(_A_BASE) + colI(g.I_DX0) * py - colI(g.I_DY0) * pxl
        e1 = colI(_A_BASE + 1) + colI(g.I_DX1) * py - colI(g.I_DY1) * pxl
        e2 = colI(_A_BASE + 2) + colI(g.I_DX2) * py - colI(g.I_DY2) * pxl
        cov = (
            (e0 >= colI(g.I_BIAS0))
            & (e1 >= colI(g.I_BIAS1))
            & (e2 >= colI(g.I_BIAS2))
        )
        alive = (colI(g.I_JMIN) <= colI(g.I_JMAX)) \
            & (colI(g.I_IMIN) <= colI(g.I_IMAX)) \
            & (colI(g.I_VALID) > 0)

        ef0 = e0.astype(f32)
        ef1 = e1.astype(f32)
        ef2 = e2.astype(f32)
        z = ef0 * colF(g.F_ZA0) + ef1 * colF(g.F_ZA1) + ef2 * colF(g.F_ZA2)
        ok = cov & alive & (z >= 0.0)

        zsel = jnp.where(ok, z, BIG_Z)
        zmin = jnp.min(zsel, axis=0)                      # (8, 128)
        idsel = jnp.where(zsel == zmin[None], tid, BIG_ID)
        idmin = jnp.min(idsel, axis=0)                    # (8, 128)
        oh = idsel == idmin[None]                         # one row per px
        ohf = oh.astype(f32)

        # Winner's exact edge values: one nonzero term per pixel.
        ef0w = jnp.sum(jnp.where(oh, ef0, 0.0), axis=0)
        ef1w = jnp.sum(jnp.where(oh, ef1, 0.0), axis=0)
        ef2w = jnp.sum(jnp.where(oh, ef2, 0.0), axis=0)

        # Winner's per-triangle coefficients: exact one-hot MXU gather.
        n_cof = (g.F_CB2 + 1) - g.F_RW0
        cof = pltpu.bitcast(
            rows[:, _F_BASE + g.F_RW0:_F_BASE + g.F_CB2 + 1], f32
        )                                                  # (32, 12)
        extra = 0
        if gbuf_scratch is not None:
            extra += 15                                    # F_U0..F_NZ2
        if const_scratch is not None:
            # The contiguous F_U0.. slice below requires the gbuf block
            # in front of the constants (the G-buffer variant uses both).
            assert gbuf_scratch is not None
            extra += 6                                     # F_MET..F_TEX
        if extra:
            cof = jnp.concatenate([
                cof,
                pltpu.bitcast(
                    rows[:, _F_BASE + g.F_U0:
                         _F_BASE + g.F_U0 + extra], f32
                ),
            ], axis=1)
        # precision=HIGHEST: the MXU's default f32 path truncates inputs
        # to one bf16 pass, which broke bit-exactness on hardware (depth
        # OK / color MISMATCH in the 1M A/B).  HIGHEST uses the exact
        # multi-pass f32 emulation; with a one-hot mask every output
        # column is a single-term sum, so the result is bit-exact.
        gat = jax.lax.dot_general(
            cof, ohf.reshape(SUBGROUP, CHUNK_H * TILE_W),
            (((0,), (0,)), ((), ())), preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(n_cof + extra, CHUNK_H, TILE_W)

        def interp(k):
            return (ef0w * gat[k] + ef1w * gat[k + 1] + ef2w * gat[k + 2])

        denw = interp(0)
        nrw = interp(3)
        ngw = interp(6)
        nbw = interp(9)

        rsel = slice(c * CHUNK_H, (c + 1) * CHUNK_H)
        zb = zbuf[rsel, :]
        upd = zmin < zb
        zbuf[rsel, :] = jnp.where(upd, zmin, zb)
        den[rsel, :] = jnp.where(upd, denw, den[rsel, :])
        nr[rsel, :] = jnp.where(upd, nrw, nr[rsel, :])
        ng[rsel, :] = jnp.where(upd, ngw, ng[rsel, :])
        nb[rsel, :] = jnp.where(upd, nbw, nb[rsel, :])
        if gbuf_scratch is not None:
            for buf, k in zip(gbuf_scratch, range(12, 27, 3)):
                buf[rsel, :] = jnp.where(
                    upd, interp(k), buf[rsel, :]
                )
        if const_scratch is not None:
            cbase = n_cof + extra - 6
            for j, buf in enumerate(const_scratch):
                buf[rsel, :] = jnp.where(
                    upd, gat[cbase + j], buf[rsel, :]
                )

    def visit_block(bk):
        dma = pltpu.make_async_copy(
            rec_hbm.at[pl.ds(bk * g.RASTER_BLOCK, g.RASTER_BLOCK), :],
            slab, sem,
        )
        dma.start()
        dma.wait()
        for s in range(n_sub):
            sj0 = slab[s * SUBGROUP, _SG_BBOX]
            sj1 = slab[s * SUBGROUP, _SG_BBOX + 1]
            si0 = slab[s * SUBGROUP, _SG_BBOX + 2]
            si1 = slab[s * SUBGROUP, _SG_BBOX + 3]
            sub_hit = (sj1 >= col0) & (sj0 < col0 + TILE_W) & (sj0 <= sj1)
            for c in range(n_chunks):
                crow0 = row0 + c * CHUNK_H
                hit = sub_hit & (si1 >= crow0) & (si0 < crow0 + CHUNK_H) \
                    & (si0 <= si1)

                @pl.when(hit)
                def _(s=s, c=c):
                    chunk_eval(s, c)

    _scan_groups(0, sup_ref.shape[0], super_hit, visit_super)

    # Resolve epilogue: identical math to _kernel_body.
    d = den[...]
    covered = d > 0
    inv = f32(1.0) / jnp.where(covered, d, f32(1.0))

    def chan(numer, clear):
        cc = jnp.where(covered, numer * inv, f32(clear))
        cc = jnp.clip(cc, 0.0, 1.0)
        q = jnp.floor(cc * f32(255.0) + f32(0.5))
        return q.astype(i32).astype(jnp.uint32)

    r = chan(nr[...], 0.0)
    gch = chan(ng[...], 0.0)
    b = chan(nb[...], 0.0)
    a = jnp.full((TILE_H, TILE_W), 255, jnp.uint32)
    color_ref[...] = r | (gch << 8) | (b << 16) | (a << 24)
    depth_ref[...] = zbuf[...]
    if gbuf_refs is not None:
        for ref, buf in zip(gbuf_refs, gbuf_scratch):
            ref[...] = jnp.where(covered, buf[...] * inv, f32(0.0))
    if const_refs is not None:
        for ref, buf in zip(const_refs, const_scratch):
            ref[...] = buf[...]


def rasterize_setup_pallas_vec(tri_i32, tri_f32, width: int, height: int,
                               interpret: bool = False):
    """Flat-path block-grouped lane-parallel raster (see module doc)."""
    assert height % TILE_H == 0 and width % TILE_W == 0
    grid = (height // TILE_H, width // TILE_W)
    supers, blocks, rec = prepare_vec_inputs(tri_i32, tri_f32)
    color, depth = _pallas_call(
        _vec_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # supers
            pl.BlockSpec(memory_space=pltpu.VMEM),   # blocks
            pl.BlockSpec(memory_space=pl.ANY),       # rec (HBM)
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
        ] + [
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32) for _ in range(4)
        ] + [
            pltpu.VMEM((g.RASTER_BLOCK, REC_LANES), jnp.int32),  # slab
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(supers, blocks, rec)
    return color, depth


def rasterize_gbuffer_pallas_vec(tri_i32, tri_f32, width: int, height: int,
                                 interpret: bool = False):
    """G-buffer variant: same outputs as rasterize_gbuffer_pallas_hbm
    (packed color, depth, u, v, nx, ny, nz, met, rgh, emr, emg, emb,
    tex)."""
    assert height % TILE_H == 0 and width % TILE_W == 0
    grid = (height // TILE_H, width // TILE_W)
    supers, blocks, rec = prepare_vec_inputs(tri_i32, tri_f32)
    plane = lambda dt: jax.ShapeDtypeStruct((height, width), dt)
    tile_spec = pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)

    def kernel(sup_ref, blk_ref, rec_hbm, color_ref, depth_ref,
               *rest):
        gbuf_refs = rest[0:5]
        const_refs = rest[5:11]
        zbuf, nr, ng, nb, den = rest[11:16]
        gbuf_scratch = rest[16:21]
        const_scratch = rest[21:27]
        slab, sem = rest[27:29]
        _vec_kernel(sup_ref, blk_ref, rec_hbm, color_ref, depth_ref,
                    zbuf, nr, ng, nb, den, slab, sem,
                    gbuf_refs=gbuf_refs, gbuf_scratch=gbuf_scratch,
                    const_refs=const_refs, const_scratch=const_scratch)

    outs = _pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[tile_spec] * 13,
        out_shape=[plane(jnp.uint32)] + [plane(jnp.float32)] * 12,
        scratch_shapes=[
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32) for _ in range(16)
        ] + [
            pltpu.VMEM((g.RASTER_BLOCK, REC_LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(supers, blocks, rec)
    return outs
