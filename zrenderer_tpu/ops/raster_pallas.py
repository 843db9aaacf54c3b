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

Triangle setup data arrives transposed as (NI32, T) / (NF32, T) so the
per-triangle constants are contiguous scalar loads.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zrenderer_tpu.ops import geometry as g

TILE_H = 32
TILE_W = 128


def _raster_kernel(ti_ref, tf_ref, color_ref, depth_ref,
                   zbuf, nr, ng, nb, den):
    """One screen tile: loop all triangles, keep tile state in VMEM scratch.

    ti_ref: (NI32, T) int32 setup, tf_ref: (NF32, T) f32 setup.
    color_ref: (TILE_H, TILE_W) uint32 out, depth_ref: (TILE_H, TILE_W) f32.
    """
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

    num_tris = ti_ref.shape[1]

    def body(t, carry):
        # Cheap scalar prefilter: does this triangle's bbox touch the tile?
        jmin = ti_ref[g.I_JMIN, t]
        jmax = ti_ref[g.I_JMAX, t]
        imin = ti_ref[g.I_IMIN, t]
        imax = ti_ref[g.I_IMAX, t]
        overlap = (
            (jmax >= col0)
            & (jmin < col0 + TILE_W)
            & (imax >= row0)
            & (imin < row0 + TILE_H)
            & (jmin <= jmax)
            & (imin <= imax)
        )

        @pl.when(overlap)
        def _():
            x0 = ti_ref[g.I_X0, t]
            y0 = ti_ref[g.I_Y0, t]
            x1 = ti_ref[g.I_X1, t]
            y1 = ti_ref[g.I_Y1, t]
            x2 = ti_ref[g.I_X2, t]
            y2 = ti_ref[g.I_Y2, t]
            dx0 = ti_ref[g.I_DX0, t]
            dy0 = ti_ref[g.I_DY0, t]
            dx1 = ti_ref[g.I_DX1, t]
            dy1 = ti_ref[g.I_DY1, t]
            dx2 = ti_ref[g.I_DX2, t]
            dy2 = ti_ref[g.I_DY2, t]
            b0 = ti_ref[g.I_BIAS0, t]
            b1 = ti_ref[g.I_BIAS1, t]
            b2 = ti_ref[g.I_BIAS2, t]

            e0 = dx0 * (py - y1) - dy0 * (px - x1)
            e1 = dx1 * (py - y2) - dy1 * (px - x2)
            e2 = dx2 * (py - y0) - dy2 * (px - x0)
            cov = (e0 >= b0) & (e1 >= b1) & (e2 >= b2)

            ef0 = e0.astype(jnp.float32)
            ef1 = e1.astype(jnp.float32)
            ef2 = e2.astype(jnp.float32)
            z = ef0 * tf_ref[g.F_ZA0, t] + ef1 * tf_ref[g.F_ZA1, t] + ef2 * tf_ref[g.F_ZA2, t]
            zb = zbuf[...]
            ok = cov & (z >= 0.0) & (z < zb)

            zbuf[...] = jnp.where(ok, z, zb)
            den[...] = jnp.where(
                ok,
                ef0 * tf_ref[g.F_RW0, t] + ef1 * tf_ref[g.F_RW1, t] + ef2 * tf_ref[g.F_RW2, t],
                den[...],
            )
            nr[...] = jnp.where(
                ok,
                ef0 * tf_ref[g.F_CR0, t] + ef1 * tf_ref[g.F_CR1, t] + ef2 * tf_ref[g.F_CR2, t],
                nr[...],
            )
            ng[...] = jnp.where(
                ok,
                ef0 * tf_ref[g.F_CG0, t] + ef1 * tf_ref[g.F_CG1, t] + ef2 * tf_ref[g.F_CG2, t],
                ng[...],
            )
            nb[...] = jnp.where(
                ok,
                ef0 * tf_ref[g.F_CB0, t] + ef1 * tf_ref[g.F_CB1, t] + ef2 * tf_ref[g.F_CB2, t],
                nb[...],
            )

        return carry

    jax.lax.fori_loop(0, num_tris, body, 0)

    # Resolve: one perspective divide per pixel, pack RGBA8 into a u32 lane.
    d = den[...]
    covered = d > 0
    inv = jnp.float32(1.0) / jnp.where(covered, d, jnp.float32(1.0))

    def chan(numer, clear):
        c = jnp.where(covered, numer * inv, jnp.float32(clear))
        c = jnp.clip(c, 0.0, 1.0)
        return jnp.floor(c * jnp.float32(255.0) + jnp.float32(0.5)).astype(jnp.uint32)

    r = chan(nr[...], 0.0)
    gch = chan(ng[...], 0.0)
    b = chan(nb[...], 0.0)
    a = jnp.full((TILE_H, TILE_W), 255, jnp.uint32)
    color_ref[...] = r | (gch << 8) | (b << 16) | (a << 24)
    depth_ref[...] = zbuf[...]


def rasterize_setup_pallas(tri_i32_t, tri_f32_t, width: int, height: int,
                           interpret: bool = False):
    """Rasterize transposed setup buffers.

    tri_i32_t: (NI32, T) int32, tri_f32_t: (NF32, T) f32 — transposed setup
    from ops.geometry.  width/height must be multiples of (TILE_W, TILE_H);
    the engine pads the framebuffer and crops (viewport clamping in setup
    already restricts coverage to the true viewport).

    Returns (packed_rgba8 (H, W) uint32, depth (H, W) f32).
    """
    assert height % TILE_H == 0 and width % TILE_W == 0
    grid = (height // TILE_H, width // TILE_W)

    color, depth = pl.pallas_call(
        _raster_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole (NI32, T)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole (NF32, T)
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
    )(tri_i32_t, tri_f32_t)
    return color, depth


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
                        interpret: bool = False):
    """Full frame: shared geometry pipeline + Pallas raster.

    Geometry runs at the true (width, height) viewport; the raster target is
    padded to tile multiples and cropped by the caller.
    """
    tri_i32, tri_f32 = g.geometry_pipeline(
        jnp, positions, attrs, tri_vidx, matrices, node_ids, width, height
    )
    color, depth = rasterize_setup_pallas(
        tri_i32.T, tri_f32.T, pad_width, pad_height, interpret=interpret
    )
    return color[:height, :width], depth[:height, :width]


render_frame_pallas_jit = partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))(
    render_frame_pallas
)
