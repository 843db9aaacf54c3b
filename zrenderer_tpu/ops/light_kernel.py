"""Tiled deferred lighting — Pallas kernel for the many-lights config.

The XLA formulation of 256-point-light GGX materializes (H, W, chunk, ...)
temporaries and goes HBM-bandwidth-bound (~145 ms/frame at 1080p).  This
kernel is the classic tiled-deferred structure mapped to TPU:

* grid over (32, 128) screen tiles; all G-buffer planes for the tile are
  loaded into VMEM once and the light accumulation never touches HBM;
* lights stream as scalar constants; a per-light conservative screen-space
  bounding box (computed once per frame in XLA from the light's influence
  radius) lets each tile skip lights that cannot affect it — tiled light
  culling, the standard real-time many-light technique;
* per (tile, light): Blinn/GGX-style evaluation as ~40 VPU ops on the
  whole tile.

The influence radius uses a 1/512 radiance cutoff (below u8 quantization),
so culling is visually lossless.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 32
TILE_W = 128
LIGHT_UNROLL = 8  # light-loop unroll (amortizes ~120 ns/iter loop cost)

# lights packed as (L, 8): x, y, z, r, g, b, 0, 0
# light screen bounds packed as (L, 4) i32: jmin, jmax, imin, imax


def light_screen_bounds(light_pos, light_color, view_proj,
                        width: int, height: int, cutoff: float = 1.0 / 512.0):
    """Conservative per-light screen bbox from the influence radius.

    Lights behind the camera or enclosing it get the full screen
    (conservative).  Runs once per frame in XLA.
    """
    intensity = jnp.max(light_color, axis=-1)
    radius = jnp.sqrt(jnp.maximum(intensity / cutoff, 1e-6))  # 1/d^2 < cutoff

    # Explicit f32 multiply-adds (default matmul precision is bf16 on the
    # TPU MXU; culling must clip with the same numbers the shade uses).
    px, py, pz = light_pos[:, 0], light_pos[:, 1], light_pos[:, 2]
    m = view_proj
    clip = jnp.stack(
        [px * m[0, j] + py * m[1, j] + pz * m[2, j] + m[3, j]
         for j in range(4)],
        axis=-1,
    )
    w = clip[:, 3]
    safe_w = jnp.where(jnp.abs(w) > 1e-6, w, 1e-6)
    ndc = clip[:, :3] / safe_w[:, None]
    sx = (ndc[:, 0] + 1.0) * (width * 0.5)
    sy = (1.0 - ndc[:, 1]) * (height * 0.5)
    # Screen-space radius: world radius scaled by the projective factor
    # (proj[0,0] * width/2 / w) — conservative for points in front.
    scale = jnp.abs(view_proj[0, 0]) * (width * 0.5) / jnp.maximum(w, 1e-3)
    sr = radius * scale + 1.0

    jmin = jnp.floor(sx - sr).astype(jnp.int32)
    jmax = jnp.ceil(sx + sr).astype(jnp.int32)
    imin = jnp.floor(sy - sr).astype(jnp.int32)
    imax = jnp.ceil(sy + sr).astype(jnp.int32)
    # Behind / near the camera plane: conservatively light the whole frame.
    full = w < 1e-3
    jmin = jnp.where(full, 0, jnp.clip(jmin, 0, width - 1))
    jmax = jnp.where(full, width - 1, jnp.clip(jmax, 0, width - 1))
    imin = jnp.where(full, 0, jnp.clip(imin, 0, height - 1))
    imax = jnp.where(full, height - 1, jnp.clip(imax, 0, height - 1))
    return jnp.stack([jmin, jmax, imin, imax], axis=1)


def _tiled_light_kernel(counts_ref, lights_ref, list_ref, consts_ref,
                        alb_r, alb_g, alb_b, nx, ny, nz, wx, wy, wz, mask,
                        met, rgh,
                        out_r, out_g, out_b):
    """Cook-Torrance GGX per (tile, light-in-list) — the same BRDF as the
    XLA reference (ops/shading.py:ggx_shade_many_lights), with per-pixel
    metallic/roughness planes from the G-buffer driving f0, the
    distribution, and geometry terms (the material system's hot path).

    Light culling is a compacted PER-TILE LIST built in XLA from the
    conservative screen bounds: ``counts_ref`` (scalar-prefetched, one int
    per tile) and ``list_ref`` ((tiles, L) light indices, hits first).
    The loop visits exactly counts[tile] lights — culled lights cost
    nothing here (the earlier per-light bounds-check + cond cost ~0.25 us
    per (tile, light) even when skipped, which dominated sparse scenes)."""
    tile_i = pl.program_id(0)
    tile_j = pl.program_id(1)
    tile_idx = tile_i * pl.num_programs(1) + tile_j

    cam_x = consts_ref[0, 0]
    cam_y = consts_ref[0, 1]
    cam_z = consts_ref[0, 2]
    ambient = consts_ref[0, 3]

    # Per-pixel prologue: normalize normal + view, material-derived terms.
    # Plane loads upcast to f32 (no-op for f32 planes; the bf16 experiment
    # stores the G-buffer planes half-width and pays one cast here — see
    # ``tiled_deferred_lighting(plane_dtype=...)``).
    f32 = jnp.float32
    nxv, nyv, nzv = nx[...].astype(f32), ny[...].astype(f32), nz[...].astype(f32)
    inv_nlen = jax.lax.rsqrt(
        jnp.maximum(nxv * nxv + nyv * nyv + nzv * nzv, 1e-12)
    )
    nxv, nyv, nzv = nxv * inv_nlen, nyv * inv_nlen, nzv * inv_nlen

    wxv, wyv, wzv = wx[...].astype(f32), wy[...].astype(f32), wz[...].astype(f32)
    vx, vy, vz = cam_x - wxv, cam_y - wyv, cam_z - wzv
    inv_vlen = jax.lax.rsqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-12))
    vx, vy, vz = vx * inv_vlen, vy * inv_vlen, vz * inv_vlen
    nv_raw = nxv * vx + nyv * vy + nzv * vz
    ndotv = jnp.maximum(nv_raw, 1e-4)

    ar, ag, ab = (alb_r[...].astype(f32), alb_g[...].astype(f32),
                  alb_b[...].astype(f32))
    mv = met[...].astype(f32)
    rv = rgh[...].astype(f32)
    one_minus_m = 1.0 - mv
    f0r = 0.04 * one_minus_m + ar * mv
    f0g = 0.04 * one_minus_m + ag * mv
    f0b = 0.04 * one_minus_m + ab * mv
    omf0r = 1.0 - f0r
    omf0g = 1.0 - f0g
    omf0b = 1.0 - f0b
    a = rv * rv
    a2 = a * a
    k = (rv + 1.0) * (rv + 1.0) * 0.125  # Smith-Schlick k
    one_minus_k = 1.0 - k
    gv = ndotv / (ndotv * one_minus_k + k)
    inv_pi = jnp.float32(1.0 / jnp.pi)
    # Algebraically merged specular (identical form in the XLA reference,
    # ops/shading.py:ggx_shade_many_lights): the Smith N.L numerator and
    # the 4 N.V N.L denominator cancel against the rendering equation's
    # N.L, so the per-pixel factor is ONE constant and each light pays a
    # single divide: spec = cs / [pi d^2 * (N.L (1-k) + k)].
    cs = a2 * gv * 0.25 / ndotv
    a2m1 = a2 - 1.0
    # Diffuse base per channel: (1-F)*kd*albedo/pi == db + F*(spec - db).
    dbr = one_minus_m * ar * inv_pi
    dbg = one_minus_m * ag * inv_pi
    dbb = one_minus_m * ab * inv_pi

    acc_r = ar * ambient
    acc_g = ag * ambient
    acc_b = ab * ambient

    def body(slot, acc):
        acc_r, acc_g, acc_b = acc

        def lit(_):
            # list_ref is this tile's (1, L, 8) compacted light-data block
            # (gathered in the XLA prepass): the dynamic index lands in the
            # sublane dim, which Mosaic compiles; dynamic lane-dim indexing
            # does not ("multiple of 128" error), and an in-kernel index
            # list would need exactly that.
            lx = list_ref[0, slot, 0]
            ly = list_ref[0, slot, 1]
            lz = list_ref[0, slot, 2]
            cr = list_ref[0, slot, 3]
            cg = list_ref[0, slot, 4]
            cb = list_ref[0, slot, 5]

            dx, dy, dz = lx - wxv, ly - wyv, lz - wzv
            d2 = dx * dx + dy * dy + dz * dz
            inv_d = jax.lax.rsqrt(jnp.maximum(d2, 1e-12))
            lxn, lyn, lzn = dx * inv_d, dy * inv_d, dz * inv_d
            nl_raw = nxv * lxn + nyv * lyn + nzv * lzn
            ndotl = jnp.maximum(nl_raw, 0.0)
            # Half vector by identity: |l+v|^2 = 2 + 2 l.v (l, v unit),
            # N.h = (N.l + N.v) / |h|, V.h = (1 + l.v) / |h|.
            ldotv = lxn * vx + lyn * vy + lzn * vz
            inv_h = jax.lax.rsqrt(jnp.maximum(2.0 + 2.0 * ldotv, 1e-12))
            ndoth = jnp.maximum((nl_raw + nv_raw) * inv_h, 0.0)
            vdoth = jnp.maximum((1.0 + ldotv) * inv_h, 0.0)

            # Merged GGX distribution + Smith + energy terms: ONE
            # reciprocal, in hardware-approximate form (~2^-12 relative
            # error => <=0.06 u8 LSB on the packed output; interpret mode
            # computes it exactly, so CPU parity tests are unchanged).
            dterm = ndoth * ndoth * a2m1 + 1.0
            denom = jnp.maximum(jnp.pi * dterm * dterm, 1e-8) * (
                ndotl * one_minus_k + k
            )
            spec = cs * pl.reciprocal(denom, approx=True)
            t = jnp.clip(1.0 - vdoth, 0.0, 1.0)
            t2 = t * t
            t5 = t2 * t2 * t
            fr = f0r + omf0r * t5
            fg = f0g + omf0g * t5
            fb = f0b + omf0b * t5
            rad = ndotl * (inv_d * inv_d)  # 1/d^2 radiance * N.L
            return (
                acc_r + (dbr + fr * (spec - dbr)) * (cr * rad),
                acc_g + (dbg + fg * (spec - dbg)) * (cg * rad),
                acc_b + (dbb + fb * (spec - dbb)) * (cb * rad),
            )

        return lit(None)

    # Unrolled by LIGHT_UNROLL (a Mosaic fori_loop iteration costs ~120 ns
    # of loop machinery): rows beyond counts[tile] are zero-color padding
    # (see the prepass), contributing exactly 0, so the loop rounds the
    # trip count up to whole groups with no masking.
    count = counts_ref[tile_idx]

    def group(q, acc):
        base = q * LIGHT_UNROLL
        for u in range(LIGHT_UNROLL):
            acc = body(base + u, acc)
        return acc

    groups = (count + LIGHT_UNROLL - 1) // LIGHT_UNROLL
    acc_r, acc_g, acc_b = jax.lax.fori_loop(
        0, groups, group, (acc_r, acc_g, acc_b)
    )
    m = mask[...] > 0
    out_r[...] = jnp.where(m, acc_r, 0.0)
    out_g[...] = jnp.where(m, acc_g, 0.0)
    out_b[...] = jnp.where(m, acc_b, 0.0)


def tiled_deferred_lighting(albedo, normal, world, covered, cam_pos,
                            light_pos, light_color, view_proj,
                            ambient=0.03, roughness=0.4, metallic=0.0,
                            interpret: bool = False,
                            plane_dtype=jnp.float32,
                            row_offset=0, full_height: int | None = None):
    """Run the tiled GGX lighting kernel over a full frame.

    albedo/normal/world: (H, W, 3) f32; covered: (H, W) bool;
    roughness/metallic: scalars OR per-pixel (H, W) planes (the G-buffer's
    per-draw material constants).  Returns (H, W, 3) f32 linear RGB.
    H, W must be tile multiples (the engine's padded framebuffer is).

    ``row_offset``/``full_height``: light a horizontal BAND of a
    ``full_height``-tall frame whose first row is global row
    ``row_offset`` (traced ok) — the multi-chip deferred path.  Light
    screen bounds and the per-tile culling then use global coordinates;
    the per-tile light lists are built for the band's tiles only.

    ``plane_dtype=jnp.bfloat16`` is the opt-in bf16 experiment: the 12
    G-buffer planes are stored/streamed half-width (halving their HBM->VMEM
    traffic) and upcast to f32 in the kernel prologue; all BRDF math and
    the accumulator stay f32 (the TPU VPU computes f32 natively, so only
    bandwidth — not ALU — can win).  Off by default because bf16 world
    positions quantize shadow-scale geometry (~8-bit mantissa) and the
    default path's contract is 1-LSB parity with the XLA reference shade.
    """
    h, w = covered.shape
    assert h % TILE_H == 0 and w % TILE_W == 0
    grid = (h // TILE_H, w // TILE_W)

    num = light_pos.shape[0]
    lights = jnp.concatenate(
        [light_pos, light_color, jnp.zeros((num, 2), jnp.float32)], axis=1
    )
    # Tiled light culling as an XLA prepass: conservative screen bounds ->
    # per-tile COMPACTED light lists (hits first, stable order preserves
    # the reference accumulation order) + counts.  The kernel loop then
    # visits exactly counts[tile] lights.
    bounds = light_screen_bounds(light_pos, light_color, view_proj, w,
                                 h if full_height is None else full_height)
    ty, tx = grid
    row0 = (jnp.arange(ty, dtype=jnp.int32) * TILE_H
            + jnp.asarray(row_offset, jnp.int32))[:, None, None]
    col0 = (jnp.arange(tx, dtype=jnp.int32) * TILE_W)[None, :, None]
    jmin, jmax = bounds[None, None, :, 0], bounds[None, None, :, 1]
    imin, imax = bounds[None, None, :, 2], bounds[None, None, :, 3]
    hit = ((jmax >= col0) & (jmin < col0 + TILE_W)
           & (imax >= row0) & (imin < row0 + TILE_H))  # (ty, tx, L)
    hit = hit.reshape(ty * tx, num)
    counts = hit.sum(axis=1).astype(jnp.int32)
    order = jnp.argsort(~hit, axis=1, stable=True)  # hits first, id order
    # Gather each tile's compacted light DATA (tiles, Lpad, 8) — the
    # kernel then has zero indirection: slot k of its block IS light k of
    # its list.  Rows past counts[tile] are ZEROED (color 0 contributes
    # exactly nothing) so the unrolled kernel loop can round trip counts
    # up to whole LIGHT_UNROLL groups without masking.  ~0.5 MB at 256
    # lights/510 tiles, built once per frame in XLA.
    tile_light_data = jnp.take(lights, order, axis=0)
    live = jnp.arange(num, dtype=jnp.int32)[None, :] < counts[:, None]
    tile_light_data = jnp.where(live[..., None], tile_light_data, 0.0)
    num_pad = -(-num // LIGHT_UNROLL) * LIGHT_UNROLL
    if num_pad != num:
        tile_light_data = jnp.pad(
            tile_light_data, ((0, 0), (0, num_pad - num), (0, 0)))

    consts = jnp.asarray(
        [[cam_pos[0], cam_pos[1], cam_pos[2], ambient, 0.0, 0.0, 0.0, 0.0]],
        jnp.float32,
    )
    met = jnp.broadcast_to(jnp.asarray(metallic, jnp.float32), (h, w))
    rgh = jnp.broadcast_to(jnp.asarray(roughness, jnp.float32), (h, w))

    def plane_cast(x):
        return x.astype(plane_dtype)

    tile_spec = pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j),
                             memory_space=pltpu.VMEM)
    plane = jax.ShapeDtypeStruct((h, w), jnp.float32)
    out_r, out_g, out_b = pl.pallas_call(
        _tiled_light_kernel,
        # Lights/lists/consts stay in VMEM: measured on hardware, Mosaic
        # compiles the dynamically-indexed (L, k) scalar loads from VMEM
        # ~200x faster than the SMEM alternative at 256 lights (0.5 ms vs
        # 100 ms full-frame) with bit-identical output images.  Counts are
        # scalar-prefetched (SMEM) — one read per tile, loop trip count.
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # lights (unused)
                pl.BlockSpec((1, num_pad, 8),
                             lambda i, j, *_: (i * tx + j, 0, 0),
                             memory_space=pltpu.VMEM),  # tile light data
                pl.BlockSpec(memory_space=pltpu.VMEM),  # consts
            ] + [tile_spec] * 12,
            out_specs=[tile_spec] * 3,
        ),
        out_shape=[plane, plane, plane],
        interpret=interpret,
    )(
        counts, lights, tile_light_data, consts,
        plane_cast(albedo[..., 0]), plane_cast(albedo[..., 1]),
        plane_cast(albedo[..., 2]),
        plane_cast(normal[..., 0]), plane_cast(normal[..., 1]),
        plane_cast(normal[..., 2]),
        plane_cast(world[..., 0]), plane_cast(world[..., 1]),
        plane_cast(world[..., 2]),
        covered.astype(jnp.int32),
        plane_cast(met), plane_cast(rgh),
    )
    return jnp.stack([out_r, out_g, out_b], axis=-1)
