"""Temporal anti-aliasing resolve (BASELINE.json config 4 "TAA resolve").

Standard TAA structure, all fused XLA elementwise work:

* the projection is jittered each frame by a Halton(2,3) sub-pixel offset
  (``jittered_view_proj``), which the fixed-point rasterizer turns into
  varying coverage;
* the resolve blends the new frame into an exponential history buffer with
  3x3 neighborhood min/max clamping (the classic ghosting fix).

The history buffer is a device-resident (H, W, 3) i32 buffer of 16-bit
fixed-point color (u8 * 257) the engine carries between frames (the
analog of a persistent render target).  The blend is pure integer math
with a 1/64-quantized alpha, which makes the resolve bit-identical in
every compilation context — single device, shard_map bands, interpret
mode — the property tests/test_config4.py relies on.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def halton(index: int, base: int) -> float:
    f, r = 1.0, 0.0
    i = index + 1
    while i > 0:
        f /= base
        r += f * (i % base)
        i //= base
    return r


def jitter_sequence(n: int = 8) -> np.ndarray:
    """(n, 2) sub-pixel jitters in [-0.5, 0.5) (Halton 2,3)."""
    return np.array(
        [[halton(i, 2) - 0.5, halton(i, 3) - 0.5] for i in range(n)],
        np.float32,
    )


def jittered_view_proj(view_proj: np.ndarray, jitter_xy,
                       width: int, height: int) -> np.ndarray:
    """Offset the projection by a sub-pixel translate in NDC (row-vector:
    add to the z-divided output via the matrix's w column pass-through)."""
    j = np.array(view_proj, np.float32)
    jx = 2.0 * float(jitter_xy[0]) / width
    jy = -2.0 * float(jitter_xy[1]) / height  # y flips in the viewport
    # Row-vector convention: ndc_x' = ndc_x + jx means adding jx * w_clip to
    # clip x, i.e. column 0 += jx * column 3.
    j[:, 0] = j[:, 0] + jx * j[:, 3]
    j[:, 1] = j[:, 1] + jy * j[:, 3]
    return j


def _neighborhood_minmax(frame, axes=(0, 1)):
    """3x3 min/max per pixel (wrap-clamped, like the original 8-roll
    form).  SEPARABLE: a vertical 3-tap pass then a horizontal 3-tap
    pass over the reduced planes — integer min/max is associative, so
    the result is bit-identical to the dense 3x3 while doing 6 rolls +
    8 min/max ops instead of 8 rolls + 16."""
    ay, ax = axes
    up = jnp.roll(frame, 1, axis=ay)
    dn = jnp.roll(frame, -1, axis=ay)
    lo_v = jnp.minimum(jnp.minimum(frame, up), dn)
    hi_v = jnp.maximum(jnp.maximum(frame, up), dn)
    lo = jnp.minimum(
        jnp.minimum(lo_v, jnp.roll(lo_v, 1, axis=ax)),
        jnp.roll(lo_v, -1, axis=ax),
    )
    hi = jnp.maximum(
        jnp.maximum(hi_v, jnp.roll(hi_v, 1, axis=ax)),
        jnp.roll(hi_v, -1, axis=ax),
    )
    return lo, hi


# History is a 16-bit fixed-point render target: u8 channel x maps to
# x * 257 in [0, 65535] (the exact 8->16 bit replication, 255 -> 65535).
# Why fixed point and not f32 [0, 1]: the blend `h*(1-a) + c*a` is an
# FMA-contraction candidate, and whether XLA/LLVM contracts it depends on
# the surrounding fusion context — measured: the same frame resolved under
# a band-sharded mesh differed from the single-device resolve by 1 LSB on
# 2/32K pixels, and eager vs jitted execution differed on thousands of
# history ulps (optimization_barrier does NOT stop the backend-level
# contraction).  Integer multiply/add/shift round identically in every
# compilation context, so the sharded config-4 composition is bit-exact by
# construction (tests/test_config4.py) — and a quantized history target is
# standard renderer practice (real engines resolve TAA into 10-16 bit
# render targets, not f32).
FIXED_MAX = 65535
BLEND_DENOM = 64  # alpha quantized to x/64


def taa_init_history(current_u8):
    """First-frame history: the current frame in 16-bit fixed point."""
    return current_u8[..., :3].astype(jnp.int32) * 257


def taa_resolve(history_i32, current_u8, alpha: float = 0.1):
    """Blend the current frame into the history with neighborhood clamping.

    history_i32: (H, W, 3) i32 fixed-point accumulated color
    (taa_init_history of the first frame); current_u8: (H, W, 4) u8.
    Returns (new_history_i32, resolved_u8).  alpha is quantized to
    round(alpha * 64)/64; the minimum representable alpha is 1/128
    (anything smaller quantizes to 0 and raises).
    """
    w = int(round(alpha * BLEND_DENOM))
    if not 0 < w <= BLEND_DENOM:
        raise ValueError(
            f"alpha={alpha} quantizes to {w}/{BLEND_DENOM}; it must "
            f"round to a nonzero multiple of 1/{BLEND_DENOM} in (0, 1] "
            f"(minimum alpha is 1/{2 * BLEND_DENOM})")
    # PLANAR internals: (H, W, 3) uses 3 of 128 TPU lanes; moving
    # channels to the leading dim gives every elementwise/roll op full
    # (8, 128) tiles over (H, W) planes.  Pure data movement — the
    # integer arithmetic is unchanged, so results stay bit-identical to
    # the channel-minor form in every compilation context.
    cur = jnp.moveaxis(
        current_u8[..., :3].astype(jnp.int32), -1, 0) * 257  # (3, H, W)
    histp = jnp.moveaxis(history_i32, -1, 0)
    lo, hi = _neighborhood_minmax(cur, axes=(1, 2))
    clamped = jnp.clip(histp, lo, hi)
    # max operand: 65535 * 64 + 32 < 2^23 — exact in i32 with headroom.
    outp = (clamped * (BLEND_DENOM - w) + cur * w
            + BLEND_DENOM // 2) >> (BLEND_DENOM.bit_length() - 1)
    resolvedp = ((outp + 128) // 257).astype(jnp.uint8)
    out = jnp.moveaxis(outp, 0, -1)
    resolved = jnp.moveaxis(resolvedp, 0, -1)
    alpha_ch = jnp.full((*out.shape[:2], 1), 255, jnp.uint8)
    return out, jnp.concatenate([resolved, alpha_ch], axis=-1)


def taa_init_history_packed(packed_u32):
    """First-frame history from the raster's PACKED u32 frame: (3, H, W)
    i32 fixed-point channel planes — the layout-native form (each plane
    is perfectly (8, 128)-tiled; the channel-minor (H, W, 3) form uses 3
    of 128 TPU lanes and measured ~13 ms/frame at 1080p)."""
    r = (packed_u32 & 0xFF).astype(jnp.int32)
    g = ((packed_u32 >> 8) & 0xFF).astype(jnp.int32)
    b = ((packed_u32 >> 16) & 0xFF).astype(jnp.int32)
    return jnp.stack([r, g, b], axis=0) * 257


def taa_resolve_packed(history3, packed_u32, alpha: float = 0.1):
    """taa_resolve on the packed-u32 frame with (3, H, W) history planes.

    Bit-identical arithmetic to taa_resolve per channel (same integer
    blend, same separable wrap 3x3 clamp) with NO channel-minor arrays
    anywhere: channels unpack straight from the packed plane and the
    resolved frame repacks to u32.  Returns (new_history3, resolved_u32).
    """
    w = int(round(alpha * BLEND_DENOM))
    if not 0 < w <= BLEND_DENOM:
        raise ValueError(
            f"alpha={alpha} quantizes to {w}/{BLEND_DENOM}; it must "
            f"round to a nonzero multiple of 1/{BLEND_DENOM} in (0, 1] "
            f"(minimum alpha is 1/{2 * BLEND_DENOM})")
    cur = taa_init_history_packed(packed_u32)  # (3, H, W) fixed point
    lo, hi = _neighborhood_minmax(cur, axes=(1, 2))
    clamped = jnp.clip(history3, lo, hi)
    out = (clamped * (BLEND_DENOM - w) + cur * w
           + BLEND_DENOM // 2) >> (BLEND_DENOM.bit_length() - 1)
    res = ((out + 128) // 257).astype(jnp.uint32)
    packed = (res[0] | (res[1] << 8) | (res[2] << 16)
              | jnp.uint32(0xFF000000))
    return out, packed
