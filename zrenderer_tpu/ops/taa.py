"""Temporal anti-aliasing resolve (BASELINE.json config 4 "TAA resolve").

Standard TAA structure, all fused XLA elementwise work:

* the projection is jittered each frame by a Halton(2,3) sub-pixel offset
  (``jittered_view_proj``), which the fixed-point rasterizer turns into
  varying coverage;
* the resolve blends the new frame into an exponential history buffer with
  3x3 neighborhood min/max clamping (the classic ghosting fix).

The history buffer is a device-resident f32 framebuffer the engine carries
between frames (the analog of a persistent render target).
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


def _neighborhood_minmax(frame):
    """3x3 min/max per pixel (edge-clamped)."""
    lo = frame
    hi = frame
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            shifted = jnp.roll(frame, (dy, dx), axis=(0, 1))
            lo = jnp.minimum(lo, shifted)
            hi = jnp.maximum(hi, shifted)
    return lo, hi


def taa_resolve(history_f32, current_u8, alpha: float = 0.1):
    """Blend the current frame into the history with neighborhood clamping.

    history_f32: (H, W, 3) f32 accumulated color (pass current as history on
    the first frame); current_u8: (H, W, 4) u8.  Returns (new_history_f32,
    resolved_u8).
    """
    cur = current_u8[..., :3].astype(jnp.float32) / jnp.float32(255.0)
    lo, hi = _neighborhood_minmax(cur)
    clamped = jnp.clip(history_f32, lo, hi)
    out = clamped * (1.0 - alpha) + cur * alpha
    resolved = jnp.floor(
        jnp.clip(out, 0.0, 1.0) * 255.0 + 0.5
    ).astype(jnp.uint8)
    alpha_ch = jnp.full((*out.shape[:2], 1), 255, jnp.uint8)
    return out, jnp.concatenate([resolved, alpha_ch], axis=-1)
