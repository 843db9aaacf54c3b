"""Microbenchmark: what drives TPU row-gather cost (the PCF bottleneck).

    python benchmarks/gather_probe.py

Times jnp.take variants with the shadowed config's real shapes (2M screen
pixels gathering rows of a 1M-row table) in one device dispatch each
(lax.scan, digest fence — docs/PERFORMANCE.md methodology).  Variants
probe: row lanes (8/16), table rows, index count, index pattern, dtype.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    os.environ.setdefault("ZRENDERER_QUIET", "1")
    import jax
    import jax.numpy as jnp

    H, W = 1080, 1920
    SH = SW = 1024
    frames = 20
    rng = np.random.default_rng(0)

    # Realistic PCF index pattern: smooth screen->shadow mapping.
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    iy = np.clip((ys / H * SH * 0.7 + 80), 0, SH - 1).astype(np.int32)
    ix = np.clip((xs / W * SW * 0.6 + 100), 0, SW - 1).astype(np.int32)
    idx_smooth = jnp.asarray((iy * SW + ix).reshape(-1))
    idx_rand = jnp.asarray(
        rng.integers(0, SH * SW, H * W).astype(np.int32))
    idx_half = idx_smooth[::2]

    def timed(name, table, idx):
        @jax.jit
        def run(t, i):
            def step(carry, k):
                rows = jnp.take(t, i + k, axis=0)
                return carry + rows.sum(dtype=jnp.float32), None
            out, _ = jax.lax.scan(
                step, jnp.float32(0.0),
                jnp.arange(frames, dtype=jnp.int32) % 2)
            return out

        np.asarray(run(table, idx))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(table, idx))
            best = min(best, (time.perf_counter() - t0) / frames)
        ns_per_idx = best / idx.shape[0] * 1e9
        print(f"{name:44s}: {best * 1000:7.2f} ms  ({ns_per_idx:5.2f} ns/idx)",
              flush=True)

    f32 = jnp.float32
    t16 = jnp.asarray(rng.random((SH * SW, 16)).astype(np.float32))
    t8 = t16[:, :8]
    tu8 = jnp.asarray(
        rng.integers(0, 2**32, (SH * SW, 8), np.uint64).astype(np.uint32))
    t16_small = t16[: SH * SW // 4]
    t4 = t16[:, :4]
    t1 = t16[:, :1]

    timed("(1M,16) f32, 2M smooth idx", t16, idx_smooth)
    timed("(1M, 8) f32, 2M smooth idx", t8, idx_smooth)
    timed("(1M, 8) u32, 2M smooth idx", tu8, idx_smooth)
    timed("(1M, 4) f32, 2M smooth idx", t4, idx_smooth)
    timed("(1M, 1) f32, 2M smooth idx", t1, idx_smooth)
    timed("(256K,16) f32, 2M smooth idx",
          t16_small, idx_smooth % (SH * SW // 4))
    timed("(1M,16) f32, 2M random idx", t16, idx_rand)
    timed("(1M,16) f32, 1M smooth idx (stride2)", t16, idx_half)
    return 0


if __name__ == "__main__":
    sys.exit(main())
