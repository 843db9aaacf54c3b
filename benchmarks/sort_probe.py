"""Microbenchmark: device-side binning prep costs (sort + gather).

    python benchmarks/sort_probe.py

Motivates the group-vectorized binned raster: per-tile lists need (1) a
sort of P pair keys by tile and (2) a gather of triangle setup rows into
pair order.  The round's Cap-E binning measured jnp.argsort at ~1.1 ms
for 65K pairs — this probe checks how that scales to the 1M-triangle
config's ~1-4M pairs, and whether a single-operand u32 sort of PACKED
keys ((tile << 21) | tri_id — unique keys, so an unstable sort is
deterministic and already id-ordered per tile) is cheaper than argsort.

Honest timing: each scan step perturbs the input with the step index so
XLA cannot LICM-hoist the op (docs/PERFORMANCE.md trap #3).
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

    frames = 8
    rng = np.random.default_rng(0)
    NUM_TILES = 2025  # 1080p in (8,128) tiles: 135 x 15

    def timed(name, fn, *args):
        @jax.jit
        def run(*a):
            def step(carry, k):
                out = fn(k, *a)
                return carry + out, None
            out, _ = jax.lax.scan(
                step, jnp.float32(0.0), jnp.arange(frames, dtype=jnp.int32))
            return out

        np.asarray(run(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(*args))
            best = min(best, (time.perf_counter() - t0) / frames)
        n = args[0].shape[0]
        print(f"{name:46s}: {best * 1000:8.2f} ms  "
              f"({best / n * 1e9:6.2f} ns/elem)", flush=True)
        return best

    for p_log in (16, 20, 22):
        P = 1 << p_log
        keys_np = (
            rng.integers(0, NUM_TILES, P).astype(np.uint32) << np.uint32(21)
        ) | rng.permutation(P).astype(np.uint32)
        keys = jnp.asarray(keys_np)
        keys_i32 = jnp.asarray(keys_np.astype(np.int64) - 2**31).astype(
            jnp.int32)

        timed(f"sort u32 packed      P={P}",
              lambda k, a: jnp.sort(a ^ k.astype(jnp.uint32)).sum(
                  dtype=jnp.uint32).astype(jnp.float32), keys)
        timed(f"sort i32 packed      P={P}",
              lambda k, a: jnp.sort(a ^ k).sum(
                  dtype=jnp.int32).astype(jnp.float32), keys_i32)
        timed(f"argsort u32          P={P}",
              lambda k, a: jnp.argsort(a ^ k.astype(jnp.uint32)).sum(
                  dtype=jnp.int32).astype(jnp.float32), keys)

        sorted_keys = jnp.sort(keys)
        bounds = (jnp.arange(NUM_TILES + 1, dtype=jnp.uint32) << 21)
        timed(f"searchsorted offsets P={P}",
              lambda k, a, b: jnp.searchsorted(a, b ^ k.astype(
                  jnp.uint32)).sum(dtype=jnp.int32).astype(jnp.float32),
              sorted_keys, bounds)
        timed(f"harness floor (sum)  P={P}",
              lambda k, a: (a ^ k.astype(jnp.uint32)).sum(
                  dtype=jnp.uint32).astype(jnp.float32), keys)

    # Gather of triangle setup rows into pair order.  Indices from a real
    # packed-key sort: near-sequential (Morton-coherent scene).
    T = 1 << 20
    for P, lanes in ((1 << 20, 64), (1 << 22, 64), (1 << 20, 32)):
        tbl = jnp.asarray(rng.random((T, lanes), np.float32))
        keys_np = (
            rng.integers(0, NUM_TILES, P).astype(np.uint32) << np.uint32(21)
        ) | (np.arange(P, dtype=np.uint32) % T)
        idx = jnp.asarray(
            (np.sort(keys_np) & np.uint32((1 << 21) - 1)).astype(np.int32))
        timed(f"take (T={T>>20}M,{lanes}) rows  P={P}",
              lambda k, i, t: jnp.take(t, i + k, axis=0).sum(
                  dtype=jnp.float32), idx, tbl)
    return 0


if __name__ == "__main__":
    sys.exit(main())
