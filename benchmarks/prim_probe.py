"""Primitive-cost probes for the band-raster design (round 3).

Measures, on the current device with an honest fence (digest
materialization; ``block_until_ready`` resolves at enqueue on the axon
runtime — docs/PERFORMANCE.md):

  * ``jnp.argsort`` / ``jnp.sort`` of N int32 keys — the binning sort that
    any per-tile/per-band list build pays per frame;
  * stable argsort of (key, id) via single i64 composite;
  * row gather: N random rows from a (T, 128) f32 table (the cost of
    building per-pair packed setup records);
  * segment offsets via searchsorted.

    python benchmarks/prim_probe.py [N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    keys_np = rng.integers(0, 2048, size=n).astype(np.int32)
    keys = jnp.asarray(keys_np)
    tbl_rows = 1_000_000
    table = jnp.asarray(rng.standard_normal((tbl_rows, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, tbl_rows, size=n // 4).astype(np.int32))

    def timed(name, fn, *args):
        out = fn(*args)
        jax.tree.map(np.asarray, out)  # compile + fence
        reps = 3
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.tree.map(np.asarray, out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:40s} {best*1e3:9.3f} ms")
        return best

    @jax.jit
    def f_sort(k):
        return jnp.sort(k)[:8]

    @jax.jit
    def f_argsort(k):
        return jnp.argsort(k)[:8]

    @jax.jit
    def f_argsort_stable(k):
        return jnp.argsort(k, stable=True)[:8]

    @jax.jit
    def f_gather(t, i):
        return t[i].sum(axis=1)[:8]

    @jax.jit
    def f_hist(k):
        # counting-sort offsets: histogram via segment_sum substitute
        return jnp.zeros(2049, jnp.int32).at[k].add(1)[:8]

    @jax.jit
    def f_cumsum(k):
        return jnp.cumsum(k)[-8:]

    print(f"N = {n}")
    timed("sort int32", f_sort, keys)
    timed("argsort int32", f_argsort, keys)
    timed("argsort stable int32", f_argsort_stable, keys)
    timed(f"gather {n//4} rows of (1M,128) f32", f_gather, table, idx)
    timed("scatter-add histogram (2048 bins)", f_hist, keys)
    timed("cumsum", f_cumsum, keys)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
