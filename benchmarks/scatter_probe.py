"""Probe: XLA scatter-min / segment-min throughput on TPU.

Motivates (or kills) a scatter-based raster path for very small triangles:
per triangle, emit K candidate (pixel index, packed z) pairs vectorized
across triangles, then scatter-min into the framebuffer.  The per-index
cost here is the whole question — gathers measured ~4-7 ns/index
(benchmarks/gather_probe.py); scatters with combiners may be much worse.

    python benchmarks/scatter_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=3, inner=10):
    out = jax.block_until_ready(fn(*args))
    # materialize to force a true fence on the axon runtime
    np.asarray(jax.tree_util.tree_leaves(out)[0])[:8]
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])[:8]
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def main() -> int:
    npix = 2 * 1024 * 1024

    rng = np.random.default_rng(0)
    for n in (1 << 22, 1 << 24):
        idx = jnp.asarray(rng.integers(0, npix, n, dtype=np.int32))
        vals = jnp.asarray(rng.random(n, dtype=np.float32))

        @jax.jit
        def scatter_min(idx, vals):
            fb = jnp.full((npix,), jnp.float32(1e9))
            return fb.at[idx].min(vals)

        t = timed(scatter_min, idx, vals)
        print(f"scatter-min  n={n:>9}: {t*1e3:8.2f} ms  "
              f"{t/n*1e9:6.2f} ns/index", flush=True)

        @jax.jit
        def scatter_add(idx, vals):
            fb = jnp.zeros((npix,), jnp.float32)
            return fb.at[idx].add(vals)

        t = timed(scatter_add, idx, vals)
        print(f"scatter-add  n={n:>9}: {t*1e3:8.2f} ms  "
              f"{t/n*1e9:6.2f} ns/index", flush=True)

        @jax.jit
        def gather(idx, vals):
            return vals[:npix][idx % npix].sum()[None]

        t = timed(gather, idx, vals)
        print(f"gather       n={n:>9}: {t*1e3:8.2f} ms  "
              f"{t/n*1e9:6.2f} ns/index", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
