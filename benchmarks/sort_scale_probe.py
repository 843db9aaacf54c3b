"""On-device sort cost at pair-binning scales — the gating number for
HBM-scale tile_lists (the pair build is P = n_input * cap entries;
everything else in the prepare is gathers + searchsorted).

Because the binned kernel breaks exact depth ties by triangle id, list
order within a tile is free — so the prepare can sort PACKED VALUES
(tile_key << idx_bits | pair_idx, unique keys, no stability needed, no
argsort+gather) instead of a stable argsort.  This probes both, plus
the downstream searchsorted and the record gather, at 1M/2M/4M.

    python benchmarks/sort_scale_probe.py [--reps N]

Honest methodology (docs/PERFORMANCE.md): lax.scan over reps with an
optimization_barrier tying the carry to inputs, one dispatch, digest
materialized.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    os.environ.setdefault("ZRENDERER_QUIET", "1")
    reps = 5
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(7)

    def timed(name, fn, *args):
        @jax.jit
        def run(*a):
            def step(c, _):
                c2, *a2 = jax.lax.optimization_barrier((c, *a))
                out = fn(*a2)
                return c2 + out, None
            o, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(reps))
            return o
        t0 = time.perf_counter()
        np.asarray(run(*args))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(*args))
            best = min(best, (time.perf_counter() - t0) / reps)
        print(f"{name:44s}: {best*1e3:9.2f} ms  (compile+first {compile_s:.1f}s)",
              flush=True)
        return best

    num_tiles = 510
    for n in (1 << 20, 1 << 21, 1 << 22):
        keys = jnp.asarray(
            rng.integers(0, num_tiles + 1, n).astype(np.int32))
        idx_bits = max(1, (n - 1).bit_length())
        packed = (keys << idx_bits) | jnp.arange(n, dtype=jnp.int32)
        label = f"{n >> 20}M"

        timed(f"[{label}] sort packed values (i32)",
              lambda p: jnp.sort(p)[n // 2].astype(jnp.float32), packed)
        timed(f"[{label}] stable argsort i32 keys",
              lambda k: jnp.argsort(k, stable=True)[n // 2]
              .astype(jnp.float32), keys)
        skeys = jnp.sort(keys)
        timed(f"[{label}] searchsorted 512 boundaries",
              lambda s: jnp.searchsorted(
                  s, jnp.arange(num_tiles + 1, dtype=jnp.int32))
              .astype(jnp.float32).sum(), skeys)
        table = jnp.asarray(
            rng.standard_normal((1 << 20, 128)).astype(np.float32))
        gidx = jnp.asarray(rng.integers(0, 1 << 20, n).astype(np.int32))
        timed(f"[{label}] gather (n,128) records by pair idx",
              lambda t, i: jnp.take(t, i, axis=0)[n // 2, 0], table, gidx)
    return 0


if __name__ == "__main__":
    sys.exit(main())
