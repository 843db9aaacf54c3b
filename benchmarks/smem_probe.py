"""Probe: does the per-visit raster-body cost come from scalar VMEM reads?

The measured 1M-triangle floor is ~250 ns per covered (tile, triangle)
visit (docs/PERFORMANCE.md).  Each visit issues ~12 SCALAR reads of
triangle parameters from VMEM scratch (ti_buf[r, lane]) that feed
vector broadcasts.  Hypothesis: those scalar VMEM reads (long latency,
serially scheduled) dominate the visit, and staging the triangle tables
in SMEM (the scalar unit's memory — the tile_lists kernel already
streams pair lists HBM->SMEM) removes most of it.

Three variants of the SAME per-visit body (3 i32 edge evals + coverage
+ z interpolate + masked z/color RMW on a (32,128) tile):

  vmem: params scalar-read from a VMEM scratch table (current kernels)
  smem: params scalar-read from an SMEM scratch table
  hoist: params scalar-read from SMEM into locals OUTSIDE the unrolled
         pair (models amortizing reads across 2 visits)

    python benchmarks/smem_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H, TILE_W = 32, 128
N_VISITS = 4096
NP = 16  # params per visit (12 used)


def _visit(params12, py, px, bufs):
    dx0, dy0, x1, y1, dx1, dy1, x2, y2, dx2, dy2, x0, y0 = params12
    zbuf, cbuf = bufs
    e0 = dx0 * (py - y1) - dy0 * (px - x1)
    e1 = dx1 * (py - y2) - dy1 * (px - x2)
    e2 = dx2 * (py - y0) - dy2 * (px - x0)
    cov = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
    z = (e0.astype(jnp.float32) * 1e-7 + e1.astype(jnp.float32) * 2e-7
         + e2.astype(jnp.float32) * 3e-7)
    zb = zbuf[...]
    ok = cov & (z < zb) & (z >= 0.0)
    zbuf[...] = jnp.where(ok, z, zb)
    cbuf[...] = jnp.where(ok, z * 2.0, cbuf[...])


def _make(where: str):
    def kernel(tab_ref, out_ref, zbuf, cbuf, vtab, stab, sem):
        if where == "vmem":
            cp = pltpu.make_async_copy(tab_ref, vtab, sem)
            cp.start()
            cp.wait()
            tab = vtab
        else:
            cp = pltpu.make_async_copy(tab_ref, stab, sem)
            cp.start()
            cp.wait()
            tab = stab
        zbuf[...] = jnp.full((TILE_H, TILE_W), 1.0, jnp.float32)
        cbuf[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        py = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
        px = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)

        def step(k, acc):
            r = k % 256
            p = [tab[r, i] for i in range(12)]
            _visit(p, py, px, (zbuf, cbuf))
            return acc

        jax.lax.fori_loop(0, N_VISITS, step, 0)
        out_ref[...] = zbuf[...]

    @jax.jit
    def run(tab):
        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((TILE_H, TILE_W), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TILE_H, TILE_W), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
                pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
                pltpu.VMEM((256, NP), jnp.int32),
                pltpu.SMEM((256, NP), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )(tab)

    return run


def main() -> int:
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.integers(-8, 8, (256, NP), dtype=np.int32))
    for name in ("vmem", "smem"):
        run = _make(name)
        try:
            out = np.asarray(run(tab))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
            continue
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(10):
                out2 = run(tab)
            np.asarray(out2)
            best = min(best, (time.perf_counter() - t0) / 10)
        per = best / N_VISITS
        print(f"{name}: {best*1e3:8.3f} ms  -> {per*1e9:7.1f} ns/visit"
              f"  (digest {float(np.asarray(out).sum()):.3f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
