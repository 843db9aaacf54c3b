"""Probe: dynamic-offset 8-row band read-modify-write on VMEM scratch.

Validates (a) Mosaic compiles `ref[pl.ds(rb, 8), :]` with an UNALIGNED
traced sublane offset, (b) results are correct, and (c) the per-visit cost
of band ops vs full-(32,128) ops — the premise of the band-raster
optimization (docs/PERFORMANCE.md "per-visit cost" section).

    python benchmarks/band_probe.py
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
BAND_H = 8
N_VISITS = 4096


def _body_full(k, acc, buf, params):
    a = params[k % 64, 0]
    x = buf[...]
    buf[...] = jnp.where(x < jnp.float32(a), x + jnp.float32(1.0), x)
    return acc


def _body_band(k, acc, buf, params):
    a = params[k % 64, 0]
    rb = jnp.minimum(k % 29, TILE_H - BAND_H)  # unaligned dynamic offset
    x = buf[pl.ds(rb, BAND_H), :]
    buf[pl.ds(rb, BAND_H), :] = jnp.where(
        x < jnp.float32(a), x + jnp.float32(1.0), x)
    return acc


def _make(body, ops_per_visit):
    def kernel(params_ref, out_ref, buf):
        buf[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)

        def step(k, acc):
            for _ in range(ops_per_visit):
                body(k, acc, buf, params_ref)
            return acc

        jax.lax.fori_loop(0, N_VISITS, step, 0)
        out_ref[...] = buf[...]

    @jax.jit
    def run(params):
        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TILE_H, TILE_W), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TILE_H, TILE_W), jnp.float32),
            scratch_shapes=[pltpu.VMEM((TILE_H, TILE_W), jnp.float32)],
        )(params)

    return run


def timeit(run, params):
    out = np.asarray(run(params))  # compile + correctness materialize
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(20):
            out = run(params)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / 20)
    return best, out


def main():
    params = jnp.arange(64, dtype=jnp.float32).reshape(64, 1) * 100
    params = jnp.pad(params, ((0, 0), (0, 127)))
    for name, body in (("full", _body_full), ("band", _body_band)):
        for ops in (1, 4, 16):
            run = _make(body, ops)
            try:
                t, out = timeit(run, params)
            except Exception as e:  # noqa: BLE001
                print(f"{name} x{ops}: FAILED {type(e).__name__}: {e}")
                continue
            per = t / (N_VISITS * ops) * 1e9
            print(f"{name} x{ops}: {t*1e6:8.1f} us total, "
                  f"{per:6.2f} ns/op  sum={float(out.sum()):.0f}")
    return 0




def _body_band_aligned(k, acc, buf, params):
    a = params[k % 64, 0]
    rb = (k % 4) * BAND_H  # ALIGNED dynamic offset (8-row multiple)
    x = buf[pl.ds(rb, BAND_H), :]
    buf[pl.ds(rb, BAND_H), :] = jnp.where(
        x < jnp.float32(a), x + jnp.float32(1.0), x)
    return acc


def _body_band16_aligned(k, acc, buf, params):
    a = params[k % 64, 0]
    rb = (k % 3) * BAND_H  # aligned 16-row window at 8-row step
    x = buf[pl.ds(rb, 16), :]
    buf[pl.ds(rb, 16), :] = jnp.where(
        x < jnp.float32(a), x + jnp.float32(1.0), x)
    return acc


def _body_band_static(k, acc, buf, params):
    a = params[k % 64, 0]
    x = buf[0:BAND_H, :]  # STATIC offset — the compiler-friendly bound
    buf[0:BAND_H, :] = jnp.where(
        x < jnp.float32(a), x + jnp.float32(1.0), x)
    return acc


def main2():
    params = jnp.arange(64, dtype=jnp.float32).reshape(64, 1) * 100
    params = jnp.pad(params, ((0, 0), (0, 127)))
    for name, body in (
        ("full32", _body_full), ("band8-unaligned", _body_band),
        ("band8-aligned", _body_band_aligned),
        ("band16-aligned", _body_band16_aligned),
        ("band8-static", _body_band_static),
    ):
        for ops in (16,):
            run = _make(body, ops)
            try:
                t, out = timeit(run, params)
            except Exception as e:  # noqa: BLE001
                print(f"{name} x{ops}: FAILED {type(e).__name__}: {e}")
                continue
            per = t / (N_VISITS * ops) * 1e9
            print(f"{name} x{ops}: {t*1e6:8.1f} us total, "
                  f"{per:6.2f} ns/op  sum={float(out.sum()):.0f}")
    return 0


def main3():
    """Independent-chain test: K parallel accumulator buffers, ops rotate
    across them.  If per-op cost drops with K, the serial-RMW chain is
    LATENCY-bound and slot-parallel accumulators in the raster body pay."""
    params = jnp.arange(64, dtype=jnp.float32).reshape(64, 1) * 100
    params = jnp.pad(params, ((0, 0), (0, 127)))
    for nbuf in (1, 2, 4, 8):
        def kernel(params_ref, out_ref, *bufs):
            for b in bufs:
                b[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)

            def step(k, acc):
                a = params_ref[k % 64, 0]
                for j in range(16):
                    b = bufs[j % nbuf]
                    x = b[...]
                    b[...] = jnp.where(
                        x < jnp.float32(a), x + jnp.float32(1.0), x)
                return acc

            jax.lax.fori_loop(0, N_VISITS, step, 0)
            out_ref[...] = bufs[0][...]

        @jax.jit
        def run(params):
            return pl.pallas_call(
                kernel,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((TILE_H, TILE_W), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((TILE_H, TILE_W), jnp.float32)
                    for _ in range(nbuf)
                ],
            )(params)

        t, out = timeit(run, params)
        per = t / (N_VISITS * 16) * 1e9
        print(f"nbuf={nbuf}: {t*1e6:8.1f} us, {per:6.2f} ns/op "
              f"sum={float(out.sum()):.0f}")
    return 0


if __name__ == "__main__":
    rc = main()
    if "--variants" in sys.argv:
        rc = main2() or rc
    if "--chains" in sys.argv:
        rc = main3() or rc
    sys.exit(rc)
