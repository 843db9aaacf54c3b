"""Scan-carry control probe (the config-4 tail attribution's decisive
experiment): raster + TRIVIAL history update with the carry (F) vs
raster + FULL TAA math without any cross-frame carry (G).

Measured 2026-08-21 @1M: F 140.4 ms, G 127.0 ms, TAA alone 1.6 ms —
the composed scan's "+12.9 ms TAA tail" is the lax.scan carried
(3, H, W) i32 buffer, not TAA compute (docs/PERFORMANCE.md,
"benchmark traps" #4).

    python benchmarks/carry_probe.py
"""

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ZRENDERER_QUIET", "1")
import numpy as np
import jax, jax.numpy as jnp
from zrenderer_tpu.engine.config import RenderConfig
from zrenderer_tpu.engine.renderer import Renderer
from zrenderer_tpu.ops import geometry as g, raster_pallas as rp, taa
from zrenderer_tpu.scene.procedural import make_stress_scene

W, H, PW, PH = 1920, 1080, 1920, 1088
scene, md = make_stress_scene(1_000_000)
r = Renderer(RenderConfig(width=W, height=H))
r.load_scene(scene, md)
b = r._buffers()
ccols, tri_node = b["corner_cols"], b["tri_node"]
jit_seq = taa.jitter_sequence(8)
frames = 10
mats = jnp.asarray(np.stack([
    r.camera_matrices(jitter=jit_seq[k % 8]) for k in range(frames)
]).astype(np.float32))

def raster(m):
    ti, tf = g.geometry_pipeline(jnp, ccols, None, None, m, tri_node, W, H)
    return rp.rasterize_setup_pallas_binned_hbm(ti, tf, PW, PH)

def timed(name, run):
    t0 = time.perf_counter(); out = np.asarray(run(mats)); c = time.perf_counter()-t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); out = np.asarray(run(mats))
        best = min(best, (time.perf_counter()-t0)/frames)
    print(f"{name:30s}: {best*1e3:8.2f} ms/frame (compile {c:.0f}s)", flush=True)

# F: carry history, trivial update (no rolls/clamp)
@jax.jit
def runF(ms):
    def step(carry, m):
        hist, acc = carry
        hist2, m2 = jax.lax.optimization_barrier((hist, m))
        color, depth = raster(m2)
        cur = taa.taa_init_history_packed(color[:H, :W])
        hist3 = (hist2 + cur) // 2
        return (hist3, acc + hist3[0, 0, 0].astype(jnp.float32)
                + depth[H//2, W//2]), None
    color0, _ = raster(ms[0])
    h0 = taa.taa_init_history_packed(color0[:H, :W])
    (hf, acc), _ = jax.lax.scan(step, (h0, jnp.float32(0)), ms)
    return acc

# G: no carry at all, but run the FULL taa math per frame vs fresh history
@jax.jit
def runG(ms):
    def step(acc, m):
        acc2, m2 = jax.lax.optimization_barrier((acc, m))
        color, depth = raster(m2)
        p = color[:H, :W]
        h = taa.taa_init_history_packed(p)
        h2, res = taa.taa_resolve_packed(h, p)
        return acc2 + res[0, 0].astype(jnp.float32) + depth[H//2, W//2], None
    acc, _ = jax.lax.scan(step, jnp.float32(0), ms)
    return acc

timed("F carry, trivial update", runF)
timed("G no carry, full TAA math", runG)
