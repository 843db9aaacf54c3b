"""bf16 G-buffer-plane experiment: deferred 256 lights, f32 vs bf16 planes.

    python benchmarks/bf16_lighting.py

Measures the full deferred frame (geometry + G-buffer + tiled lighting)
both ways plus the lighting kernel in isolation; prints JSON lines.
Findings recorded in docs/PERFORMANCE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    os.environ.setdefault("ZRENDERER_QUIET", "1")
    import jax
    import jax.numpy as jnp

    from zrenderer_tpu.engine.config import RenderConfig
    from zrenderer_tpu.engine.renderer import Renderer
    from zrenderer_tpu.scene.mesh import MeshData
    from zrenderer_tpu.scene.scene import Scene
    from zrenderer_tpu.ops.light_kernel import tiled_deferred_lighting

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sd = os.path.join(here, "content", "scenes", "test_scene")
    scene = Scene.load(os.path.join(sd, "scene.bin"))
    md = MeshData.load(os.path.join(sd, "meshes.bin"))

    rng = np.random.default_rng(3)
    pos = rng.uniform([-6, 0.5, -6], [6, 6, 6], (256, 3)).astype(np.float32)
    col = rng.uniform(0.1, 1.0, (256, 3)).astype(np.float32)

    imgs = {}
    for planes in ("f32", "bf16"):
        cfg = RenderConfig(width=1920, height=1080, pipeline="deferred",
                           lighting_planes=planes)
        r = Renderer(cfg)
        r.load_scene(scene, md)
        r.set_environment(lights=(pos, col))
        for _ in range(5):
            r.render(); r.present()
        r.finish_gpu_commands()
        best = float("inf")
        for _rep in range(3):
            t0 = time.perf_counter()
            for _ in range(100):
                r.render(); r.present()
            r.finish_gpu_commands()
            best = min(best, (time.perf_counter() - t0) / 100)
        imgs[planes] = np.asarray(r._pending[0][::8, ::8])
        print(json.dumps({"config": f"deferred_256L_{planes}",
                          "ms_per_frame": round(best * 1000, 3),
                          "fps": round(1 / best, 1)}), flush=True)

    d = np.abs(imgs["f32"].astype(np.int32) - imgs["bf16"].astype(np.int32))
    print(json.dumps({"u8_max_diff": int(d.max()),
                      "u8_mean_diff": float(d.mean())}), flush=True)

    # Kernel in isolation (1088x1920 padded planes, 256 lights).
    h, w = 1088, 1920
    key = jax.random.PRNGKey(0)
    albedo = jax.random.uniform(key, (h, w, 3), jnp.float32)
    nrm = jnp.concatenate([jax.random.normal(key, (h, w, 2)),
                           jnp.abs(jax.random.normal(key, (h, w, 1))) + 0.5],
                          axis=-1)
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    world = jax.random.uniform(key, (h, w, 3), jnp.float32, -5, 5)
    covered = jnp.ones((h, w), bool)
    vp = jnp.eye(4, dtype=jnp.float32)
    cam = jnp.asarray([0.0, 0.0, 8.0])
    for planes, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        fn = jax.jit(lambda a, n, wd, c: tiled_deferred_lighting(
            a, n, wd, c, cam, jnp.asarray(pos), jnp.asarray(col), vp,
            plane_dtype=dt))
        out = fn(albedo, nrm, world, covered); out.block_until_ready()
        best = float("inf")
        for _rep in range(3):
            t0 = time.perf_counter()
            for _ in range(20):
                out = fn(albedo, nrm, world, covered)
            out.block_until_ready()
            best = min(best, (time.perf_counter() - t0) / 20)
        print(json.dumps({"config": f"light_kernel_only_{planes}",
                          "ms": round(best * 1000, 3)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
