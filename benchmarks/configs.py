"""Measure every BASELINE.json config on the current device.

    python benchmarks/configs.py [--quick]

Prints one JSON line per config plus a markdown table (paste-ready for
docs/PERFORMANCE.md).  Timing methodology matches bench.py: warmup past
compilation, then best-of-3 timed windows of N frames with the in-flight
frame drained inside each window; "present" is the fence (the reference's
Present is an on-GPU swapchain flip with no CPU copy either).

Config list (BASELINE.json):
  0 flat      512x512  test_scene, CPU-runnable reference analog
  1 lit       1080p    textured + Blinn-Phong point light, Z-buffered
  2 shadowed  1080p    directional shadow map (depth pass + PCF)
  3 deferred  1080p    G-buffer + GGX with 256 point lights
  4 stretch   1080p    ~1M-triangle lattice + TAA resolve (single chip;
                       multi-chip sharding is validated by dryrun_multichip)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(renderer, frames: int, taa: bool = False) -> float:
    """Best-of-3 steady-state seconds/frame."""
    jitters = None
    history = None
    if taa:
        from zrenderer_tpu.ops.taa import jitter_sequence

        jitters = jitter_sequence(8)

    def one_frame(i: int):
        nonlocal history
        jitter = jitters[i % 8] if taa else None
        renderer.render(jitter=jitter)
        if taa:
            from zrenderer_tpu.ops.taa import taa_resolve

            color, depth = renderer._pending
            if history is None:
                history = color[..., :3].astype("float32") / 255.0
            history, resolved = taa_resolve(history, color)
            renderer._pending = (resolved, depth)
        renderer.present()

    for i in range(5):
        one_frame(i)
    renderer.finish_gpu_commands()
    best = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        for i in range(frames):
            one_frame(i)
        renderer.finish_gpu_commands()
        best = min(best, (time.perf_counter() - t0) / frames)
    return best


def checker_texture(size: int = 256):
    from zrenderer_tpu.engine.textures import Texture

    y, x = np.mgrid[0:size, 0:size]
    c = (((x // 16) ^ (y // 16)) & 1).astype(np.float32)
    img = np.stack([c, 0.5 + 0.5 * c, 1.0 - 0.5 * c, np.ones_like(c)], axis=-1)
    return Texture.from_array(img.astype(np.float32))


def main() -> int:
    os.environ.setdefault("ZRENDERER_QUIET", "1")
    quick = "--quick" in sys.argv
    import jax

    from zrenderer_tpu.engine.config import RenderConfig
    from zrenderer_tpu.engine.renderer import Renderer
    from zrenderer_tpu.scene.mesh import MeshData
    from zrenderer_tpu.scene.procedural import make_stress_scene
    from zrenderer_tpu.scene.scene import Scene

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene_dir = os.path.join(here, "content", "scenes", "test_scene")
    scene = Scene.load(os.path.join(scene_dir, "scene.bin"))
    mesh_data = MeshData.load(os.path.join(scene_dir, "meshes.bin"))
    platform = jax.devices()[0].platform
    frames = 20 if quick else 100

    rows = []

    def record(name: str, cfg: RenderConfig, r: Renderer, spf: float):
        tris = r.flat.num_triangles
        row = {
            "config": name,
            "ms_per_frame": round(spf * 1000, 3),
            "fps": round(1.0 / spf, 1),
            "mtri_s": round(tris / spf / 1e6, 2),
            "gpix_s": round(cfg.width * cfg.height / spf / 1e9, 3),
            "resolution": f"{cfg.width}x{cfg.height}",
            "tris": tris,
            "platform": platform,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    # 0: flat 512x512.
    cfg = RenderConfig(width=512, height=512, pipeline="flat")
    r = Renderer(cfg)
    r.load_scene(scene, mesh_data)
    record("flat_512", cfg, r, measure(r, frames))

    # 1: lit 1080p, textured + Blinn-Phong point light.
    cfg = RenderConfig(width=1920, height=1080, pipeline="lit")
    r = Renderer(cfg)
    r.load_scene(scene, mesh_data)
    r.set_environment(texture=checker_texture())
    record("lit_1080p", cfg, r, measure(r, frames))

    # 2: shadowed 1080p (depth-only pass + PCF).
    cfg = RenderConfig(width=1920, height=1080, pipeline="shadowed")
    r = Renderer(cfg)
    r.load_scene(scene, mesh_data)
    record("shadowed_1080p", cfg, r, measure(r, frames))

    # 3: deferred 1080p with 256 point lights.
    rng = np.random.default_rng(3)
    pos = rng.uniform([-6, 0.5, -6], [6, 6, 6], (256, 3)).astype(np.float32)
    col = rng.uniform(0.1, 1.0, (256, 3)).astype(np.float32)
    cfg = RenderConfig(width=1920, height=1080, pipeline="deferred")
    r = Renderer(cfg)
    r.load_scene(scene, mesh_data)
    r.set_environment(lights=(pos, col))
    record("deferred_256L_1080p", cfg, r, measure(r, frames))

    # 4: stretch — ~1M-triangle lattice, flat 1080p + TAA resolve.
    s4, md4 = make_stress_scene(200_000 if quick else 1_000_000)
    cfg = RenderConfig(width=1920, height=1080, pipeline="flat")
    r = Renderer(cfg)
    r.load_scene(s4, md4)
    record("stretch_1M_taa_1080p", cfg, r, measure(r, max(frames // 5, 5),
                                                   taa=True))

    print("\n| config | resolution | tris | ms/frame | FPS | Mtri/s | Gpix/s |")
    print("|---|---|---|---|---|---|---|")
    for row in rows:
        print(
            f"| {row['config']} | {row['resolution']} | {row['tris']} "
            f"| {row['ms_per_frame']} | {row['fps']} | {row['mtri_s']} "
            f"| {row['gpix_s']} |"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
