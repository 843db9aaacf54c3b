"""Measure every BASELINE.json config on the current device — honestly.

    python benchmarks/configs.py [--quick] [--only substr]

``--only substr`` runs just the configs whose name contains ``substr``.

Prints one JSON line per config plus a markdown table (paste-ready for
docs/PERFORMANCE.md).

METHODOLOGY: each config renders N frames in ONE device dispatch
(``Renderer.render_animation`` — a lax.scan over stacked per-frame
constants) and the per-frame digests are materialized as a TRUE fence.
``block_until_ready`` is NOT a fence on the remote axon runtime (it
resolves at enqueue; measured: a 65 ms frame "finished" in 0.5 ms), and a
per-frame dispatch loop pays ~35 ms of tunnel RPC latency per frame that
a co-located host would not see.  The single-dispatch rate equals the
device frame rate on every runtime.  See docs/PERFORMANCE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(renderer, frames: int) -> float:
    """Best-of-3 seconds/frame via the single-dispatch animation path."""
    digests, _ = renderer.render_animation(num_frames=frames)
    np.asarray(digests)  # compile + one-time D2H channel setup
    best = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        digests, _ = renderer.render_animation(num_frames=frames)
        np.asarray(digests)  # true fence
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
    only = (sys.argv[sys.argv.index("--only") + 1]
            if "--only" in sys.argv else "")
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

    def want(name):
        return only in name

    # 0: flat 512x512.
    if want("flat_512"):
        cfg = RenderConfig(width=512, height=512, pipeline="flat")
        r = Renderer(cfg)
        r.load_scene(scene, mesh_data)
        record("flat_512", cfg, r, measure(r, frames))

    # 1: lit 1080p, textured + Blinn-Phong point light.
    if want("lit_1080p"):
        cfg = RenderConfig(width=1920, height=1080, pipeline="lit")
        r = Renderer(cfg)
        r.load_scene(scene, mesh_data)
        r.set_environment(texture=checker_texture())
        record("lit_1080p", cfg, r, measure(r, frames))

    # 2: shadowed 1080p (depth-only pass + PCF).
    if want("shadowed_1080p"):
        cfg = RenderConfig(width=1920, height=1080, pipeline="shadowed")
        r = Renderer(cfg)
        r.load_scene(scene, mesh_data)
        record("shadowed_1080p", cfg, r, measure(r, frames))

    # 3: deferred 1080p with 256 point lights, two light sets:
    # "wide" = intensities up to 1.0, every light's influence radius spans
    # the scene (culling cannot prune — the brute-force bound);
    # "r2" = same positions, intensity 0.008 => ~2-unit influence radius
    # (the standard many-small-lights regime tiled culling exists for).
    rng = np.random.default_rng(3)
    pos = rng.uniform([-6, 0.5, -6], [6, 6, 6], (256, 3)).astype(np.float32)
    col = rng.uniform(0.1, 1.0, (256, 3)).astype(np.float32)
    for name, colors in (("deferred_256L_wide_1080p", col),
                         ("deferred_256L_r2_1080p",
                          (col * 0.008).astype(np.float32))):
        if not want(name):
            continue
        cfg = RenderConfig(width=1920, height=1080, pipeline="deferred")
        r = Renderer(cfg)
        r.load_scene(scene, mesh_data)
        r.set_environment(lights=(pos, colors))
        record(name, cfg, r, measure(r, frames))

    # 4: stretch — ~1M-triangle lattice, flat 1080p (TAA resolve measured
    # separately in the app path; the scan carries frame history already).
    if want("stretch_1M_1080p"):
        s4, md4 = make_stress_scene(200_000 if quick else 1_000_000)
        cfg = RenderConfig(width=1920, height=1080, pipeline="flat")
        r = Renderer(cfg)
        r.load_scene(s4, md4)
        record("stretch_1M_1080p", cfg, r, measure(r, max(frames // 5, 5)))

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
