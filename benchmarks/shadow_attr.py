"""Stage attribution for the shadowed frame (config 2 analysis).

    python benchmarks/shadow_attr.py [--frames N]

Times cumulative stage prefixes of the shadowed pipeline (Pallas backend,
1080p) in ONE device dispatch each (lax.scan over per-frame constants,
digest-materialization fence — the honest methodology, see
docs/PERFORMANCE.md):

    A  depth-only pass              (1024^2 shadow map raster)
    B  A + G-buffer raster          (1080p, 13 planes)
    C  B + world reconstruction     (+ albedo fast path + normalize)
    D  C + PCF shadow lookup        (the one-gather 3x3 kernel)
    E  full frame                   (+ shade + tonemap/pack)

Each scan step consumes a perturbed matrix set so no stage hoists out of
the loop.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    os.environ.setdefault("ZRENDERER_QUIET", "1")
    frames = 20
    if "--frames" in sys.argv:
        frames = int(sys.argv[sys.argv.index("--frames") + 1])
    stages = (sys.argv[sys.argv.index("--stages") + 1].upper()
              if "--stages" in sys.argv else "ABCDE")

    import jax
    import jax.numpy as jnp

    from zrenderer_tpu.engine import passes
    from zrenderer_tpu.engine.config import RenderConfig
    from zrenderer_tpu.engine.renderer import Renderer
    from zrenderer_tpu.ops import shading
    from zrenderer_tpu.scene.mesh import MeshData
    from zrenderer_tpu.scene.scene import Scene

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sd = os.path.join(here, "content", "scenes", "test_scene")
    scene = Scene.load(os.path.join(sd, "scene.bin"))
    mesh_data = MeshData.load(os.path.join(sd, "meshes.bin"))

    cfg = RenderConfig(width=1920, height=1080, pipeline="shadowed")
    r = Renderer(cfg)
    r.load_scene(scene, mesh_data)
    r.set_environment()  # default directional light (same as configs.py)
    W, H = cfg.width, cfg.height
    PW, PH = cfg.pad_width, cfg.pad_height
    b = r._buffers()

    c = r._lit_constants(None, None)
    light_vp = r._light_view_proj(None)
    light_matrices = np.einsum(
        "nij,jk->nik", c["node_to_world"], light_vp
    ).astype(np.float32)

    rng = np.random.default_rng(0)

    def stack(x):
        base = np.repeat(np.asarray(x, np.float32)[None], frames, axis=0)
        return jnp.asarray(base + rng.normal(0, 1e-6, base.shape)
                           .astype(np.float32))

    xs = {
        "matrices": stack(c["matrices"]),
        "normal_mats": stack(c["normal_mats"]),
        "inv_view_proj": stack(c["inv_view_proj"]),
        "light_matrices": stack(light_matrices),
        "light_vp": stack(light_vp),
    }
    cam_pos = jnp.asarray(c["cam_pos"])
    light_dir = jnp.asarray(r.light_dir)
    light_color = jnp.asarray(r.light_color)
    atlas = r.texture.oct_atlas_u32
    th, tw = (int(r.texture.base_shape[0]), int(r.texture.base_shape[1]))
    levels = r.texture.num_levels

    def depth_pass(x):
        return passes._depth_only("pallas", b, x["light_matrices"],
                                  cfg.shadow_size, False)

    def gbuf(x):
        return passes._gbuffer("pallas", b, x["matrices"], x["normal_mats"],
                               W, H, PH, PW, False)

    def through_c(x):
        outs = gbuf(x)
        rgba, depth, u, v, nx, ny, nz = outs[:7]
        tex_layer = outs[12]
        albedo = passes._sample_albedo(rgba, atlas, u, v, tex_layer,
                                       th, tw, levels, False)
        normal = jnp.stack([nx, ny, nz], axis=-1)
        n = normal / jnp.maximum(
            jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-8)
        world = shading.reconstruct_world_pos(depth, x["inv_view_proj"], W, H)
        return depth, albedo, n, world

    def stage_a(x):
        return depth_pass(x).sum()

    def stage_b(x):
        outs = gbuf(x)
        return depth_pass(x).sum() + sum(jnp.float32(o.sum()) for o in outs)

    def stage_c(x):
        sm = depth_pass(x)
        depth, albedo, n, world = through_c(x)
        return (sm.sum() + depth.sum() + albedo.sum() + n.sum()
                + world.sum())

    def stage_d(x):
        sm = depth_pass(x)
        depth, albedo, n, world = through_c(x)
        lit_mask = shading.shadow_factor_pcf(
            sm, world, x["light_vp"], bias=cfg.shadow_bias,
            taps=cfg.pcf_taps, normal=n, light_dir=light_dir,
            slope_bias=cfg.shadow_slope_bias)
        return (sm.sum() + depth.sum() + albedo.sum() + lit_mask.sum())

    frame_fn = passes.build_shadowed_frame(
        "pallas", W, H, PH, PW, r.texture, shadow_size=cfg.shadow_size,
        shadow_bias=cfg.shadow_bias, shadow_slope_bias=cfg.shadow_slope_bias,
        pcf_taps=cfg.pcf_taps)

    def stage_e(x):
        color, depth, sm = frame_fn(
            b, atlas, x["matrices"], x["normal_mats"], x["inv_view_proj"],
            cam_pos, x["light_matrices"], x["light_vp"], light_dir,
            light_color)
        return jnp.float32(color.sum()) + depth.sum() + sm.sum()

    def timed(fn, name):
        @jax.jit
        def run(xs):
            def step(carry, x):
                return carry + jnp.float32(fn(x)), None
            out, _ = jax.lax.scan(step, jnp.float32(0.0), xs)
            return out

        t0 = time.perf_counter()
        np.asarray(run(xs))
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(xs))
            best = min(best, (time.perf_counter() - t0) / frames)
        return best * 1000

    fns = {"A": (stage_a, "A depth-only"), "B": (stage_b, "B +gbuffer"),
           "C": (stage_c, "C +world"), "D": (stage_d, "D +pcf"),
           "E": (stage_e, "E full")}
    print(f"frames={frames} platform={jax.devices()[0].platform}")
    prev = None
    for key in "ABCDE":
        if key not in stages:
            continue
        ms = timed(*fns[key])
        delta = "" if prev is None else f"  (+{ms - prev:.2f})"
        print(f"{fns[key][1]:22s}: {ms:8.2f} ms/frame{delta}", flush=True)
        prev = ms
    return 0


if __name__ == "__main__":
    sys.exit(main())
