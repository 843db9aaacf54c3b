"""Component attribution for the lit/shadowed pipelines at 1080p.

    python benchmarks/lit_attr.py

Times cumulative prefixes of the lit frame (and the shadow-pass pieces)
with the honest single-dispatch methodology (lax.scan over per-frame
matrices, digest fence):

    G   13-plane G-buffer raster (Pallas)
    GA  G + quad-atlas trilinear albedo sample (the 2-gather path)
    GL  GA + Blinn-Phong shading + tonemap (== full lit frame)
    D   depth-only 1024^2 shadow pass alone
    GP  GA + PCF shadow factor + shading (== full shadowed frame, minus D)

so lit = GL, shadowed ~= GL + D + (GP - GA deltas).  Tells which of
raster / texture gathers / PCF gathers to attack next.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    os.environ.setdefault("ZRENDERER_QUIET", "1")
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
    md = MeshData.load(os.path.join(sd, "meshes.bin"))

    from benchmarks.configs import checker_texture

    cfg = RenderConfig(width=1920, height=1080, pipeline="shadowed")
    r = Renderer(cfg)
    r.load_scene(scene, md)
    r.set_environment(texture=checker_texture(256))
    b = r._buffers()
    W, H, PH, PW = cfg.width, cfg.height, cfg.pad_height, cfg.pad_width
    tex = r.texture
    th, tw = int(tex.base_shape[0]), int(tex.base_shape[1])
    frames = 20

    c = r._lit_constants(None, None)
    light_vp = r._light_view_proj(None)
    light_mats = np.einsum(
        "nij,jk->nik", c["node_to_world"], light_vp).astype(np.float32)

    rng = np.random.default_rng(0)
    mats = np.stack([c["matrices"] for _ in range(frames)])
    mats += rng.normal(0, 1e-6, mats.shape)
    mats = jnp.asarray(mats.astype(np.float32))
    nmats = jnp.asarray(c["normal_mats"])
    ivp = jnp.asarray(c["inv_view_proj"])
    cam = jnp.asarray(c["cam_pos"])
    atlas = tex.oct_atlas_u32

    def gbuf(m):
        return passes._gbuffer("pallas", b, m, nmats, W, H, PH, PW, False)

    def stage_g(m):
        outs = gbuf(m)
        return sum(jnp.float32(o.sum()) for o in outs)

    def stage_ga(m):
        (rgba, depth, u, v, nx, ny, nz, met, rgh, emr, emg, emb,
         tl) = gbuf(m)
        albedo = passes._sample_albedo(
            rgba, atlas, u, v, tl, th, tw, tex.num_levels, False)
        return jnp.float32(albedo.sum()) + depth.sum()

    def stage_gl(m):
        (rgba, depth, u, v, nx, ny, nz, met, rgh, emr, emg, emb,
         tl) = gbuf(m)
        albedo = passes._sample_albedo(
            rgba, atlas, u, v, tl, th, tw, tex.num_levels, False)
        covered = depth < 1.0
        normal = jnp.stack([nx, ny, nz], axis=-1)
        world = shading.reconstruct_world_pos(depth, ivp, W, H)
        spec, shin = shading.blinn_params_from_material(met, rgh)
        lit = shading.blinn_phong(
            albedo, normal, world, cam, r.light_pos, r.light_color,
            specular=spec, shininess=shin)
        lit = lit + jnp.stack([emr, emg, emb], axis=-1)
        return jnp.float32(
            shading.tonemap_and_pack(lit, covered).sum()) + depth.sum()

    lm = jnp.asarray(light_mats)

    def stage_d(m):
        depth = passes._depth_only("pallas", b, lm, 1024, False)
        return depth.sum() + jnp.float32(m.sum())

    ldir = jnp.asarray(
        np.asarray(r.light_dir, np.float32)
        / np.linalg.norm(np.asarray(r.light_dir, np.float32)))
    lvp = jnp.asarray(light_vp)

    def stage_full_shadowed(m):
        shadow_depth = passes._depth_only("pallas", b, lm, 1024, False)
        (rgba, depth, u, v, nx, ny, nz, met, rgh, emr, emg, emb,
         tl) = gbuf(m)
        covered = depth < 1.0
        albedo = passes._sample_albedo(
            rgba, atlas, u, v, tl, th, tw, tex.num_levels, False)
        normal = jnp.stack([nx, ny, nz], axis=-1)
        n = normal / jnp.maximum(
            jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-8)
        world = shading.reconstruct_world_pos(depth, ivp, W, H)
        lit_mask = shading.shadow_factor_pcf_strided(
            shadow_depth, world, lvp, stride=1,
            bias=cfg.shadow_bias, taps=cfg.pcf_taps,
            normal=n, light_dir=ldir, slope_bias=cfg.shadow_slope_bias)
        ndotl = jnp.maximum(
            jnp.sum(n * (-ldir)[None, None, :], axis=-1), 0.0)
        rgb = albedo * (0.10 + ndotl[..., None] * lit_mask[..., None])
        rgb = rgb + jnp.stack([emr, emg, emb], axis=-1)
        return jnp.float32(
            shading.tonemap_and_pack(rgb, covered).sum()) + depth.sum()

    def timed(fn, name):
        @jax.jit
        def run(ms):
            def step(carry, m):
                return carry + fn(m), None
            out, _ = jax.lax.scan(step, jnp.float32(0.0), ms)
            return out

        t0 = time.perf_counter()
        np.asarray(run(mats))
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(mats))
            best = min(best, (time.perf_counter() - t0) / frames)
        return best * 1000

    g_ms = timed(stage_g, "G  gbuffer")
    ga_ms = timed(stage_ga, "GA +albedo")
    gl_ms = timed(stage_gl, "GL +shading")
    d_ms = timed(stage_d, "D  shadow pass")
    fs_ms = timed(stage_full_shadowed, "FS full shadowed")
    print(f"platform={jax.devices()[0].platform} frames={frames}")
    print(f"G  gbuffer raster      : {g_ms:7.2f} ms")
    print(f"GA +albedo sample      : {ga_ms:7.2f} ms  (+{ga_ms - g_ms:.2f})")
    print(f"GL +blinn+tonemap (lit): {gl_ms:7.2f} ms  (+{gl_ms - ga_ms:.2f})")
    print(f"D  shadow depth pass   : {d_ms:7.2f} ms")
    print(f"FS full shadowed       : {fs_ms:7.2f} ms  "
          f"(PCF+dir-shading delta +{fs_ms - ga_ms - d_ms:.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
