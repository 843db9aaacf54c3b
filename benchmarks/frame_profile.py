"""Op-level profile of a FULL frame pipeline on the current device.

Captures a jax.profiler trace of N frames rendered in one dispatch (the
honest render_animation methodology) and prints the top XLA/Mosaic ops by
device time — ground truth for where a frame's milliseconds go.

    python benchmarks/frame_profile.py [pipeline] [num_triangles]
        [--size WxH] [--frames N] [--trace-dir DIR]

``pipeline``: flat (default) | lit | shadowed | deferred.
``num_triangles``: 0 (default) = the converted test scene; otherwise a
procedural stress lattice of that many triangles.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    os.environ.setdefault("ZRENDERER_QUIET", "1")
    args = sys.argv[1:]
    pipeline = args[0] if args and not args[0].startswith("-") else "flat"
    tris = 0
    if len(args) > 1 and args[1].isdigit():
        tris = int(args[1])
    size = (1920, 1080)
    if "--size" in args:
        w, h = args[args.index("--size") + 1].split("x")
        size = (int(w), int(h))
    frames = 8
    if "--frames" in args:
        frames = int(args[args.index("--frames") + 1])
    trace_dir = "/tmp/frame_trace"
    if "--trace-dir" in args:
        trace_dir = args[args.index("--trace-dir") + 1]

    import jax

    from zrenderer_tpu.engine.config import RenderConfig
    from zrenderer_tpu.engine.renderer import Renderer
    from zrenderer_tpu.scene.procedural import make_stress_scene
    from zrenderer_tpu.scene.scene import Scene
    from zrenderer_tpu.scene.mesh import MeshData

    cfg = RenderConfig(width=size[0], height=size[1], pipeline=pipeline)
    r = Renderer(cfg)
    if tris:
        scene, mesh_data = make_stress_scene(tris)
    else:
        scene = Scene.load("content/scenes/test_scene/scene.bin")
        mesh_data = MeshData.load("content/scenes/test_scene/meshes.bin")
    r.load_scene(scene, mesh_data)
    if pipeline in ("lit", "shadowed"):
        # Match benchmarks/configs.py: a real 256^2 trilinear texture
        # (the default 1x1 environment takes the fast-path sampler and
        # is not representative).
        from zrenderer_tpu.engine.textures import Texture

        y, x = np.mgrid[0:256, 0:256]
        c = (((x // 16) ^ (y // 16)) & 1).astype(np.float32)
        img = np.stack(
            [c, 0.5 + 0.5 * c, 1.0 - 0.5 * c, np.ones_like(c)], axis=-1)
        r.set_environment(texture=Texture.from_array(img))

    digests, _ = r.render_animation(num_frames=frames)  # compile + warm
    np.asarray(digests)
    with jax.profiler.trace(trace_dir):
        digests, _ = r.render_animation(num_frames=frames)
        np.asarray(digests)

    files = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not files:
        print("no trace files under", trace_dir)
        return 1
    with gzip.open(files[-1], "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name" and "args" in e}
    totals: dict[str, float] = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        name = e.get("name", "?")
        totals[name] = totals.get(name, 0.0) + e["dur"]
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:30]
    total_us = sum(totals.values())
    print(f"pipeline={pipeline} tris={tris or 'test_scene'} "
          f"size={size[0]}x{size[1]} frames={frames}")
    print(f"device total: {total_us / 1000 / frames:.3f} ms/frame "
          f"({len(totals)} distinct ops)")
    for name, us in top:
        print(f"{us / 1000 / frames:9.3f} ms/frame  {name[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
