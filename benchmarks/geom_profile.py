"""Op-level profile of the geometry pipeline on TPU.

Captures a jax.profiler trace of the per-corner geometry pipeline at 1M
triangles and prints the top XLA ops by total device time — the ground
truth for where the ~140 ms/frame actually goes.

    python benchmarks/geom_profile.py [num_triangles] [--trace-dir DIR]
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
    tris = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 1_000_000
    trace_dir = "/tmp/geom_trace"
    if "--trace-dir" in sys.argv:
        trace_dir = sys.argv[sys.argv.index("--trace-dir") + 1]

    import jax
    import jax.numpy as jnp

    from zrenderer_tpu.engine.config import RenderConfig
    from zrenderer_tpu.engine.renderer import Renderer
    from zrenderer_tpu.ops import geometry as g
    from zrenderer_tpu.scene.procedural import make_stress_scene

    cfg = RenderConfig(width=1920, height=1080)
    W, H = cfg.pad_width, cfg.pad_height
    scene, mesh_data = make_stress_scene(tris)
    r = Renderer(cfg)
    r.load_scene(scene, mesh_data)
    b = r._buffers()
    base = np.asarray(r.camera_matrices())
    reps = 4
    mats = jnp.asarray(np.stack(
        [base * (1.0 + 1e-4 * k) for k in range(reps)], 0
    ).astype(np.float32))

    @jax.jit
    def run(mats_, ccols, tri_node):
        def step(carry, m):
            ti, tf = g.geometry_pipeline(jnp, ccols, None, None, m, tri_node,
                                         W, H)
            return carry + jnp.sum(ti[:, 0]) + jnp.sum(tf[:, 0]), None
        out, _ = jax.lax.scan(step, jnp.float32(0.0), mats_)
        return out

    args = (mats, b["corner_cols"], b["tri_node"])
    np.asarray(run(*args))  # compile + warm
    with jax.profiler.trace(trace_dir):
        np.asarray(run(*args))

    # Parse the trace: sum device-side event durations by op name.
    files = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not files:
        print("no trace files under", trace_dir)
        return 1
    with gzip.open(files[-1], "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])
    # Device lanes: pid names containing "TPU" / "/device:"; fall back to
    # any complete event with a duration.
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
    print(f"device total: {total_us / 1000 / reps:.2f} ms/frame "
          f"({len(totals)} distinct ops)")
    for name, us in top:
        print(f"{us / 1000 / reps:9.3f} ms/frame  {name[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
