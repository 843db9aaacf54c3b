"""Benchmark: steady-state FPS at 1920x1080 on test_scene (one TPU chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = 60 FPS (the driver-set target, BASELINE.md — the reference
publishes no numbers and is vsync-capped by design).

METHODOLOGY (honest device rate — see docs/PERFORMANCE.md):

* The headline measures the single-dispatch animation path
  (``Renderer.render_animation``): N frames produced back-to-back on
  device by one ``lax.scan``, each frame fully rasterized and reduced to
  a digest; materializing the digests is a TRUE fence on every runtime.
* Why not a per-frame loop with ``block_until_ready``:  measured on this
  harness, the remote axon runtime resolves ``block_until_ready`` at
  ENQUEUE time, so a per-frame loop reports host dispatch rate (5000+
  "FPS" while the device is still working).  Round-1's recorded number
  had exactly that flaw.  Additionally, each per-frame dispatch pays
  ~35 ms of tunnel RPC latency that a co-located host would not see; the
  interactive loop rate is reported separately on stderr.
* Parity artifact: every run renders 256x144 through the device pipeline
  and diffs the full frame against the CPU oracle.
"""

import json
import os
import sys
import time

import numpy as np


def main() -> int:
    os.environ.setdefault("ZRENDERER_QUIET", "1")
    verify = "--verify" in sys.argv
    import jax

    from zrenderer_tpu.engine.config import RenderConfig
    from zrenderer_tpu.engine.renderer import Renderer
    from zrenderer_tpu.scene.mesh import MeshData
    from zrenderer_tpu.scene.scene import Scene

    here = os.path.dirname(os.path.abspath(__file__))
    scene_dir = os.path.join(here, "content", "scenes", "test_scene")
    scene = Scene.load(os.path.join(scene_dir, "scene.bin"))
    mesh_data = MeshData.load(os.path.join(scene_dir, "meshes.bin"))

    config = RenderConfig(width=1920, height=1080, backend="auto")
    renderer = Renderer(config)
    renderer.load_scene(scene, mesh_data)

    # Warmup: compile the animation executable + pay the one-time tunnel
    # D2H channel setup (measured ~3-5 min for the FIRST transfer of a
    # process; every later readback is milliseconds).
    frames = 200
    digests, _ = renderer.render_animation(num_frames=frames)
    np.asarray(digests)

    # Measured: N frames per device dispatch, digest materialization as
    # the fence.  Best-of-3 absorbs transient tunnel latency on the one
    # dispatch + one readback per rep.
    best = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        digests, (color, depth) = renderer.render_animation(num_frames=frames)
        d0 = float(np.asarray(digests)[0])
        best = min(best, time.perf_counter() - t0)
    fps = frames / best

    # Secondary: the interactive per-frame loop rate through the tunnel
    # (render+present per frame, hard drain at the end).  On a co-located
    # host this approaches the device rate; through the tunnel it is
    # dominated by ~35 ms/dispatch RPC latency.
    renderer.render()
    renderer.present()
    renderer.drain_hard()  # compile + warm the per-frame path
    n_loop = 25
    t0 = time.perf_counter()
    for _ in range(n_loop):
        renderer.render()
        renderer.present()
    renderer.drain_hard()
    loop_ms = (time.perf_counter() - t0) / n_loop * 1000

    # Sanity: the frame must actually contain the scene.
    t0 = time.perf_counter()
    img = np.asarray(color[::16, ::16])
    readback_ms = (time.perf_counter() - t0) * 1000
    coverage = (img[..., 0:3].sum(axis=-1) > 0).mean()
    assert coverage > 0.05, f"benchmark frame empty (coverage={coverage})"
    assert d0 > 0, "empty digest"

    # Parity artifact (captured in EVERY bench run — the north-star
    # "pixel-exact vs the CPU reference raster" as recorded evidence):
    # 256x144 through the same device pipeline vs the CPU oracle.
    from zrenderer_tpu.raster_ref import render_scene_cpu

    pw, ph = 256, 144
    pr = Renderer(RenderConfig(width=pw, height=ph, backend=config.backend))
    pr.load_scene(scene, mesh_data)
    img_dev, _ = pr.render_and_read()
    img_cpu, _ = render_scene_cpu(scene, mesh_data, pw, ph)
    diff = np.abs(img_dev.astype(np.int32) - img_cpu.astype(np.int32))
    bad = int((diff > 0).sum())
    parity_ok = int(diff.max()) <= 1 and bad < 50
    print(
        f"# parity vs CPU oracle at {pw}x{ph} on "
        f"{jax.devices()[0].platform}/{pr.backend}: max_diff="
        f"{int(diff.max())} LSB, {bad}/{pw * ph} px differ — "
        f"{'OK' if parity_ok else 'FAIL'}",
        file=sys.stderr,
    )
    assert parity_ok, (int(diff.max()), bad)

    if verify:
        # Full-resolution parity vs the CPU oracle (slow readback; opt-in).
        renderer.render()
        img_full, _ = renderer.read_frame()
        img_cpu, _ = render_scene_cpu(scene, mesh_data, 1920, 1080)
        diff = np.abs(img_full.astype(np.int32) - img_cpu.astype(np.int32))
        bad = (diff > 0).sum()
        assert diff.max() <= 1 and bad < 100, (diff.max(), bad)
        print(f"# parity vs oracle at 1080p: {bad} px differ by <=1 LSB",
              file=sys.stderr)

    tris = renderer.flat.num_triangles
    print(
        json.dumps(
            {
                "metric": "fps_1080p_test_scene",
                "value": round(fps, 2),
                "unit": "frames/sec (device rate, single-dispatch, true fence)",
                "vs_baseline": round(fps / 60.0, 3),
            }
        )
    )
    print(
        f"# {fps:.1f} FPS device rate ({1000.0 / fps:.3f} ms/frame), "
        f"{tris} tris/frame, {tris * fps / 1e6:.2f} Mtri/s, "
        f"{1920 * 1080 * fps / 1e9:.3f} Gpix/s shaded; "
        f"interactive loop {loop_ms:.1f} ms/frame through the tunnel "
        f"(~35 ms of that is per-dispatch RPC latency, not renderer); "
        f"readback {readback_ms:.1f} ms (screenshot path), "
        f"platform={jax.devices()[0].platform}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    # The TPU is reached through a tunnel that occasionally aborts a request
    # transiently; one retry in a fresh process protects the benchmark run.
    try:
        sys.exit(main())
    except Exception as e:  # noqa: BLE001
        print(f"# first attempt failed ({type(e).__name__}: {e}); retrying",
              file=sys.stderr)
        import subprocess

        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)]
            + [a for a in sys.argv[1:]],
            env={**os.environ, "ZRENDERER_BENCH_RETRY": "1"},
        ).returncode if os.environ.get("ZRENDERER_BENCH_RETRY") != "1" else 1
        sys.exit(rc)
