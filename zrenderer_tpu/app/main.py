"""Headless renderer application — the zrenderer.zig main() analog.

Same flow as the reference (zrenderer.zig:364-395): init (load scene bins,
create device context, upload geometry), then a frame loop of
update (stats + scene outliner) -> draw -> present.  On a TPU host there is
no interactive window; frames are written as PNGs (or discarded when
benchmarking) and the scene outliner + frame stats print to the console
(and render into the 2D overlay pass when enabled).

    python -m zrenderer_tpu.app.main --scene content/scenes/test_scene \
        --width 1920 --height 1080 --frames 60 --out out/
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

from zrenderer_tpu.engine.config import RenderConfig
from zrenderer_tpu.engine.renderer import Renderer
from zrenderer_tpu.scene.mesh import MeshData
from zrenderer_tpu.scene.scene import Scene
from zrenderer_tpu.utils.png import write_png

log = logging.getLogger("zrenderer.app")


def scene_outliner(scene) -> str:
    """The imgui 'Scene Outliner' panel (zrenderer.zig:246-254), as text."""
    lines = ["Scene Outliner"]
    for node in scene.nodes:
        lines.append(f"  * {node.name}")
    return "\n".join(lines)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="zrenderer-tpu")
    parser.add_argument(
        "--scene", default="content/scenes/test_scene",
        help="folder containing scene.bin + meshes.bin, OR a .gltf/.glb "
             "file to load directly (runtime glTF load)",
    )
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--height", type=int, default=1080)
    parser.add_argument("--frames", type=int, default=60)
    parser.add_argument("--out", default=None, help="PNG output folder")
    parser.add_argument("--backend", default="auto",
                        choices=["auto", "pallas", "xla"])
    parser.add_argument("--pipeline", default="flat",
                        choices=["flat", "lit", "shadowed", "deferred"],
                        help="render pipeline (BASELINE.json configs 0-3)")
    parser.add_argument("--orbit", action="store_true",
                        help="animate the camera on a turntable orbit")
    parser.add_argument("--taa", action="store_true",
                        help="temporal anti-aliasing (jitter + history resolve)")
    parser.add_argument("--overlay", action="store_true",
                        help="rasterize the stats/outliner overlay into frames")
    parser.add_argument("--ui", action="store_true",
                        help="full imgui-window UI (stats + scene outliner "
                             "windows) instead of the simple overlay panel")
    parser.add_argument("--binning", default="auto",
                        choices=["auto", "hierarchy", "tile_lists"],
                        help="raster binning strategy (tile_lists = per-tile "
                             "sorted triangle lists, wins on dense soups)")
    parser.add_argument("--debug", action="store_true",
                        help="interpret-mode kernels (the debug layer)")
    parser.add_argument("--ssaa", type=int, default=1,
                        help="ordered-grid supersampling factor for the "
                             "flat pipeline (MSAA analog; TAA is the "
                             "temporal alternative)")
    parser.add_argument("--trace", default=None,
                        help="capture a jax.profiler trace to this dir")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(name)s: %(message)s")

    if args.scene.endswith((".gltf", ".glb")):
        # Runtime glTF load (the parseAndLoadGltfFile capability,
        # common.zig:539-667) — no offline conversion step needed.
        from zrenderer_tpu.scene.gltf_runtime import load_gltf

        scene, mesh_data = load_gltf(args.scene)
    else:
        scene = Scene.load(os.path.join(args.scene, "scene.bin"))
        mesh_data = MeshData.load(os.path.join(args.scene, "meshes.bin"))

    config = RenderConfig(
        width=args.width, height=args.height, backend=args.backend,
        pipeline=args.pipeline, debug=args.debug, binning=args.binning,
        supersample=args.ssaa,
    )
    renderer = Renderer(config)
    renderer.load_scene(scene, mesh_data)
    if args.pipeline != "flat":
        from zrenderer_tpu.engine.textures import (
            Texture, checkerboard, textures_from_mesh_data,
        )

        # Per-material textures from the scene's TEXS table when present
        # (uris relative to the scene folder); checker fallback otherwise.
        base_dir = (
            os.path.dirname(args.scene)
            if args.scene.endswith((".gltf", ".glb")) else args.scene
        )
        tex_list, mat_tex = textures_from_mesh_data(mesh_data, base_dir)
        if tex_list is not None:
            renderer.set_environment(textures=tex_list,
                                     material_textures=mat_tex)
        else:
            renderer.set_environment(
                texture=Texture.from_array(checkerboard(256))
            )

    orbit_ctl = None
    if args.orbit:
        from zrenderer_tpu.app.camera import CameraController

        orbit_ctl = CameraController(scene.active_camera)
        orbit_radius = float(
            __import__("numpy").linalg.norm(scene.active_camera.position)
        )

    print(scene_outliner(scene))

    overlay = None
    if args.ui:
        from zrenderer_tpu.app.overlay_ui import ImguiOverlay

        overlay = ImguiOverlay(config.width, config.height)
    elif args.overlay:
        from zrenderer_tpu.app.overlay_ui import OverlayUI

        overlay = OverlayUI(config.width, config.height)

    if args.out:
        os.makedirs(args.out, exist_ok=True)

    taa_state = {"history": None, "jitters": None}
    if args.taa:
        from zrenderer_tpu.ops import taa as taa_ops

        taa_state["jitters"] = taa_ops.jitter_sequence(8)

    def run_frames():
        import math

        for frame_i in range(args.frames):
            if orbit_ctl is not None:
                orbit_ctl.orbit(
                    (0.0, 0.5, 0.0), orbit_radius,
                    azimuth=2 * math.pi * frame_i / max(args.frames, 1),
                    elevation=0.35,
                )
            jitter = None
            if args.taa:
                jitter = taa_state["jitters"][frame_i % 8]
            renderer.render(jitter=jitter)
            if args.taa:
                from zrenderer_tpu.ops.taa import taa_init_history, taa_resolve

                color, depth_dev = renderer._pending
                if taa_state["history"] is None:
                    taa_state["history"] = taa_init_history(color)
                taa_state["history"], resolved = taa_resolve(
                    taa_state["history"], color
                )
                renderer._pending = (resolved, depth_dev)
            if not args.out and overlay is None:
                renderer.present()  # fence only; frame stays on device
                if frame_i % 30 == 0 or frame_i == args.frames - 1:
                    print(renderer.stats.format_line())
                continue
            img, depth = renderer.read_frame()
            if overlay is not None:
                if args.ui:
                    img = overlay.compose(
                        img, renderer.stats.format_line(), scene
                    )
                else:
                    img = overlay.compose(
                        img,
                        [renderer.stats.format_line()]
                        + scene_outliner(scene).split("\n"),
                    )
            if args.out:
                write_png(os.path.join(args.out, f"frame_{frame_i:04d}.png"), img)
            if frame_i % 30 == 0 or frame_i == args.frames - 1:
                print(renderer.stats.format_line())

    if args.trace:
        from zrenderer_tpu.profiling import ztracy

        with ztracy.trace(args.trace):
            run_frames()
    else:
        run_frames()

    renderer.finish_gpu_commands()
    return 0


if __name__ == "__main__":
    sys.exit(main())
