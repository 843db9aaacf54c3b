"""Frame statistics — the FrameStats analog (common.zig:22-73).

Tracks fps and average frame time recomputed once per second like the
reference, plus renderer-domain throughput (Mtri/s submitted, Gpix/s
shaded) as required by the BASELINE.json metric.  Instead of writing to a
window title, `format_line()` renders the stats string for the console/
overlay.
"""

from __future__ import annotations

import time


class FrameStats:
    def __init__(self, window_name: str = "zrenderer-tpu"):
        self.window_name = window_name
        self.time = 0.0
        self.delta_time = 0.0
        self.fps = 0.0
        self.average_cpu_time_ms = 0.0
        self.mtri_per_s = 0.0
        self.gpix_per_s = 0.0
        # Dropped plane-crossing triangles (capped clipper overflow) —
        # populated by the renderer in debug mode / clip_overflow().
        self.clip_dropped = 0
        self._start = time.perf_counter()
        self._previous_time = 0.0
        self._refresh_time = 0.0
        self._frame_counter = 0
        self._tri_counter = 0
        self._pix_counter = 0

    def update(self, triangles: int = 0, pixels: int = 0) -> None:
        """Call once per frame (reference updates stats in update(),
        zrenderer.zig:240)."""
        now = time.perf_counter() - self._start
        self.time = now
        self.delta_time = now - self._previous_time
        self._previous_time = now

        if now - self._refresh_time >= 1.0:
            t = now - self._refresh_time
            fps = self._frame_counter / t
            self.fps = fps
            self.average_cpu_time_ms = (1.0 / fps) * 1000.0 if fps > 0 else 0.0
            self.mtri_per_s = self._tri_counter / t / 1e6
            self.gpix_per_s = self._pix_counter / t / 1e9
            self._refresh_time = now
            self._frame_counter = 0
            self._tri_counter = 0
            self._pix_counter = 0
        self._frame_counter += 1
        self._tri_counter += triangles
        self._pix_counter += pixels

    def format_line(self) -> str:
        warn = (f"  clip_dropped={self.clip_dropped}"
                if self.clip_dropped else "")
        return (
            f"FPS: {self.fps:.1f}  CPU time: {self.average_cpu_time_ms:.3f} ms  "
            f"{self.mtri_per_s:.2f} Mtri/s  {self.gpix_per_s:.2f} Gpix/s"
            f"{warn} | {self.window_name}"
        )
