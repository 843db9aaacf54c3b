"""Per-frame host staging ring — the GpuMemoryHeap / upload-heap analog.

The reference gives every in-flight frame a fixed 18 MB linear upload heap
(zd3d12.zig:62-63, :2052-2115: bump allocator, 512-byte alignment, returns
null when full) and degrades gracefully on exhaustion: the caller stalls
the GPU, resets the heap, and retries (zd3d12.zig:1240-1250) instead of
crashing.

The TPU analog: per-frame traced constants (per-draw matrices, light
tables) are staged into pooled pinned host buffers before the host->device
transfer.  Two buffers rotate with the renderer's two-frames-in-flight
pacing, `stage()` returns None when the frame's budget is exhausted, and
the renderer stalls (finish_gpu_commands) + resets + retries — the same
back-pressure contract.
"""

from __future__ import annotations

import numpy as np

ALLOC_ALIGNMENT = 512  # zd3d12.zig GpuMemoryHeap.alloc_alignment


class UploadRing:
    def __init__(self, frame_bytes: int = 18 * 2**20, frames: int = 2):
        assert frames >= 1 and frame_bytes > 0
        self.frame_bytes = frame_bytes
        self.frames = frames
        self._buffers = [
            np.empty(frame_bytes, np.uint8) for _ in range(frames)
        ]
        self._offset = 0
        self._frame = 0
        self.stall_count = 0  # observability: how often back-pressure hit

    def begin_frame(self) -> None:
        """Rotate to the next per-frame buffer (endFrame analog: the heap
        for frame N is reused once frame N-frames has drained)."""
        self._frame = (self._frame + 1) % self.frames
        self._offset = 0

    def reset_frame(self) -> None:
        """Reset the CURRENT frame's heap after a stall-and-retry."""
        self._offset = 0

    def stage(self, arr: np.ndarray):
        """Copy ``arr`` into the current frame's staging buffer.

        Returns a view over pooled storage (same dtype/shape), or None when
        the frame budget is exhausted (the caller stalls and retries, or
        fails the frame — zd3d12.zig:1240-1250 semantics).
        """
        arr = np.asarray(arr)
        size = arr.nbytes
        aligned = -(-self._offset // ALLOC_ALIGNMENT) * ALLOC_ALIGNMENT
        if aligned + size > self.frame_bytes:
            return None
        buf = self._buffers[self._frame]
        view = buf[aligned : aligned + size].view(arr.dtype).reshape(arr.shape)
        np.copyto(view, arr)
        self._offset = aligned + size
        return view

    def stage_all(self, arrays):
        """Stage a list of arrays atomically; None if ANY would overflow."""
        saved = self._offset
        out = []
        for a in arrays:
            v = self.stage(a)
            if v is None:
                self._offset = saved
                return None
            out.append(v)
        return out
