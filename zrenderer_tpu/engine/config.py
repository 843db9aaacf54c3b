"""Renderer configuration.

The reference's configuration is compile-time build options + hardcoded
constants (SURVEY.md §5.6: window 1920x1080 at zrenderer.zig:30-31, debug
flags in build.zig:15-35).  Here it is a runtime dataclass whose content
hash keys the pipeline cache (the analog of zd3d12's Adler32 PSO cache,
zd3d12.zig:1007-1012).
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field, replace

from zrenderer_tpu.ops.raster_pallas import TILE_H, TILE_W


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclass(frozen=True)
class RenderConfig:
    width: int = 1920
    height: int = 1080
    backend: str = "auto"  # "pallas" | "xla" | "auto" (pallas on TPU)
    # BASELINE.json configs: "flat" (0), "lit" (1), "shadowed" (2),
    # "deferred" (3)
    pipeline: str = "flat"
    # Raster binning: "hierarchy" (union-bbox block/superblock skip),
    # "tile_lists" (per-tile sorted lists via the pair-argsort prep — the
    # explicit choice for dense soups), "small" (sort-free dense-mask
    # per-tile lists, small scenes only), or "auto" (small up to
    # SMALL_BIN_MAX_ROWS setup rows, hierarchy above —
    # ops/raster_pallas.py, measured in docs/PERFORMANCE.md).
    binning: str = "auto"
    shadow_size: int = 1024
    # Shadow quality (config 2): constant + slope-scaled depth bias and the
    # PCF kernel radius ((2*taps+1)^2 taps).
    shadow_bias: float = 2e-3
    shadow_slope_bias: float = 3e-3
    pcf_taps: int = 1
    # Shadow-lookup resolution divisor: 1 = exact per-pixel PCF; 2 = PCF
    # at every 2nd pixel + bilinear upsample of the lit fraction (4x fewer
    # TPU gathers — the shadow pass's dominant cost; PCF is already a
    # blur, so away from contact edges the image is visually identical).
    shadow_lookup_stride: int = 1
    clear_color: tuple = (0.0, 0.0, 0.0, 1.0)
    # Ordered-grid supersampling (the MSAA-capable-pass analog,
    # zd3d12.zig:904-1046 sample-desc plumbing): render the flat pipeline
    # at supersample x resolution and box-resolve down (integer filter,
    # deterministic; depth resolves to per-box min).  TAA remains the
    # temporal default for the demo (docs/QUIRKS.md).
    supersample: int = 1
    # bf16 experiment (deferred/pallas only): stream the G-buffer planes
    # through the tiled light kernel at half width ("bf16"); BRDF math
    # stays f32.  "f32" (default) keeps the 1-LSB parity contract with the
    # XLA reference shade.  Measured results: docs/PERFORMANCE.md.
    lighting_planes: str = "f32"
    # The debug layer (SURVEY.md §5.2): interpret-mode Pallas kernels + frame
    # output validation; on the XLA backend the frame is additionally
    # compiled with checkify NaN/div/OOB asserts (engine/renderer.py).
    debug: bool = False
    profile: bool = False  # jax.profiler trace zones
    vert_align: int = 128
    tri_align: int = 256
    lod: int = 0  # mesh LOD drawn (the reference hardcodes 0)
    # Meshlet (cluster) culling — the mesh-shader-pipeline analog
    # (zd3d12.zig:1147-1205): conservative frustum-sphere + backface-cone
    # tests kill whole 128-triangle blocks before binning (flat
    # pipeline).  Conservative wrt float geometry; snap-flipped
    # sub-pixel slivers may differ (ops/geometry.py meshlet_keep_mask —
    # the standard cone-culling contract), so the default stays off.
    meshlet_cull: bool = False
    # Per-frame host-staging budget for traced constants (the 18 MB
    # per-frame upload heap analog, zd3d12.zig:62-63); exhaustion stalls
    # the device and retries (zd3d12.zig:1240-1250 semantics).
    upload_heap_bytes: int = 18 * 2**20
    readback: bool = True  # device->host copy of each frame ("present")
    # CPU<->device pipelining depth (max_num_buffered_frames=2,
    # zd3d12.zig:45): present() fences only when the host is this many
    # frames ahead, so frame N+1's host prep overlaps frame N's device
    # work.  1 = fully synchronous present.
    frames_in_flight: int = 2

    @property
    def pad_width(self) -> int:
        return _round_up(self.width, TILE_W)

    @property
    def pad_height(self) -> int:
        return _round_up(self.height, TILE_H)

    def content_hash(self) -> int:
        """Stable content hash for pipeline-cache keys."""
        return zlib.adler32(repr(self).encode())

    def with_(self, **kw) -> "RenderConfig":
        return replace(self, **kw)
