"""The Renderer — the zd3d12.GraphicsContext + frame-loop analog, reshaped
for TPU (SURVEY.md §7.2 item 5).

Mapping from the reference's device layer:

* GraphicsContext.init (zd3d12.zig:82-583)  -> Renderer(config): pick the
  JAX device, build the pipeline cache and resource pool.
* VB/IB upload + barriers (zrenderer.zig:131-209) -> load_scene(): flatten
  the scene once and jax.device_put the arrays.
* command list + PSO + per-draw root constants (zrenderer.zig:257-362) ->
  one jitted frame function; per-frame constants (object_to_clip matrices)
  are traced arguments, so one compilation serves every frame.
* beginFrame/endFrame fence pacing (zd3d12.zig:622-675) -> JAX async
  dispatch: `render()` returns after enqueuing; `present()` (device->host
  readback of the previous frame) is the swapchain flip, overlapping the
  next frame's compute.
* PSO cache (zd3d12.zig:1007-1012) -> PipelineCache keyed by
  (backend, shapes, resolution, config hash).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from zrenderer_tpu.engine.config import RenderConfig
from zrenderer_tpu.engine.pools import PipelineCache, ResourcePool
from zrenderer_tpu.engine.stats import FrameStats
from zrenderer_tpu.engine.upload import FlatScene, flatten_scene
from zrenderer_tpu.ops import geometry as g
from zrenderer_tpu.ops import raster_pallas, raster_xla
from zrenderer_tpu.profiling import ztracy

log = logging.getLogger("zrenderer.engine")


class Renderer:
    def __init__(self, config: RenderConfig | None = None):
        self.config = config or RenderConfig()
        self.device = jax.devices()[0]
        self.backend = self._resolve_backend()
        self.pipelines = PipelineCache()
        self.resources = ResourcePool(name="device-array")
        self.stats = FrameStats()
        from zrenderer_tpu.engine.upload_ring import UploadRing

        self.upload_ring = UploadRing(
            self.config.upload_heap_bytes,
            frames=max(self.config.frames_in_flight, 1),
        )
        self._in_flight = []  # enqueued frames not yet fenced (oldest first)
        self.flat: FlatScene | None = None
        self._buffer_handles = {}  # name -> generational Handle
        self._vertex_shader = None
        self._vertex_shader_key = None
        self._pending = None  # last enqueued frame (async dispatch)
        self._meshlet_table = None  # set by load_scene when meshlet_cull
        log.info(
            "Renderer on %s (platform=%s, backend=%s)",
            self.device,
            self.device.platform,
            self.backend,
        )

    def _resolve_backend(self) -> str:
        if self.config.backend != "auto":
            return self.config.backend
        return "pallas" if self.device.platform == "tpu" else "xla"

    # -- resource upload ----------------------------------------------------

    def load_scene(self, scene, mesh_data) -> None:
        """Flatten + upload scene geometry (the VB/IB upload analog)."""
        with ztracy.zone("load_scene"):
            self.scene = scene
            self.mesh_data = mesh_data
            self.flat = flatten_scene(
                scene,
                mesh_data,
                pad=True,
                vert_align=self.config.vert_align,
                tri_align=self.config.tri_align,
                lod=self.config.lod,
                apply_materials=self.config.pipeline != "flat",
            )
            f = self.flat
            # Device buffers live in the generational resource pool; the
            # data path goes through handle lookups (stale handles after a
            # destroy are detected, zd3d12.zig:1752-1831 semantics), and
            # reloading a scene destroys the previous buffers' slots.
            for name in ("positions", "attrs", "tri_vidx", "vert_node",
                         "materials", "corner_cols", "tri_node"):
                h = self._buffer_handles.pop(name, None)
                if h is not None:
                    self.resources.destroy(h)
            self._set_buffer("positions", jax.device_put(f.positions, self.device))
            self._set_buffer("attrs", jax.device_put(f.attrs, self.device))
            self._set_buffer("tri_vidx", jax.device_put(f.tri_vidx, self.device))
            self._set_buffer("vert_node", jax.device_put(f.vert_node, self.device))
            # Column per-corner expansion (static topology): the geometry
            # stage skips both its per-frame 3T-row gather (latency-bound)
            # and the padded (T,3,16) AoS triangle array — see
            # geometry_pipeline_cols.
            ccols, tri_node = f.expand_corner_cols()
            self._set_buffer("corner_cols", jax.device_put(ccols, self.device))
            self._set_buffer("tri_node", jax.device_put(tri_node, self.device))
            # Per-draw local AABB corners, cached once: the light frustum is
            # fitted from TRANSFORMED bounds (exact under node rotation and
            # scale) without per-frame host scans of all vertices.
            f = self.flat
            corners = np.empty((f.draw_count, 8, 4), np.float32)
            for d in range(f.draw_count):
                pts = f.positions[: f.num_vertices][
                    f.vert_node[: f.num_vertices] == d, :3
                ]
                lo = pts.min(axis=0)
                hi = pts.max(axis=0)
                k = 0
                for x in (lo[0], hi[0]):
                    for y in (lo[1], hi[1]):
                        for z in (lo[2], hi[2]):
                            corners[d, k] = (x, y, z, 1.0)
                            k += 1
            self._draw_corners = corners
            self._static_light_vp = None
            self._meshlet_table = None
            if self.config.meshlet_cull:
                bounds, mdraw, enabled = f.build_meshlet_table(
                    g.RASTER_BLOCK)
                self._meshlet_table = (
                    jax.device_put(bounds, self.device),
                    jax.device_put(mdraw, self.device),
                    jax.device_put(enabled, self.device),
                )
            self._upload_material_table()
            log.info(
                "scene uploaded: %d draws, %d verts (%d padded), %d tris (%d padded)",
                f.draw_count,
                f.num_vertices,
                len(f.positions),
                f.num_triangles,
                len(f.tri_vidx),
            )

    # -- environment (textures, lights) --------------------------------------

    def set_environment(self, texture=None, light_pos=(4.0, 8.0, 6.0),
                        light_color=(1.0, 1.0, 1.0), lights=None,
                        light_dir=(-0.5, -1.0, -0.35),
                        textures=None, material_textures=None):
        """Bind the lit pipelines' resources: a Texture (None = 1x1 white),
        one point light (lit), a light array (deferred), or a directional
        light (shadowed).

        Per-draw texture binding (the per-draw SRV analog,
        zd3d12.zig:1273-1356): pass ``textures`` (a list of same-size
        Texture objects, stacked into a TextureArray) plus
        ``material_textures`` mapping material index -> layer index
        (-1 / missing = untextured; an all-white layer is appended for
        those).  Draws resolve to layers through their mesh's material.
        """
        from zrenderer_tpu.engine.textures import (
            Texture, TextureArray, white_texture,
        )

        self._material_tex_layer = None
        if textures is not None:
            import numpy as _np

            h, w = textures[0].base_shape
            white = Texture.from_array(
                _np.ones((h, w, 4), _np.float32),
                num_levels=textures[0].num_levels,
            )
            array = TextureArray.from_textures(list(textures) + [white])
            white_layer = array.num_layers - 1
            mats = getattr(self, "mesh_data", None)
            num_materials = len(mats.materials) if mats else 0
            mapping = np.full(max(num_materials, 1), white_layer, np.int32)
            if material_textures is not None:
                for mi, layer in enumerate(material_textures):
                    if 0 <= mi < len(mapping) and layer >= 0:
                        mapping[mi] = layer
            self._material_tex_layer = mapping
            self._white_layer = white_layer
            self.texture = array
        else:
            self._white_layer = 0
            self.texture = texture if texture is not None else white_texture()
        self.light_pos = np.asarray(light_pos, np.float32)
        self.light_color = np.asarray(light_color, np.float32)
        d = np.asarray(light_dir, np.float32)
        self.light_dir = d / np.linalg.norm(d)
        self._static_light_vp = None  # frustum depends on light_dir
        if lights is None:
            lights = (np.asarray([light_pos], np.float32),
                      np.asarray([light_color], np.float32))
        self.lights = (np.asarray(lights[0], np.float32),
                       np.asarray(lights[1], np.float32))
        if self.config.pipeline in ("lit", "shadowed"):
            # Pre-build the sampler's atlas OUTSIDE any jit trace: the
            # derived atlases are lazy (engine/textures.py), and a first
            # touch inside a traced frame would rebuild it per trace
            # (and must not populate the cache — tracer-leak guard).
            _ = self.texture.oct_atlas_u32
        if self.flat is not None:
            self._upload_material_table()

    def _upload_material_table(self) -> None:
        """Per-draw material constants (metallic, roughness, emissive rgb,
        texture layer) -> device table consumed by the G-buffer stage.
        Draws without a material get the Material defaults + white layer."""
        from zrenderer_tpu.ops.geometry import MATERIAL_COLS

        mats = getattr(self, "mesh_data", None)
        tex_layer = getattr(self, "_material_tex_layer", None)
        table = np.zeros((self.flat.draw_count, MATERIAL_COLS), np.float32)
        table[:, 1] = 0.5  # default roughness (Material dataclass default)
        # Draws without a material sample the white layer (no-op texture).
        table[:, 5] = float(getattr(self, "_white_layer", 0))
        for d, mesh_index in enumerate(self.flat.draw_mesh):
            mi = -1
            if mats is not None and mats.mesh_material:
                mi = mats.mesh_material[mesh_index]
            if mi is None or mi < 0:
                continue
            m = mats.materials[mi]
            table[d, 0] = m.metallic
            table[d, 1] = m.roughness
            table[d, 2:5] = m.emissive
            if tex_layer is not None and mi < len(tex_layer):
                table[d, 5] = float(tex_layer[mi])
        old = self._buffer_handles.pop("materials", None)
        if old is not None:
            self.resources.destroy(old)
        # Expand draw->material to per-TRIANGLE rows once at load (host):
        # the device-side gather would hit the tiny-table-gather pathology
        # and the mapping is static per scene anyway.
        tri_draw = self.flat.vert_node[self.flat.tri_vidx[:, 0]]
        self._set_buffer(
            "materials", jax.device_put(table[tri_draw], self.device)
        )

    def _light_view_proj(self, node_to_world=None) -> np.ndarray:
        """Directional-light ortho view-proj fitted to the scene's world
        AABB (per-draw cached local corners x current transforms — exact
        under rotation/scale, O(draws) per frame, cached for static
        transforms)."""
        from zrenderer_tpu.math import zmath as zm

        static = node_to_world is None
        if static and self._static_light_vp is not None:
            return self._static_light_vp
        mats = self.flat.node_to_world if static else node_to_world
        world = np.einsum("dkj,dji->dki", self._draw_corners, mats)
        pts = world.reshape(-1, 4)[:, :3]
        lo = pts.min(axis=0)
        hi = pts.max(axis=0)
        center = (lo + hi) * 0.5
        radius = 0.5 * float(np.linalg.norm(hi - lo)) + 1e-3
        eye = center - self.light_dir * (2.0 * radius)
        up = (0, 1, 0) if abs(self.light_dir[1]) < 0.95 else (1, 0, 0)
        view = zm.look_at_rh(
            zm.load_vec3(eye), zm.load_vec3(center), zm.vec3(*up)
        )
        proj = zm.orthographic_rh(2.2 * radius, 2.2 * radius, 0.1, 4.5 * radius)
        vp = zm.mul(view, proj)
        if static:
            self._static_light_vp = vp
        return vp

    # -- frame pipeline -----------------------------------------------------

    def _frame_fn(self):
        cfg = self.config
        # Texture identity is part of the key: build_lit/shadowed_frame bake
        # mip geometry (base_shape, num_levels) from the bound texture at
        # build time, so rebinding a different-sized texture must recompile.
        tex_key = None
        if cfg.pipeline != "flat" and hasattr(self, "texture"):
            tex_key = (tuple(self.texture.base_shape),
                       self.texture.num_levels,
                       getattr(self.texture, "num_layers", 1))
        key = (
            self.backend,
            cfg.content_hash(),
            len(self.flat.positions),
            len(self.flat.tri_vidx),
            self.flat.draw_count,
            tex_key,
            self._vertex_shader_key,
        )

        def build_raw():
            if cfg.pipeline == "flat":
                return self._build_flat_frame()
            from zrenderer_tpu.engine import passes

            if not hasattr(self, "texture"):
                self.set_environment()
            args = (self.backend, cfg.width, cfg.height, cfg.pad_height,
                    cfg.pad_width)
            vs = self._vertex_shader
            if cfg.pipeline == "lit":
                return passes.build_lit_frame(*args, self.texture,
                                              interpret=cfg.debug,
                                              vertex_shader=vs,
                                              binning=cfg.binning)
            if cfg.pipeline == "shadowed":
                return passes.build_shadowed_frame(
                    *args, self.texture, shadow_size=cfg.shadow_size,
                    interpret=cfg.debug,
                    shadow_bias=cfg.shadow_bias,
                    shadow_slope_bias=cfg.shadow_slope_bias,
                    pcf_taps=cfg.pcf_taps,
                    vertex_shader=vs,
                    shadow_lookup_stride=cfg.shadow_lookup_stride,
                    binning=cfg.binning,
                )
            if cfg.pipeline == "deferred":
                return passes.build_deferred_frame(
                    *args, interpret=cfg.debug, vertex_shader=vs,
                    lighting_planes=cfg.lighting_planes,
                    binning=cfg.binning)
            raise ValueError(f"unknown pipeline {cfg.pipeline!r}")

        def build():
            raw = build_raw()
            if cfg.debug and self.backend == "xla":
                # The debug-layer analog (SURVEY.md §5.2): functionalized
                # NaN/div-by-zero/OOB-gather asserts compiled into the frame.
                # (The Pallas backend's debug layer is interpret-mode kernels
                # + the host-side _validate_frame instead — checkify cannot
                # see inside pallas_call.)
                from jax.experimental import checkify

                checked = jax.jit(checkify.checkify(
                    raw, errors=checkify.float_checks | checkify.index_checks
                ))

                def throwing(*a, **k):
                    err, out = checked(*a, **k)
                    err.throw()
                    return out

                return throwing
            return jax.jit(raw)

        return self.pipelines.get_or_create(key, build)

    def _geom_args(self, b):
        """(positions, attrs, tri_vidx, node_ids) for the frame functions:
        the column per-corner buffers (geometry_pipeline_cols) normally;
        the indexed buffers when a custom vertex shader is bound (the hook
        runs on per-vertex rows)."""
        if self._vertex_shader is None:
            return b["corner_cols"], None, None, b["tri_node"]
        return b["positions"], b["attrs"], b["tri_vidx"], b["vert_node"]

    def _meshlet_cull_arg(self, cam_local=None):
        """(bounds, mdraw, enabled, cam_local) for render_frame_pallas,
        or None when cluster culling is off."""
        if self._meshlet_table is None:
            return None
        b, m, e = self._meshlet_table
        return (b, m, e, cam_local)

    def cam_local_constants(self, camera=None, transforms=None):
        """Per-draw camera position in each draw's LOCAL space (D, 4) —
        the backface-cone half of meshlet culling (ops/geometry.py
        meshlet_keep_mask)."""
        camera = camera if camera is not None else self.scene.active_camera
        n2w = self.flat.node_to_world
        if transforms is not None:
            n2w = np.asarray(transforms, np.float32)
        cam = np.asarray([*camera.position[:3], 1.0], np.float32)
        inv = np.linalg.inv(n2w.astype(np.float64)).astype(np.float32)
        return np.einsum("j,djk->dk", cam, inv).astype(np.float32)

    def _build_flat_frame(self):
        cfg = self.config
        s = max(int(cfg.supersample), 1)
        rw, rh = cfg.width * s, cfg.height * s
        prw = -(-rw // raster_pallas.TILE_W) * raster_pallas.TILE_W
        prh = -(-rh // raster_pallas.TILE_H) * raster_pallas.TILE_H
        if self.backend == "pallas":

            def frame(positions, attrs, tri_vidx, node_ids, matrices,
                      cam_local=None):
                cull = self._meshlet_cull_arg(cam_local) \
                    if cam_local is not None else None
                color, depth = raster_pallas.render_frame_pallas(
                    positions, attrs, tri_vidx, matrices, node_ids,
                    rw, rh, prh, prw,
                    interpret=cfg.debug, binning=cfg.binning,
                    vertex_shader=self._vertex_shader,
                    meshlet_cull=cull,
                )
                color, depth = raster_pallas.unpack_rgba8(color), depth
                if s > 1:
                    color, depth = raster_xla.ssaa_resolve(color, depth, s)
                return color, depth

        else:

            def frame(positions, attrs, tri_vidx, node_ids, matrices):
                color, depth = raster_xla.render_frame_xla(
                    positions, attrs, tri_vidx, matrices, node_ids,
                    rw, rh,
                    vertex_shader=self._vertex_shader,
                )
                if s > 1:
                    color, depth = raster_xla.ssaa_resolve(color, depth, s)
                return color, depth

        return frame

    def camera_matrices(self, camera=None, transforms=None,
                        jitter=None) -> np.ndarray:
        """Host-side per-frame constants: object_to_clip per draw
        (the Pso_FrameConst/Pso_DrawConst analog, zrenderer.zig:311-343).
        ``jitter``: optional (jx, jy) sub-pixel TAA offset (ops/taa.py)."""
        camera = camera if camera is not None else self.scene.active_camera
        vp = g.view_proj_from_camera(camera, self.config.width, self.config.height)
        if jitter is not None:
            from zrenderer_tpu.ops.taa import jittered_view_proj

            vp = jittered_view_proj(
                vp, jitter, self.config.width, self.config.height
            )
        node_to_world = self.flat.node_to_world
        if transforms is not None:
            node_to_world = np.asarray(transforms, np.float32)
        # One batched matmul for all draws: a per-node Python loop costs
        # milliseconds of GIL time per frame at 10k draws
        # (benchmarks/host_constants.py).
        return np.einsum("nij,jk->nik", node_to_world, vp).astype(np.float32)

    def _lit_constants(self, camera=None, transforms=None,
                       jitter=None) -> dict:
        """Extended per-frame constants for the lit pipelines: normal
        matrices (inverse-transpose rotations), inverse view-proj for
        world-position reconstruction, camera position, lights.
        ``jitter``: optional (jx, jy) sub-pixel TAA offset — applied to the
        camera view-proj (and therefore its inverse, so world-position
        reconstruction stays consistent with the jittered raster); the
        light's view-proj is camera-independent and stays unjittered."""
        camera = camera if camera is not None else self.scene.active_camera
        vp = g.view_proj_from_camera(camera, self.config.width, self.config.height)
        if jitter is not None:
            from zrenderer_tpu.ops.taa import jittered_view_proj

            vp = jittered_view_proj(
                vp, jitter, self.config.width, self.config.height
            )
        node_to_world = self.flat.node_to_world
        if transforms is not None:
            node_to_world = np.asarray(transforms, np.float32)
        matrices = np.einsum("nij,jk->nik", node_to_world, vp).astype(np.float32)
        # Batched inverse (one LAPACK call) instead of a per-node loop.
        normal_mats = np.linalg.inv(
            node_to_world[:, :3, :3]
        ).transpose(0, 2, 1).astype(np.float32)
        return {
            "matrices": matrices,
            "normal_mats": normal_mats,
            "view_proj": vp.astype(np.float32),
            # f64 inversion: the projective matrix is ill-conditioned near
            # the far plane and an f32 inverse costs ~1e-3 ndc error.
            "inv_view_proj": np.linalg.inv(vp.astype(np.float64)).astype(np.float32),
            "cam_pos": np.asarray(camera.position, np.float32),
            "node_to_world": node_to_world,
        }

    def render(self, camera=None, transforms=None, jitter=None):
        """Enqueue one frame; returns the device frame (async).

        The host returns as soon as XLA has enqueued the step — the CPU/TPU
        pipelining the reference implements with 2-frames-in-flight fences
        (zd3d12.zig:45, :663-667) falls out of JAX's async dispatch.
        ``jitter``: optional TAA sub-pixel offset (flat pipeline).
        """
        assert self.flat is not None, "load_scene first"
        with ztracy.zone("render"):
            # beginFrame: fence pacing bounds how far the host runs ahead
            # (and bounds _in_flight for present-less render loops; their
            # staging accumulates in one ring slot until the back-pressure
            # stall drains + resets — safe by construction).
            self._pace()
            frame = self._frame_fn()
            b = self._buffers()
            pipeline = self.config.pipeline
            if pipeline == "flat":
                matrices = self.camera_matrices(camera, transforms, jitter)
                if (self._meshlet_table is not None
                        and self.backend == "pallas"):
                    cam_local = self.cam_local_constants(camera, transforms)
                    matrices, cam_local = self._stage_constants(
                        [matrices, cam_local])
                    color, depth = frame(*self._geom_args(b), matrices,
                                         cam_local)
                else:
                    (matrices,) = self._stage_constants([matrices])
                    color, depth = frame(*self._geom_args(b), matrices)
            else:
                c = self._lit_constants(camera, transforms, jitter)
                staged = self._stage_constants(
                    [c["matrices"], c["normal_mats"], c["inv_view_proj"]]
                )
                c["matrices"], c["normal_mats"], c["inv_view_proj"] = staged
                if pipeline == "lit":
                    color, depth = frame(
                        b, self.texture.oct_atlas_u32, c["matrices"],
                        c["normal_mats"], c["inv_view_proj"], c["cam_pos"],
                        self.light_pos, self.light_color,
                    )
                elif pipeline == "shadowed":
                    light_vp = self._light_view_proj(
                        None if transforms is None else c["node_to_world"]
                    )
                    light_matrices = np.einsum(
                        "nij,jk->nik", c["node_to_world"], light_vp
                    ).astype(np.float32)
                    color, depth, self._shadow_map = frame(
                        b, self.texture.oct_atlas_u32, c["matrices"],
                        c["normal_mats"], c["inv_view_proj"], c["cam_pos"],
                        light_matrices, light_vp, self.light_dir,
                        self.light_color,
                    )
                elif pipeline == "deferred":
                    color, depth = frame(
                        b, c["matrices"], c["normal_mats"],
                        c["inv_view_proj"], c["cam_pos"],
                        self.lights[0], self.lights[1], c["view_proj"],
                    )
                else:
                    raise ValueError(pipeline)
            if self.config.debug:
                self._validate_frame(color, depth)
                mats = matrices if pipeline == "flat" else c["matrices"]
                dropped = self.clip_overflow(mats)
                self.stats.clip_dropped = dropped
                if dropped:
                    raise RuntimeError(
                        f"debug validation: capped clipper dropped {dropped} "
                        "plane-crossing triangles this frame (raise the "
                        "clip cap; see geometry.clip_cap_for)"
                    )
            self._pending = (color, depth)
            self._in_flight.append(self._pending)
            self.stats.update(
                triangles=self.flat.num_triangles,
                pixels=self.config.width * self.config.height,
            )
        # Outside the render zone: the frame-step annotation spans from one
        # mark to the next and must nest cleanly around zones (TraceMe spans
        # are a thread-local stack — interleaving drops them).
        ztracy.frame_mark()
        return color, depth

    def clip_overflow(self, matrices) -> int:
        """Triangles dropped by the capped clipper for these per-draw
        matrices (camera pass).  Device-computed via a cached jitted
        transform+classify pass (geometry.clip_overflow_count) — run per
        frame under config.debug, or on demand; surfaces the capped
        clipper's silent-drop knob (clip_triangles_capped docstring)."""
        key = ("clip_overflow", self.backend, self.config.content_hash(),
               len(self.flat.tri_vidx), self._vertex_shader_key)
        cfg = self.config
        vs = self._vertex_shader

        def build():
            def count(positions, attrs, tri_vidx, node_ids, mats):
                return g.clip_overflow_count(
                    jnp, positions, attrs, tri_vidx, mats, node_ids,
                    cfg.width, cfg.height, vertex_shader=vs,
                )

            return jax.jit(count)

        fn = self.pipelines.get_or_create(key, build)
        return int(fn(*self._geom_args(self._buffers()), matrices))

    def _validate_frame(self, color, depth) -> None:
        """Debug-layer analog (SURVEY.md §5.2): with config.debug the frame
        outputs are checked for NaN/Inf depth and out-of-range values, the
        way the reference opts into the D3D12 debug layer + GPU-based
        validation (zd3d12.zig:121-131)."""
        d = np.asarray(depth)
        if not np.isfinite(d).all():
            raise FloatingPointError("debug validation: non-finite depth")
        if d.min() < 0.0 or d.max() > 1.0:
            raise FloatingPointError(
                f"debug validation: depth outside [0,1] ({d.min()}, {d.max()})"
            )

    def _set_buffer(self, name: str, array) -> None:
        self._buffer_handles[name] = self.resources.add((name, array))

    def _buffers(self) -> dict:
        """Resolve the scene's device buffers through their pool handles —
        the lookupResource data path.  A stale/destroyed handle fails
        loudly instead of silently using freed data."""
        out = {}
        for name, h in self._buffer_handles.items():
            payload = self.resources.lookup(h)
            if payload is None:
                raise RuntimeError(
                    f"stale resource handle for {name!r} (destroyed?)"
                )
            out[name] = payload[1]
        return out

    def _stage_constants(self, arrays):
        """Per-frame constants go through the bounded staging ring (the
        upload-heap path).  Exhaustion -> stall the device, reset the
        frame's heap, retry — the reference's graceful degradation
        (zd3d12.zig:1240-1250)."""
        staged = self.upload_ring.stage_all(arrays)
        if staged is None:
            self.upload_ring.stall_count += 1
            log.warning(
                "per-frame upload heap exhausted (%d bytes): stalling the "
                "device and retrying", self.config.upload_heap_bytes,
            )
            self.finish_gpu_commands()
            self.upload_ring.reset_frame()
            staged = self.upload_ring.stage_all(arrays)
            if staged is None:
                raise MemoryError(
                    "frame constants exceed the upload heap "
                    f"({self.config.upload_heap_bytes} bytes); raise "
                    "RenderConfig.upload_heap_bytes"
                )
        return staged

    def _pace(self) -> None:
        """Fence until at most ``frames_in_flight - 1`` frames remain
        outstanding (max_num_buffered_frames=2 -> wait on frame N-1 while
        N executes, zd3d12.zig:45, :663-667).  The staging-ring slot about
        to be reused always belongs to a frame drained here (ring depth ==
        frames_in_flight)."""
        keep = max(self.config.frames_in_flight - 1, 0)
        while len(self._in_flight) > keep:
            jax.block_until_ready(self._in_flight.pop(0))

    def present(self):
        """Present + fence pacing (zd3d12.zig:649-667): after submitting
        frame N the host blocks only until frame N-1 completes, so the next
        frame's host prep overlaps frame N's device work.  Frames STAY on
        device — the reference's Present flips an on-GPU swapchain with no
        CPU copy either.  Returns the device arrays of the newest frame
        (not necessarily complete yet; read_frame / finish_gpu_commands
        synchronize)."""
        assert self._pending is not None, "render first"
        with ztracy.zone("present"):
            self._pace()
            # endFrame: rotate the per-frame staging heap (zd3d12.zig:672-674).
            # A ring slot is reused after frames_in_flight presents, by which
            # time _pace() has fenced the frame that staged into it.
            self.upload_ring.begin_frame()
            return self._pending

    def read_frame(self):
        """Device -> host readback of the latest frame (the screenshot /
        CopyTextureRegion-to-readback-buffer path, NOT part of the steady
        frame loop).  Returns (rgba_u8 (H, W, 4), depth (H, W)) numpy."""
        assert self._pending is not None, "render first"
        color, depth = self._pending
        with ztracy.zone("read_frame"):
            out = np.asarray(color), np.asarray(depth)
        # The copy synchronized the newest frame; device ops complete in
        # program order, so every older in-flight frame is done too.
        self._in_flight.clear()
        return out

    def render_and_read(self, camera=None, transforms=None, jitter=None):
        self.render(camera, transforms, jitter)
        return self.read_frame()

    def set_vertex_shader(self, fn, name: str | None = None) -> None:
        """Bind a custom vertex stage — the arbitrary-VS PSO capability
        (zd3d12.zig:904-1046 compiles any vertex shader into a pipeline;
        uber.hlsl is just the demo's instance).  ``fn(positions (N, 4),
        attrs (N, 12)) -> (positions, attrs)`` runs in OBJECT space on
        device inside the jitted frame.  ``name`` keys the pipeline cache
        (defaults to the function identity — pass a stable name to reuse
        compilations across renderers)."""
        self._vertex_shader = fn
        self._vertex_shader_key = (
            None if fn is None else (name or f"vs-{id(fn)}")
        )

    # -- compute pipelines ----------------------------------------------------

    def create_compute_pipeline(self, fn, static_argnums=()):
        """createComputeShaderPipeline analog (zd3d12.zig:1147-1205): compile
        an arbitrary device function into the pipeline pool and return its
        generational handle.  The "shader" is any jittable function; the
        grid/dispatch structure lives inside it (Pallas or plain XLA)."""
        jitted = jax.jit(fn, static_argnums=static_argnums)
        return self.pipelines.add_pipeline(jitted)

    def create_mesh_pipeline(self, fn):
        """createMeshShaderPipeline analog (zd3d12.zig:1048-1145): the
        pipeline kind whose geometry comes from a GPU program instead of
        vertex buffers.  ``fn(*args) -> (positions (V, 4) f32,
        attrs (V, 12) f32, tri_vidx (T, 3) i32, vert_node (V,) i32)`` runs
        ON DEVICE inside the jitted frame — generated geometry never touches
        the host (the mesh-shader promise).  Outputs are padded in-trace to
        the raster alignments (zero rows = degenerate triangles, culled like
        load-time padding).  Run it with
        ``dispatch(handle, matrices, *fn_args)`` where ``matrices`` is the
        (num_draws, 4, 4) object_to_clip table; returns (color, depth)."""
        cfg = self.config
        backend = self.backend
        va, ta = cfg.vert_align, cfg.tri_align

        def frame(matrices, *args):
            positions, attrs, tri_vidx, vert_node = fn(*args)
            pv = -(-positions.shape[0] // va) * va - positions.shape[0]
            pt = -(-tri_vidx.shape[0] // ta) * ta - tri_vidx.shape[0]
            positions = jnp.pad(positions, ((0, pv), (0, 0)))
            attrs = jnp.pad(attrs, ((0, pv), (0, 0)))
            vert_node = jnp.pad(vert_node, ((0, pv),))
            tri_vidx = jnp.pad(tri_vidx, ((0, pt), (0, 0)))
            if backend == "pallas":
                color, depth = raster_pallas.render_frame_pallas(
                    positions, attrs, tri_vidx, matrices, vert_node,
                    cfg.width, cfg.height, cfg.pad_height, cfg.pad_width,
                    interpret=cfg.debug,
                )
                return raster_pallas.unpack_rgba8(color), depth
            return raster_xla.render_frame_xla(
                positions, attrs, tri_vidx, matrices, vert_node,
                cfg.width, cfg.height,
            )

        return self.pipelines.add_pipeline(jax.jit(frame))

    def dispatch(self, handle, *args, **kwargs):
        """setCurrentPipeline + Dispatch analog (zd3d12.zig:1207-1227 +
        compute dispatch): run a pooled compute pipeline.  Stale handles
        fail loudly, like lookupPipeline returning null."""
        fn = self.pipelines.lookup_pipeline(handle)
        if fn is None:
            raise RuntimeError("dispatch on a stale/destroyed pipeline handle")
        with ztracy.zone("dispatch"):
            return fn(*args, **kwargs)

    def destroy_pipeline(self, handle) -> None:
        self.pipelines.destroy_pipeline(handle)

    def finish_gpu_commands(self) -> None:
        """Drain the device (finishGpuCommands analog, zd3d12.zig:784-794)."""
        while self._in_flight:
            jax.block_until_ready(self._in_flight.pop(0))
        if self._pending is not None:
            jax.block_until_ready(self._pending)

    def drain_hard(self) -> None:
        """Drain with a guaranteed execution barrier.

        ``block_until_ready`` is the correct fence on standard JAX runtimes,
        but the remote axon runtime (TPU behind a tunnel) resolves it when
        the work is ENQUEUED, not executed — measured: a 256-light deferred
        frame "completed" in 0.5 ms by block_until_ready while the real
        device time was ~65 ms.  Materializing any value derived from the
        frame forces true completion on every runtime.  Benchmarks must
        fence with this; interactive loops can keep the cheap fence.
        """
        self.finish_gpu_commands()
        if self._pending is not None:
            np.asarray(self._pending[0][0, 0])

    def render_animation(self, num_frames: int | None = None, cameras=None,
                         transforms_seq=None, jitters=None):
        """Render a whole frame sequence in ONE device dispatch.

        The offline-animation / benchmark path: per-frame constants for all
        N frames are computed on the host, stacked, and uploaded once; a
        ``lax.scan`` then produces every frame on-device back-to-back (each
        frame is fully rasterized and reduced to a digest — the scan's
        analog of presenting to a swapchain that retains only the last
        image).  Returns ``(digests, (last_color, last_depth))`` where
        ``digests`` is (N,) f32, one checksum per frame (forces each frame
        to be fully produced; materializing it is a true fence).

        Why this exists: through the axon tunnel each per-frame dispatch
        costs ~35 ms of RPC latency (measured; co-located hosts see ~none),
        so a per-frame loop measures the tunnel, not the renderer.  One
        dispatch per sequence makes the wall-clock rate equal the device
        frame rate on any runtime.
        """
        assert self.flat is not None, "load_scene first"
        if self.config.pipeline != "flat" and not hasattr(self, "texture"):
            self.set_environment()
        if num_frames is None:
            num_frames = (len(transforms_seq) if transforms_seq is not None
                          else len(cameras) if cameras is not None
                          else len(jitters))

        def per_frame(i):
            cam = cameras[i] if cameras is not None else None
            tr = (transforms_seq[i] if transforms_seq is not None else None)
            jit_ = jitters[i] if jitters is not None else None
            return cam, tr, jit_

        pipeline = self.config.pipeline
        if pipeline == "flat":
            mats = np.stack([
                self.camera_matrices(*per_frame(i)) for i in range(num_frames)
            ])
            xs = {"matrices": mats}
            if self._meshlet_table is not None and self.backend == "pallas":
                xs["cam_local"] = np.stack([
                    self.cam_local_constants(per_frame(i)[0],
                                             per_frame(i)[1])
                    for i in range(num_frames)
                ])
        else:
            keys = ["matrices", "normal_mats", "inv_view_proj", "cam_pos",
                    "view_proj"]
            per = []
            for i in range(num_frames):
                cam, tr, jit_ = per_frame(i)
                c = self._lit_constants(cam, tr, jit_)
                if pipeline == "shadowed":
                    light_vp = self._light_view_proj(
                        None if tr is None else c["node_to_world"])
                    c["light_vp"] = light_vp
                    c["light_matrices"] = np.einsum(
                        "nij,jk->nik", c["node_to_world"], light_vp
                    ).astype(np.float32)
                per.append(c)
            xs = {k: np.stack([c[k] for c in per]) for k in keys}
            if pipeline == "shadowed":
                xs["light_vp"] = np.stack([c["light_vp"] for c in per])
                xs["light_matrices"] = np.stack(
                    [c["light_matrices"] for c in per])

        tex_key = None
        if pipeline != "flat" and hasattr(self, "texture"):
            tex_key = (tuple(self.texture.base_shape),
                       self.texture.num_levels,
                       getattr(self.texture, "num_layers", 1))
        key = ("anim", pipeline, num_frames, self.backend,
               self.config.content_hash(), len(self.flat.positions),
               len(self.flat.tri_vidx), self.flat.draw_count, tex_key,
               self._vertex_shader_key)

        def build_anim():
            frame = self._frame_fn()
            b = self._buffers()
            tex = getattr(self, "texture", None)

            # Flat/pallas scan body renders the PADDED packed-u32 frame
            # (no per-frame crop/unpack — those full-frame passes cost as
            # much as the raster kernel at 1080p) and digests it directly;
            # the presented frame is produced ONCE after the scan.
            raw_frame = None
            if (pipeline == "flat" and self.backend == "pallas"
                    and self.config.supersample <= 1):
                cfg = self.config

                def raw_frame(positions, attrs, tri_vidx, node_ids,
                              matrices, cam_local=None):
                    cull = (self._meshlet_cull_arg(cam_local)
                            if cam_local is not None else None)
                    return raster_pallas.render_frame_pallas(
                        positions, attrs, tri_vidx, matrices, node_ids,
                        cfg.width, cfg.height,
                        cfg.pad_height, cfg.pad_width,
                        interpret=cfg.debug, binning=cfg.binning,
                        vertex_shader=self._vertex_shader, raw_packed=True,
                        meshlet_cull=cull,
                    )

            def body(carry, x):
                if raw_frame is not None:
                    packed, _depth = raw_frame(
                        *self._geom_args(b), x["matrices"],
                        x.get("cam_local"))
                    # Every frame is fully rasterized + resolved; the
                    # digest reduces the packed plane (convert fuses into
                    # the reduce — one pass, no 4-channel unpack).
                    return carry, jnp.sum(packed, dtype=jnp.float32)
                if pipeline == "flat":
                    extra = ([x["cam_local"]] if "cam_local" in x else [])
                    color, depth = frame(*self._geom_args(b), x["matrices"],
                                         *extra)
                elif pipeline == "lit":
                    color, depth = frame(
                        b, tex.oct_atlas_u32, x["matrices"], x["normal_mats"],
                        x["inv_view_proj"], x["cam_pos"],
                        self.light_pos, self.light_color,
                    )
                elif pipeline == "shadowed":
                    color, depth, _sm = frame(
                        b, tex.oct_atlas_u32, x["matrices"], x["normal_mats"],
                        x["inv_view_proj"], x["cam_pos"],
                        x["light_matrices"], x["light_vp"], self.light_dir,
                        self.light_color,
                    )
                elif pipeline == "deferred":
                    color, depth = frame(
                        b, x["matrices"], x["normal_mats"],
                        x["inv_view_proj"], x["cam_pos"],
                        self.lights[0], self.lights[1], x["view_proj"],
                    )
                else:
                    raise ValueError(pipeline)
                digest = jnp.sum(color.astype(jnp.float32))
                # Frames do NOT ride the carry (the swapchain keeps only
                # the final image, which is re-rendered once after the
                # scan); carrying full framebuffers costs a per-frame
                # copy, and accumulating them in the scan ys would
                # allocate N of them.
                return carry, digest

            # The presented frame: re-run the standard (cropped, unpacked)
            # frame once on the last frame's constants, outside the scan.
            def run(xs_dev):
                _, digests = jax.lax.scan(body, 0, xs_dev)
                last = jax.tree.map(lambda v: v[-1], xs_dev)
                if pipeline == "flat":
                    extra = ([last["cam_local"]] if "cam_local" in last
                             else [])
                    color, depth = frame(*self._geom_args(b),
                                         last["matrices"], *extra)
                elif pipeline == "lit":
                    color, depth = frame(
                        b, tex.oct_atlas_u32, last["matrices"],
                        last["normal_mats"], last["inv_view_proj"],
                        last["cam_pos"], self.light_pos, self.light_color,
                    )
                elif pipeline == "shadowed":
                    color, depth, _sm = frame(
                        b, tex.oct_atlas_u32, last["matrices"],
                        last["normal_mats"], last["inv_view_proj"],
                        last["cam_pos"], last["light_matrices"],
                        last["light_vp"], self.light_dir, self.light_color,
                    )
                else:  # deferred
                    color, depth = frame(
                        b, last["matrices"], last["normal_mats"],
                        last["inv_view_proj"], last["cam_pos"],
                        self.lights[0], self.lights[1], last["view_proj"],
                    )
                return digests, color, depth

            return jax.jit(run)

        fn = self.pipelines.get_or_create(key, build_anim)

        xs_dev = {k: jax.device_put(jnp.asarray(v), self.device)
                  for k, v in xs.items()}
        digests, color, depth = fn(xs_dev)
        self._pending = (color, depth)
        self.stats.update(
            triangles=self.flat.num_triangles * num_frames,
            pixels=self.config.width * self.config.height * num_frames,
        )
        return digests, (color, depth)
