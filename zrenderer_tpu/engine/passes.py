"""Render-pass composition: the frame programs for each pipeline config.

The reference's platform can build graphics/compute pipelines beyond its
flat-color demo (zd3d12.zig:904-1205); the BASELINE.json configs define the
renderer's target pipelines.  Each builder returns a jittable function of
(buffers, frame constants) — everything fuses into one XLA program per
frame (plus the Pallas raster kernels):

* ``flat``        — config 0: vertex-color forward (the reference demo).
* ``lit``         — config 1: textured + Blinn-Phong point light.
* ``shadowed``    — config 2: directional shadow map (depth-only pass) + PCF.
* ``deferred``    — config 3: G-buffer + GGX with many point lights.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from zrenderer_tpu.ops import geometry as g
from zrenderer_tpu.ops import raster_pallas, raster_xla, sampling, shading


def _gbuffer(backend, b, matrices, normal_mats, width, height,
             pad_height, pad_width, interpret, vertex_shader=None,
             binning="auto"):
    """Returns (rgba, depth, u, v, nx, ny, nz, met, rgh, em r/g/b, tex) —
    per-pixel uv/normal interpolants plus the winning draw's material
    constants and texture layer (the per-draw SRV/material binding analog,
    zd3d12.zig:1273-1356).  The material table rides the buffer dict as
    b['materials'] (D, MATERIAL_COLS)."""
    mat = b.get("materials")
    pos, attrs, tvi, vnode = _geom_buffers(b, vertex_shader)
    if backend == "pallas":
        outs = raster_pallas.render_gbuffer_pallas(
            pos, attrs, tvi, matrices,
            vnode, normal_mats, width, height,
            pad_height, pad_width, interpret=interpret, material_table=mat,
            vertex_shader=vertex_shader, binning=binning,
        )
        return [raster_pallas.unpack_rgba8(outs[0])] + list(outs[1:])
    ti, tf = g.geometry_pipeline(
        jnp, pos, attrs, tvi, matrices,
        vnode, width, height, normal_matrices=normal_mats,
        material_table=mat, vertex_shader=vertex_shader,
    )
    return list(raster_xla.rasterize_gbuffer_xla(ti, tf, width, height))


def _geom_buffers(b, vertex_shader=None):
    """Prefer the column per-corner buffers (tri_vidx=None + attrs=None
    selects geometry_pipeline_cols, the gather-free SoA mode) when the
    engine uploaded them; fall back to the indexed form (custom vertex
    shaders — the hook runs on per-vertex rows — and device-generated
    geometry/tests)."""
    if vertex_shader is None and "corner_cols" in b:
        return b["corner_cols"], None, None, b["tri_node"]
    return b["positions"], b["attrs"], b["tri_vidx"], b["vert_node"]


def _depth_only(backend, b, light_matrices, size, interpret,
                binning="auto"):
    """Depth-only pass from the light's view (the shadow-map pass)."""
    sw = sh = size
    pos, attrs, tvi, vnode = _geom_buffers(b)
    if backend == "pallas":
        depth = raster_pallas.render_depth_pallas(
            pos, attrs, tvi, light_matrices,
            vnode, sw, sh, interpret=interpret, binning=binning,
        )
    else:
        _, depth = raster_xla.render_frame_xla(
            pos, attrs, tvi, light_matrices,
            vnode, sw, sh,
        )
    return depth


def _sample_albedo(rgba, tex_atlas_u32, u, v, tex_layer, th, tw, levels,
                   layered: bool):
    """Vertex rgb x (tri)linear texture sample; with a texture array the
    per-pixel layer plane (from the G-buffer) picks the draw's texture."""
    if th == 1 and tw == 1 and not layered:
        # 1x1 texture (the default white binding): a single texel — no
        # per-pixel gather at all, just a broadcast multiply.
        texel = sampling._unpack_u32(tex_atlas_u32[0, 0, 0])
        return (rgba[..., :3].astype(jnp.float32) / 255.0) * texel[:3]
    uv = jnp.stack([u, v], axis=-1)
    lod = sampling.mip_level_from_derivatives(uv, th, tw, levels)
    layer = tex_layer.astype(jnp.int32) if layered else None
    # Single-gather trilinear (per-index gather cost made the 8-gather
    # path 131 ms and the 2-gather quad path ~12 ms at 1080p).  A 32-lane
    # atlas is the parent-variant (pvar) form, 16-lane the oct form —
    # bit-identical taps either way.  The oct atlas is the PRODUCTION
    # choice: the round-5 on-chip A/B measured the full lit frame 1.16x
    # FASTER with oct (11.14 vs 12.91 ms — pvar's narrower gather row
    # does not pay for its 2x atlas width; benchmarks/pvar_ab.py,
    # docs/PERFORMANCE.md round-5 section).
    if tex_atlas_u32.shape[-1] == 32:
        tex = sampling.sample_trilinear_pvar(
            tex_atlas_u32, th, tw, levels, uv, lod, layer=layer
        )
    else:
        tex = sampling.sample_trilinear_oct(
            tex_atlas_u32, th, tw, levels, uv, lod, layer=layer
        )
    return (rgba[..., :3].astype(jnp.float32) / 255.0) * tex[..., :3]


def build_lit_frame(backend, width, height, pad_height, pad_width,
                    texture, interpret=False, vertex_shader=None,
                    binning="auto"):
    """Config 1: textured + Blinn-Phong point light, Z-buffered.

    Materials modulate the Blinn-Phong knobs per pixel (roughness ->
    exponent via the Beckmann-to-Phong mapping, metallic -> specular
    strength) and emissive adds after lighting; ``texture`` may be a
    Texture or a TextureArray (per-draw texture binding)."""

    th, tw = int(texture.base_shape[0]), int(texture.base_shape[1])
    levels = texture.num_levels
    layered = getattr(texture, "num_layers", 1) > 1

    def frame(b, tex_atlas_u32, matrices, normal_mats, inv_view_proj,
              cam_pos, light_pos, light_color):
        (rgba, depth, u, v, nx, ny, nz,
         met, rgh, emr, emg, emb, tex_layer) = _gbuffer(
            backend, b, matrices, normal_mats, width, height,
            pad_height, pad_width, interpret, vertex_shader, binning,
        )
        covered = depth < 1.0
        albedo = _sample_albedo(rgba, tex_atlas_u32, u, v, tex_layer,
                                th, tw, levels, layered)
        normal = jnp.stack([nx, ny, nz], axis=-1)
        world = shading.reconstruct_world_pos(depth, inv_view_proj, width, height)
        specular, shininess = shading.blinn_params_from_material(met, rgh)
        lit = shading.blinn_phong(
            albedo, normal, world, cam_pos, light_pos, light_color,
            specular=specular, shininess=shininess,
        )
        lit = lit + jnp.stack([emr, emg, emb], axis=-1)
        return shading.tonemap_and_pack(lit, covered), depth

    return frame


def build_shadowed_frame(backend, width, height, pad_height, pad_width,
                         texture, shadow_size=1024, interpret=False,
                         shadow_bias=2e-3, shadow_slope_bias=3e-3,
                         pcf_taps=1, vertex_shader=None,
                         shadow_lookup_stride=1, binning="auto"):
    """Config 2: directional light shadow map (depth-only pass + PCF)."""

    th, tw = int(texture.base_shape[0]), int(texture.base_shape[1])
    levels = texture.num_levels

    layered = getattr(texture, "num_layers", 1) > 1

    def frame(b, tex_atlas_u32, matrices, normal_mats, inv_view_proj,
              cam_pos, light_matrices, light_view_proj, light_dir,
              light_color):
        shadow_depth = _depth_only(
            backend, b, light_matrices, shadow_size, interpret, binning
        )
        (rgba, depth, u, v, nx, ny, nz,
         met, rgh, emr, emg, emb, tex_layer) = _gbuffer(
            backend, b, matrices, normal_mats, width, height,
            pad_height, pad_width, interpret, vertex_shader, binning,
        )
        covered = depth < 1.0
        albedo = _sample_albedo(rgba, tex_atlas_u32, u, v, tex_layer,
                                th, tw, levels, layered)
        normal = jnp.stack([nx, ny, nz], axis=-1)
        n = normal / jnp.maximum(
            jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-8
        )
        world = shading.reconstruct_world_pos(depth, inv_view_proj, width, height)

        lit_mask = shading.shadow_factor_pcf_strided(
            shadow_depth, world, light_view_proj,
            stride=shadow_lookup_stride,
            bias=shadow_bias, taps=pcf_taps,
            normal=n, light_dir=light_dir, slope_bias=shadow_slope_bias,
        )
        ndotl = jnp.maximum(
            jnp.sum(n * (-light_dir)[None, None, :], axis=-1), 0.0
        )
        ambient = 0.10
        rgb = albedo * (ambient + ndotl[..., None] * lit_mask[..., None]
                        * light_color[None, None, :])
        rgb = rgb + jnp.stack([emr, emg, emb], axis=-1)
        return shading.tonemap_and_pack(rgb, covered), depth, shadow_depth

    return frame


def build_deferred_frame(backend, width, height, pad_height, pad_width,
                         interpret=False, vertex_shader=None,
                         lighting_planes="f32", binning="auto"):
    """Config 3: deferred G-buffer + GGX lighting with many point lights.

    Per-draw materials drive the BRDF per pixel: metallic/roughness planes
    from the G-buffer feed GGX (f0, distribution, geometry), emissive adds
    after the light loop.  On the Pallas backend the light loop runs in the
    tiled deferred-lighting kernel (ops/light_kernel.py) with per-tile
    light culling; the XLA backend uses the chunked GGX reference
    (ops/shading.py) — same BRDF, the parity pair."""

    def frame(b, matrices, normal_mats, inv_view_proj, cam_pos,
              light_pos, light_color, view_proj):
        (rgba, depth, u, v, nx, ny, nz,
         met, rgh, emr, emg, emb, tex_layer) = _gbuffer(
            backend, b, matrices, normal_mats, width, height,
            pad_height, pad_width, interpret, vertex_shader, binning,
        )
        covered = depth < 1.0
        albedo = rgba[..., :3].astype(jnp.float32) / 255.0
        normal = jnp.stack([nx, ny, nz], axis=-1)
        world = shading.reconstruct_world_pos(depth, inv_view_proj, width, height)
        if backend == "pallas":
            from zrenderer_tpu.ops.light_kernel import tiled_deferred_lighting

            def pad(x):
                return jnp.pad(
                    x,
                    [(0, pad_height - height), (0, pad_width - width)]
                    + [(0, 0)] * (x.ndim - 2),
                )

            rgb = tiled_deferred_lighting(
                pad(albedo), pad(normal), pad(world), pad(covered),
                cam_pos, light_pos, light_color, view_proj,
                roughness=pad(rgh), metallic=pad(met), interpret=interpret,
                plane_dtype=(jnp.bfloat16 if lighting_planes == "bf16"
                             else jnp.float32),
            )[:height, :width]
        else:
            rgb = shading.ggx_shade_many_lights(
                albedo, normal, world, cam_pos, light_pos, light_color,
                metallic=met, roughness=rgh,
            )
        rgb = rgb + jnp.stack([emr, emg, emb], axis=-1)
        return shading.tonemap_and_pack(rgb, covered), depth

    return frame
