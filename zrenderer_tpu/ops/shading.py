"""Shading models: Blinn-Phong, GGX PBR, PCF shadows, G-buffer resolve.

These are the pixel-stage programs of the renderer's lit configurations
(BASELINE.json configs 1-3) — the counterpart of HLSL pixel shaders the
reference platform would compile (its demo only does vertex-color
passthrough, uber.hlsl:31-38; the lit paths exercise the *platform
capability*: pipelines with textures, lights, and depth-only passes).

All functions are plain jnp over (H, W, ...) G-buffer planes: XLA fuses
them into the frame program.  Deferred lighting over many lights is
batched so the light loop vectorizes on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from zrenderer_tpu.ops import geometry as g


def reconstruct_world_pos(depth_ndc, inv_view_proj, width: int, height: int,
                          row_offset=0):
    """World position from the depth plane — the standard deferred trick.

    depth_ndc: (H, W) z in [0, 1].  inv_view_proj: (4, 4) row-vector
    inverse of view_proj.  Pixel centers at (j+0.5, i+0.5).

    ``row_offset``: first row's GLOBAL screen row (traced ok) — the
    multi-chip deferred path reconstructs a band of the frame, whose NDC
    y must come from global coordinates while ``height`` stays the full
    frame height (parallel/tiles.py make_sharded_deferred_frame).
    """
    h, w = depth_ndc.shape
    xs = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5) * (2.0 / w) - 1.0
    ys = 1.0 - (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
                + jnp.float32(0.5)
                + jnp.asarray(row_offset, jnp.float32)) * (2.0 / height)
    # Explicit multiply-adds, NOT einsum: a default-precision einsum runs
    # bf16 on the TPU MXU, and the resulting ~0.4% world-position error
    # was measured to move the deferred image up to 252 u8 LSB off the CPU
    # reference.  Elementwise FMAs stay f32 on the VPU on every platform.
    m = inv_view_proj
    out = []
    for j in range(4):
        out.append(xs * m[0, j] + ys * m[1, j] + depth_ndc * m[2, j] + m[3, j])
    return jnp.stack(out[:3], axis=-1) / out[3][..., None]


def blinn_params_from_material(metallic, roughness):
    """Map PBR metallic/roughness (per-pixel (H, W) planes from the
    G-buffer) onto the Blinn-Phong knobs config 1 uses: the
    Beckmann-to-Phong exponent ``2/alpha^2 - 2`` with alpha = roughness^2,
    and a specular strength lerping dielectric 0.04 -> metal 1.0.
    Returns (specular (H, W, 1), shininess (H, W, 1))."""
    met = jnp.asarray(metallic, jnp.float32)[..., None]
    r = jnp.asarray(roughness, jnp.float32)[..., None]
    alpha = jnp.clip(r * r, 0.05, 1.0)
    shininess = jnp.clip(2.0 / (alpha * alpha) - 2.0, 2.0, 1024.0)
    specular = 0.04 + 0.96 * met
    return specular, shininess


def blinn_phong(albedo, normal, world_pos, cam_pos, light_pos, light_color,
                ambient=0.08, specular=0.35, shininess=48.0,
                attenuation=0.005):
    """Point-light Blinn-Phong (config 1).  All inputs (H, W, 3) except
    scalars/3-vectors; returns (H, W, 3) linear RGB."""
    n = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-8
    )
    lvec = light_pos - world_pos
    dist2 = jnp.sum(lvec * lvec, axis=-1, keepdims=True)
    l = lvec / jnp.sqrt(jnp.maximum(dist2, 1e-12))
    v = cam_pos - world_pos
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)
    hvec = l + v
    hvec = hvec / jnp.maximum(jnp.linalg.norm(hvec, axis=-1, keepdims=True), 1e-8)

    ndotl = jnp.maximum(jnp.sum(n * l, axis=-1, keepdims=True), 0.0)
    ndoth = jnp.maximum(jnp.sum(n * hvec, axis=-1, keepdims=True), 0.0)
    atten = 1.0 / (1.0 + attenuation * dist2)
    diffuse = albedo * ndotl
    spec = specular * jnp.power(ndoth, shininess) * jnp.sign(ndotl)
    return (ambient * albedo + (diffuse + spec) * light_color * atten).astype(
        jnp.float32
    )


# -- GGX / Cook-Torrance (config 3) -------------------------------------------


def _fresnel_schlick(vdoth, f0):
    return f0 + (1.0 - f0) * jnp.power(jnp.clip(1.0 - vdoth, 0.0, 1.0), 5.0)


def ggx_shade_many_lights(albedo, normal, world_pos, cam_pos,
                          light_pos, light_color,
                          metallic=0.0, roughness=0.4, ambient=0.03,
                          chunk: int = 32):
    """Cook-Torrance GGX with L point lights, evaluated in light chunks so
    the (H, W, chunk) broadcast stays VPU-friendly without blowing HBM.

    light_pos/light_color: (L, 3).  ``metallic``/``roughness``: scalars or
    per-pixel (H, W) planes (per-draw material constants from the
    G-buffer).  Returns (H, W, 3).
    """
    n = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-8)
    v = cam_pos - world_pos
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)
    nv_raw = jnp.sum(n * v, axis=-1, keepdims=True)
    ndotv = jnp.maximum(nv_raw, 1e-4)
    metallic = jnp.broadcast_to(
        jnp.asarray(metallic, jnp.float32), albedo.shape[:2]
    )[..., None]
    roughness = jnp.broadcast_to(
        jnp.asarray(roughness, jnp.float32), albedo.shape[:2]
    )[..., None]
    met_l = metallic[..., None, :]
    f0 = 0.04 * (1.0 - metallic) + albedo * metallic

    # Algebraically merged Cook-Torrance (the Pallas light kernel uses the
    # identical form — ops/light_kernel.py): the 1/(4 N.V N.L) specular
    # denominator cancels against the Smith N.L numerator and the N.L in
    # the rendering equation, so everything per-pixel folds into ONE
    # constant cs = a2 * Gv / (4 N.V); the per-light specular is a single
    # divide cs / [pi d^2 * (N.L (1-k) + k)].  The half vector is never
    # built: |l+v|^2 = 2 + 2 l.v, N.h = (N.l + N.v)/|h|, V.h = (1 + l.v)/|h|.
    a = roughness * roughness
    a2 = a * a
    k = (roughness + 1.0) ** 2 / 8.0
    gv = ndotv / (ndotv * (1.0 - k) + k)
    cs = a2 * gv * 0.25 / ndotv
    a2m1 = a2[..., None, :] - 1.0
    k_l = k[..., None, :]
    cs_l = cs[..., None, :]

    num_lights = light_pos.shape[0]
    if num_lights % chunk:
        chunk = num_lights  # small light counts: one chunk
    num_chunks = num_lights // chunk
    lp = light_pos.reshape(num_chunks, chunk, 3)
    lc = light_color.reshape(num_chunks, chunk, 3)

    def body(c, acc):
        lpos = lp[c]  # (chunk, 3)
        lcol = lc[c]
        lvec = lpos[None, None] - world_pos[..., None, :]  # (H, W, chunk, 3)
        dist2 = jnp.sum(lvec * lvec, axis=-1, keepdims=True)
        inv_d = jax.lax.rsqrt(jnp.maximum(dist2, 1e-12))
        l = lvec * inv_d
        nl_raw = jnp.sum(n[..., None, :] * l, axis=-1, keepdims=True)
        ndotl = jnp.maximum(nl_raw, 0.0)
        ldotv = jnp.sum(v[..., None, :] * l, axis=-1, keepdims=True)
        inv_h = jax.lax.rsqrt(jnp.maximum(2.0 + 2.0 * ldotv, 1e-12))
        ndoth = jnp.maximum((nl_raw + nv_raw[..., None, :]) * inv_h, 0.0)
        vdoth = jnp.maximum((1.0 + ldotv) * inv_h, 0.0)

        dterm = ndoth * ndoth * a2m1 + 1.0
        denom = jnp.maximum(jnp.pi * dterm * dterm, 1e-8) * (
            ndotl * (1.0 - k_l) + k_l
        )
        spec = cs_l / denom
        f = _fresnel_schlick(vdoth, f0[..., None, :])
        kd = (1.0 - f) * (1.0 - met_l)
        radiance = lcol[None, None] * (inv_d * inv_d)
        contrib = (kd * albedo[..., None, :] / jnp.pi + f * spec) \
            * radiance * ndotl
        return acc + contrib.sum(axis=-2)

    acc = jnp.zeros_like(albedo)
    acc = jax.lax.fori_loop(0, num_chunks, body, acc)
    return (ambient * albedo + acc).astype(jnp.float32)


# -- Shadows (config 2) --------------------------------------------------------


def shadow_factor_pcf(shadow_depth, world_pos, light_view_proj,
                      bias: float = 2e-3, taps: int = 1,
                      normal=None, light_dir=None,
                      slope_bias: float = 3e-3, max_bias: float = 1.2e-2):
    """Percentage-closer filtering against a depth-only shadow map.

    shadow_depth: (Sh, Sw) z in [0, 1] from the light's pass;
    light_view_proj: (4, 4) row-vector.  Returns (H, W) in [0, 1]
    (1 = fully lit).  (2*taps+1)^2 kernel.

    With ``normal`` (H, W, 3 — unit) and ``light_dir`` (3, — unit, pointing
    FROM the light), the depth bias is slope-scaled: grazing geometry
    (N.L -> 0) gets up to ``max_bias`` via the standard
    ``slope_bias * tan(acos(N.L))`` rule, killing acne on silhouettes
    without peter-panning flat-on surfaces.
    """
    sh, sw = shadow_depth.shape
    # Explicit f32 multiply-adds (see reconstruct_world_pos: default
    # einsum precision is bf16 on the TPU MXU, which shifts shadow lookup
    # coordinates by ~0.4%).
    wx, wy, wz = world_pos[..., 0], world_pos[..., 1], world_pos[..., 2]
    m = light_view_proj
    clip = jnp.stack(
        [wx * m[0, j] + wy * m[1, j] + wz * m[2, j] + m[3, j]
         for j in range(4)],
        axis=-1,
    )
    ndc = clip[..., :3] / jnp.maximum(clip[..., 3:4], 1e-8)
    sx = (ndc[..., 0] + 1.0) * (sw * 0.5)
    sy = (1.0 - ndc[..., 1]) * (sh * 0.5)
    z = ndc[..., 2]

    total_bias = jnp.float32(bias)
    if normal is not None and light_dir is not None:
        ndotl = jnp.clip(
            jnp.sum(normal * (-jnp.asarray(light_dir))[None, None, :], axis=-1),
            1e-3, 1.0,
        )
        tan_theta = jnp.sqrt(jnp.maximum(1.0 - ndotl * ndotl, 0.0)) / ndotl
        total_bias = jnp.minimum(
            jnp.float32(bias) + jnp.float32(slope_bias) * tan_theta,
            jnp.float32(max_bias),
        )

    ix = jnp.clip(sx.astype(jnp.int32), 0, sw - 1)
    iy = jnp.clip(sy.astype(jnp.int32), 0, sh - 1)
    count = (2 * taps + 1) ** 2
    # ONE gather for the whole kernel: XLA gathers on TPU cost per-INDEX,
    # not per-byte, and (2t+1)^2 separate full-screen gathers measured
    # 140+ ms/frame at 1080p.  Every edge-clamped shifted map becomes a
    # channel of one row table — shifted[k][y, x] ==
    # shadow[clip(y+dy), clip(x+dx)] exactly matches a per-tap clamped
    # lookup — and all taps ride one contiguous row per pixel.
    #
    # The map is stored U16 (the D16 shadow-map format real renderers
    # default to): two taps pack per u32 lane, so the 3x3 kernel is FIVE
    # u32 lanes padded to eight.  Measured on hardware
    # (benchmarks/gather_probe.py): 8-lane rows gather at ~4.3 ns/index
    # vs ~6.9 for 9xf32 rows — the gather is the dominant cost of the
    # shadowed frame (attribution: 13.8 of 19.5 ms).  U16 quantization
    # (lsb 1.5e-5) is ~130x below the default depth bias (2e-3), so the
    # comparison semantics are unchanged in practice; both backends run
    # this same function, so cross-backend parity is preserved exactly.
    shifted = []
    for dy in range(-taps, taps + 1):
        for dx in range(-taps, taps + 1):
            sl = jnp.pad(shadow_depth, ((taps, taps), (taps, taps)),
                         mode="edge")[
                taps + dy:taps + dy + sh, taps + dx:taps + dx + sw]
            shifted.append(
                jnp.floor(jnp.clip(sl, 0.0, 1.0) * 65535.0 + 0.5)
                .astype(jnp.int32).astype(jnp.uint32))
    u32_lanes = (count + 1) // 2
    lanes = 4
    while lanes < u32_lanes:
        lanes *= 2
    packed = []
    for j in range(u32_lanes):
        lo = shifted[2 * j]
        hi = shifted[2 * j + 1] if 2 * j + 1 < count else jnp.zeros_like(lo)
        packed.append(lo | (hi << 16))
    packed += [jnp.zeros_like(packed[0])] * (lanes - u32_lanes)
    stack = jnp.stack(packed, axis=-1).reshape(sh * sw, lanes)
    rows = jnp.take(stack, iy * sw + ix, axis=0)  # (H, W, lanes)
    # Integer-domain compare: threshold t16 = ceil((z - bias) * 65535)
    # clamped to [0, 65535]; hit iff stored u16 >= t16  <=>
    # z - bias <= d16/65535 (the f32 compare against the D16 depth).
    t16 = jnp.clip(
        jnp.ceil((z - total_bias) * 65535.0), 0.0, 65535.0
    ).astype(jnp.int32)[..., None]
    hit_count = jnp.zeros(z.shape, jnp.int32)
    for k in range(count):
        tap = ((rows[..., k // 2] >> (16 * (k % 2))) & 0xFFFF).astype(jnp.int32)
        hit_count = hit_count + (tap >= t16[..., 0]).astype(jnp.int32)
    lit = hit_count.astype(jnp.float32) / count
    inside = (
        (ndc[..., 0] >= -1) & (ndc[..., 0] <= 1)
        & (ndc[..., 1] >= -1) & (ndc[..., 1] <= 1)
        & (z >= 0) & (z <= 1)
    )
    return jnp.where(inside, lit, 1.0)


def tonemap_and_pack(rgb, covered, clear_rgb=(0.0, 0.0, 0.0)):
    """Clamp-tonemap and pack to u8 with the spec's rounding (§4)."""
    c = jnp.where(covered[..., None], rgb, jnp.asarray(clear_rgb, jnp.float32))
    c = jnp.clip(c, 0.0, 1.0)
    rgba = jnp.concatenate([c, jnp.ones_like(c[..., :1])], axis=-1)
    return jnp.floor(rgba * jnp.float32(255.0) + jnp.float32(0.5)).astype(jnp.uint8)


def shadow_factor_pcf_strided(shadow_depth, world_pos, light_view_proj,
                              stride: int = 1, normal=None, **kw):
    """PCF shadow lookup at reduced screen resolution (perf knob).

    ``stride=1`` is the exact per-pixel path.  ``stride=2`` evaluates the
    PCF at every stride-th pixel (quartering the gather count — the
    dominant cost of the shadow pass on TPU, where XLA gathers pay per
    index) and bilinearly upsamples the lit fraction.  PCF is already a
    spatial blur, so half-res lookup is visually equivalent away from
    contact edges; the exactness contract stays with stride=1
    (RenderConfig.shadow_lookup_stride default).
    """
    if stride == 1:
        return shadow_factor_pcf(shadow_depth, world_pos, light_view_proj,
                                 normal=normal, **kw)
    h, w = world_pos.shape[:2]

    def pool(x):
        # 2x2 mean-pool by reshape+reduce: strided lane slicing (x[::2])
        # relayouts expensively on TPU; the reduce is plain vector math.
        extra = x.shape[2:]
        return x.reshape(h // 2, 2, w // 2, 2, *extra).mean(axis=(1, 3))

    sub = shadow_factor_pcf(
        shadow_depth, pool(world_pos), light_view_proj,
        normal=None if normal is None else pool(normal), **kw
    )
    # Bilinear upsample with pure vector ops (interleave + edge-clamped
    # shifts) — jax.image.resize lowers to a gather, which costs more than
    # the PCF gathers this knob saves.
    assert stride == 2, "stride 1 or 2"
    right = jnp.concatenate([sub[:, 1:], sub[:, -1:]], axis=1)
    down = jnp.concatenate([sub[1:, :], sub[-1:, :]], axis=0)
    diag = jnp.concatenate([right[1:, :], right[-1:, :]], axis=0)
    row_a = jnp.stack([sub, (sub + right) * 0.5], axis=-1).reshape(
        sub.shape[0], -1)
    row_b = jnp.stack([(sub + down) * 0.5,
                       (sub + right + down + diag) * 0.25], axis=-1).reshape(
        sub.shape[0], -1)
    out = jnp.stack([row_a, row_b], axis=1).reshape(-1, row_a.shape[1])
    return out[:h, :w]
