"""Pure-XLA rasterizer: the whole frame as one fused jnp program.

Brute-force formulation (every triangle tested against every pixel) used as
(a) the always-available device fallback, (b) a differential-testing backend
between the CPU oracle and the Pallas kernels, and (c) the baseline the
tiled Pallas kernel must beat.  Arithmetic is formula-identical to
raster_ref/raster_cpu.py (docs/RASTER_SPEC.md §2-§4).

The triangle loop is a lax.fori_loop carrying the five per-pixel state
planes (z, r/g/b numerators, 1/w denominator); iteration order is submission
order so strict-less depth testing reproduces D3D LESS tie behaviour.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from zrenderer_tpu.ops import geometry as g

CLEAR_DEPTH = 1.0


def _ob(x):
    """Rounding barrier (see ops/geometry.py:_ob): pins each product to f32
    before the summing adds so XLA:CPU cannot FMA-contract where the NumPy
    oracle rounds.  Keeps raster-stage depth/color bit-exact vs the oracle
    on every backend."""
    return jax.lax.optimization_barrier(x)


def _interp(ef0, ef1, ef2, c0, c1, c2):
    return (_ob(ef0 * c0) + _ob(ef1 * c1)) + _ob(ef2 * c2)


def rasterize_setup_xla(tri_i32, tri_f32, width: int, height: int):
    """Rasterize pre-setup triangles; returns (rgba f32 (H,W,4), depth)."""
    half = g.SUBPIXEL // 2
    py = (
        jax.lax.broadcasted_iota(jnp.int32, (height, width), 0) * g.SUBPIXEL + half
    )
    px = (
        jax.lax.broadcasted_iota(jnp.int32, (height, width), 1) * g.SUBPIXEL + half
    )

    num_tris = tri_i32.shape[0]

    def body(t, state):
        zbuf, nr, ng, nb, den = state
        ti = tri_i32[t]
        tf = tri_f32[t]
        x0, y0, x1, y1, x2, y2 = ti[0], ti[1], ti[2], ti[3], ti[4], ti[5]
        dx0, dy0, dx1, dy1, dx2, dy2 = ti[6], ti[7], ti[8], ti[9], ti[10], ti[11]
        b0, b1, b2 = ti[12], ti[13], ti[14]
        valid = ti[g.I_VALID] > 0

        e0 = dx0 * (py - y1) - dy0 * (px - x1)
        e1 = dx1 * (py - y2) - dy1 * (px - x2)
        e2 = dx2 * (py - y0) - dy2 * (px - x0)
        cov = (e0 >= b0) & (e1 >= b1) & (e2 >= b2) & valid

        ef0 = e0.astype(jnp.float32)
        ef1 = e1.astype(jnp.float32)
        ef2 = e2.astype(jnp.float32)
        z = _interp(ef0, ef1, ef2, tf[g.F_ZA0], tf[g.F_ZA1], tf[g.F_ZA2])
        ok = cov & (z >= 0.0) & (z < zbuf)

        zbuf = jnp.where(ok, z, zbuf)
        den = jnp.where(
            ok, _interp(ef0, ef1, ef2, tf[g.F_RW0], tf[g.F_RW1], tf[g.F_RW2]), den
        )
        nr = jnp.where(
            ok, _interp(ef0, ef1, ef2, tf[g.F_CR0], tf[g.F_CR1], tf[g.F_CR2]), nr
        )
        ng = jnp.where(
            ok, _interp(ef0, ef1, ef2, tf[g.F_CG0], tf[g.F_CG1], tf[g.F_CG2]), ng
        )
        nb = jnp.where(
            ok, _interp(ef0, ef1, ef2, tf[g.F_CB0], tf[g.F_CB1], tf[g.F_CB2]), nb
        )
        return zbuf, nr, ng, nb, den

    init = (
        jnp.full((height, width), CLEAR_DEPTH, jnp.float32),
        jnp.zeros((height, width), jnp.float32),
        jnp.zeros((height, width), jnp.float32),
        jnp.zeros((height, width), jnp.float32),
        jnp.zeros((height, width), jnp.float32),
    )
    zbuf, nr, ng, nb, den = jax.lax.fori_loop(0, num_tris, body, init)
    return resolve(zbuf, nr, ng, nb, den)


def rasterize_gbuffer_xla(tri_i32, tri_f32, width: int, height: int):
    """G-buffer brute-force raster (CPU-testable twin of the Pallas
    G-buffer kernel): returns (rgba_u8, depth, u, v, nx, ny, nz,
    metallic, roughness, emissive r/g/b, tex_layer)."""
    half = g.SUBPIXEL // 2
    py = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0) * g.SUBPIXEL + half
    px = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1) * g.SUBPIXEL + half

    def body(t, state):
        zbuf, planes, consts = state
        ti = tri_i32[t]
        tf = tri_f32[t]
        e0 = ti[6] * (py - ti[3]) - ti[7] * (px - ti[2])
        e1 = ti[8] * (py - ti[5]) - ti[9] * (px - ti[4])
        e2 = ti[10] * (py - ti[1]) - ti[11] * (px - ti[0])
        cov = (e0 >= ti[12]) & (e1 >= ti[13]) & (e2 >= ti[14]) & (
            ti[g.I_VALID] > 0
        )
        ef0 = e0.astype(jnp.float32)
        ef1 = e1.astype(jnp.float32)
        ef2 = e2.astype(jnp.float32)
        z = _interp(ef0, ef1, ef2, tf[g.F_ZA0], tf[g.F_ZA1], tf[g.F_ZA2])
        ok = cov & (z >= 0.0) & (z < zbuf)
        zbuf = jnp.where(ok, z, zbuf)
        new_planes = []
        for idx, c0 in enumerate(
            (g.F_RW0, g.F_CR0, g.F_CG0, g.F_CB0, g.F_U0, g.F_V0,
             g.F_NX0, g.F_NY0, g.F_NZ0)
        ):
            num = _interp(ef0, ef1, ef2, tf[c0], tf[c0 + 1], tf[c0 + 2])
            new_planes.append(jnp.where(ok, num, planes[idx]))
        new_consts = tuple(
            jnp.where(ok, tf[col], consts[idx])
            for idx, col in enumerate(
                (g.F_MET, g.F_RGH, g.F_EMR, g.F_EMG, g.F_EMB, g.F_TEX)
            )
        )
        return zbuf, tuple(new_planes), new_consts

    shape = (height, width)
    init_planes = tuple(jnp.zeros(shape, jnp.float32) for _ in range(9))
    init_consts = tuple(jnp.zeros(shape, jnp.float32) for _ in range(6))
    zbuf, planes, consts = jax.lax.fori_loop(
        0, tri_i32.shape[0], body,
        (jnp.full(shape, CLEAR_DEPTH, jnp.float32), init_planes, init_consts),
    )
    den, nr, ng, nb, nu, nv, nnx, nny, nnz = planes
    covered = den > 0
    inv = jnp.float32(1.0) / jnp.where(covered, den, jnp.float32(1.0))

    rgba, _ = resolve(zbuf, nr, ng, nb, den)
    out = [pack_u8(rgba), zbuf]
    for numer in (nu, nv, nnx, nny, nnz):
        out.append(jnp.where(covered, numer * inv, jnp.float32(0.0)))
    out.extend(consts)
    return tuple(out)


def resolve(zbuf, nr, ng, nb, den, clear_rgb=(0.0, 0.0, 0.0)):
    """Latched numerators -> final RGBA (one perspective divide per pixel)."""
    covered = den > 0
    safe = jnp.where(covered, den, jnp.float32(1.0))
    inv = jnp.float32(1.0) / safe
    rgba = jnp.stack(
        [
            jnp.where(covered, nr * inv, jnp.float32(clear_rgb[0])),
            jnp.where(covered, ng * inv, jnp.float32(clear_rgb[1])),
            jnp.where(covered, nb * inv, jnp.float32(clear_rgb[2])),
            jnp.full(zbuf.shape, 1.0, jnp.float32),
        ],
        axis=-1,
    )
    return rgba, zbuf


def pack_u8(rgba_f32):
    """RASTER_SPEC.md §4 u8 packing (identical to the CPU oracle's)."""
    c = jnp.clip(rgba_f32, 0.0, 1.0)
    return jnp.floor(c * jnp.float32(255.0) + jnp.float32(0.5)).astype(jnp.uint8)


def render_setup_to_u8(tri_i32, tri_f32, width: int, height: int):
    rgba, depth = rasterize_setup_xla(tri_i32, tri_f32, width, height)
    return pack_u8(rgba), depth


def ssaa_resolve(color_u8, depth, s: int):
    """Ordered-grid supersample resolve: average s x s sample boxes of an
    (s*H, s*W, 4) u8 frame down to (H, W, 4) — the MSAA-capable-pass
    analog (the reference's PSO plumbing carries sample-desc state,
    zd3d12.zig:904-1046, though its demo never multisamples).  Integer
    box filter with round-half-up, so the resolve is deterministic across
    backends; depth resolves to the per-box MIN (the conservative
    occlusion convention for downstream passes)."""
    h2, w2 = depth.shape
    h, w = h2 // s, w2 // s
    c = color_u8.astype(jnp.uint32).reshape(h, s, w, s, 4)
    csum = c.sum(axis=(1, 3))
    n = s * s
    out = ((csum + n // 2) // n).astype(jnp.uint8)
    d = depth.reshape(h, s, w, s).min(axis=(1, 3))
    return out, d


def render_frame_xla(positions, attrs, tri_vidx, matrices, node_ids,
                     width: int, height: int, vertex_shader=None):
    """Full frame: geometry pipeline + brute-force raster, jit-friendly.

    ``matrices`` are per-draw object_to_clip (object_to_world @ view_proj),
    traced per frame so one compilation serves a dynamic scene.
    """
    tri_i32, tri_f32 = g.geometry_pipeline(
        jnp, positions, attrs, tri_vidx, matrices, node_ids, width, height,
        vertex_shader=vertex_shader,
    )
    return render_setup_to_u8(tri_i32, tri_f32, width, height)


# Module-level jitted entry points: one compilation per distinct shape set
# (the "pipeline cache" discipline — zd3d12 caches PSOs by content hash,
# zd3d12.zig:1007-1012; here the jit cache is keyed by shapes + static dims).
setup_pipeline_jit = partial(jax.jit, static_argnums=(5, 6))(
    lambda p, a, t, m, n, width, height: g.geometry_pipeline(
        jnp, p, a, t, m, n, width, height
    )
)
render_setup_jit = partial(jax.jit, static_argnums=(2, 3))(render_setup_to_u8)
render_frame_jit = partial(jax.jit, static_argnums=(5, 6))(render_frame_xla)
