"""Shared geometry pipeline: transform -> clip -> snap -> triangle setup.

This module implements §1-§3 of docs/RASTER_SPEC.md once, parameterized over
the array namespace ``xp`` (numpy for the CPU reference rasterizer,
jax.numpy for the device path).  Sharing the code guarantees the two
backends evaluate formula-identical f32/int32 expressions, which is what
makes pixel-exact parity achievable.

It replaces the reference's vertex-stage HLSL (uber.hlsl:24-29: object->clip
transform) plus the fixed-function clipper/viewport/raster-setup hardware
that the reference gets for free from D3D12.

Everything here is static-shape and jit-safe: near/guard-band clipping uses
a vectorized Sutherland-Hodgman with a fixed 8-vertex polygon buffer and a
fixed 6-triangle fan, laid out slot-major (all fan-slot-0 triangles first)
so that almost-always-invalid overflow slots land in trailing blocks the
raster kernels can skip wholesale.
"""

from __future__ import annotations

import numpy as np

from zrenderer_tpu.math import zmath as zm

# --- Fixed-point configuration (docs/RASTER_SPEC.md §1-2) -------------------
SUBPIXEL_BITS = 3
SUBPIXEL = 1 << SUBPIXEL_BITS  # 8 subpixel positions per axis
GUARD_PX = 960  # preferred guard band beyond each viewport edge, in pixels
MAX_SPAN_PX = 4096  # (W + 2*guard) must stay <= this (int32 exactness)


def guard_px(extent: int) -> int:
    """Guard-band width for a viewport extent: the preferred 960 px, shrunk
    to keep the snapped-coordinate span inside the exact-int32 budget for
    wide viewports (e.g. 4K gets a 128 px guard).  Triangles beyond the
    guard take the geometric clip path either way, so correctness is
    unchanged — a thin guard only means more triangles clip."""
    assert extent <= MAX_SPAN_PX - 64, f"viewport extent {extent} too large"
    return min(GUARD_PX, (MAX_SPAN_PX - extent) // 2)

# Clip stage static shapes
CLIP_MAX_VERTS = 8  # 3 verts + 5 planes (near + 4 guard)
FAN_SLOTS = CLIP_MAX_VERTS - 2  # 6 triangles per input after full clipping

# Attribute channel layout carried through clipping:
#   0:4   clip-space position (x, y, z, w)
#   4:8   color rgba
#   8:10  uv
#   10:13 normal
#   13:16 tangent.xyz  (tangent.w dropped into 16 if needed later)
ATTR_FLOATS = 16

def _ob(xp, x):
    """Rounding barrier: forces the wrapped product to be rounded to f32
    before any consuming add, preventing XLA/Mosaic from contracting
    mul+add chains into FMAs.  NumPy rounds after every op already, so this
    is what makes device setup arithmetic bit-identical to the CPU oracle
    (docs/RASTER_SPEC.md §5)."""
    if xp is np:
        return x
    import jax

    return jax.lax.optimization_barrier(x)


# Triangle setup integer column layout (Tsetup, NI32)
I_X0, I_Y0, I_X1, I_Y1, I_X2, I_Y2 = range(6)
I_DX0, I_DY0, I_DX1, I_DY1, I_DX2, I_DY2 = range(6, 12)
I_BIAS0, I_BIAS1, I_BIAS2 = range(12, 15)
I_JMIN, I_JMAX, I_IMIN, I_IMAX = range(15, 19)
I_VALID = 19
NI32 = 20

# Triangle setup float column layout (Tsetup, NF32).  Columns 15+ carry the
# extended interpolants used by the textured/lit pipelines (G-buffer path);
# the flat-color kernel reads only the first 15.  Columns 30-35 are
# per-triangle CONSTANTS (no vertex interpolation): the draw's material
# parameters + texture layer — the per-draw SRV/material binding analog
# (zd3d12.zig:1273-1356), latched by the G-buffer kernel into planes.
F_ZA0, F_ZA1, F_ZA2 = range(3)
F_RW0, F_RW1, F_RW2 = range(3, 6)
F_CR0, F_CR1, F_CR2 = range(6, 9)
F_CG0, F_CG1, F_CG2 = range(9, 12)
F_CB0, F_CB1, F_CB2 = range(12, 15)
F_U0, F_U1, F_U2 = range(15, 18)
F_V0, F_V1, F_V2 = range(18, 21)
F_NX0, F_NX1, F_NX2 = range(21, 24)
F_NY0, F_NY1, F_NY2 = range(24, 27)
F_NZ0, F_NZ1, F_NZ2 = range(27, 30)
F_MET, F_RGH, F_EMR, F_EMG, F_EMB, F_TEX = range(30, 36)
MATERIAL_COLS = 6  # metallic, roughness, emissive rgb, texture layer
# 40 keeps the HBM-streaming slab 1024-aligned (128 * 40 = 5 * 1024).
NF32 = 40


def view_proj_from_camera(camera, width: int, height: int) -> np.ndarray:
    """Per-frame view-projection matrix, exactly the reference's draw() math
    (zrenderer.zig:261-272): RH look-at toward position+forward, RH
    perspective with the viewport aspect, then view @ proj."""
    view = zm.look_at_rh(
        zm.load_vec3(camera.position),
        zm.load_vec3(np.asarray(camera.position) + np.asarray(camera.forward)),
        zm.f32x4(0.0, 1.0, 0.0, 0.0),
    )
    zfar = camera.zfar if camera.zfar > camera.znear else 1000.0
    proj = zm.perspective_fov_rh(
        camera.yfov, float(width) / float(height), camera.znear, zfar
    )
    return zm.mul(view, proj)


def transform_positions(xp, positions, matrices, node_ids):
    """Object -> clip transform of (N, 4) positions by per-vertex node matrix.

    ``matrices``: (M, 4, 4) combined object_to_clip per node (row-vector
    convention, so out = p @ M).  ``node_ids``: (N,) int32.

    Written as explicitly-associated elementwise multiply-adds instead of
    einsum/dot so NumPy and XLA round identically (reduction order is part
    of the pixel-exactness contract, docs/RASTER_SPEC.md §5); on TPU these
    are VPU ops and XLA fuses them with the downstream clip math.
    """
    m = _expand_rows(xp, matrices.reshape(-1, 16), node_ids).reshape(
        -1, 4, 4)  # (N, 4, 4)
    p0 = positions[:, 0:1]
    p1 = positions[:, 1:2]
    p2 = positions[:, 2:3]
    p3 = positions[:, 3:4]
    out = (_ob(xp, p0 * m[:, 0]) + _ob(xp, p1 * m[:, 1])) + (
        _ob(xp, p2 * m[:, 2]) + _ob(xp, p3 * m[:, 3])
    )
    return out.astype(xp.float32)


def _expand_rows(xp, table, ids, max_onehot: int = 64):
    """``table[ids]`` without a per-element gather on TPU when the table is
    small: a row gather of (N,) indices measured ~0.5 s at 2M vertices
    (per-INDEX gather cost), while a one-hot f32 matmul at HIGHEST
    precision is exact — each output row sums one 1.0*row plus zeros, and
    the bf16x3 split reassembles f32 bit-exactly — and runs on the MXU in
    ~1 ms.  Falls back to the gather for large tables (one-hot memory is
    N x M) and for the NumPy oracle path.
    """
    m_rows = table.shape[0]
    if xp is np or m_rows > max_onehot:
        return table[ids]
    import jax

    onehot = (ids[:, None] == xp.arange(m_rows, dtype=ids.dtype)[None, :])
    return jax.lax.dot_general(
        onehot.astype(xp.float32), table.astype(xp.float32),
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )


def _expand_cols(xp, table, ids, max_onehot: int = 64):
    """``table[ids].T`` — (K, T) columns — via the transposed one-hot
    matmul (same exactness argument as _expand_rows: each output element
    is a HIGHEST-precision dot summing one 1.0*x plus zeros)."""
    m_rows = table.shape[0]
    if xp is np or m_rows > max_onehot:
        return table[ids].T
    import jax

    onehot = (ids[None, :] == xp.arange(m_rows, dtype=ids.dtype)[:, None])
    return jax.lax.dot_general(
        table.astype(xp.float32).T, onehot.astype(xp.float32),
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )


def transform_normals(xp, attrs, normal_matrices, node_ids):
    """Rotate per-vertex normals (attrs channels 6:9) into world space by
    the per-draw inverse-transpose rotation (row-vector: n' = n @ NM).
    Same explicit association + barriers as transform_positions."""
    nm = _expand_rows(xp, normal_matrices.reshape(-1, 9), node_ids).reshape(
        -1, 3, 3)  # (N, 3, 3)
    n = attrs[:, 6:9]
    n0 = n[:, 0:1]
    n1 = n[:, 1:2]
    n2 = n[:, 2:3]
    out = (_ob(xp, n0 * nm[:, 0]) + _ob(xp, n1 * nm[:, 1])) + _ob(
        xp, n2 * nm[:, 2]
    )
    return xp.concatenate(
        [attrs[:, 0:6], out.astype(xp.float32), attrs[:, 9:]], axis=1
    )


def assemble_triangles(xp, clip_pos, attrs, tri_vidx):
    """Gather per-triangle vertex data.

    clip_pos: (N, 4), attrs: (N, ATTR_FLOATS - 4), tri_vidx: (T, 3) int32.
    Returns (T, 3, ATTR_FLOATS) with clip position in channels 0:4.

    One concatenated row gather instead of two: TPU gathers pay per INDEX
    (~4-7 ns), not per byte, so gathering the merged (N, A) table halves
    the 6M index visits of the two-gather form at 1M triangles (the
    concat itself is a cheap contiguous copy).
    """
    merged = xp.concatenate([clip_pos, attrs], axis=-1)  # (N, A)
    return merged[tri_vidx]  # (T, 3, A)


# ---------------------------------------------------------------------------
# Clipping (RASTER_SPEC.md §1.2-1.3)
# ---------------------------------------------------------------------------


def _plane_distance(xp, verts, plane_id, gx, gy):
    """Signed inside-distance of clip-space verts (..., ATTR) to plane k."""
    x, y, z, w = verts[..., 0], verts[..., 1], verts[..., 2], verts[..., 3]
    if plane_id == 0:
        return z  # near: z >= 0
    if plane_id == 1:
        return _ob(xp, gx * w) - x  # right guard
    if plane_id == 2:
        return _ob(xp, gx * w) + x  # left guard
    if plane_id == 3:
        return _ob(xp, gy * w) - y  # top guard
    return _ob(xp, gy * w) + y  # bottom guard


def _clip_polygons_against_plane(xp, verts, counts, dist):
    """One vectorized Sutherland-Hodgman step.

    verts: (T, V, A) polygon vertices, counts: (T,) valid vertex counts,
    dist: (T, V) signed distances (inside >= 0).  Returns (T, V, A) verts
    and new counts; vertex budget V = CLIP_MAX_VERTS is never exceeded
    because each of the 5 planes can add at most one vertex to a triangle.
    """
    T, V, A = verts.shape
    idx = np.arange(V)
    in_poly = idx[None, :] < counts[:, None]  # (T, V) slot validity

    nxt = (idx + 1) % V
    # For the last valid vertex, the "next" is vertex 0; emulate by gathering
    # with wrap then fixing: next index of slot counts-1 must be 0.
    nxt_idx = xp.where(idx[None, :] + 1 >= counts[:, None], 0, idx[None, :] + 1)
    d_cur = dist
    d_nxt = xp.take_along_axis(dist, nxt_idx, axis=1)
    v_nxt = xp.take_along_axis(verts, nxt_idx[:, :, None], axis=1)

    keep = (d_cur >= 0) & in_poly
    cross = ((d_cur >= 0) != (d_nxt >= 0)) & in_poly

    # Intersection vertex on each crossing edge: t = d_cur / (d_cur - d_nxt).
    denom = d_cur - d_nxt
    safe = xp.where(denom == 0, xp.float32(1.0), denom)
    t = (d_cur / safe).astype(xp.float32)[..., None]
    v_is = (verts + _ob(xp, t * (v_nxt - verts))).astype(xp.float32)

    # Each input slot emits up to two outputs: [v_cur if keep][v_is if cross].
    emit0 = keep.astype(xp.int32)
    emit1 = cross.astype(xp.int32)
    total = emit0 + emit1
    ends = xp.cumsum(total, axis=1)
    starts = ends - total
    pos0 = starts
    pos1 = starts + emit0
    new_counts = ends[:, -1]

    # Non-emitting slots write to the V trash lane (sliced off below); valid
    # target positions are disjoint by construction of the prefix sums.
    trash = V
    tgt0 = xp.where(keep, pos0, trash)
    tgt1 = xp.where(cross, pos1, trash)

    if xp is np:
        out = np.zeros((T, V + 1, A), np.float32)
        rows = np.arange(T)[:, None]
        out[rows, tgt0] = verts
        out[rows, tgt1] = v_is
        out = out[:, :V]
    else:
        out = xp.zeros((T, V + 1, A), xp.float32)
        rows = xp.arange(T)[:, None]
        out = out.at[rows, tgt0].set(verts)
        out = out.at[rows, tgt1].set(v_is)
        out = out[:, :V]
    return out, new_counts.astype(xp.int32)


def clip_triangles(xp, tris, width: int, height: int):
    """Clip (T, 3, ATTR_FLOATS) triangles against near + 4 guard planes.

    Returns (FAN_SLOTS * T, 3, ATTR_FLOATS) fan triangles in slot-major
    order (slot j holds fan triangle j of every input) plus a validity mask
    (FAN_SLOTS * T,).  Slot-major ordering defines the canonical triangle
    submission order for tie-breaking (docs/RASTER_SPEC.md §3).
    """
    T = tris.shape[0]
    V = CLIP_MAX_VERTS
    A = tris.shape[-1]
    gx = xp.float32(1.0 + 2.0 * guard_px(width) / float(width))
    gy = xp.float32(1.0 + 2.0 * guard_px(height) / float(height))

    verts = xp.concatenate(
        [tris, xp.zeros((T, V - 3, A), xp.float32)], axis=1
    )
    counts = xp.full((T,), 3, xp.int32)
    for plane in range(5):
        dist = _plane_distance(xp, verts, plane, gx, gy).astype(xp.float32)
        verts, counts = _clip_polygons_against_plane(xp, verts, counts, dist)

    # Fan: triangle j = (v0, v_{j+1}, v_{j+2}), valid while j+2 < count.
    out = []
    valid = []
    for j in range(FAN_SLOTS):
        a = verts[:, 0]
        b = verts[:, min(j + 1, V - 1)]
        c = verts[:, min(j + 2, V - 1)]
        out.append(xp.stack([a, b, c], axis=1))
        valid.append(counts >= j + 3)
    fan = xp.concatenate(out, axis=0)  # slot-major: (FAN_SLOTS*T, 3, A)
    fan_valid = xp.concatenate(valid, axis=0)
    return fan, fan_valid


def clip_triangles_cols(xp, sub_cols, width: int, height: int):
    """Column (SoA) Sutherland-Hodgman — bit-identical to clip_triangles.

    ``sub_cols[c][k]``: channel k of corner c as a (cap,) vector.  Returns
    (fan_cols, fan_valid): fan_cols[c][k] a (FAN_SLOTS*cap,) vector in the
    same slot-major order as clip_triangles' output, fan_valid
    (FAN_SLOTS*cap,) bool.

    Why (round-4 geometry trace, v5e): the AoS clipper's per-plane
    take_along_axis + positional scatter over (cap, 8, 16) cost ~20 ms of
    the 45 ms 1M-triangle geometry stage — gather/scatter custom calls on
    16-lane-minor shapes.  Here the polygon state is 16 channel arrays of
    (V, cap) (slots in sublanes, triangles in lanes) and both the
    next-vertex lookup and the compaction scatter become chains of
    row-level selects with STATIC row indices — pure elementwise work, no
    gathers.  Every arithmetic expression, association, `_ob` barrier, and
    select disjointness matches the AoS form, so results are bitwise
    equal (tested).
    """
    V = CLIP_MAX_VERTS
    A = ATTR_FLOATS
    cap = sub_cols[0][0].shape[0]
    f32 = xp.float32
    i32 = xp.int32
    gx = f32(1.0 + 2.0 * guard_px(width) / float(width))
    gy = f32(1.0 + 2.0 * guard_px(height) / float(height))

    ch = [
        xp.concatenate(
            [
                xp.stack([sub_cols[0][k], sub_cols[1][k], sub_cols[2][k]],
                         axis=0),
                xp.zeros((V - 3, cap), f32),
            ],
            axis=0,
        )
        for k in range(A)
    ]
    counts = xp.full((cap,), 3, i32)

    def nxt_rows(arr):
        # Row j's cyclic successor: vertex j+1, or vertex 0 when j is the
        # last valid slot — static row slices + one select per row.
        return xp.stack(
            [
                xp.where(counts <= j + 1, arr[0], arr[(j + 1) % V])
                for j in range(V)
            ],
            axis=0,
        )

    slot_idx = np.arange(V)[:, None]
    for plane in range(5):
        x, y, z, w = ch[0], ch[1], ch[2], ch[3]
        if plane == 0:
            d = z
        elif plane == 1:
            d = _ob(xp, gx * w) - x
        elif plane == 2:
            d = _ob(xp, gx * w) + x
        elif plane == 3:
            d = _ob(xp, gy * w) - y
        else:
            d = _ob(xp, gy * w) + y
        d = d.astype(f32)
        in_poly = slot_idx < counts[None, :]
        d_nxt = nxt_rows(d)
        keep = (d >= 0) & in_poly
        cross = ((d >= 0) != (d_nxt >= 0)) & in_poly
        denom = d - d_nxt
        safe = xp.where(denom == 0, f32(1.0), denom)
        t = (d / safe).astype(f32)

        emit0 = keep.astype(i32)
        emit1 = cross.astype(i32)
        total = emit0 + emit1
        ends = xp.cumsum(total, axis=0)
        starts = ends - total
        tgt0 = xp.where(keep, starts, V)
        tgt1 = xp.where(cross, starts + emit0, V)
        new_counts = ends[-1]

        # Destination masks, shared across channels.  Prefix sums only
        # shrink positions, so out slot k receives tgt0 from j >= k and
        # tgt1 (one past a kept vertex) from j >= k-1.
        m0 = {(j, k): tgt0[j] == k
              for k in range(V) for j in range(k, V)}
        m1 = {(j, k): tgt1[j] == k
              for k in range(V) for j in range(max(0, k - 1), V)}

        new_ch = []
        for arr in ch:
            v_nxt = nxt_rows(arr)
            v_is = (arr + _ob(xp, t * (v_nxt - arr))).astype(f32)
            rows = []
            for k in range(V):
                acc = xp.zeros((cap,), f32)
                for j in range(max(0, k - 1), V):
                    if j >= k:
                        acc = xp.where(m0[(j, k)], arr[j], acc)
                    acc = xp.where(m1[(j, k)], v_is[j], acc)
                rows.append(acc)
            new_ch.append(xp.stack(rows, axis=0))
        ch = new_ch
        counts = new_counts.astype(i32)

    fan_cols = [[None] * A for _ in range(3)]
    for k in range(A):
        fan_cols[0][k] = xp.concatenate([ch[k][0]] * FAN_SLOTS)
        fan_cols[1][k] = xp.concatenate(
            [ch[k][min(j + 1, V - 1)] for j in range(FAN_SLOTS)])
        fan_cols[2][k] = xp.concatenate(
            [ch[k][min(j + 2, V - 1)] for j in range(FAN_SLOTS)])
    fan_valid = xp.concatenate(
        [counts >= j + 3 for j in range(FAN_SLOTS)])
    return fan_cols, fan_valid


CLIP_CAP_MIN = 1024


def clip_cap_for(num_tris: int) -> int:
    """Subset capacity for capped clipping: enough for every realistic
    scene (triangles crossing the near plane / guard band are a thin
    silhouette around the frustum boundary), scaling with scene size."""
    return min(num_tris, max(CLIP_CAP_MIN, num_tris // 64))


def capped_rows(num_tris: int) -> int:
    """Total setup rows of the capped layout for T input triangles."""
    return num_tris + FAN_SLOTS * clip_cap_for(num_tris)


def head_count(total_rows: int) -> int:
    """Invert capped_rows (it is strictly increasing in T)."""
    lo, hi = 1, total_rows
    while lo < hi:
        mid = (lo + hi) // 2
        if capped_rows(mid) < total_rows:
            lo = mid + 1
        else:
            hi = mid
    assert capped_rows(lo) == total_rows, (total_rows, lo)
    return lo


def clip_triangles_capped(xp, tris, width: int, height: int, cap: int):
    """Slot-0-for-everyone + capped-subset clipping.

    The dense Sutherland-Hodgman path (clip_triangles) pays 2 gathers + 2
    scatters over (T, 8, A) PER PLANE — measured 10.5 s/frame at 1M
    triangles on TPU — for clipping that touches a fraction of a percent
    of triangles.  Here every triangle gets ONE slot holding the original
    (valid unless it crosses a clip plane), and only a top-k subset of
    crossing triangles (capacity ``cap``) runs the real clipper.

    Layout: rows [0, T) = slot 0; rows [T, T + FAN_SLOTS*cap) = the
    subset's fan, slot-major over the subset (ascending input order inside
    each slot).  Returns (fan, valid, subset_idx (cap,) int32).
    Triangles fully outside one plane are culled outright.  If more than
    ``cap`` triangles cross planes, the overflow is DROPPED (a documented
    capacity knob, like every real renderer's clip buffer).
    """
    T = tris.shape[0]
    gx = xp.float32(1.0 + 2.0 * guard_px(width) / float(width))
    gy = xp.float32(1.0 + 2.0 * guard_px(height) / float(height))

    crossing = xp.zeros(T, bool)
    fully_out = xp.zeros(T, bool)
    for plane in range(5):
        dk = _plane_distance(xp, tris, plane, gx, gy)  # (T, 3)
        neg = dk < 0
        any_neg = neg.any(axis=1)
        all_neg = neg.all(axis=1)
        fully_out = fully_out | all_neg
        crossing = crossing | (any_neg & ~all_neg)
    needs = crossing & ~fully_out
    slot0_valid = ~(crossing | fully_out)

    if xp is np:
        sel = np.nonzero(needs)[0].astype(np.int32)
        k = min(cap, len(sel))
        idx = np.zeros(cap, np.int32)
        idx[:k] = sel[:k]
        live = np.zeros(cap, bool)
        live[:k] = True
    else:
        # First-cap crossing triangles in ascending order, WITHOUT top_k:
        # top_k over 1M keys measured ~135 ms/frame on v5e (its lowering
        # is a k-pass/sort-shaped reduction); the same selection is an
        # inclusive cumsum (idx j = first i with cumsum(needs)[i] == j+1)
        # answered by a vectorized binary search — ~20 gather rounds of
        # `cap` indices each, milliseconds (docs/PERFORMANCE.md).
        c = xp.cumsum(needs.astype(xp.int32))
        j = xp.arange(cap, dtype=xp.int32)
        idx = xp.searchsorted(c, j + 1, side="left").astype(xp.int32)
        live = j < c[-1]  # slot j live iff at least j+1 crossing triangles
        idx = xp.where(live, xp.minimum(idx, T - 1), 0)

    sub = tris[idx]  # (cap, 3, A) — a cap-sized gather, not a T-sized one
    fan_s, valid_s = clip_triangles(xp, sub, width, height)
    valid_s = valid_s & xp.tile(live, FAN_SLOTS)
    fan = xp.concatenate([tris, fan_s], axis=0)
    valid = xp.concatenate([slot0_valid, valid_s], axis=0)
    return fan, valid, idx


def _count_crossing(xp, clip_corners, width: int, height: int):
    """Number of triangles that cross a clip plane (and so need the real
    clipper), from per-corner clip positions ``clip_corners`` — a list of
    3 per-corner (T, 4) arrays (or column 4-lists of (T,) vectors)."""
    gx = xp.float32(1.0 + 2.0 * guard_px(width) / float(width))
    gy = xp.float32(1.0 + 2.0 * guard_px(height) / float(height))
    crossing = None
    fully_out = None
    for plane in range(5):
        neg = [
            _plane_distance_col(
                xp, c[0], c[1], c[2], c[3], plane, gx, gy
            ) < 0
            for c in clip_corners
        ]
        any_neg = (neg[0] | neg[1]) | neg[2]
        all_neg = (neg[0] & neg[1]) & neg[2]
        fully_out = all_neg if fully_out is None else (fully_out | all_neg)
        crossing = any_neg if crossing is None else (crossing | any_neg)
    # (crossing & ~fully_out) matches the pipelines' `needs` set: per-plane
    # (any_neg & ~all_neg) differs from plain any_neg only on triangles
    # that are fully_out, which the mask removes either way.
    needs = crossing & ~fully_out
    return xp.sum(needs.astype(xp.int32))


def clip_overflow_count(xp, positions, attrs, tri_vidx, matrices, node_ids,
                        width: int, height: int, clip_cap="auto",
                        vertex_shader=None):
    """Crossing triangles DROPPED by capped clipping this frame.

    The capped clipper (clip_triangles_capped) silently drops crossing
    triangles beyond its capacity — a documented knob, but one that needs
    a runtime signal (VERDICT r2 weak #5).  This reruns only the
    transform + plane classification (no assemble/setup) and returns
    ``max(num_crossing - cap, 0)`` as a device scalar; the renderer
    surfaces it in FrameStats and raises under config.debug.

    Accepts both geometry modes (cols: tri_vidx=None, positions=(48,T)
    ccols, node_ids=(T,) draw ids; indexed: per-vertex rows).
    """
    if tri_vidx is None:
        assert attrs is None
        t = positions.shape[1]
        mrow = _expand_cols(xp, matrices.reshape(-1, 16), node_ids)
        corners = []
        for c in range(3):
            pos = [positions[c * 16 + j] for j in range(4)]
            corners.append([
                (
                    (_ob(xp, pos[0] * mrow[0 * 4 + j])
                     + _ob(xp, pos[1] * mrow[1 * 4 + j]))
                    + (_ob(xp, pos[2] * mrow[2 * 4 + j])
                       + _ob(xp, pos[3] * mrow[3 * 4 + j]))
                ).astype(xp.float32)
                for j in range(4)
            ])
    else:
        if vertex_shader is not None:
            positions, attrs = vertex_shader(positions, attrs)
        clip_pos = transform_positions(xp, positions, matrices, node_ids)
        t = tri_vidx.shape[0]
        tri_pos = clip_pos[tri_vidx]  # (T, 3, 4)
        corners = [
            [tri_pos[:, c, j] for j in range(4)] for c in range(3)
        ]
    cap = clip_cap_for(t) if clip_cap == "auto" else min(clip_cap, t)
    n_crossing = _count_crossing(xp, corners, width, height)
    return xp.maximum(n_crossing - xp.int32(cap), xp.int32(0))


# ---------------------------------------------------------------------------
# Snap + triangle setup (RASTER_SPEC.md §1.4-§3)
# ---------------------------------------------------------------------------


def setup_triangles(xp, tris, valid, width: int, height: int,
                    const_cols=None):
    """Viewport transform, subpixel snap, facing/cull, edge + interpolation
    setup.  tris: (T, 3, ATTR_FLOATS) post-clip, valid: (T,).

    ``const_cols`` (optional, (T, MATERIAL_COLS) f32): per-triangle constant
    columns (material params + texture layer) copied into F_MET..F_TEX.

    Returns (tri_i32 (T, NI32) int32, tri_f32 (T, NF32) float32).
    Culled/invalid triangles get an empty bbox (jmin > jmax) and valid=0.
    """
    gpx = guard_px(width)
    gpy = guard_px(height)
    f32 = xp.float32
    i32 = xp.int32

    pos = tris[..., 0:4]
    # w > 0 after near clipping for valid triangles; guard the padding slots
    # so their garbage stays finite (they are masked out via `valid` below).
    w = xp.where(pos[..., 3] > 0, pos[..., 3], f32(1.0))
    inv_w = (f32(1.0) / w).astype(f32)
    ndc_x = pos[..., 0] * inv_w
    ndc_y = pos[..., 1] * inv_w
    ndc_z = pos[..., 2] * inv_w

    half_w = f32(0.5 * width)
    half_h = f32(0.5 * height)
    xs = (ndc_x + f32(1.0)) * half_w
    ys = (f32(1.0) - ndc_y) * half_h

    # Subpixel snap: floor(x * 8 + 0.5) in f32 then to int32 (exact: *8 is a
    # power-of-two scale).  Clamp to the guard window first so that
    # pathological f32 values cannot overflow the int conversion.
    lox = f32(-gpx * SUBPIXEL)
    loy = f32(-gpy * SUBPIXEL)
    hix = f32((width + gpx) * SUBPIXEL)
    hiy = f32((height + gpy) * SUBPIXEL)
    X = xp.clip(xp.floor(xs * f32(SUBPIXEL) + f32(0.5)), lox, hix).astype(i32)
    Y = xp.clip(xp.floor(ys * f32(SUBPIXEL) + f32(0.5)), loy, hiy).astype(i32)

    x0, x1, x2 = X[:, 0], X[:, 1], X[:, 2]
    y0, y1, y2 = Y[:, 0], Y[:, 1], Y[:, 2]

    # Facing: FrontCounterClockwise=TRUE + y-down screen coords means front
    # faces have negative doubled area (docs/RASTER_SPEC.md §2).
    area2 = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    front = area2 < 0
    alive = valid & front  # back-face + degenerate (area2 >= 0) culled

    # Canonicalize: swap v1 <-> v2 so interiors have positive edge values.
    x1, x2 = x2, x1
    y1, y2 = y2, y1
    varr = xp.stack(
        [tris[:, 0], tris[:, 2], tris[:, 1]], axis=1
    )  # swapped attribute order
    area2 = -area2

    # Edge vectors for edge k = (k1 -> k2), (k1, k2) = ((1,2), (2,0), (0,1)).
    dx0, dy0 = x2 - x1, y2 - y1
    dx1, dy1 = x0 - x2, y0 - y2
    dx2, dy2 = x1 - x0, y1 - y0

    def bias(dx, dy):
        top_left = (dy < 0) | ((dy == 0) & (dx > 0))
        return xp.where(top_left, i32(0), i32(1))

    # Pixel-space bbox: pixel centers at SUBPIXEL*j + SUBPIXEL//2.
    half = SUBPIXEL // 2
    xmin = xp.minimum(xp.minimum(x0, x1), x2)
    xmax = xp.maximum(xp.maximum(x0, x1), x2)
    ymin = xp.minimum(xp.minimum(y0, y1), y2)
    ymax = xp.maximum(xp.maximum(y0, y1), y2)
    jmin = xp.maximum((xmin + (SUBPIXEL - 1 - half)) >> SUBPIXEL_BITS, 0)
    jmax = xp.minimum((xmax - half) >> SUBPIXEL_BITS, width - 1)
    imin = xp.maximum((ymin + (SUBPIXEL - 1 - half)) >> SUBPIXEL_BITS, 0)
    imax = xp.minimum((ymax - half) >> SUBPIXEL_BITS, height - 1)
    jmin = xp.where(alive, jmin, 1).astype(i32)
    jmax = xp.where(alive, jmax, 0).astype(i32)
    imin = xp.where(alive, imin, 1).astype(i32)
    imax = xp.where(alive, imax, 0).astype(i32)

    tri_i32 = xp.stack(
        [
            x0, y0, x1, y1, x2, y2,
            dx0, dy0, dx1, dy1, dx2, dy2,
            bias(dx0, dy0), bias(dx1, dy1), bias(dx2, dy2),
            jmin, jmax, imin, imax,
            alive.astype(i32),
        ],
        axis=1,
    ).astype(i32)

    # Interpolation constants (canonical vertex order).
    safe_area = xp.where(area2 > 0, area2, 1)
    inv_area = (f32(1.0) / safe_area.astype(f32)).astype(f32)
    wc = xp.where(alive[:, None], varr[..., 3], f32(1.0))
    rw = (f32(1.0) / wc).astype(f32)
    zndc = varr[..., 2] * rw
    za = zndc * inv_area[:, None]
    col = varr[..., 4:7]  # rgb
    cw = col * rw[..., None]
    uvw = varr[..., 8:10] * rw[..., None]  # u/w, v/w
    nw = varr[..., 10:13] * rw[..., None]  # world-space normal / w

    if const_cols is None:
        const_cols = xp.zeros((tris.shape[0], MATERIAL_COLS), f32)
    tri_f32 = xp.concatenate(
        [
            za,  # F_ZA*
            rw,  # F_RW*
            cw[..., 0],  # F_CR*
            cw[..., 1],
            cw[..., 2],
            uvw[..., 0],  # F_U*
            uvw[..., 1],  # F_V*
            nw[..., 0],  # F_NX*
            nw[..., 1],  # F_NY*
            nw[..., 2],  # F_NZ*
            const_cols.astype(f32),  # F_MET..F_TEX
            xp.zeros((tris.shape[0], NF32 - 30 - MATERIAL_COLS), f32),
        ],
        axis=1,
    ).astype(f32)

    # Neutralize dead rows (culled / padding / unused clip-subset slots) to
    # a canonical sentinel: empty bbox, zero payload.  Their data is never
    # consumed (coverage is gated on bbox + valid), but deterministic
    # content keeps the bit-exact contracts simple — np and jnp select
    # different garbage for unused capped-clip slots (np zero-fills,
    # top_k's zero-key ties gather arbitrary rows), and sharded gathers
    # must compare bit-equal to single-device buffers.
    sentinel = np.zeros(NI32, np.int32)
    sentinel[I_JMIN] = 1
    sentinel[I_IMIN] = 1
    # Dead slots get bias = INT32_MAX so their coverage test can NEVER
    # pass (|edge values| < 2^31 by the guard-band clamp): kernels may
    # evaluate triangles unconditionally with no per-triangle bbox fold
    # needed for correctness — the bbox is purely a skip optimization.
    sentinel[I_BIAS0] = sentinel[I_BIAS1] = sentinel[I_BIAS2] = 2**31 - 1
    mask = alive[:, None]
    tri_i32 = xp.where(mask, tri_i32, xp.asarray(sentinel, dtype=i32))
    tri_f32 = xp.where(mask, tri_f32, f32(0.0))
    return tri_i32, tri_f32


def geometry_pipeline(xp, positions, attrs, tri_vidx, matrices, node_ids,
                      width: int, height: int, normal_matrices=None,
                      material_table=None, vertex_shader=None,
                      clip_cap="auto"):
    """Full shared geometry stage: transform, assemble, clip, setup.

    ``normal_matrices`` (optional, (M, 3, 3)): per-draw inverse-transpose
    rotations for world-space normals (needed by the lit pipelines).
    ``material_table`` (optional, (M, MATERIAL_COLS) f32): per-draw material
    constants (metallic, roughness, emissive rgb, texture layer) — each
    triangle carries its draw's row (via vertex 0's node id, constant across
    the triangle by construction), fan-expanded with the clip stage.
    ``vertex_shader`` (optional): a jit-traceable
    ``fn(positions (N,4), attrs (N,12)) -> (positions, attrs)`` applied in
    OBJECT space before the object->clip transform — the programmable
    vertex-stage capability (the reference's platform compiles arbitrary
    vertex shaders into PSOs, zd3d12.zig:904-1046; the demo's uber.hlsl is
    one instance).  Runs on device inside the jitted frame.

    ``tri_vidx=None`` selects the column (SoA) per-corner mode:
    ``positions`` is the (48, T) corner-column buffer built at load
    (FlatScene.expand_corner_cols), ``attrs`` must be None, ``node_ids``
    is the (T,) per-triangle draw id.  See geometry_pipeline_cols for
    why (gather-free AND AoS-free — both measured bottlenecks on TPU).
    Returns (tri_i32, tri_f32).  With the default capped clipping
    (``clip_cap="auto"``) the static row count is ``capped_rows(T)`` =
    T slot-0 rows (one per input triangle, in submission order) followed
    by FAN_SLOTS * clip_cap_for(T) subset-fan rows (slot-major over the
    clip subset); ``clip_cap=None`` selects the legacy dense slot-major
    (FAN_SLOTS * T) layout.
    """
    if tri_vidx is None:
        # Column (SoA) per-corner mode: ``positions`` is the (48, T)
        # corner-column buffer (attrs=None), ``node_ids`` the (T,)
        # per-triangle draw — see geometry_pipeline_cols.  The
        # vertex-shader hook needs the per-vertex row layout; callers
        # fall back to the indexed mode for it.
        assert attrs is None, "tri_vidx=None takes the (48,T) cols buffer"
        assert vertex_shader is None, "cols mode has no vertex_shader"
        return geometry_pipeline_cols(
            xp, positions, node_ids, matrices, width, height,
            normal_matrices=normal_matrices, material_table=material_table,
            clip_cap=clip_cap,
        )
    if vertex_shader is not None:
        positions, attrs = vertex_shader(positions, attrs)
    clip_pos = transform_positions(xp, positions, matrices, node_ids)
    if normal_matrices is not None:
        attrs = transform_normals(xp, attrs, normal_matrices, node_ids)
    t = tri_vidx.shape[0]
    tris = assemble_triangles(xp, clip_pos, attrs, tri_vidx)
    subset_idx = None
    if clip_cap is None:
        # Legacy dense layout: FAN_SLOTS slots for every triangle,
        # slot-major.  Kept for reference/tests; the capped layout below
        # is the production path.
        fan, fan_valid = clip_triangles(xp, tris, width, height)
    else:
        cap = clip_cap_for(t) if clip_cap == "auto" else min(clip_cap, t)
        fan, fan_valid, subset_idx = clip_triangles_capped(
            xp, tris, width, height, cap
        )
    const_cols = None
    if material_table is not None:
        if material_table.shape[0] == t:
            # Pre-expanded per-triangle rows (the engine precomputes these
            # at load: per-pixel-scale gathers from tiny tables are
            # pathologically slow on TPU, and the draw->material mapping is
            # static per scene).
            per_tri = material_table
        else:
            tri_draw = node_ids[tri_vidx[:, 0]]  # (T,) draw of each triangle
            per_tri = material_table[tri_draw]  # (T, MATERIAL_COLS)
        if subset_idx is None:
            # Fan slots are slot-major: slot j of every triangle first.
            const_cols = xp.tile(per_tri, (FAN_SLOTS, 1))
        else:
            const_cols = xp.concatenate(
                [per_tri, xp.tile(per_tri[subset_idx], (FAN_SLOTS, 1))],
                axis=0,
            )
    return setup_triangles(xp, fan, fan_valid, width, height,
                           const_cols=const_cols)


def _plane_distance_col(xp, x, y, z, w, plane_id, gx, gy):
    """Column form of _plane_distance: same formulas on (T,) vectors."""
    if plane_id == 0:
        return z
    if plane_id == 1:
        return _ob(xp, gx * w) - x
    if plane_id == 2:
        return _ob(xp, gx * w) + x
    if plane_id == 3:
        return _ob(xp, gy * w) - y
    return _ob(xp, gy * w) + y


def geometry_pipeline_cols(xp, ccols, tri_node, matrices,
                           width: int, height: int, normal_matrices=None,
                           material_table=None, clip_cap="auto"):
    """Column-form (SoA) per-corner geometry pipeline.

    The row-form per-corner mode still materializes the (T, 3, 16) AoS
    triangle array; on TPU XLA lays that out {2,1,0:T(4,128)} — the (3,16)
    minor dims pad to a (4,128) tile, a ~10.7x memory amplification
    (~2 GB at 1M triangles), and the classify/setup passes that read it
    measured ~75 ms/frame (op-level trace, benchmarks/geom_profile.py).
    Here every quantity is a (T,)-shaped vector (a row slice of one
    (48, T) buffer), which tiles perfectly.

    ``ccols``: (48, T) f32 — row c*16+j is channel j of triangle corner c
    (channels: clip-input position xyzw, color rgba, uv, normal, tangent),
    built once at load by FlatScene.expand_corner_cols.
    ``tri_node``: (T,) int32 — the draw of each triangle (corners of one
    triangle always share a draw).
    Returns (tri_i32, tri_f32) — identical bit-for-bit to the row modes:
    every elementwise formula, association (incl. _ob rounding barriers),
    and reduction order is the same, only array shapes differ.
    """
    t = ccols.shape[1]
    f32 = xp.float32
    i32 = xp.int32
    assert clip_cap is not None, "cols mode requires capped clipping"
    cap = clip_cap_for(t) if clip_cap == "auto" else min(clip_cap, t)

    # -- transform: per-triangle object_to_clip rows (16, T) -------------
    mrow = _expand_cols(xp, matrices.reshape(-1, 16), tri_node)
    pos = [[ccols[c * 16 + j] for j in range(4)] for c in range(3)]
    clip = [
        [
            (
                (_ob(xp, pos[c][0] * mrow[0 * 4 + j])
                 + _ob(xp, pos[c][1] * mrow[1 * 4 + j]))
                + (_ob(xp, pos[c][2] * mrow[2 * 4 + j])
                   + _ob(xp, pos[c][3] * mrow[3 * 4 + j]))
            ).astype(f32)
            for j in range(4)
        ]
        for c in range(3)
    ]
    attr = [[ccols[c * 16 + 4 + i] for i in range(12)] for c in range(3)]
    if normal_matrices is not None:
        nmrow = _expand_cols(xp, normal_matrices.reshape(-1, 9), tri_node)
        for c in range(3):
            n0, n1, n2 = attr[c][6], attr[c][7], attr[c][8]
            out = [
                (
                    (_ob(xp, n0 * nmrow[0 * 3 + j])
                     + _ob(xp, n1 * nmrow[1 * 3 + j]))
                    + _ob(xp, n2 * nmrow[2 * 3 + j])
                ).astype(f32)
                for j in range(3)
            ]
            attr[c][6], attr[c][7], attr[c][8] = out

    # Full channel grid: cols[c][j] == assembled tris[:, c, j].
    cols = [clip[c] + attr[c] for c in range(3)]

    # -- clip classification + capped subset selection -------------------
    gx = f32(1.0 + 2.0 * guard_px(width) / float(width))
    gy = f32(1.0 + 2.0 * guard_px(height) / float(height))
    crossing = xp.zeros(t, bool)
    fully_out = xp.zeros(t, bool)
    for plane in range(5):
        neg = [
            _plane_distance_col(
                xp, clip[c][0], clip[c][1], clip[c][2], clip[c][3],
                plane, gx, gy,
            ) < 0
            for c in range(3)
        ]
        any_neg = (neg[0] | neg[1]) | neg[2]
        all_neg = (neg[0] & neg[1]) & neg[2]
        fully_out = fully_out | all_neg
        crossing = crossing | (any_neg & ~all_neg)
    needs = crossing & ~fully_out
    slot0_valid = ~(crossing | fully_out)

    if xp is np:
        sel = np.nonzero(needs)[0].astype(np.int32)
        k = min(cap, len(sel))
        idx = np.zeros(cap, np.int32)
        idx[:k] = sel[:k]
        live = np.zeros(cap, bool)
        live[:k] = True
    else:
        c_ = xp.cumsum(needs.astype(i32))
        j_ = xp.arange(cap, dtype=i32)
        idx = xp.searchsorted(c_, j_ + 1, side="left").astype(i32)
        live = j_ < c_[-1]
        idx = xp.where(live, xp.minimum(idx, t - 1), 0)

    # Subset columns feed the SoA clipper (bit-identical to the AoS
    # clip_triangles; see clip_triangles_cols for the layout rationale).
    sub_cols = [
        [cols[c][j][idx] for j in range(ATTR_FLOATS)] for c in range(3)
    ]
    fan_cols, valid_s = clip_triangles_cols(xp, sub_cols, width, height)
    valid_s = valid_s & xp.tile(live, FAN_SLOTS)
    valid = xp.concatenate([slot0_valid, valid_s])

    # Row r's channel columns: slot-0 part is the original (T,) vectors,
    # the subset fan is the clipper's column output.
    fcols = [
        [
            xp.concatenate([cols[c][j], fan_cols[c][j]])
            for j in range(ATTR_FLOATS)
        ]
        for c in range(3)
    ]

    const_cols = None
    if material_table is not None:
        if material_table.shape[0] == t:
            per_tri = material_table
        else:
            per_tri = material_table[tri_node]
        sub_tri = per_tri[idx]
        const_cols = [
            xp.concatenate(
                [per_tri[:, c], xp.tile(sub_tri[:, c], FAN_SLOTS)]
            ).astype(f32)
            for c in range(MATERIAL_COLS)
        ]

    return _setup_cols(xp, fcols, valid, width, height, const_cols)


def _setup_cols(xp, cols, valid, width: int, height: int, const_cols=None):
    """Column form of setup_triangles: identical formulas on (R,) vectors.
    ``cols[c][j]``: channel j of post-clip vertex c; ``valid``: (R,) bool.
    Returns (tri_i32 (R, NI32), tri_f32 (R, NF32)) — bit-identical to
    setup_triangles on the equivalent (R, 3, A) AoS input."""
    gpx = guard_px(width)
    gpy = guard_px(height)
    f32 = xp.float32
    i32 = xp.int32
    r = valid.shape[0]

    X, Y = [], []
    for c in range(3):
        w_ = cols[c][3]
        w_ = xp.where(w_ > 0, w_, f32(1.0))
        inv_w = (f32(1.0) / w_).astype(f32)
        ndc_x = cols[c][0] * inv_w
        ndc_y = cols[c][1] * inv_w
        xs = (ndc_x + f32(1.0)) * f32(0.5 * width)
        ys = (f32(1.0) - ndc_y) * f32(0.5 * height)
        lox = f32(-gpx * SUBPIXEL)
        loy = f32(-gpy * SUBPIXEL)
        hix = f32((width + gpx) * SUBPIXEL)
        hiy = f32((height + gpy) * SUBPIXEL)
        X.append(xp.clip(
            xp.floor(xs * f32(SUBPIXEL) + f32(0.5)), lox, hix).astype(i32))
        Y.append(xp.clip(
            xp.floor(ys * f32(SUBPIXEL) + f32(0.5)), loy, hiy).astype(i32))

    x0, x1, x2 = X
    y0, y1, y2 = Y
    area2 = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    front = area2 < 0
    alive = valid & front

    # Canonicalize: swap v1 <-> v2 (matches setup_triangles).
    x1, x2 = x2, x1
    y1, y2 = y2, y1
    vord = (0, 2, 1)  # canonical vertex order into cols
    area2 = -area2

    dx0, dy0 = x2 - x1, y2 - y1
    dx1, dy1 = x0 - x2, y0 - y2
    dx2, dy2 = x1 - x0, y1 - y0

    def bias(dx, dy):
        top_left = (dy < 0) | ((dy == 0) & (dx > 0))
        return xp.where(top_left, i32(0), i32(1))

    half = SUBPIXEL // 2
    xmin = xp.minimum(xp.minimum(x0, x1), x2)
    xmax = xp.maximum(xp.maximum(x0, x1), x2)
    ymin = xp.minimum(xp.minimum(y0, y1), y2)
    ymax = xp.maximum(xp.maximum(y0, y1), y2)
    jmin = xp.maximum((xmin + (SUBPIXEL - 1 - half)) >> SUBPIXEL_BITS, 0)
    jmax = xp.minimum((xmax - half) >> SUBPIXEL_BITS, width - 1)
    imin = xp.maximum((ymin + (SUBPIXEL - 1 - half)) >> SUBPIXEL_BITS, 0)
    imax = xp.minimum((ymax - half) >> SUBPIXEL_BITS, height - 1)
    jmin = xp.where(alive, jmin, 1).astype(i32)
    jmax = xp.where(alive, jmax, 0).astype(i32)
    imin = xp.where(alive, imin, 1).astype(i32)
    imax = xp.where(alive, imax, 0).astype(i32)

    i32_cols = [
        x0, y0, x1, y1, x2, y2,
        dx0, dy0, dx1, dy1, dx2, dy2,
        bias(dx0, dy0), bias(dx1, dy1), bias(dx2, dy2),
        jmin, jmax, imin, imax,
        alive.astype(i32),
    ]

    safe_area = xp.where(area2 > 0, area2, 1)
    inv_area = (f32(1.0) / safe_area.astype(f32)).astype(f32)
    za, rw, cr, cg, cb, uu, vv, nx, ny, nz = ([] for _ in range(10))
    for k in range(3):
        c = vord[k]
        wc = xp.where(alive, cols[c][3], f32(1.0))
        rw_k = (f32(1.0) / wc).astype(f32)
        rw.append(rw_k)
        za.append((cols[c][2] * rw_k) * inv_area)
        cr.append(cols[c][4] * rw_k)
        cg.append(cols[c][5] * rw_k)
        cb.append(cols[c][6] * rw_k)
        uu.append(cols[c][8] * rw_k)
        vv.append(cols[c][9] * rw_k)
        nx.append(cols[c][10] * rw_k)
        ny.append(cols[c][11] * rw_k)
        nz.append(cols[c][12] * rw_k)

    if const_cols is None:
        const_cols = [xp.zeros(r, f32)] * MATERIAL_COLS
    f32_cols = (
        za + rw + cr + cg + cb + uu + vv + nx + ny + nz + list(const_cols)
        + [xp.zeros(r, f32)] * (NF32 - 30 - MATERIAL_COLS)
    )

    tri_i32 = xp.stack(i32_cols, axis=1).astype(i32)
    tri_f32 = xp.stack(f32_cols, axis=1).astype(f32)

    sentinel = np.zeros(NI32, np.int32)
    sentinel[I_JMIN] = 1
    sentinel[I_IMIN] = 1
    sentinel[I_BIAS0] = sentinel[I_BIAS1] = sentinel[I_BIAS2] = 2**31 - 1
    mask = alive[:, None]
    tri_i32 = xp.where(mask, tri_i32, xp.asarray(sentinel, dtype=i32))
    tri_f32 = xp.where(mask, tri_f32, f32(0.0))
    return tri_i32, tri_f32


# ---------------------------------------------------------------------------
# Compaction + block metadata (binning level 0)
# ---------------------------------------------------------------------------

RASTER_BLOCK = 128  # triangles per raster block (block-skip granularity)
SUPER_BLOCK = 32  # blocks per superblock (level-1 skip granularity)
_INT_MAX = 2**31 - 1


def compact_triangles(xp, tri_i32, tri_f32):
    """Stable-partition live triangles to the front.

    The fan-slot layout leaves most slots dead (clipping rarely fires); a
    stable valid-first sort clusters live triangles into the leading raster
    blocks so the kernel's block-skip test eliminates the dead tail.  The
    sort is stable, so the relative order of live triangles — the depth-tie
    submission order — is preserved exactly.
    """
    dead = (tri_i32[:, I_VALID] == 0).astype(xp.int32)
    if xp is np:
        # kind='stable' spells the stable sort on NumPy 1.x and 2.x both
        # (the `stable=` keyword is NumPy >= 2.0 only).
        order = np.argsort(dead, kind="stable")
    else:
        order = xp.argsort(dead, stable=True)
    return tri_i32[order], tri_f32[order]


def block_bounds(xp, tri_i32, block: int = RASTER_BLOCK):
    """Per-block union bbox for the kernel's block-skip test.

    Returns (num_blocks, 8) int32: [jmin, jmax, imin, imax, any_valid, 0, 0, 0]
    with an empty bbox (jmin > jmax) for all-dead blocks.
    """
    t = tri_i32.shape[0]
    assert t % block == 0, "pad triangle count to a multiple of RASTER_BLOCK"
    nb = t // block
    valid = tri_i32[:, I_VALID].reshape(nb, block) > 0
    jmin = xp.where(valid, tri_i32[:, I_JMIN].reshape(nb, block), _INT_MAX).min(axis=1)
    jmax = xp.where(valid, tri_i32[:, I_JMAX].reshape(nb, block), -_INT_MAX).max(axis=1)
    imin = xp.where(valid, tri_i32[:, I_IMIN].reshape(nb, block), _INT_MAX).min(axis=1)
    imax = xp.where(valid, tri_i32[:, I_IMAX].reshape(nb, block), -_INT_MAX).max(axis=1)
    any_valid = valid.any(axis=1).astype(xp.int32)
    zero = xp.zeros_like(jmin)
    return xp.stack(
        [jmin, jmax, imin, imax, any_valid, zero, zero, zero], axis=1
    ).astype(xp.int32)


def super_bounds(xp, blocks, super_block: int = SUPER_BLOCK):
    """Level-1 union bboxes over groups of SUPER_BLOCK raster blocks —
    lets the kernel skip 4096 triangles with 4 scalar loads.  Pads the
    block table to a superblock multiple with empty blocks; returns
    (padded_blocks, supers) both (n, 8) int32."""
    nb = blocks.shape[0]
    pad = (-nb) % super_block
    if pad:
        empty = xp.zeros((pad, 8), xp.int32)
        if xp is np:
            empty = empty.copy()
            empty[:, 0] = 1  # jmin > jmax: empty bbox
        else:
            empty = empty.at[:, 0].set(1)
        blocks = xp.concatenate([blocks, empty], axis=0)
    ns = blocks.shape[0] // super_block
    grp = blocks.reshape(ns, super_block, 8)
    alive = grp[:, :, 4] > 0
    jmin = xp.where(alive, grp[:, :, 0], _INT_MAX).min(axis=1)
    jmax = xp.where(alive, grp[:, :, 1], -_INT_MAX).max(axis=1)
    imin = xp.where(alive, grp[:, :, 2], _INT_MAX).min(axis=1)
    imax = xp.where(alive, grp[:, :, 3], -_INT_MAX).max(axis=1)
    any_valid = alive.any(axis=1).astype(xp.int32)
    zero = xp.zeros_like(jmin)
    supers = xp.stack(
        [jmin, jmax, imin, imax, any_valid, zero, zero, zero], axis=1
    ).astype(xp.int32)
    return blocks, supers


# ---------------------------------------------------------------------------
# Meshlet (cluster) culling — the mesh-shader-pipeline analog
# ---------------------------------------------------------------------------

# Clip-space half-space planes p with "visible => v_clip . p >= 0" in the
# row-vector convention with D3D [0, 1] depth (docs/RASTER_SPEC.md):
# left/right/bottom/top/near/far.
_FRUSTUM_PLANES = (
    (1.0, 0.0, 0.0, 1.0),
    (-1.0, 0.0, 0.0, 1.0),
    (0.0, 1.0, 0.0, 1.0),
    (0.0, -1.0, 0.0, 1.0),
    (0.0, 0.0, 1.0, 0.0),
    (0.0, 0.0, -1.0, 1.0),
)


def meshlet_keep_mask(xp, bounds, mdraw, enabled, matrices, cam_local,
                      backface_margin: float = 0.1):
    """Per-meshlet visibility (engine/upload.py build_meshlet_table).

    ``bounds`` (M, 8) f32 draw-LOCAL [center, radius, cone axis, cone
    cutoff]; ``matrices`` (D, 4, 4) node->clip (row-vector); ``cam_local``
    (D, 4) camera position in each draw's local space (host-computed per
    frame).  Both tests are conservative — a culled meshlet provably has
    no visible pixels, so killing its triangles cannot change the image
    (the bit-exactness contract; tests/test_meshlet_cull.py):

    * frustum: each clip half-space is pulled to local space through the
      draw's matrix (lp = M @ p), where the sphere test
      ``dot(c, lp.xyz) + lp.w >= -r * |lp.xyz|`` is exact for spheres;
    * backface cone: with w = cone cutoff (= min dot(axis, face normal)
      >= 0) and view offset d = cam_local - center, every face is
      back-facing when ``dot(d, axis) * w + |d| * sqrt(1 - w^2) + r < 0``
      (cos(angle-theta) identity + |sin| <= 1 bound; w < 0 never culls).

    ``backface_margin``: requires every face to be at least asin(margin)
    past edge-on at the cluster's distance (sin ~6 deg default).

    CONTRACT (the same one meshopt-style cone culling ships with): the
    cone test is conservative with respect to FLOAT geometry.  The
    rasterizer computes winding from subpixel-SNAPPED coordinates, and a
    snap can flip a (sub-)pixel sliver that is geometrically back-facing
    into a front-facing one — such slivers rasterize without culling and
    vanish with it (measured: 1 px in 8192 on the 32K-triangle sphere
    field, a 3.5e-4-area pole sliver with face dot -2.49).  No angular
    margin can close this for triangles below the snap quantum, so the
    deviation is accepted and bounded by tests/test_meshlet_cull.py
    (<= 0.1% of pixels, each traceable to a geometrically back-facing
    sliver); frustum culling remains exact (no snapping involved).
    """
    planes = xp.asarray(_FRUSTUM_PLANES, xp.float32)  # (6, 4)
    lp = xp.einsum("dij,kj->dki", matrices, planes)  # (D, 6, 4)
    lpm = lp[mdraw]  # (M, 6, 4)
    c = bounds[:, 0:3]
    r = bounds[:, 3]
    dist_to_plane = (
        xp.einsum("mi,mki->mk", c, lpm[:, :, 0:3]) + lpm[:, :, 3]
    )
    plane_norm = xp.sqrt((lpm[:, :, 0:3] ** 2).sum(axis=2))
    outside = (dist_to_plane < -r[:, None] * plane_norm).any(axis=1)

    axis = bounds[:, 4:7]
    w = bounds[:, 7]
    cam = cam_local[mdraw, 0:3]
    d = cam - c
    dist = xp.sqrt((d * d).sum(axis=1))
    sin_t = xp.sqrt(xp.maximum(1.0 - w * w, 0.0))
    backface = (w >= 0.0) & (
        (d * axis).sum(axis=1) * w + dist * sin_t + r
        < -xp.float32(backface_margin) * dist
    )

    return ~enabled | ~(outside | backface)
