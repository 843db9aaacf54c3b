"""Row-major SIMD-math analog of the reference's zmath library.

The reference renderer does all host-side camera/transform math with zmath
(``zrenderer/libs/zmath/zmath.zig``), a DirectXMath-style library with these
conventions, which we preserve exactly:

* **Row-major matrices, row-vector convention**: points transform as
  ``v' = v @ M`` and transforms compose left-to-right
  (``mul(A, B)`` applies A first). See ``zmath.zig:1957-2010``.
* **Right-handed view space** with the camera looking down -Z
  (``lookAtRh``/``lookToLh``, ``zmath.zig:2111-2130``).
* **D3D-style [0, 1] clip depth** (``perspectiveFovRh``, ``zmath.zig:2157-2175``):
  for a view-space point, ``w_clip = -z_view``.
* **Quaternions as (x, y, z, w)**; ``qmul(q0, q1)`` returns the Hamilton
  product ``q1 * q0`` (DirectXMath ``XMQuaternionMultiply`` order,
  ``zmath.zig:2598-2615``), i.e. the rotation that applies q0 first.

Everything is float32 NumPy — this layer is host math (camera matrices,
asset-pipeline transforms). Device-side math lives in ``zrenderer_tpu.ops``.
"""

from __future__ import annotations

import numpy as np

F32 = np.float32

# ---------------------------------------------------------------------------
# Construction helpers
# ---------------------------------------------------------------------------


def f32x4(x: float, y: float, z: float, w: float) -> np.ndarray:
    """A 4-wide float32 vector (zmath ``f32x4``)."""
    return np.array([x, y, z, w], dtype=F32)


def vec3(x: float, y: float, z: float) -> np.ndarray:
    """A 3-component point/direction as an f32x4 with w = 0."""
    return np.array([x, y, z, 0.0], dtype=F32)


def splat(value: float) -> np.ndarray:
    return np.full(4, value, dtype=F32)


def load_vec3(mem, w: float = 0.0) -> np.ndarray:
    """zmath ``load(mem, Vec, 3)``: read 3 floats, set the 4th lane."""
    m = np.asarray(mem, dtype=F32).reshape(-1)
    return np.array([m[0], m[1], m[2], w], dtype=F32)


def load_mat(mem) -> np.ndarray:
    """zmath ``loadMat``: 16 consecutive floats -> 4x4 row-major matrix."""
    return np.asarray(mem, dtype=F32).reshape(-1)[:16].reshape(4, 4).copy()


def store_mat(m: np.ndarray) -> np.ndarray:
    """zmath ``storeMat``/``matToArray``: 4x4 -> flat 16 floats (row-major)."""
    return np.asarray(m, dtype=F32).reshape(16).copy()


def identity() -> np.ndarray:
    return np.eye(4, dtype=F32)


# ---------------------------------------------------------------------------
# Vector ops
# ---------------------------------------------------------------------------


def dot3(a: np.ndarray, b: np.ndarray) -> F32:
    a = np.asarray(a, dtype=F32)
    b = np.asarray(b, dtype=F32)
    return F32(a[0] * b[0] + a[1] * b[1] + a[2] * b[2])


def cross3(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = np.asarray(a, dtype=F32)
    b = np.asarray(b, dtype=F32)
    return np.array(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
            0.0,
        ],
        dtype=F32,
    )


def length3(a: np.ndarray) -> F32:
    return F32(np.sqrt(dot3(a, a), dtype=F32))


def normalize3(a: np.ndarray) -> np.ndarray:
    a = np.asarray(a, dtype=F32)
    n = length3(a)
    out = a.copy()
    out[:3] = a[:3] / n
    out[3] = a[3] / n  # zmath normalize3 divides the whole register
    return out


# ---------------------------------------------------------------------------
# Matrix ops (row-vector convention)
# ---------------------------------------------------------------------------


def mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """zmath ``mul``: Mat@Mat, Vec@Mat (row vector), Mat*scalar.

    ``mul(A, B)`` composes so that A is applied first: ``v @ A @ B``.
    """
    a = np.asarray(a, dtype=F32)
    b = np.asarray(b, dtype=F32)
    if a.ndim == 1 and b.ndim == 2:
        return (a @ b).astype(F32)
    if a.ndim == 2 and b.ndim == 1:
        return (a @ b).astype(F32)
    return (a @ b).astype(F32)


def transpose(m: np.ndarray) -> np.ndarray:
    return np.asarray(m, dtype=F32).T.copy()


def translation(x: float, y: float, z: float) -> np.ndarray:
    m = identity()
    m[3, 0] = x
    m[3, 1] = y
    m[3, 2] = z
    return m


def translation_v(v) -> np.ndarray:
    v = np.asarray(v, dtype=F32)
    return translation(v[0], v[1], v[2])


def scaling(x: float, y: float, z: float) -> np.ndarray:
    m = identity()
    m[0, 0] = x
    m[1, 1] = y
    m[2, 2] = z
    return m


def scaling_v(v) -> np.ndarray:
    v = np.asarray(v, dtype=F32)
    return scaling(v[0], v[1], v[2])


def rotation_x(angle: float) -> np.ndarray:
    s, c = F32(np.sin(F32(angle))), F32(np.cos(F32(angle)))
    return np.array(
        [[1, 0, 0, 0], [0, c, s, 0], [0, -s, c, 0], [0, 0, 0, 1]], dtype=F32
    )


def rotation_y(angle: float) -> np.ndarray:
    s, c = F32(np.sin(F32(angle))), F32(np.cos(F32(angle)))
    return np.array(
        [[c, 0, -s, 0], [0, 1, 0, 0], [s, 0, c, 0], [0, 0, 0, 1]], dtype=F32
    )


def rotation_z(angle: float) -> np.ndarray:
    s, c = F32(np.sin(F32(angle))), F32(np.cos(F32(angle)))
    return np.array(
        [[c, s, 0, 0], [-s, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], dtype=F32
    )


# ---------------------------------------------------------------------------
# View matrices (zmath.zig:2111-2141)
# ---------------------------------------------------------------------------


def look_to_lh(eyepos, eyedir, updir) -> np.ndarray:
    az = normalize3(np.asarray(eyedir, dtype=F32))
    ax = normalize3(cross3(np.asarray(updir, dtype=F32), az))
    ay = normalize3(cross3(az, ax))
    eye = np.asarray(eyepos, dtype=F32)
    return np.array(
        [
            [ax[0], ay[0], az[0], 0.0],
            [ax[1], ay[1], az[1], 0.0],
            [ax[2], ay[2], az[2], 0.0],
            [-dot3(ax, eye), -dot3(ay, eye), -dot3(az, eye), 1.0],
        ],
        dtype=F32,
    )


def look_to_rh(eyepos, eyedir, updir) -> np.ndarray:
    return look_to_lh(eyepos, -np.asarray(eyedir, dtype=F32), updir)


def look_at_lh(eyepos, focuspos, updir) -> np.ndarray:
    return look_to_lh(
        eyepos, np.asarray(focuspos, dtype=F32) - np.asarray(eyepos, dtype=F32), updir
    )


def look_at_rh(eyepos, focuspos, updir) -> np.ndarray:
    """Matches zmath.lookAtRh (zmath.zig:2128-2130): lookToLh(eye, eye-focus)."""
    return look_to_lh(
        eyepos, np.asarray(eyepos, dtype=F32) - np.asarray(focuspos, dtype=F32), updir
    )


# ---------------------------------------------------------------------------
# Projection matrices (zmath.zig:2143-2205) — D3D [0,1] depth
# ---------------------------------------------------------------------------


def perspective_fov_lh(fovy: float, aspect: float, near: float, far: float) -> np.ndarray:
    assert near > 0.0 and far > 0.0 and far > near
    h = F32(np.cos(F32(0.5 * fovy)) / np.sin(F32(0.5 * fovy)))
    w = F32(h / F32(aspect))
    r = F32(far / (far - near))
    return np.array(
        [[w, 0, 0, 0], [0, h, 0, 0], [0, 0, r, 1], [0, 0, -r * near, 0]], dtype=F32
    )


def perspective_fov_rh(fovy: float, aspect: float, near: float, far: float) -> np.ndarray:
    """Matches zmath.perspectiveFovRh (zmath.zig:2159-2175).

    Row-vector convention: for view-space v = (x, y, z, 1),
    ``clip = v @ M`` gives ``w_clip = -z`` and ``z_ndc in [0, 1]`` with
    z_ndc = 0 at z = -near and 1 at z = -far.
    """
    assert near > 0.0 and far > 0.0 and far > near
    h = F32(np.cos(F32(0.5 * fovy)) / np.sin(F32(0.5 * fovy)))
    w = F32(h / F32(aspect))
    r = F32(far / (near - far))
    return np.array(
        [[w, 0, 0, 0], [0, h, 0, 0], [0, 0, r, -1], [0, 0, r * near, 0]], dtype=F32
    )


def orthographic_lh(w: float, h: float, near: float, far: float) -> np.ndarray:
    r = F32(1.0 / (far - near))
    return np.array(
        [[2.0 / w, 0, 0, 0], [0, 2.0 / h, 0, 0], [0, 0, r, 0], [0, 0, -r * near, 1]],
        dtype=F32,
    )


def orthographic_rh(w: float, h: float, near: float, far: float) -> np.ndarray:
    r = F32(1.0 / (near - far))
    return np.array(
        [[2.0 / w, 0, 0, 0], [0, 2.0 / h, 0, 0], [0, 0, r, 0], [0, 0, r * near, 1]],
        dtype=F32,
    )


def orthographic_off_center_lh(
    left: float, right: float, bottom: float, top: float, near: float, far: float
) -> np.ndarray:
    """Off-center LH ortho with [0,1] depth (row-vector convention)."""
    rw = F32(1.0 / (right - left))
    rh = F32(1.0 / (top - bottom))
    rz = F32(1.0 / (far - near))
    return np.array(
        [
            [2.0 * rw, 0, 0, 0],
            [0, 2.0 * rh, 0, 0],
            [0, 0, rz, 0],
            [-(right + left) * rw, -(top + bottom) * rh, -rz * near, 1],
        ],
        dtype=F32,
    )


# ---------------------------------------------------------------------------
# Quaternions — (x, y, z, w), zmath.zig:2598+, 2449+, 2786+
# ---------------------------------------------------------------------------


def qmul(q0: np.ndarray, q1: np.ndarray) -> np.ndarray:
    """zmath.qmul: Hamilton product q1 * q0 (applies q0's rotation first).

    Verified against the zmath unit test (zmath.zig:2615-2621):
    qmul((2,3,4,1), (3,2,1,4)) == (16, 4, 22, -12).
    """
    ax, ay, az, aw = (F32(v) for v in np.asarray(q1, dtype=F32))
    bx, by, bz, bw = (F32(v) for v in np.asarray(q0, dtype=F32))
    return np.array(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        dtype=F32,
    )


def quat_identity() -> np.ndarray:
    return f32x4(0.0, 0.0, 0.0, 1.0)


def mat_from_quat(q: np.ndarray) -> np.ndarray:
    """Rotation matrix for quaternion q, row-vector convention (v' = v @ M).

    Matches zmath.matFromQuat (zmath.zig:2449-2492) /
    DirectXMath XMMatrixRotationQuaternion.
    """
    x, y, z, w = (F32(v) for v in np.asarray(q, dtype=F32))
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    two = F32(2.0)
    one = F32(1.0)
    return np.array(
        [
            [one - two * (yy + zz), two * (xy + wz), two * (xz - wy), 0.0],
            [two * (xy - wz), one - two * (xx + zz), two * (yz + wx), 0.0],
            [two * (xz + wy), two * (yz - wx), one - two * (xx + yy), 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ],
        dtype=F32,
    )


quat_to_mat = mat_from_quat


def quat_from_mat(m: np.ndarray) -> np.ndarray:
    """Quaternion from a rotation matrix (row-vector convention).

    Inverse of mat_from_quat; matches zmath.quatFromMat / matToQuat
    (zmath.zig:2509-2597) up to sign (q and -q encode the same rotation).
    """
    m = np.asarray(m, dtype=F32)
    t = m[0, 0] + m[1, 1] + m[2, 2]
    if t > 0.0:
        s = np.sqrt(t + 1.0, dtype=F32)
        w = F32(0.5) * s
        s = F32(0.5) / s
        x = (m[1, 2] - m[2, 1]) * s
        y = (m[2, 0] - m[0, 2]) * s
        z = (m[0, 1] - m[1, 0]) * s
    elif m[0, 0] >= m[1, 1] and m[0, 0] >= m[2, 2]:
        s = np.sqrt(F32(1.0) + m[0, 0] - m[1, 1] - m[2, 2], dtype=F32)
        x = F32(0.5) * s
        s = F32(0.5) / s
        y = (m[0, 1] + m[1, 0]) * s
        z = (m[0, 2] + m[2, 0]) * s
        w = (m[1, 2] - m[2, 1]) * s
    elif m[1, 1] > m[2, 2]:
        s = np.sqrt(F32(1.0) + m[1, 1] - m[0, 0] - m[2, 2], dtype=F32)
        y = F32(0.5) * s
        s = F32(0.5) / s
        x = (m[0, 1] + m[1, 0]) * s
        z = (m[1, 2] + m[2, 1]) * s
        w = (m[2, 0] - m[0, 2]) * s
    else:
        s = np.sqrt(F32(1.0) + m[2, 2] - m[0, 0] - m[1, 1], dtype=F32)
        z = F32(0.5) * s
        s = F32(0.5) / s
        x = (m[0, 2] + m[2, 0]) * s
        y = (m[1, 2] + m[2, 1]) * s
        w = (m[0, 1] - m[1, 0]) * s
    return np.array([x, y, z, w], dtype=F32)


mat_to_quat = quat_from_mat


def quat_from_norm_axis_angle(axis, angle: float) -> np.ndarray:
    axis = np.asarray(axis, dtype=F32)
    half = F32(0.5 * angle)
    s, c = F32(np.sin(half)), F32(np.cos(half))
    return np.array([axis[0] * s, axis[1] * s, axis[2] * s, c], dtype=F32)


def quat_from_roll_pitch_yaw(pitch: float, yaw: float, roll: float) -> np.ndarray:
    """Matches zmath.quatFromRollPitchYaw (zmath.zig:2786-2800):
    intrinsic rotations applied in roll(Z) -> pitch(X) -> yaw(Y) order for
    row-vector matrices, i.e. q = qmul(qmul(q_roll, q_pitch), q_yaw)."""
    qx = quat_from_norm_axis_angle((1.0, 0.0, 0.0), pitch)
    qy = quat_from_norm_axis_angle((0.0, 1.0, 0.0), yaw)
    qz = quat_from_norm_axis_angle((0.0, 0.0, 1.0), roll)
    return qmul(qmul(qz, qx), qy)


def quat_to_euler(q: np.ndarray) -> tuple:
    """The converter's quadToEulerAngles (gltf_converter.zig:210-223):
    extracts (x=pitch, y=yaw, z=roll) Tait-Bryan angles."""
    q = np.asarray(q, dtype=F32)
    t0 = F32(2.0) * (q[3] * q[0] + q[1] * q[2])
    t1 = F32(1.0) - F32(2.0) * (q[0] * q[0] + q[1] * q[1])
    x = F32(np.arctan2(t0, t1))
    t2 = F32(2.0) * (q[3] * q[1] - q[2] * q[0])
    t2 = F32(np.clip(t2, -1.0, 1.0))
    y = F32(np.arcsin(t2))
    t3 = F32(2.0) * (q[3] * q[2] + q[0] * q[1])
    t4 = F32(1.0) - F32(2.0) * (q[1] * q[1] + q[2] * q[2])
    z = F32(np.arctan2(t3, t4))
    return x, y, z


def rotate_vec3(q: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Rotate a 3-vector by quaternion q (same convention as mat_from_quat:
    rotate_vec3(q, v) == v @ mat_from_quat(q))."""
    m = mat_from_quat(q)
    v4 = np.array([v[0], v[1], v[2], 0.0], dtype=F32)
    return (v4 @ m).astype(F32)


def trs_matrix(translation_xyz=None, rotation_quat=None, scale_xyz=None) -> np.ndarray:
    """Compose a glTF node transform as a row-vector matrix: v' = v @ S @ R @ T.

    This is the row-vector equivalent of glTF's column-vector M = T*R*S.
    DELIBERATE DEVIATION from the reference converter, which composes
    ``mul(mul(mul(I, T), R), S)`` (= v @ T @ R @ S) and also builds the
    rotation quat with a copy-paste typo (``rotation[2]`` where ``[3]`` is
    meant, gltf_converter.zig:405). Its test scene only uses pure
    translations, so the observed image is identical; see docs/QUIRKS.md
    items 3-4 and SURVEY.md §8.
    """
    m = identity()
    if scale_xyz is not None:
        m = mul(m, scaling_v(scale_xyz))
    if rotation_quat is not None:
        m = mul(m, mat_from_quat(rotation_quat))
    if translation_xyz is not None:
        m = mul(m, translation_v(translation_xyz))
    return m
