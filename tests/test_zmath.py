"""Unit tests for the zmath-analog math layer.

Mirrors the reference's math-layer test density (65 inline `test` blocks in
zrenderer/libs/zmath/zmath.zig — the only unit tests in the reference).
Golden values below are computed from the zmath formulas themselves
(documented at SURVEY.md §2.1 / §7.1 item 7), not copied outputs.
"""

import numpy as np
import pytest

from zrenderer_tpu.math import zmath as zm

F32 = np.float32


def approx(a, b, eps=1e-4):
    return np.allclose(np.asarray(a, np.float64), np.asarray(b, np.float64), atol=eps)


# ---------------------------------------------------------------------------
# construction / load / store
# ---------------------------------------------------------------------------


def test_f32x4():
    v = zm.f32x4(1, 2, 3, 4)
    assert v.dtype == F32 and approx(v, [1, 2, 3, 4])


def test_load_vec3_sets_w():
    v = zm.load_vec3([5.0, 6.0, 7.0, 99.0])
    assert approx(v, [5, 6, 7, 0])
    v = zm.load_vec3([5.0, 6.0, 7.0], w=1.0)
    assert approx(v, [5, 6, 7, 1])


def test_load_store_mat_roundtrip():
    flat = np.arange(16, dtype=F32)
    m = zm.load_mat(flat)
    assert m.shape == (4, 4) and m[1, 2] == 6.0
    assert approx(zm.store_mat(m), flat)


def test_identity():
    assert approx(zm.identity(), np.eye(4))


# ---------------------------------------------------------------------------
# vector ops
# ---------------------------------------------------------------------------


def test_dot3():
    assert zm.dot3(zm.vec3(1, 2, 3), zm.vec3(4, 5, 6)) == pytest.approx(32.0)


def test_cross3():
    c = zm.cross3(zm.vec3(1, 0, 0), zm.vec3(0, 1, 0))
    assert approx(c, [0, 0, 1, 0])


def test_cross3_anticommutes():
    a, b = zm.vec3(1, 2, 3), zm.vec3(-2, 0.5, 4)
    assert approx(zm.cross3(a, b), -zm.cross3(b, a))


def test_normalize3():
    n = zm.normalize3(zm.vec3(3, 0, 4))
    assert approx(n[:3], [0.6, 0, 0.8])
    assert zm.length3(n) == pytest.approx(1.0, abs=1e-6)


# ---------------------------------------------------------------------------
# mul / transpose — golden values from the zmath unit tests' own inputs
# (zmath.zig:2012-2029), recomputed independently
# ---------------------------------------------------------------------------


def test_mat_mul_golden():
    a = np.array(
        [[0.1, 0.2, 0.3, 0.4], [0.5, 0.6, 0.7, 0.8], [0.9, 1.0, 1.1, 1.2], [1.3, 1.4, 1.5, 1.6]],
        dtype=F32,
    )
    b = np.array(
        [[1.7, 1.8, 1.9, 2.0], [2.1, 2.2, 2.3, 2.4], [2.5, 2.6, 2.7, 2.8], [2.9, 3.0, 3.1, 3.2]],
        dtype=F32,
    )
    c = zm.mul(a, b)
    assert approx(c[0], [2.5, 2.6, 2.7, 2.8])
    assert approx(c[1], [6.18, 6.44, 6.7, 6.96])
    assert approx(c[2], [9.86, 10.28, 10.7, 11.12])
    assert approx(c[3], [13.54, 14.12, 14.7, 15.28])


def test_vec_mul_mat_is_row_vector():
    m = zm.translation(10, 20, 30)
    p = zm.mul(zm.f32x4(1, 2, 3, 1), m)
    assert approx(p, [11, 22, 33, 1])


def test_transpose():
    m = np.arange(16, dtype=F32).reshape(4, 4)
    assert approx(zm.transpose(m), m.T)


def test_mul_composes_left_to_right():
    # v @ mul(T, S): translate first, then scale.
    t = zm.translation(1, 0, 0)
    s = zm.scaling(2, 2, 2)
    p = zm.mul(zm.f32x4(1, 0, 0, 1), zm.mul(t, s))
    assert approx(p, [4, 0, 0, 1])


# ---------------------------------------------------------------------------
# affine builders
# ---------------------------------------------------------------------------


def test_translation_layout():
    m = zm.translation(7, 8, 9)
    assert approx(m[3], [7, 8, 9, 1])
    assert approx(m[:3, :3], np.eye(3))


def test_scaling():
    m = zm.scaling(2, 3, 4)
    assert approx(zm.mul(zm.f32x4(1, 1, 1, 1), m), [2, 3, 4, 1])


def test_rotation_x_quarter_turn():
    m = zm.rotation_x(np.pi / 2)
    # Row-vector convention: +Y rotates to +Z about X (RH).
    assert approx(zm.mul(zm.f32x4(0, 1, 0, 0), m), [0, 0, 1, 0], eps=1e-6)


def test_rotation_y_quarter_turn():
    m = zm.rotation_y(np.pi / 2)
    assert approx(zm.mul(zm.f32x4(0, 0, 1, 0), m), [1, 0, 0, 0], eps=1e-6)


def test_rotation_z_quarter_turn():
    m = zm.rotation_z(np.pi / 2)
    assert approx(zm.mul(zm.f32x4(1, 0, 0, 0), m), [0, 1, 0, 0], eps=1e-6)


def test_rotation_matches_quat():
    for angle in [0.3, -1.2, 2.9]:
        q = zm.quat_from_norm_axis_angle((0, 1, 0), angle)
        assert approx(zm.mat_from_quat(q), zm.rotation_y(angle), eps=1e-5)


# ---------------------------------------------------------------------------
# view matrices — golden from zmath.zig:2131-2138
# ---------------------------------------------------------------------------


def test_look_to_lh_golden():
    m = zm.look_to_lh(zm.f32x4(0, 0, -3, 1), zm.f32x4(0, 0, 1, 0), zm.f32x4(0, 1, 0, 0))
    assert approx(m[0], [1, 0, 0, 0], 1e-3)
    assert approx(m[1], [0, 1, 0, 0], 1e-3)
    assert approx(m[2], [0, 0, 1, 0], 1e-3)
    assert approx(m[3], [0, 0, 3, 1], 1e-3)


def test_look_at_rh_camera_looks_down_negative_z():
    # RH camera at origin looking at -Z: view should be identity-ish.
    m = zm.look_at_rh(zm.vec3(0, 0, 0), zm.vec3(0, 0, -1), zm.vec3(0, 1, 0))
    p = zm.mul(zm.f32x4(0, 0, -5, 1), m)
    assert approx(p, [0, 0, -5, 1], 1e-5)


def test_look_at_rh_translates_eye_to_origin():
    eye = zm.vec3(1, 2, 3)
    m = zm.look_at_rh(eye, zm.vec3(1, 2, 0), zm.vec3(0, 1, 0))
    p = zm.mul(zm.f32x4(1, 2, 3, 1), m)
    assert approx(p, [0, 0, 0, 1], 1e-5)


def test_look_at_rh_depth_increases_toward_focus():
    eye = zm.vec3(0, 0, 10)
    m = zm.look_at_rh(eye, zm.vec3(0, 0, 0), zm.vec3(0, 1, 0))
    # A point 4 in front of the camera must land at view z = -4 (RH).
    p = zm.mul(zm.f32x4(0, 0, 6, 1), m)
    assert approx(p, [0, 0, -4, 1], 1e-5)


# ---------------------------------------------------------------------------
# projections — D3D [0,1] depth conventions
# ---------------------------------------------------------------------------


def test_perspective_rh_near_far_mapping():
    m = zm.perspective_fov_rh(0.5, 16 / 9, 0.1, 100.0)
    near_clip = zm.mul(zm.f32x4(0, 0, -0.1, 1), m)
    far_clip = zm.mul(zm.f32x4(0, 0, -100.0, 1), m)
    assert near_clip[2] / near_clip[3] == pytest.approx(0.0, abs=1e-6)
    assert far_clip[2] / far_clip[3] == pytest.approx(1.0, abs=1e-5)


def test_perspective_rh_w_is_minus_viewz():
    m = zm.perspective_fov_rh(0.9, 1.0, 0.5, 50.0)
    clip = zm.mul(zm.f32x4(1, 2, -7, 1), m)
    assert clip[3] == pytest.approx(7.0)


def test_perspective_lh_near_far_mapping():
    m = zm.perspective_fov_lh(0.5, 16 / 9, 0.1, 100.0)
    near_clip = zm.mul(zm.f32x4(0, 0, 0.1, 1), m)
    far_clip = zm.mul(zm.f32x4(0, 0, 100.0, 1), m)
    assert near_clip[2] / near_clip[3] == pytest.approx(0.0, abs=1e-6)
    assert far_clip[2] / far_clip[3] == pytest.approx(1.0, abs=1e-5)


def test_perspective_fov_scaling():
    fovy = 0.8
    m = zm.perspective_fov_rh(fovy, 2.0, 0.1, 10.0)
    h = 1.0 / np.tan(fovy / 2)
    assert m[1, 1] == pytest.approx(h, rel=1e-5)
    assert m[0, 0] == pytest.approx(h / 2.0, rel=1e-5)


def test_orthographic_rh_mapping():
    m = zm.orthographic_rh(4.0, 2.0, 1.0, 11.0)
    p = zm.mul(zm.f32x4(2, 1, -1, 1), m)
    assert approx(p, [1, 1, 0, 1], 1e-5)
    p = zm.mul(zm.f32x4(0, 0, -11, 1), m)
    assert p[2] == pytest.approx(1.0, abs=1e-5)


def test_orthographic_off_center_lh():
    m = zm.orthographic_off_center_lh(0.0, 8.0, 0.0, 4.0, 0.0, 10.0)
    p = zm.mul(zm.f32x4(8, 4, 10, 1), m)
    assert approx(p, [1, 1, 1, 1], 1e-5)
    p = zm.mul(zm.f32x4(0, 0, 0, 1), m)
    assert approx(p, [-1, -1, 0, 1], 1e-5)


# ---------------------------------------------------------------------------
# quaternions
# ---------------------------------------------------------------------------


def test_qmul_golden_zmath():
    # zmath.zig:2615-2621: qmul((2,3,4,1), (3,2,1,4)) == (16, 4, 22, -12)
    q = zm.qmul(zm.f32x4(2, 3, 4, 1), zm.f32x4(3, 2, 1, 4))
    assert approx(q, [16, 4, 22, -12])


def test_qmul_identity():
    q = zm.f32x4(0.1, 0.2, 0.3, 0.925)
    assert approx(zm.qmul(q, zm.quat_identity()), q)
    assert approx(zm.qmul(zm.quat_identity(), q), q)


def test_qmul_order_applies_first_arg_first():
    # qmul(q0, q1) must equal the rotation "q0 then q1":
    # mat_from_quat(qmul(q0,q1)) == mat_from_quat(q0) @ mat_from_quat(q1)
    q0 = zm.quat_from_norm_axis_angle((1, 0, 0), 0.7)
    q1 = zm.quat_from_norm_axis_angle((0, 1, 0), -0.4)
    lhs = zm.mat_from_quat(zm.qmul(q0, q1))
    rhs = zm.mul(zm.mat_from_quat(q0), zm.mat_from_quat(q1))
    assert approx(lhs, rhs, 1e-5)


def test_mat_from_quat_identity():
    assert approx(zm.mat_from_quat(zm.quat_identity()), np.eye(4))


def test_mat_from_quat_axis_angle():
    q = zm.quat_from_norm_axis_angle((1, 0, 0), np.pi / 2)
    v = zm.rotate_vec3(q, (0, 1, 0))
    assert approx(v, [0, 0, 1, 0], 1e-6)


def test_quat_mat_roundtrip():
    rng = np.random.default_rng(7)
    for _ in range(10):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        q = zm.quat_from_norm_axis_angle(axis, rng.uniform(-3, 3))
        q2 = zm.quat_from_mat(zm.mat_from_quat(q))
        if q2[3] * q[3] < 0 or (q[3] == 0 and np.dot(q2[:3], q[:3]) < 0):
            q2 = -q2
        assert approx(q2, q, 1e-4)


def test_quat_from_roll_pitch_yaw_pure_axes():
    assert approx(
        zm.quat_from_roll_pitch_yaw(0.6, 0, 0),
        zm.quat_from_norm_axis_angle((1, 0, 0), 0.6),
        1e-6,
    )
    assert approx(
        zm.quat_from_roll_pitch_yaw(0, 0.6, 0),
        zm.quat_from_norm_axis_angle((0, 1, 0), 0.6),
        1e-6,
    )
    assert approx(
        zm.quat_from_roll_pitch_yaw(0, 0, 0.6),
        zm.quat_from_norm_axis_angle((0, 0, 1), 0.6),
        1e-6,
    )


def test_quat_to_euler_roundtrip_pitch_yaw():
    # The converter extracts pitch/yaw via quadToEulerAngles
    # (gltf_converter.zig:210-223, :287-292).
    for pitch, yaw in [(0.3, -0.8), (-1.1, 0.2), (0.0, 1.4)]:
        q = zm.quat_from_roll_pitch_yaw(pitch, yaw, 0.0)
        x, y, z = zm.quat_to_euler(q)
        assert x == pytest.approx(pitch, abs=1e-5)
        assert y == pytest.approx(yaw, abs=1e-5)
        assert z == pytest.approx(0.0, abs=1e-5)


def test_rotate_vec3_matches_matrix():
    q = zm.quat_from_norm_axis_angle((0, 0, 1), 1.2)
    v = (3.0, -1.0, 0.5)
    assert approx(zm.rotate_vec3(q, v), zm.mul(zm.vec3(*v), zm.mat_from_quat(q)), 1e-5)


# ---------------------------------------------------------------------------
# TRS composition (glTF node transforms)
# ---------------------------------------------------------------------------


def test_trs_translation_only():
    m = zm.trs_matrix(translation_xyz=(1, 2, 3))
    assert approx(m, zm.translation(1, 2, 3))


def test_trs_order_scale_rotate_translate():
    # v @ S @ R @ T: a unit-x point scaled by 2, rotated 90deg about z, then moved.
    q = zm.quat_from_norm_axis_angle((0, 0, 1), np.pi / 2)
    m = zm.trs_matrix(translation_xyz=(10, 0, 0), rotation_quat=q, scale_xyz=(2, 2, 2))
    p = zm.mul(zm.f32x4(1, 0, 0, 1), m)
    assert approx(p, [10, 2, 0, 1], 1e-5)


def test_trs_matches_gltf_column_major_composition():
    # Column-vector glTF: M = T*R*S acting on columns; ours must be its transpose.
    rng = np.random.default_rng(3)
    t = rng.normal(size=3)
    s = rng.uniform(0.5, 2.0, size=3)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    q = zm.quat_from_norm_axis_angle(axis, 0.9)

    ours = zm.trs_matrix(t, q, s)

    T = np.eye(4)
    T[:3, 3] = t
    R = np.eye(4)
    R[:3, :3] = zm.mat_from_quat(q)[:3, :3].T  # column-vector rotation
    S = np.diag([s[0], s[1], s[2], 1.0])
    gltf_col = T @ R @ S
    assert approx(ours, gltf_col.T, 1e-5)


def test_camera_forward_from_gltf_quats():
    # glTF cameras look down -Z; the test scene's camera combines a parent
    # rotation with the Blender child orientation (test.gltf nodes 2-3).
    # 75deg up about X then -90deg about X = -15deg: forward tilts downward.
    q_parent = zm.f32x4(0.6087614297866821, 0, 0, 0.7933533191680908)
    q_child = zm.f32x4(-0.7071067690849304, 0, 0, 0.7071067690849304)
    q = zm.qmul(q_child, q_parent)  # child applied first, then parent
    fwd = zm.rotate_vec3(q, (0, 0, -1))
    assert fwd[2] < 0  # still looking forward (-Z-ish)
    assert fwd[1] < 0  # pitched down toward the scene
    assert abs(fwd[0]) < 1e-5


# ---------------------------------------------------------------------------
# extended coverage (matching the reference's 65-test zmath density)
# ---------------------------------------------------------------------------


def test_vec3_and_splat():
    assert approx(zm.vec3(1, 2, 3), [1, 2, 3, 0])
    assert approx(zm.splat(2.5), [2.5] * 4)


def test_length3():
    assert zm.length3(zm.vec3(2, 3, 6)) == pytest.approx(7.0)


def test_normalize3_divides_w_like_zmath():
    # zmath's normalize3 divides the whole register by the 3-length.
    v = zm.f32x4(3, 0, 4, 10)
    n = zm.normalize3(v)
    assert n[3] == pytest.approx(2.0)


def test_translation_v_and_scaling_v():
    assert approx(zm.translation_v((1, 2, 3)), zm.translation(1, 2, 3))
    assert approx(zm.scaling_v((2, 3, 4)), zm.scaling(2, 3, 4))


def test_store_mat_roundtrip():
    m = zm.translation(5, 6, 7)
    assert approx(zm.load_mat(zm.store_mat(m)), m)


def test_rotation_composition_matches_quat_composition():
    rx, ry = 0.4, -0.9
    m = zm.mul(zm.rotation_x(rx), zm.rotation_y(ry))
    q = zm.qmul(
        zm.quat_from_norm_axis_angle((1, 0, 0), rx),
        zm.quat_from_norm_axis_angle((0, 1, 0), ry),
    )
    assert approx(m, zm.mat_from_quat(q), 1e-5)


def test_look_to_rh_negates_direction():
    eye = zm.vec3(1, 2, 3)
    d = zm.vec3(0, 0, -1)
    assert approx(zm.look_to_rh(eye, d, zm.vec3(0, 1, 0)),
                  zm.look_to_lh(eye, -d, zm.vec3(0, 1, 0)))


def test_look_at_lh_looks_down_positive_z():
    m = zm.look_at_lh(zm.vec3(0, 0, -5), zm.vec3(0, 0, 0), zm.vec3(0, 1, 0))
    p = zm.mul(zm.f32x4(0, 0, 0, 1), m)
    assert approx(p, [0, 0, 5, 1], 1e-5)


def test_orthographic_lh_mapping():
    m = zm.orthographic_lh(4.0, 2.0, 1.0, 11.0)
    p = zm.mul(zm.f32x4(2, 1, 1, 1), m)
    assert approx(p, [1, 1, 0, 1], 1e-5)
    p = zm.mul(zm.f32x4(0, 0, 11, 1), m)
    assert p[2] == pytest.approx(1.0, abs=1e-5)


def test_perspective_lh_rh_mirror():
    # LH and RH projections agree for mirrored view-space z.
    lh = zm.perspective_fov_lh(0.7, 1.5, 0.2, 20.0)
    rh = zm.perspective_fov_rh(0.7, 1.5, 0.2, 20.0)
    p_lh = zm.mul(zm.f32x4(1, 1, 5, 1), lh)
    p_rh = zm.mul(zm.f32x4(1, 1, -5, 1), rh)
    assert approx(p_lh[:3] / p_lh[3], p_rh[:3] / p_rh[3], 1e-5)


def test_quat_identity_matrix():
    assert approx(zm.mat_from_quat(zm.quat_identity()), np.eye(4))


def test_quat_from_mat_negative_trace_branches():
    # Rotations near 180 deg about each axis exercise the non-trace branches.
    for axis in [(1, 0, 0), (0, 1, 0), (0, 0, 1)]:
        q = zm.quat_from_norm_axis_angle(axis, 3.1)
        m = zm.mat_from_quat(q)
        q2 = zm.quat_from_mat(m)
        assert approx(zm.mat_from_quat(q2), m, 1e-4)


def test_qmul_is_associative():
    q1 = zm.quat_from_norm_axis_angle((1, 0, 0), 0.3)
    q2 = zm.quat_from_norm_axis_angle((0, 1, 0), 0.5)
    q3 = zm.quat_from_norm_axis_angle((0, 0, 1), -0.7)
    a = zm.qmul(zm.qmul(q1, q2), q3)
    b = zm.qmul(q1, zm.qmul(q2, q3))
    assert approx(a, b, 1e-5)


def test_quat_norm_preserved_by_qmul():
    q1 = zm.quat_from_norm_axis_angle((0.6, 0.8, 0), 1.1)
    q2 = zm.quat_from_norm_axis_angle((0, 0.6, 0.8), -0.4)
    q = zm.qmul(q1, q2)
    assert np.linalg.norm(q) == pytest.approx(1.0, abs=1e-5)


def test_quat_to_euler_roll():
    q = zm.quat_from_roll_pitch_yaw(0.0, 0.0, 0.9)
    x, y, z = zm.quat_to_euler(q)
    assert z == pytest.approx(0.9, abs=1e-5)
    assert x == pytest.approx(0.0, abs=1e-5)


def test_trs_identity_when_empty():
    assert approx(zm.trs_matrix(), np.eye(4))


def test_trs_scale_only():
    m = zm.trs_matrix(scale_xyz=(2, 3, 4))
    assert approx(m, zm.scaling(2, 3, 4))


def test_rotation_matrices_are_orthonormal():
    for builder in (zm.rotation_x, zm.rotation_y, zm.rotation_z):
        m = builder(0.77)[:3, :3]
        assert approx(m @ m.T, np.eye(3), 1e-6)
        assert np.linalg.det(m) == pytest.approx(1.0, abs=1e-6)


def test_look_at_rh_basis_is_orthonormal():
    m = zm.look_at_rh(zm.vec3(3, 4, 5), zm.vec3(0, 1, 0), zm.vec3(0, 1, 0))
    r = m[:3, :3]
    assert approx(r @ r.T, np.eye(3), 1e-5)


def test_perspective_preserves_x_y_sign():
    m = zm.perspective_fov_rh(1.0, 1.0, 0.1, 10.0)
    p = zm.mul(zm.f32x4(1, 1, -2, 1), m)
    ndc = p[:3] / p[3]
    assert ndc[0] > 0 and ndc[1] > 0


def test_mul_scalar_matrix():
    m = zm.translation(1, 2, 3)
    doubled = np.asarray(m, np.float32) * np.float32(2.0)
    assert approx(doubled[3], [2, 4, 6, 2])


def test_rotate_vec3_preserves_length():
    q = zm.quat_from_norm_axis_angle((0.48, 0.6, 0.64), 2.2)
    v = zm.rotate_vec3(q, (3, -4, 12))
    assert np.linalg.norm(v[:3]) == pytest.approx(13.0, abs=1e-4)


def test_camera_view_proj_composition_is_row_vector():
    # The full reference draw() composition (zrenderer.zig:261-272):
    # world point -> view -> clip via v @ view @ proj.
    from zrenderer_tpu.ops.geometry import view_proj_from_camera
    from zrenderer_tpu.scene.scene import Camera

    cam = Camera(position=np.array([0, 0, 10], np.float32),
                 forward=np.array([0, 0, -1], np.float32),
                 yfov=0.8, znear=0.1, zfar=100.0)
    vp = view_proj_from_camera(cam, 100, 100)
    clip = zm.f32x4(0, 0, 0, 1) @ vp
    assert clip[3] == pytest.approx(10.0, abs=1e-4)  # w = -z_view
    assert abs(clip[0]) < 1e-4 and abs(clip[1]) < 1e-4  # centered
