"""Tests for the full-breadth zmath API (the part of the library beyond the
renderer-used subset covered by test_zmath.py).

Test vectors mirror the reference's inline ``test "zmath.*"`` blocks
(zrenderer/libs/zmath/zmath.zig) wherever those publish expected values —
determinant 2939.0 (zmath.zig:2225-2243), the mod table (:1286-1301), the
atan2 special-case table (:1656-1756), the slerp fixture (:2779-2784), the
min/max NaN semantics (:698-778) — plus sweeps against NumPy's
transcendentals at the same epsilon the zmath tests use (0.0001).
"""

import numpy as np
import pytest

from zrenderer_tpu.math import zmath as zm

INF = np.float32(np.inf)
NAN = np.float32(np.nan)
PI = np.pi
EPS = 1e-4


def approx(a, b, eps=EPS):
    assert zm.approx_eq_abs(a, b, eps), (a, b)


# ---------------------------------------------------------------------------
# Constructors / predicates / bit ops
# ---------------------------------------------------------------------------


def test_wide_constructors():
    assert zm.f32x8(*range(8)).shape == (8,)
    assert zm.f32x16(*range(16)).shape == (16,)
    assert np.all(zm.f32x4s(2.5) == 2.5)
    assert np.all(zm.f32x8s(-1.0) == -1.0)
    assert zm.f32x16s(0.0).shape == (16,)
    assert zm.u32x4(1, 2, 3, 4).dtype == np.uint32
    assert zm.boolx4(True, False, True, False).tolist() == [True, False, True, False]


def test_vec3_to_array():
    assert zm.vec3_to_array(zm.f32x4(1, 2, 3, 4)).tolist() == [1, 2, 3]


def test_all_any():
    m = np.array([True, True, False, True])
    assert not zm.all_true(m)
    assert zm.any_true(m)
    assert zm.all_true(m, 2)  # only first two lanes
    assert not zm.any_true(np.array([False, False, True]), 2)


def test_is_near_equal_nan_inf():
    v0 = zm.f32x4(1.0, 2.0, -3.0, 4.001)
    v1 = zm.f32x4(1.0, 2.1, -3.0, 4.0)
    assert zm.is_near_equal(v0, v1, 0.01).tolist() == [True, False, True, True]
    assert zm.is_nan(zm.f32x4(1, NAN, 3, NAN)).tolist() == [False, True, False, True]
    assert zm.is_inf(zm.f32x4(1, INF, -INF, NAN)).tolist() == [False, True, True, False]


def test_is_in_bounds():
    v = zm.f32x4(0.5, -2.0, -1.0, 1.9)
    b = zm.f32x4(1.0, 1.0, 1.0, 2.0)
    assert zm.is_in_bounds(v, b).tolist() == [True, False, True, True]


def test_bitwise_ops():
    # Mirrors test "zmath.xorInt" (zmath.zig:632-651).
    ones = np.array([0xFFFFFFFF], dtype=np.uint32).view(np.float32)[0]
    v0 = zm.f32x4(1.0, ones, 0, 0)
    v1 = zm.f32x4(1.0, 0, 0, 0)
    v = zm.xor_int(v0, v1)
    assert v[0] == 0.0
    assert v[1].view(np.uint32) if hasattr(v[1], "view") else True
    assert np.array([v[1]], dtype=np.float32).view(np.uint32)[0] == 0xFFFFFFFF
    # andInt keeps only shared bits: x & x == x, x & 0 == 0.
    a = zm.and_int(v0, v0)
    assert a[0] == 1.0 and a[2] == 0.0
    # andNotInt(v0, v1) = ~v0 & v1: masking 1.0 by itself clears it.
    n = zm.and_not_int(v1, v1)
    assert n[0] == 0.0
    o = zm.or_int(zm.f32x4(0, 0, 0, 0), v1)
    assert o[0] == 1.0
    nor = zm.nor_int(zm.f32x4(0, 0, 0, 0), zm.f32x4(0, 0, 0, 0))
    assert np.array([nor[0]], dtype=np.float32).view(np.uint32)[0] == 0xFFFFFFFF


# ---------------------------------------------------------------------------
# min/max family — NaN/inf semantics from the zmath tests
# ---------------------------------------------------------------------------


def test_min_max_basic():
    v0 = zm.f32x4(1.0, 3.0, 2.0, 7.0)
    v1 = zm.f32x4(2.0, 1.0, 4.0, INF)
    approx(zm.vmin(v0, v1), zm.f32x4(1.0, 1.0, 2.0, 7.0), 0.0)
    approx(zm.vmax(v0, v1), zm.f32x4(2.0, 3.0, 4.0, INF), 0.0)
    approx(zm.min_fast(v0, v1), zm.f32x4(1.0, 1.0, 2.0, 7.0), 0.0)
    approx(zm.max_fast(v0, v1), zm.f32x4(2.0, 3.0, 4.0, INF), 0.0)


def test_min_max_nan():
    # zmath.min test (zmath.zig:698-738): NaN loses to a real number.
    v0 = zm.f32x4(1.0, NAN, 5.0, NAN)
    v1 = zm.f32x4(2.0, 1.0, 4.0, INF)
    v = zm.vmin(v0, v1)
    assert v[0] == 1.0 and v[1] == 1.0 and v[2] == 4.0 and v[3] == INF
    v = zm.vmax(v0, v1)
    assert v[0] == 2.0 and v[1] == 1.0 and v[2] == 5.0 and v[3] == INF
    # Both NaN -> NaN; inf mixes.
    v0 = zm.f32x4(-INF, INF, INF, NAN)
    v1 = zm.f32x4(NAN, -INF, NAN, NAN)
    v = zm.vmin(v0, v1)
    assert v[0] == -INF and v[1] == -INF and v[2] == INF and np.isnan(v[3])


def test_clamp_saturate():
    v = zm.clamp(zm.f32x4(-1.0, 0.2, 1.1, -0.3), zm.f32x4s(-0.5), zm.f32x4s(0.5))
    approx(v, zm.f32x4(-0.5, 0.2, 0.5, -0.3))
    v = zm.saturate(zm.f32x4(-INF, INF, NAN, 0.4))
    assert v[0] == 0.0 and v[1] == 1.0 and v[2] == 0.0 and abs(v[3] - 0.4) < EPS
    v = zm.clamp_fast(zm.f32x4(-1.0, 0.2, 1.1, -0.3), zm.f32x4s(-0.5), zm.f32x4s(0.5))
    approx(v, zm.f32x4(-0.5, 0.2, 0.5, -0.3))
    v = zm.saturate_fast(zm.f32x4(-1.0, 0.2, 1.1, -0.3))
    approx(v, zm.f32x4(0.0, 0.2, 1.0, 0.0))


# ---------------------------------------------------------------------------
# Rounding / lanewise misc
# ---------------------------------------------------------------------------


def test_round_half_even():
    # zmath.round F32x16 fixture (round-half-to-even at .5).
    v = zm.vround(
        zm.f32x16(1.1, -1.1, -1.5, 1.5, 2.1, 2.8, 2.9, 4.1,
                  5.8, 6.1, 7.9, 8.9, 10.1, 11.2, 12.7, 13.1)
    )
    expected = zm.f32x16(1, -1, -2, 2, 2, 3, 3, 4, 6, 6, 8, 9, 10, 11, 13, 13)
    approx(v, expected, 0.0)


def test_trunc_floor_ceil():
    v = zm.f32x4(1.6, -1.6, 2.5, -2.5)
    approx(zm.trunc(v), zm.f32x4(1, -1, 2, -2), 0.0)
    approx(zm.floor(v), zm.f32x4(1, -2, 2, -3), 0.0)
    approx(zm.ceil(v), zm.f32x4(2, -1, 3, -2), 0.0)


def test_sqrt_abs_select_lerp_swizzle():
    approx(zm.vsqrt(zm.f32x4(4.0, 9.0, 1.0, 0.25)), zm.f32x4(2, 3, 1, 0.5))
    approx(zm.vabs(zm.f32x4(-1, 2, -3, 0)), zm.f32x4(1, 2, 3, 0), 0.0)
    sel = zm.select([True, False, True, False], zm.f32x4s(1.0), zm.f32x4s(2.0))
    approx(sel, zm.f32x4(1, 2, 1, 2), 0.0)
    approx(zm.lerp(zm.f32x4s(0.0), zm.f32x4s(10.0), 0.25), zm.f32x4s(2.5))
    approx(
        zm.lerp_v(zm.f32x4s(0.0), zm.f32x4s(10.0), zm.f32x4(0, 0.5, 1, 0.1)),
        zm.f32x4(0, 5, 10, 1),
    )
    approx(
        zm.swizzle(zm.f32x4(1, 2, 3, 4), "w", "z", "y", "x"),
        zm.f32x4(4, 3, 2, 1), 0.0,
    )


def test_mod():
    # zmath.mod table (zmath.zig:1286-1301).
    approx(zm.mod(zm.f32x4s(3.1), zm.f32x4s(1.7)), zm.f32x4s(1.4), 0.0005)
    approx(zm.mod(zm.f32x4s(-3.0), zm.f32x4s(2.0)), zm.f32x4s(-1.0), 0.0005)
    approx(zm.mod(zm.f32x4s(-3.0), zm.f32x4s(-2.0)), zm.f32x4s(-1.0), 0.0005)
    approx(zm.mod(zm.f32x4s(3.0), zm.f32x4s(-2.0)), zm.f32x4s(1.0), 0.0005)
    with np.errstate(invalid="ignore"):
        assert np.all(zm.is_nan(zm.mod(zm.f32x4s(INF), zm.f32x4s(1.0))))
        assert np.all(zm.is_nan(zm.mod(zm.f32x4s(NAN), zm.f32x4s(123.456))))
        assert np.all(zm.is_nan(zm.mod(zm.f32x4s(123.456), zm.f32x4s(INF))))


def test_mod_angle():
    # Wraps into [-pi, pi].
    sweep = np.linspace(-100.0, 100.0, 1001, dtype=np.float32)
    w = zm.mod_angle(sweep)
    assert np.all(np.abs(w) <= np.pi + 1e-5)
    # Equivalent angle: sin/cos agree with the unwrapped input.
    np.testing.assert_allclose(np.sin(w), np.sin(sweep), atol=1e-4)


def test_mul_add():
    approx(zm.mul_add(zm.f32x4s(2.0), zm.f32x4s(3.0), zm.f32x4s(1.0)), zm.f32x4s(7.0))


# ---------------------------------------------------------------------------
# Transcendentals — sweeps at the zmath test epsilon
# ---------------------------------------------------------------------------


def test_sin_cos_sweep():
    # Mirrors the zmath sweep: f = -100 growing by 0.12345*i for 100 steps.
    f, vals = -100.0, []
    for i in range(100):
        vals.append(f)
        f += 0.12345 * i
    v = np.array(vals, dtype=np.float32)
    np.testing.assert_allclose(zm.sin(v), np.sin(v), atol=EPS)
    np.testing.assert_allclose(zm.cos(v), np.cos(v), atol=EPS)
    s, c = zm.sincos(v)
    np.testing.assert_allclose(s, np.sin(v), atol=EPS)
    np.testing.assert_allclose(c, np.cos(v), atol=EPS)


def test_asin_acos_sweep():
    v = np.linspace(-1.0, 1.0, 201, dtype=np.float32)
    np.testing.assert_allclose(zm.asin(v), np.arcsin(v), atol=EPS)
    np.testing.assert_allclose(zm.acos(v), np.arccos(v), atol=EPS)


def test_atan_sweep():
    v = np.array(
        [-0.25, 0.5, -1.0, 0.0, 0.1, -0.2, 30.0, 400.0,
         1.25, 100.0, -200.0, 300.0, -0.05, -0.125, 0.0625, 4000.0],
        dtype=np.float32,
    )
    np.testing.assert_allclose(zm.atan(v), np.arctan(v), atol=EPS)


def test_atan2_special_cases():
    # The DirectXMath table (zmath.zig:1656-1668 + test :1690-1754).
    approx(zm.atan2(1.0, -1.0), np.arctan(-1.0) + PI)
    approx(zm.atan2(-10.0, -2.0), np.arctan(5.0) - PI)
    approx(zm.atan2(INF, 2.0), 0.5 * PI)
    approx(zm.atan2(-INF, 2.0), -0.5 * PI)
    approx(zm.atan2(INF, -INF), 0.75 * PI)
    approx(zm.atan2(-INF, -INF), -0.75 * PI)
    approx(zm.atan2(INF, INF), 0.25 * PI)
    approx(zm.atan2(-INF, INF), -0.25 * PI)
    y = zm.f32x8(0.0, -INF, -0.0, 2.0, INF, INF, 1.0, -INF)
    x = zm.f32x8(-2.0, INF, 1.0, 0.0, 10.0, -INF, 1.0, -INF)
    expected = zm.f32x8(
        PI, -0.25 * PI, -0.0, 0.5 * PI, 0.5 * PI, 0.75 * PI,
        np.arctan(1.0), -0.75 * PI,
    )
    approx(zm.atan2(y, x), expected)


def test_atan2_vs_numpy_grid():
    y = np.linspace(-3, 3, 25, dtype=np.float32)
    x = np.linspace(-3, 3, 25, dtype=np.float32)
    yy, xx = np.meshgrid(y, x)
    got = zm.atan2(yy.ravel(), xx.ravel())
    np.testing.assert_allclose(got, np.arctan2(yy.ravel(), xx.ravel()), atol=EPS)


# ---------------------------------------------------------------------------
# Vector breadth
# ---------------------------------------------------------------------------


def test_dot_length_normalize():
    a = zm.f32x4(1.0, 2.0, 3.0, 4.0)
    b = zm.f32x4(5.0, 6.0, 7.0, 8.0)
    approx(zm.dot2(a, b), 17.0)
    approx(zm.dot4(a, b), 70.0)
    approx(zm.length_sq2(a), 5.0)
    approx(zm.length_sq3(a), 14.0)
    approx(zm.length_sq4(a), 30.0)
    approx(zm.length2(a), np.sqrt(5.0))
    approx(zm.length4(a), np.sqrt(30.0))
    n2 = zm.normalize2(zm.f32x4(3.0, 4.0, 0.0, 0.0))
    approx(zm.length2(n2), 1.0)
    n4 = zm.normalize4(a)
    approx(zm.length4(n4), 1.0)


def test_line_point_distance():
    # zmath fixture: line (-1,-2,-3) -> (1,2,3), point (1,1,1).
    d = zm.line_point_distance(
        zm.f32x4(-1, -2, -3, 1), zm.f32x4(1, 2, 3, 1), zm.f32x4(1, 1, 1, 1)
    )
    # Reference value computed independently (f64 cross-product formula).
    p0, p1, p = (np.array(v, dtype=np.float64) for v in
                 ([-1, -2, -3], [1, 2, 3], [1, 1, 1]))
    expected = np.linalg.norm(np.cross(p - p0, p1 - p0)) / np.linalg.norm(p1 - p0)
    approx(d, expected)


# ---------------------------------------------------------------------------
# Matrix breadth
# ---------------------------------------------------------------------------

M_FIXTURE = np.array(
    [
        [10.0, -9.0, -12.0, 1.0],
        [7.0, -12.0, 11.0, 1.0],
        [-10.0, 10.0, 3.0, 1.0],
        [1.0, 2.0, 3.0, 4.0],
    ],
    dtype=np.float32,
)


def test_determinant():
    # zmath.matrix.determinant fixture -> 2939.0 (zmath.zig:2225-2243).
    approx(zm.determinant(M_FIXTURE), 2939.0)
    approx(zm.determinant(zm.identity()), 1.0)


def test_inverse_roundtrip():
    inv = zm.inverse(M_FIXTURE)
    approx(zm.mul(M_FIXTURE, inv), zm.identity(), 1e-4)
    inv2, det = zm.inverse_det(M_FIXTURE, return_det=True)
    approx(det, 2939.0)
    np.testing.assert_array_equal(inv, inv2)


def test_inverse_singular_is_zero():
    singular = np.zeros((4, 4), dtype=np.float32)
    singular[0, 0] = 1.0
    assert np.all(zm.inverse(singular) == 0.0)


def test_mat_from_axis_angle_matches_euler_rotations():
    # zmath.matrix.matFromAxisAngle test triplet.
    approx(zm.mat_from_axis_angle(zm.f32x4(1, 0, 0, 0), PI * 0.25),
           zm.rotation_x(PI * 0.25))
    approx(zm.mat_from_axis_angle(zm.f32x4(0, 1, 0, 0), PI * 0.125),
           zm.rotation_y(PI * 0.125))
    approx(zm.mat_from_axis_angle(zm.f32x4(0, 0, 1, 0), PI * 0.333),
           zm.rotation_z(PI * 0.333))
    # Unnormalized axis is normalized first.
    approx(zm.mat_from_axis_angle(zm.f32x4(2, 0, 0, 0), 0.5),
           zm.rotation_x(0.5))


def test_mat_from_roll_pitch_yaw():
    # zmath.quatFromRollPitchYawV test: matFromRollPitchYaw ==
    # mul(Rz(roll), mul(Rx(pitch), Ry(yaw))).
    p, y, r = 0.1 * PI, 0.2 * PI, 0.3 * PI
    expected = zm.mul(zm.rotation_z(r), zm.mul(zm.rotation_x(p), zm.rotation_y(y)))
    approx(zm.mat_from_roll_pitch_yaw(p, y, r), expected)
    approx(zm.mat_from_roll_pitch_yaw_v(zm.f32x4(p, y, r, 0)), expected)
    # Consistency with the quaternion path.
    approx(zm.mat_from_quat(zm.quat_from_roll_pitch_yaw(p, y, r)), expected, 1e-3)


def test_mat43_34_io():
    m = zm.mul(zm.rotation_y(0.3), zm.translation(1, 2, 3))
    a43 = zm.store_mat43(m)
    assert a43.shape == (12,)
    approx(zm.load_mat43(a43), m)  # w column of a TRS matrix is 0,0,0,1
    a34 = zm.store_mat34(m)
    back = zm.load_mat34(a34)
    approx(back[:3], m[:3])
    approx(back[3], zm.f32x4(0, 0, 0, 1), 0.0)
    assert zm.mat43_to_array(m).shape == (12,)
    assert zm.mat34_to_array(m).shape == (12,)
    assert zm.mat_to_array(m).shape == (16,)


# ---------------------------------------------------------------------------
# Quaternion breadth
# ---------------------------------------------------------------------------


def test_conjugate_inverse_quat():
    # zmath.quaternion.inverseQuat fixture: inverse((2,3,4,1)) ==
    # (-1/15, -1/10, -2/15, 1/30).
    approx(
        zm.inverse(zm.f32x4(2.0, 3.0, 4.0, 1.0)),
        zm.f32x4(-1.0 / 15.0, -1.0 / 10.0, -2.0 / 15.0, 1.0 / 30.0),
    )
    q = zm.quat_from_norm_axis_angle((0.0, 1.0, 0.0), 0.7)
    qc = zm.conjugate(q)
    approx(zm.qmul(q, qc), zm.quat_identity(), 1e-6)
    assert np.all(zm.inverse_quat(zm.f32x4(0, 0, 0, 0)) == 0.0)


def test_quat_to_axis_angle():
    q0 = zm.quat_from_norm_axis_angle((1.0, 0.0, 0.0), 0.25 * PI)
    axis, angle = zm.quat_to_axis_angle(q0)
    approx(angle, 0.25 * PI)
    approx(axis[0], np.sin(0.125 * PI))


def test_quat_from_axis_angle_normalizes():
    q0 = zm.quat_from_axis_angle(zm.f32x4(2.0, 0.0, 0.0, 0.0), 0.25 * PI)
    q1 = zm.quat_from_norm_axis_angle((1.0, 0.0, 0.0), 0.25 * PI)
    approx(q0, q1)


def test_slerp():
    # zmath.quaternion.slerp fixture (zmath.zig:2779-2784).
    res = zm.slerp(zm.f32x4(0, 0, 0, 1), zm.f32x4(0.5, 0.5, -0.5, 0.5), 0.5)
    approx(res, zm.f32x4(0.28867513, 0.28867513, -0.28867513, 0.86602540))
    # Endpoints.
    q0 = zm.quat_from_norm_axis_angle((0, 1, 0), 0.3)
    q1 = zm.quat_from_norm_axis_angle((0, 1, 0), 1.1)
    approx(zm.slerp(q0, q1, 0.0), q0, 1e-6)
    approx(zm.slerp(q0, q1, 1.0), q1, 1e-6)
    # Geodesic property for same-axis quats: t=0.5 is the mid angle.
    approx(zm.slerp(q0, q1, 0.5), zm.quat_from_norm_axis_angle((0, 1, 0), 0.7), 1e-5)
    # Near-parallel falls back to lerp without NaN.
    q2 = zm.quat_from_norm_axis_angle((0, 1, 0), 0.3 + 1e-7)
    assert not np.any(np.isnan(zm.slerp(q0, q2, 0.5)))
    # slerpV lane variant.
    approx(zm.slerp_v(q0, q1, zm.f32x4s(0.5)), zm.slerp(q0, q1, 0.5), 0.0)
    # Opposite-sign hemisphere handling: slerp against the negated target
    # still travels the shortest arc and lands on the same rotation as q1.
    approx(zm.slerp(q0, -q1, 1.0), q1, 1e-5)


# ---------------------------------------------------------------------------
# Complex SoA + FFT
# ---------------------------------------------------------------------------


def test_cmul_soa():
    re, im = zm.cmul_soa(
        zm.f32x4(1, 2, 3, 4), zm.f32x4(5, 6, 7, 8),
        zm.f32x4(9, 10, 11, 12), zm.f32x4(13, 14, 15, 16),
    )
    a = np.array([1, 2, 3, 4]) + 1j * np.array([5, 6, 7, 8])
    b = np.array([9, 10, 11, 12]) + 1j * np.array([13, 14, 15, 16])
    c = a * b
    np.testing.assert_allclose(re, c.real, atol=1e-4)
    np.testing.assert_allclose(im, c.imag, atol=1e-4)


@pytest.mark.parametrize("n", [4, 8, 16, 64, 256, 512])
def test_fft_matches_numpy(n):
    rng = np.random.default_rng(42 + n)
    re = rng.standard_normal(n).astype(np.float32)
    im = rng.standard_normal(n).astype(np.float32)
    table = zm.fft_init_unity_table(n)
    fr, fi = zm.fft(re, im, table)
    expected = np.fft.fft(re + 1j * im)
    scale = max(1.0, float(np.abs(expected).max()))
    np.testing.assert_allclose(fr / scale, expected.real / scale, atol=2e-4)
    np.testing.assert_allclose(fi / scale, expected.imag / scale, atol=2e-4)


@pytest.mark.parametrize("n", [4, 16, 64, 512])
def test_ifft_roundtrip(n):
    # Mirrors test "zmath.ifft": fft then ifft returns the input.
    rng = np.random.default_rng(7 + n)
    re = rng.standard_normal(n).astype(np.float32)
    im = rng.standard_normal(n).astype(np.float32)
    table = zm.fft_init_unity_table(n)
    fr, fi = zm.fft(re, im, table)
    rr, ri = zm.ifft(fr, fi, table)
    np.testing.assert_allclose(rr, re, atol=1e-4)
    np.testing.assert_allclose(ri, im, atol=1e-4)


def test_splat_int():
    v = zm.splat_int(zm.f32x4s(0.0), 0x3F800000)  # bit pattern of 1.0f
    assert np.all(v == 1.0)


def test_approx_eq_abs_nan_pairs():
    assert zm.approx_eq_abs(zm.f32x4(1, NAN, 3, 4), zm.f32x4(1, NAN, 3, 4), 0.0)
    assert not zm.approx_eq_abs(zm.f32x4(1, NAN, 3, 4), zm.f32x4(1, 2, 3, 4), 0.0)
