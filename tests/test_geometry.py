"""Unit tests for ops.geometry against the reference formulas
(include/utility.h:346-405)."""

import numpy as np
import jax.numpy as jnp

from dr_using_scv_od_tpu.ops import geometry


def ref_polar_angle(x, y):
    # reference getPolarAngle (utility.h:376-387)
    if x == 0 and y == 0:
        return 0.0
    a = np.arctan2(y, x)
    if y < 0:
        a += 2 * np.pi
    return np.degrees(a)


def test_polar_angle_matches_reference(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    got = np.asarray(geometry.polar_angle_deg(jnp.asarray(pts)))
    want = np.array([ref_polar_angle(p[0], p[1]) for p in pts])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
    assert np.all(got >= 0) and np.all(got < 360.0 + 1e-4)


def test_azimuth(rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    got = np.asarray(geometry.azimuth_deg(jnp.asarray(pts)))
    want = np.degrees(np.arctan2(pts[:, 2], np.hypot(pts[:, 0], pts[:, 1])))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_transform_roundtrip(rng):
    xyzrpy = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
    T = geometry.pose_to_matrix(xyzrpy)
    Ti = geometry.inverse_se3(T)
    pts = jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32))
    back = geometry.transform_points(Ti, geometry.transform_points(T, pts))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts),
                               rtol=1e-4, atol=1e-4)


def test_euler_matrix_roundtrip(rng):
    rpy = rng.uniform(-1.2, 1.2, size=(10, 3)).astype(np.float32)
    R = geometry.euler_to_matrix(jnp.asarray(rpy[:, 0]),
                                 jnp.asarray(rpy[:, 1]),
                                 jnp.asarray(rpy[:, 2]))
    back = np.asarray(geometry.matrix_to_euler(R))
    np.testing.assert_allclose(back, rpy, rtol=1e-4, atol=1e-4)


def test_exp_se3_identity():
    T = geometry.exp_se3(jnp.zeros((6,)))
    np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-6)


def test_exp_se3_pure_translation():
    xi = jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])
    T = np.asarray(geometry.exp_se3(xi))
    np.testing.assert_allclose(T[:3, 3], [1, 2, 3], atol=1e-5)
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-5)


def test_exp_so3_rotation():
    w = jnp.array([0.0, 0.0, np.pi / 2])
    R = np.asarray(geometry.exp_so3(w))
    np.testing.assert_allclose(R @ np.array([1, 0, 0]), [0, 1, 0], atol=1e-5)
