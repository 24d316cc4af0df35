"""Batched 3x3 eigendecomposition and plane fits vs numpy.linalg."""

import numpy as np
import jax.numpy as jnp

from dr_using_scv_od_tpu.ops import plane


def test_eigh3x3_random(rng):
    B = 200
    X = rng.normal(size=(B, 3, 3)).astype(np.float32)
    A = X @ np.transpose(X, (0, 2, 1)) + 1e-3 * np.eye(3)
    evals, evecs = plane.eigh3x3(jnp.asarray(A))
    evals, evecs = np.asarray(evals), np.asarray(evecs)
    want = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(evals, want, rtol=2e-3, atol=2e-3)
    # eigenvector residual ||A v - lambda v||
    for k in range(3):
        res = np.einsum('bij,bj->bi', A, evecs[:, :, k]) \
            - evals[:, k:k+1] * evecs[:, :, k]
        assert np.max(np.linalg.norm(res, axis=1)) < 5e-2


def test_eigh3x3_degenerate():
    A = np.stack([np.eye(3), np.diag([2.0, 2.0, 5.0]), np.zeros((3, 3))])
    evals, evecs = plane.eigh3x3(jnp.asarray(A.astype(np.float32)))
    evals = np.asarray(evals)
    np.testing.assert_allclose(evals[0], [1, 1, 1], atol=1e-5)
    np.testing.assert_allclose(evals[1], [2, 2, 5], atol=1e-5)
    np.testing.assert_allclose(evals[2], [0, 0, 0], atol=1e-5)
    # vectors stay finite and unit-norm even in degenerate cases
    norms = np.linalg.norm(np.asarray(evecs), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_fit_plane_ground(rng):
    K = 256
    xy = rng.uniform(-5, 5, size=(K, 2))
    z = 0.02 * rng.normal(size=K) - 1.7
    pts = np.stack([xy[:, 0], xy[:, 1], z], axis=1).astype(np.float32)
    mask = np.ones(K, bool)
    mask[200:] = False
    n, mean, evals, npts = plane.fit_plane(jnp.asarray(pts)[None],
                                           jnp.asarray(mask)[None])
    n = np.asarray(n)[0]
    assert n[2] > 0.99  # canonicalized upward normal
    assert abs(float(mean[0, 2]) + 1.7) < 0.05
    assert int(npts[0]) == 200


def test_fit_plane_tilted(rng):
    # plane with known normal
    true_n = np.array([0.3, -0.2, 0.9])
    true_n /= np.linalg.norm(true_n)
    K = 128
    u = rng.normal(size=(K, 3))
    u -= np.outer(u @ true_n, true_n)  # project into plane
    pts = (u + 0.001 * rng.normal(size=(K, 3))).astype(np.float32)
    n, _, _, _ = plane.fit_plane(jnp.asarray(pts)[None],
                                 jnp.ones((1, K), bool))
    n = np.asarray(n)[0]
    assert abs(np.dot(n, true_n)) > 0.999
