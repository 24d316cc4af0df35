"""Pose-graph optimization tests: drifted odometry + loop closure must pull
the trajectory back (new backend capability; reference has none)."""

import numpy as np
import jax.numpy as jnp

from dr_using_scv_od_tpu.models import posegraph
from dr_using_scv_od_tpu.ops import geometry


def _noisy_square(rng, n_side=5, noise_t=0.05, noise_r=0.01):
    """Ground truth: a square loop. Odometry: noisy relative transforms."""
    F = 4 * n_side
    gt = [np.eye(4, dtype=np.float32)]
    rels_true = []
    for k in range(F - 1):
        xi = np.zeros(6, np.float32)
        xi[0] = 1.0                       # 1m forward
        if (k + 1) % n_side == 0:
            xi[5] = np.pi / 2             # turn left at corners
        rel = np.asarray(geometry.exp_se3(jnp.asarray(xi)))
        rels_true.append(rel)
        gt.append(gt[-1] @ rel)
    gt = np.stack(gt)
    rels_noisy = []
    for rel in rels_true:
        dxi = np.concatenate([rng.normal(scale=noise_t, size=3),
                              rng.normal(scale=noise_r, size=3)]).astype(
            np.float32)
        rels_noisy.append(np.asarray(geometry.exp_se3(jnp.asarray(dxi))) @ rel)
    return gt, np.stack(rels_noisy)


def test_chain_composition(rng):
    gt, rels = _noisy_square(rng, noise_t=0.0, noise_r=0.0)
    poses = np.asarray(posegraph.odometry_chain(jnp.asarray(rels)))
    np.testing.assert_allclose(poses, gt, atol=1e-4)


def test_loop_closure_reduces_drift(rng):
    gt, rels = _noisy_square(rng)
    init = posegraph.odometry_chain(jnp.asarray(rels))
    drift_before = np.linalg.norm(
        np.asarray(init)[-1][:3, 3] - gt[-1][:3, 3])

    # loop closure: last pose sees the first (measured = GT relative)
    F = gt.shape[0]
    T_loop = np.linalg.inv(gt[F - 1]) @ gt[0]
    pg = posegraph.make_odometry_graph(
        init, jnp.asarray(rels),
        loop_i=jnp.asarray([F - 1]), loop_j=jnp.asarray([0]),
        loop_T=jnp.asarray(T_loop[None].astype(np.float32)),
        loop_w=jnp.asarray([5.0]))
    res = posegraph.optimize(pg, gn_iters=15, cg_iters=60)
    opt = np.asarray(res.poses)

    # ATE w.r.t. gauge-aligned GT (node 0 fixed = identity in both)
    ate_before = np.sqrt(np.mean(np.sum(
        (np.asarray(init)[:, :3, 3] - gt[:, :3, 3]) ** 2, axis=1)))
    ate_after = np.sqrt(np.mean(np.sum(
        (opt[:, :3, 3] - gt[:, :3, 3]) ** 2, axis=1)))
    assert ate_after < 0.6 * ate_before, (ate_before, ate_after)
    # loop must actually close
    gap = np.linalg.norm(opt[-1] @ T_loop @ np.linalg.inv(opt[0])
                         - np.eye(4))
    assert gap < drift_before
