"""Distributed pose-graph optimization must match single-device results
(edge-sharded CG with psum reductions over the 8-device CPU mesh)."""

import numpy as np
import jax.numpy as jnp

from dr_using_scv_od_tpu.models import posegraph
from dr_using_scv_od_tpu.parallel import distributed_pgo, mesh as mesh_mod
from test_posegraph import _noisy_square


def _graph(rng):
    gt, rels = _noisy_square(rng)
    init = posegraph.odometry_chain(jnp.asarray(rels))
    F = gt.shape[0]
    T_loop = np.linalg.inv(gt[F - 1]) @ gt[0]
    pg = posegraph.make_odometry_graph(
        init, jnp.asarray(rels),
        loop_i=jnp.asarray([F - 1]), loop_j=jnp.asarray([0]),
        loop_T=jnp.asarray(T_loop[None].astype(np.float32)),
        loop_w=jnp.asarray([5.0]))
    return gt, pg


def test_distributed_matches_single(rng):
    gt, pg = _graph(rng)
    single = posegraph.optimize(pg, gn_iters=10, cg_iters=50)
    mesh = mesh_mod.make_mesh(4, axis_names=("dp",))
    dist_poses, dist_err = distributed_pgo.optimize_distributed(
        pg, mesh, gn_iters=10, cg_iters=50)
    np.testing.assert_allclose(np.asarray(dist_poses),
                               np.asarray(single.poses),
                               rtol=1e-3, atol=1e-3)


def test_distributed_reduces_ate(rng):
    gt, pg = _graph(rng)
    mesh = mesh_mod.make_mesh(8, axis_names=("dp",))
    dist_poses, _ = distributed_pgo.optimize_distributed(
        pg, mesh, gn_iters=12, cg_iters=60)
    opt = np.asarray(dist_poses)
    init = np.asarray(pg.poses)
    ate_before = np.sqrt(np.mean(np.sum(
        (init[:, :3, 3] - gt[:, :3, 3]) ** 2, 1)))
    ate_after = np.sqrt(np.mean(np.sum(
        (opt[:, :3, 3] - gt[:, :3, 3]) ** 2, 1)))
    assert ate_after < 0.6 * ate_before
