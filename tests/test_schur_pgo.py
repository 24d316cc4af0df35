"""Schur-complement distributed PGO: must reach the same optimum as the
matrix-free CG solver (models/posegraph.py) on noisy graphs."""

import numpy as np
import jax.numpy as jnp
import pytest

from dr_using_scv_od_tpu.models import posegraph as pgo
from dr_using_scv_od_tpu.ops import geometry
from dr_using_scv_od_tpu.parallel import mesh as mesh_mod, schur_pgo

pytestmark = pytest.mark.slow  # heavy e2e tier (fast tier: -m 'not slow')


def _noisy_chain(F, rng, n_loops=2):
    """Ground-truth circular-ish trajectory, noisy odometry edges, exact
    loop-closure edges."""
    t = np.linspace(0, 1.5 * np.pi, F)
    xyz = np.stack([5 * np.cos(t), 5 * np.sin(t), 0.1 * t], 1)
    yaw = t + np.pi / 2
    gt = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    gt[:, 0, 0] = np.cos(yaw); gt[:, 0, 1] = -np.sin(yaw)
    gt[:, 1, 0] = np.sin(yaw); gt[:, 1, 1] = np.cos(yaw)
    gt[:, :3, 3] = xyz
    gt = jnp.asarray(gt)
    rel = jnp.einsum('fij,fjk->fik', geometry.inverse_se3(gt[:-1]), gt[1:])
    noise = jnp.asarray(rng.normal(0, 0.02, size=(F - 1, 6)).astype(
        np.float32))
    rel_noisy = jnp.einsum('fij,fjk->fik', rel,
                           jnp.stack([geometry.exp_se3(n) for n in noise]))
    init = pgo.odometry_chain(rel_noisy)
    li = jnp.asarray(rng.integers(0, F // 2, n_loops).astype(np.int32))
    lj = jnp.asarray((F - 1 - rng.integers(0, F // 3, n_loops)).astype(
        np.int32))
    lT = jnp.einsum('fij,fjk->fik', geometry.inverse_se3(gt[li]), gt[lj])
    lw = jnp.ones((n_loops,))
    return pgo.make_odometry_graph(init, rel_noisy, li, lj, lT, lw), gt


def test_partition_lifts_cross_block_endpoints():
    rng = np.random.default_rng(0)
    g, _ = _noisy_chain(16, rng, n_loops=3)
    padded, part = schur_pgo.partition_graph(g, 4)
    assert part.block_size == 4
    # block firsts are separators
    for b in range(4):
        assert b * 4 in part.sep_ids.tolist()
    # every cross-block edge endpoint is a separator
    ei, ej = np.asarray(g.edge_i), np.asarray(g.edge_j)
    cross = (ei // 4) != (ej // 4)
    for e in np.concatenate([ei[cross], ej[cross]]):
        assert e in part.sep_ids.tolist()
    # padded shards are equal-sized and reference weight-0 edges
    assert part.edge_block.shape[0] == 4
    assert np.asarray(padded.edge_w)[len(ei):].sum() == 0


def test_indivisible_raises():
    rng = np.random.default_rng(0)
    g, _ = _noisy_chain(10, rng)
    with pytest.raises(ValueError):
        schur_pgo.partition_graph(g, 4)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_schur_matches_cg_optimum(n_dev):
    rng = np.random.default_rng(1)
    F = 16
    g, gt = _noisy_chain(F, rng, n_loops=2)
    mesh = mesh_mod.make_mesh(n_dev, axis_names=("dp",))

    init_err = float(jnp.sum(pgo.residuals(g) ** 2))
    poses_s, err_s = schur_pgo.optimize_schur(g, mesh, gn_iters=8)
    ref = pgo.optimize(g, gn_iters=8, cg_iters=60)

    final_s = float(jnp.sum(pgo.residuals(
        g._replace(poses=poses_s)) ** 2))
    final_cg = float(jnp.sum(pgo.residuals(
        g._replace(poses=ref.poses)) ** 2))
    assert final_s < 0.05 * init_err            # actually optimizes
    assert final_s <= final_cg * 1.5 + 1e-6     # same optimum class
    # both solvers stay anchored at the gauge
    np.testing.assert_allclose(np.asarray(poses_s[0]),
                               np.asarray(g.poses[0]), atol=1e-5)
