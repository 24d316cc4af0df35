"""GICP odometry tests: recover known rigid transforms between synthetic
scans (new capability - the reference consumes GT poses, src/ssc.cpp:913)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dr_using_scv_od_tpu import config
from dr_using_scv_od_tpu.models import gicp
from dr_using_scv_od_tpu.ops import geometry
from dr_using_scv_od_tpu.utils import synthetic


def _structured_cloud(rng, n=6000):
    """Ground plane + two walls + a box: enough constraint in all 6 DoF."""
    g = np.stack([rng.uniform(-20, 20, n // 2), rng.uniform(-20, 20, n // 2),
                  rng.normal(scale=0.02, size=n // 2) - 1.7], 1)
    w1 = np.stack([rng.uniform(-15, 15, n // 4),
                   np.full(n // 4, 8.0) + rng.normal(scale=0.02, size=n // 4),
                   rng.uniform(-1.5, 4, n // 4)], 1)
    w2 = np.stack([np.full(n // 4, -10.0) + rng.normal(scale=0.02, size=n // 4),
                   rng.uniform(-15, 15, n // 4),
                   rng.uniform(-1.5, 4, n // 4)], 1)
    return np.concatenate([g, w1, w2]).astype(np.float32)


@pytest.mark.parametrize("pose6", [
    (0.4, 0.1, 0.0, 0.0, 0.0, 0.02),
    (1.0, -0.3, 0.05, 0.01, -0.01, 0.06),
])
@pytest.mark.slow
def test_scan_to_scan_recovers_pose(rng, pose6):
    cfg = config.semantickitti().gicp
    target = _structured_cloud(rng)
    T_true = np.asarray(geometry.pose_to_matrix(jnp.asarray(pose6,
                                                            jnp.float32)))
    # source = inverse-transformed target (so T maps source -> target)
    src = (target - T_true[:3, 3]) @ T_true[:3, :3]
    valid = np.ones(len(src), bool)

    res = gicp.scan_to_scan(jnp.asarray(src.astype(np.float32)),
                            jnp.asarray(valid),
                            jnp.asarray(target), jnp.asarray(valid), cfg)
    T = np.asarray(res.T)
    t_err = np.linalg.norm(T[:3, 3] - T_true[:3, 3])
    R_err = np.degrees(np.arccos(np.clip(
        (np.trace(T[:3, :3] @ T_true[:3, :3].T) - 1) / 2, -1, 1)))
    assert t_err < 0.05, f"translation error {t_err}"
    assert R_err < 0.5, f"rotation error {R_err} deg"
    assert int(res.n_corr) > 1000


@pytest.mark.slow
def test_identity_stays_identity(rng):
    cfg = config.semantickitti().gicp
    cloud = _structured_cloud(rng)
    valid = np.ones(len(cloud), bool)
    res = gicp.scan_to_scan(jnp.asarray(cloud), jnp.asarray(valid),
                            jnp.asarray(cloud), jnp.asarray(valid), cfg)
    T = np.asarray(res.T)
    assert np.linalg.norm(T[:3, 3]) < 0.02
    assert abs(np.trace(T[:3, :3]) - 3) < 1e-3


@pytest.mark.slow
def test_odometry_on_synthetic_window(rng):
    """Ego trajectory recovered across a synthetic window (static world)."""
    cfg = config.semantickitti().gicp
    spec = synthetic.SceneSpec(n_moving_cars=0, ground_pts=12000,
                               building_pts=1500, tree_pts=400, car_pts=300)
    scene = synthetic.make_scene(spec)
    N = 40000
    win = synthetic.render_window(scene, 3, N)
    est = [np.eye(4, dtype=np.float32)]
    for f in range(1, 3):
        res = gicp.scan_to_scan(
            jnp.asarray(win["xyz"][f]), jnp.asarray(win["valid"][f]),
            jnp.asarray(win["xyz"][f - 1]), jnp.asarray(win["valid"][f - 1]),
            cfg)
        est.append(est[-1] @ np.asarray(res.T))
    # ground truth ego motion: spec.ego_speed per frame along +x
    gt = win["poses"]
    for f in range(3):
        err = np.linalg.norm(est[f][:3, 3] - gt[f][:3, 3])
        assert err < 0.08 * max(f, 1), f"frame {f} ATE {err}"
