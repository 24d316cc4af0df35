"""Window odometry + self-supervised pipeline test: dynamic removal with
ESTIMATED poses must approach GT-pose quality (the reference can only use
GT poses; this capability is new)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dr_using_scv_od_tpu import config
from dr_using_scv_od_tpu.eval import metrics
from dr_using_scv_od_tpu.models import odometry, pipeline
from dr_using_scv_od_tpu.utils import synthetic


@pytest.fixture(scope="module")
def window():
    cfg = config.semantickitti()
    scene = synthetic.make_scene()
    win = synthetic.render_window(scene, 4, cfg.shapes.max_points)
    return cfg, win


@pytest.mark.slow
def test_window_odometry_accuracy(window):
    cfg, win = window
    res = odometry.estimate_window_poses(jnp.asarray(win["xyz"]),
                                         jnp.asarray(win["valid"]), cfg)
    ate = float(odometry.ate_rmse(res.poses, jnp.asarray(win["poses"])))
    assert ate < 0.15, f"ATE {ate} m"
    assert np.all(np.asarray(res.n_corr) > 5000)


@pytest.mark.slow
def test_scan_to_map_beats_chaining(window):
    cfg, win = window
    s2s = odometry.estimate_window_poses(jnp.asarray(win["xyz"]),
                                         jnp.asarray(win["valid"]), cfg)
    s2m = odometry.estimate_window_poses_scan_to_map(
        jnp.asarray(win["xyz"]), jnp.asarray(win["valid"]), cfg)
    gt = jnp.asarray(win["poses"])
    ate_s2s = float(odometry.ate_rmse(s2s.poses, gt))
    ate_s2m = float(odometry.ate_rmse(s2m.poses, gt))
    assert ate_s2m < 0.05
    assert ate_s2m <= ate_s2s + 0.01


@pytest.mark.slow
def test_pipeline_with_estimated_poses(window):
    cfg, win = window
    od = odometry.estimate_window_poses(jnp.asarray(win["xyz"]),
                                        jnp.asarray(win["valid"]), cfg)
    res = pipeline.run_window(
        jnp.asarray(win["xyz"]), jnp.asarray(win["intensity"]),
        jnp.asarray(win["valid"]), od.poses, cfg)
    F = win["xyz"].shape[0]
    m = metrics.removal_metrics(
        jnp.asarray(win["label"][:F - 1]).reshape(-1),
        res.removed[:F - 1].reshape(-1),
        jnp.asarray(win["valid"][:F - 1]).reshape(-1))
    assert m.pr > 98.0, f"PR={m.pr}"
    assert m.rr > 70.0, f"RR={m.rr}"
