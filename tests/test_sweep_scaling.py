"""Occupancy sweep + scaling harness tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from dr_using_scv_od_tpu import config
from dr_using_scv_od_tpu.eval import sweep
from dr_using_scv_od_tpu.parallel import scaling
from dr_using_scv_od_tpu.utils import synthetic


def _tiny_window(F=4):
    cfg = config.tiny_test()
    spec = synthetic.SceneSpec(ground_pts=1500, building_pts=300,
                               tree_pts=100, car_pts=120, n_buildings=2,
                               n_trees=3, n_parked_cars=2, n_moving_cars=2,
                               extent=14.0, moving_speed=4.0, ego_speed=1.0)
    scene = synthetic.make_scene(spec)
    return cfg, synthetic.render_window(scene, F, cfg.shapes.max_points)


@pytest.mark.slow
def test_occupancy_sweep_monotone():
    cfg, win = _tiny_window()
    rows = sweep.occupancy_sweep(
        jnp.asarray(win["xyz"]), jnp.asarray(win["intensity"]),
        jnp.asarray(win["valid"]), jnp.asarray(win["poses"]),
        jnp.asarray(win["label"]), cfg, thresholds=(0.2, 0.5, 0.8))
    assert len(rows) == 3
    # higher occupancy threshold -> more clusters judged dynamic -> RR
    # must not decrease (doc/note.txt:83-85 shows the same trend)
    rrs = [r["rr"] for r in rows]
    assert rrs[0] <= rrs[-1] + 1e-6
    table = sweep.format_table(rows)
    assert "threshold" in table and table.count("|") > 10


@pytest.mark.slow
def test_scaling_harness_runs():
    cfg, win = _tiny_window(F=8)
    rows = scaling.measure_scaling(win["xyz"], win["intensity"],
                                   win["valid"], win["poses"], cfg,
                                   device_counts=[1, 4], reps=1)
    assert len(rows) == 2
    assert rows[0]["devices"] == 1 and rows[1]["devices"] == 4
    assert all(r["frames_per_s"] > 0 for r in rows)
