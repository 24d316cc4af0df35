"""Multi-device sharding tests on the virtual 8-CPU mesh
(xla_force_host_platform_device_count; SURVEY.md section 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dr_using_scv_od_tpu import config
from dr_using_scv_od_tpu.eval import metrics
from dr_using_scv_od_tpu.parallel import mesh as mesh_mod
from dr_using_scv_od_tpu.parallel import sharded_pipeline
from dr_using_scv_od_tpu.utils import synthetic

pytestmark = pytest.mark.slow  # heavy e2e tier (fast tier: -m 'not slow')


def _window(cfg, F):
    spec = synthetic.SceneSpec(ground_pts=1500, building_pts=300,
                               tree_pts=100, car_pts=120, n_buildings=2,
                               n_trees=3, n_parked_cars=2, n_moving_cars=2,
                               extent=14.0, moving_speed=4.0, ego_speed=1.0)
    scene = synthetic.make_scene(spec)
    return synthetic.render_window(scene, F, cfg.shapes.max_points)


def test_mesh_creation():
    m = mesh_mod.make_mesh(8, axis_names=("dp",))
    assert m.devices.shape == (8,)
    m2 = mesh_mod.make_mesh(8, shape=(4, 2), axis_names=("dp", "tp"))
    assert m2.devices.shape == (4, 2)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_window_runs(n_dev):
    cfg = config.tiny_test()
    F = n_dev * 2
    win = _window(cfg, F)
    mesh = mesh_mod.make_mesh(n_dev, axis_names=("dp",))
    removed, states, n_dyn = sharded_pipeline.sharded_run_window(
        jnp.asarray(win["xyz"]), jnp.asarray(win["intensity"]),
        jnp.asarray(win["valid"]), jnp.asarray(win["poses"]), cfg, mesh)
    assert removed.shape == win["xyz"].shape[:2]
    # static preservation must hold under sharding
    m = metrics.removal_metrics(jnp.asarray(win["label"]).reshape(-1),
                                removed.reshape(-1),
                                jnp.asarray(win["valid"]).reshape(-1))
    assert m.pr > 99.0
    # global final frame must carry no verdicts
    assert int(np.asarray(n_dyn)[-1]) == 0


def test_sharded_matches_singledevice_verdicts():
    """Non-boundary pairs must produce identical dynamic counts to the
    single-device run (boundary pairs may differ only in split/merge
    bookkeeping, which doesn't change verdict counts here)."""
    cfg = config.tiny_test()
    F = 8
    win = _window(cfg, F)
    args = (jnp.asarray(win["xyz"]), jnp.asarray(win["intensity"]),
            jnp.asarray(win["valid"]), jnp.asarray(win["poses"]))
    mesh1 = mesh_mod.make_mesh(1, axis_names=("dp",))
    mesh4 = mesh_mod.make_mesh(4, axis_names=("dp",))
    r1, s1, n1 = sharded_pipeline.sharded_run_window(*args, cfg, mesh1)
    r4, s4, n4 = sharded_pipeline.sharded_run_window(*args, cfg, mesh4)
    n1, n4 = np.asarray(n1), np.asarray(n4)
    np.testing.assert_array_equal(n1, n4)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r4))


def test_graft_dryrun():
    import __graft_entry__ as ge
    ge.dryrun_multichip(4)
