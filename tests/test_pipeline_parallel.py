"""Pipeline-parallel (GPipe-over-stages) tests: the PP placement must
reproduce the single-device per-frame pipeline bit-exactly (same stage
functions, same order - only placement differs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dr_using_scv_od_tpu import config
from dr_using_scv_od_tpu.models import pipeline
from dr_using_scv_od_tpu.parallel import mesh as mesh_mod
from dr_using_scv_od_tpu.parallel import pipeline_parallel as pp
from dr_using_scv_od_tpu.utils import synthetic

pytestmark = pytest.mark.slow  # heavy e2e tier (fast tier: -m 'not slow')


def _window(cfg, F):
    spec = synthetic.SceneSpec(ground_pts=1500, building_pts=300,
                               tree_pts=100, car_pts=120, n_buildings=2,
                               n_trees=3, n_parked_cars=2, n_moving_cars=2,
                               extent=14.0, moving_speed=4.0, ego_speed=1.0)
    scene = synthetic.make_scene(spec)
    return synthetic.render_window(scene, F, cfg.shapes.max_points)


def test_make_stages_partitions():
    cfg = config.tiny_test()
    assert len(pp.make_stages(cfg, 1)) == 1
    assert len(pp.make_stages(cfg, 3)) == 3
    assert len(pp.make_stages(cfg, 4)) == 4   # tail stages pass-through
    with pytest.raises(ValueError):
        pp.make_stages(cfg, 0)


@pytest.mark.parametrize("n_stages", [2, 3])
def test_pp_matches_single_device(n_stages):
    cfg = config.tiny_test()
    F = 5                                     # deliberately != n_stages
    win = _window(cfg, F)
    xyz = jnp.asarray(win["xyz"])
    inten = jnp.asarray(win["intensity"])
    valid = jnp.asarray(win["valid"])
    poses = jnp.asarray(win["poses"])

    ref = pipeline.process_window(xyz, inten, valid, poses, cfg)

    mesh = mesh_mod.make_mesh(n_stages, axis_names=("pp",))
    got = pp.pipelined_process_window(xyz, inten, valid, cfg, mesh)

    np.testing.assert_array_equal(np.asarray(got.point_voxel),
                                  np.asarray(ref.state.point_voxel))
    np.testing.assert_array_equal(np.asarray(got.point_cluster),
                                  np.asarray(ref.state.point_cluster))
    np.testing.assert_array_equal(np.asarray(got.label_grid),
                                  np.asarray(ref.state.label_grid))
    np.testing.assert_array_equal(np.asarray(got.table.type),
                                  np.asarray(ref.state.clusters.type))
    np.testing.assert_array_equal(np.asarray(got.table.valid),
                                  np.asarray(ref.state.clusters.valid))
    np.testing.assert_array_equal(np.asarray(got.n_clusters),
                                  np.asarray(ref.n_clusters))
    np.testing.assert_allclose(np.asarray(got.feats.area),
                               np.asarray(ref.features.area), rtol=1e-6)


def test_pp_single_stage_degenerate():
    cfg = config.tiny_test()
    win = _window(cfg, 2)
    mesh = mesh_mod.make_mesh(1, axis_names=("pp",))
    got = pp.pipelined_process_window(
        jnp.asarray(win["xyz"]), jnp.asarray(win["intensity"]),
        jnp.asarray(win["valid"]), cfg, mesh)
    assert int(got.n_clusters[0]) > 0
