"""Auxiliary subsystem tests: stage timing, checkpoint round-trip, and
object-map initialization (reference: tictoc.h, src/ssc.cpp:1148-1248)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dr_using_scv_od_tpu import config
from dr_using_scv_od_tpu.models import object_map, pipeline
from dr_using_scv_od_tpu.utils import checkpoint, synthetic, timing


def test_stage_timer(tmp_path):
    t = timing.StageTimer(tmp_path / "time.txt")
    with t.stage("preprocess"):
        sum(range(1000))
    with t.stage("segment"):
        sum(range(1000))
    row = t.end_frame()
    assert set(row) == {"preprocess", "segment"}
    assert all(v >= 0 for v in row.values())
    t.dump_json(tmp_path / "t.json")
    assert (tmp_path / "time.txt").exists()
    assert t.summary()["segment"] >= 0


def test_checkpoint_roundtrip(tmp_path, rng):
    state = {
        "poses": rng.normal(size=(4, 4, 4)).astype(np.float32),
        "counter": np.int32(7),
        "nested": {"a": np.arange(5)},
    }
    checkpoint.save(tmp_path / "ckpt", state)
    got = checkpoint.load(tmp_path / "ckpt")
    np.testing.assert_array_equal(got["poses"], state["poses"])
    assert int(got["counter"]) == 7
    np.testing.assert_array_equal(got["nested"]["a"], np.arange(5))


@pytest.mark.slow
def test_object_map_initialize():
    cfg = config.tiny_test()
    spec = synthetic.SceneSpec(ground_pts=1500, building_pts=300,
                               tree_pts=100, car_pts=120, n_buildings=2,
                               n_trees=3, n_parked_cars=2, n_moving_cars=0,
                               extent=14.0, ego_speed=0.5)
    scene = synthetic.make_scene(spec)
    win = synthetic.render_window(scene, 3, cfg.shapes.max_points)
    frames = pipeline.process_window(
        jnp.asarray(win["xyz"]), jnp.asarray(win["intensity"]),
        jnp.asarray(win["valid"]), jnp.asarray(win["poses"]), cfg)
    res = object_map.initialize(
        jnp.asarray(win["xyz"]), frames.state.point_voxel,
        jnp.asarray(win["valid"]), frames.state.label_grid,
        frames.state.clusters, jnp.asarray(win["poses"]), cfg)
    n_cl = np.asarray(jnp.sum(frames.state.clusters.valid, axis=1))
    # reference tie-break: <= keeps the LAST minimal frame (src/ssc.cpp:1154)
    want = len(n_cl) - 1 - int(np.argmin(n_cl[::-1]))
    assert int(res.base_idx) == want
    # fused map stays consistent: every live row has voxels
    valid = np.asarray(res.table.valid)
    nvox = np.asarray(res.table.n_voxels)
    assert np.all(nvox[valid] > 0)
    lg = np.asarray(res.label_grid)
    assert set(np.unique(lg[lg >= 0])).issubset(set(np.where(valid)[0]))
