"""End-to-end per-frame pipeline tests on the synthetic scene
(segment_frame + recognize; reference behaviour: src/ssc.cpp:637-656,
834-895)."""

import collections

import numpy as np
import jax.numpy as jnp
import pytest

from dr_using_scv_od_tpu import config
from dr_using_scv_od_tpu.models import pipeline
from dr_using_scv_od_tpu.utils import synthetic
from dr_using_scv_od_tpu.types import TYPE_CAR


@pytest.fixture(scope="module")
def frame_out():
    cfg = config.semantickitti()
    scene = synthetic.make_scene()
    xyz, inten, label, pose = synthetic.render_frame(scene, 0)
    N = cfg.shapes.max_points
    X = np.zeros((N, 3), np.float32); X[:len(xyz)] = xyz
    V = np.zeros((N,), bool); V[:len(xyz)] = True
    I = np.zeros((N,), np.float32); I[:len(inten)] = inten
    L = np.zeros((N,), np.int32); L[:len(label)] = label
    out = pipeline.process_frame(jnp.asarray(X), jnp.asarray(I),
                                 jnp.asarray(V), jnp.asarray(pose), cfg)
    return cfg, out, L


def test_no_overflow(frame_out):
    _, out, _ = frame_out
    assert int(out.overflow_points) == 0


def test_cluster_count_reasonable(frame_out):
    _, out, _ = frame_out
    assert 5 <= int(out.n_clusters) <= 60


def test_car_clusters_pure_and_found(frame_out):
    """Every moving/parked car should end in a pure car-typed cluster."""
    _, out, L = frame_out
    types = np.asarray(out.state.clusters.type)
    valid = np.asarray(out.state.clusters.valid)
    pc = np.asarray(out.state.point_cluster)

    car_rows = np.where(valid & (types == TYPE_CAR))[0]
    assert len(car_rows) >= 4, "expected several car clusters"
    covered_moving = 0
    covered_static = 0
    for c in car_rows:
        labs = L[pc == c]
        top, n = collections.Counter(labs.tolist()).most_common(1)[0]
        assert top in (10, 252), f"car cluster {c} dominated by label {top}"
        assert n / max(len(labs), 1) > 0.9, f"impure car cluster {c}"
        if top == 252:
            covered_moving += labs.size
        else:
            covered_static += labs.size
    # most of the moving-car points must live in car-typed clusters
    total_moving_in_clusters = ((L == 252) & (pc >= 0)).sum()
    assert covered_moving >= 0.8 * max(total_moving_in_clusters, 1)
    assert covered_static > 0


def test_label_grid_consistent(frame_out):
    """point_cluster must equal label_grid gathered at point voxels."""
    cfg, out, _ = frame_out
    pv = np.asarray(out.state.point_voxel)
    pc = np.asarray(out.state.point_cluster)
    lg = np.asarray(out.state.label_grid)
    live = pc >= 0
    np.testing.assert_array_equal(lg[pv[live]], pc[live])


def test_routes_partition(frame_out):
    """Every valid point gets exactly one route; pipeline routes point to
    live clusters only."""
    _, out, _ = frame_out
    route = np.asarray(out.state.point_route)
    pc = np.asarray(out.state.point_cluster)
    valid = np.asarray(out.state.points.valid)
    assert np.all(route[valid] >= 0)
    # route 0 (pipeline) points have a live cluster; removed points don't
    from dr_using_scv_od_tpu.models.segmentation import ROUTE_PIPELINE
    assert np.all((pc[valid] >= 0) == (route[valid] == ROUTE_PIPELINE))
