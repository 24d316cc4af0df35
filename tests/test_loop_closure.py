"""Loop-closure detection test: an ego revisiting its start must produce a
verified loop edge that the pose graph then uses to kill drift."""

import numpy as np
import jax.numpy as jnp
import pytest

from dr_using_scv_od_tpu import config
from dr_using_scv_od_tpu.models import loop_closure, posegraph
from dr_using_scv_od_tpu.ops import geometry
from dr_using_scv_od_tpu.utils import synthetic


@pytest.mark.slow
def test_loop_detected_and_closes(rng):
    cfg = config.semantickitti()
    # render a static scene; fake a loop by revisiting the same poses
    spec = synthetic.SceneSpec(n_moving_cars=0, ground_pts=9000,
                               building_pts=1200, tree_pts=300,
                               car_pts=200, ego_speed=0.0)
    scene = synthetic.make_scene(spec)
    N = 24000
    F = 16
    win = synthetic.render_window(scene, F, N)
    # synthetic "trajectory": out 1m/frame and back; re-render is identical
    # because the scene is static and ego_speed=0, so scans at revisit
    # match the start scans
    gt = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    xs = np.concatenate([np.arange(F // 2), np.arange(F // 2)[::-1]]) * 1.0
    gt[:, 0, 3] = xs

    # drifted estimates: constant bias per step
    est = gt.copy()
    est[:, 0, 3] += np.linspace(0, 1.5, F)   # 1.5 m drift at the end

    res = loop_closure.detect(jnp.asarray(win["xyz"]),
                              jnp.asarray(win["valid"]),
                              jnp.asarray(est), cfg,
                              loop_closure.LoopConfig(min_gap=10,
                                                      radius=4.0))
    assert int(res.n_accepted) >= 1, "no loop closure found"
    w = np.asarray(res.edge_w)
    ei = np.asarray(res.edge_i)[w > 0]
    ej = np.asarray(res.edge_j)[w > 0]
    assert np.all(np.abs(ei - ej) > 10)

    # closing the graph must reduce end-pose drift
    rel = jnp.einsum('fij,fjk->fik',
                     geometry.inverse_se3(jnp.asarray(est[:-1])),
                     jnp.asarray(est[1:]))
    pg = posegraph.make_odometry_graph(
        jnp.asarray(est), rel,
        loop_i=res.edge_i[w > 0], loop_j=res.edge_j[w > 0],
        loop_T=res.edge_T[w > 0], loop_w=jnp.asarray(w[w > 0]))
    out = posegraph.optimize(pg, gn_iters=10, cg_iters=40)
    opt = np.asarray(out.poses)
    drift_before = abs(est[-1, 0, 3] - gt[-1, 0, 3])
    drift_after = abs(opt[-1, 0, 3] - gt[-1, 0, 3])
    assert drift_after < drift_before
