"""End-to-end tests of the composed SLAM engine (models/engine.py): the
sequence driver the reference left commented out (src/ssc.cpp:1454-1546),
here streaming odometry -> segmentation/tracking -> submaps -> descriptor
loop closure -> pose graph -> ERASOR -> checkpoint/resume."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from dr_using_scv_od_tpu import config
from dr_using_scv_od_tpu.models import engine, odometry, posegraph
from dr_using_scv_od_tpu.models import scan_context as sc
from dr_using_scv_od_tpu.utils import synthetic

pytestmark = pytest.mark.slow  # heavy e2e tier (fast tier: -m 'not slow')


def small_cfg():
    cfg = config.semantickitti()
    return cfg.replace(
        grid=dataclasses.replace(cfg.grid, sector_res=2.4, azimuth_res=4.0),
        shapes=dataclasses.replace(cfg.shapes, max_points=16384,
                                   max_clusters=256, max_track_points=4096),
        gicp=dataclasses.replace(cfg.gicp, xy_extent=48.0))


def loop_scene():
    spec = synthetic.SceneSpec(
        trajectory="loop", loop_frames=24, loop_radius=18.0,
        ground_pts=9000, building_pts=1200, tree_pts=300, car_pts=350,
        n_moving_cars=2)
    return synthetic.make_scene(spec)


@pytest.fixture(scope="module")
def slam_run():
    """One 26-frame loop-trajectory run with HEAVY injected odometry drift
    (0.3 m + 2 deg per frame): by the revisit, chained odometry is >10 m
    off, so pose-proximity loop proposal would fail - only the
    scan-context descriptor can recover the loop."""
    cfg = small_cfg()
    scene = loop_scene()
    F = 26
    win = synthetic.render_window(scene, F, cfg.shapes.max_points)
    ec = engine.EngineConfig(
        window=6, max_keyframes=32, submap_points=2048, local_map_kf=3,
        loop_min_gap=8, loop_min_score=0.90,
        erasor=dataclasses.replace(engine.erasor_mod.ErasorConfig(),
                                   max_range=45.0, max_pts_per_bin=256),
        erasor_every=2,
        drift_bias=(0.3, 0.0, 0.0, 0.0, 0.0, 0.035))
    eng = engine.SlamEngine(cfg, ec)
    removed = {}
    for f in range(F):
        out = eng.feed(win["xyz"][f], win["intensity"][f], win["valid"][f])
        if out is not None:
            base = eng.n_frames - out.poses.shape[0]
            for k in range(out.removed.shape[0]):
                removed[base + k] = out.removed[k]
    eng.finalize()
    return cfg, win, eng, removed


def test_loop_found_beyond_pose_proximity(slam_run):
    """The descriptor retrieval must close the loop although the drifted
    pose estimates put the revisit far outside any proximity radius
    (VERDICT round-1 item 6)."""
    _, _, eng, _ = slam_run
    st = eng.state
    assert int(st.n_loops) >= 1
    li, lj = int(st.loop_i[0]), int(st.loop_j[0])
    assert li < 5 and lj > 19          # spans the revisit
    # chained (no-PGO) odometry separation of the matched pair: larger
    # than the 10 m radius loop_closure.detect uses for pose proximity
    chain = posegraph.odometry_chain(st.rel_T[1:int(st.n)])
    sep = float(jnp.linalg.norm(chain[li][:3, 3] - chain[lj][:3, 3]))
    assert sep > 10.0, f"drift too small to prove the point: {sep:.1f} m"


def test_pgo_beats_chained_odometry(slam_run):
    """Final ATE after loop closure + pose graph must clearly beat the
    chained odometry (VERDICT round-1 item 1 'done' criterion)."""
    _, win, eng, _ = slam_run
    st = eng.state
    gt = jnp.asarray(win["poses"][:eng.n_frames])
    ate_pgo = float(odometry.ate_rmse(jnp.asarray(eng.poses()), gt))
    chain = posegraph.odometry_chain(st.rel_T[1:int(st.n)])
    ate_chain = float(odometry.ate_rmse(chain, gt))
    assert ate_pgo < 0.75 * ate_chain, (ate_pgo, ate_chain)
    assert ate_pgo < 6.0               # measured 4.72 on this scene


def test_no_failures_or_overflows(slam_run):
    _, _, eng, _ = slam_run
    st = eng.state
    assert int(st.odo_fallbacks) == 0
    assert int(st.row_overflow) == 0
    assert int(st.point_overflow) == 0
    assert int(st.submap_overflow) == 0


def test_dynamic_points_removed_static_kept(slam_run):
    """Across judged frames, moving-car returns must be rejected and
    static returns preserved (pose-robust check on the per-scan masks).

    RR is measured over IN-GRID dynamic points: returns beyond the curved
    grid's max range bypass straight to the static set in the reference
    (src/ssc.cpp:161-172) so the verdict lattice never sees them - in the
    loop scene the traffic circulates out past 30 m roughly a third of the
    time. Their map-level cleanup is ERASOR's job
    (test_map_contamination)."""
    cfg, win, eng, removed = slam_run
    dyn_total = dyn_removed = stat_total = stat_removed = 0
    for f, mask in removed.items():
        lab = win["label"][f]
        val = win["valid"][f]
        rng2d = np.linalg.norm(win["xyz"][f][:, :2], axis=1)
        in_grid = (rng2d > cfg.grid.min_dis) & (rng2d < cfg.grid.max_dis)
        dyn = val & in_grid & (lab == synthetic.LABEL_CAR_MOVING)
        stat = val & (lab != synthetic.LABEL_CAR_MOVING)
        dyn_total += int(dyn.sum())
        dyn_removed += int((dyn & mask).sum())
        stat_total += int(stat.sum())
        stat_removed += int((stat & mask).sum())
    assert dyn_total > 0
    rr = 100.0 * dyn_removed / dyn_total
    pr = 100.0 * (stat_total - stat_removed) / stat_total
    assert rr > 88.0, f"dynamic rejection too low under drift: {rr:.1f}"
    assert pr > 98.0, f"static points wrongly removed: {pr:.1f}"


def test_map_contamination(slam_run):
    """Exact map-level check via submap source indices: the final static
    map must contain almost no moving-car returns - the per-scan verdicts
    catch in-grid movers and the periodic ERASOR passes must clean the
    out-of-range residue the grid never judged."""
    _, win, eng, _ = slam_run
    st = eng.state
    K = int(st.poses.shape[0])
    sval = np.asarray(st.submap_valid)
    sidx = np.asarray(st.submap_idx)
    n_map = n_dyn = 0
    for k in range(min(int(st.n) - 1, K)):
        sel = sval[k] & (sidx[k] >= 0)
        if not sel.any():
            continue
        lab = win["label"][k][sidx[k][sel]]
        n_map += int(sel.sum())
        n_dyn += int((lab == synthetic.LABEL_CAR_MOVING).sum())
    assert n_map > 10000                      # the map is actually populated
    contamination = 100.0 * n_dyn / n_map
    assert contamination < 1.0, \
        f"{n_dyn}/{n_map} map points are moving-car returns " \
        f"({contamination:.2f}%)"


def test_map_and_erasor(slam_run):
    _, _, eng, _ = slam_run
    m = eng.static_map()
    assert len(m) > 10000              # map actually accumulated
    assert int(eng.state.erasor_removed) > 0   # periodic cleaning ran


def test_checkpoint_resume_exact(tmp_path):
    """Kill/resume: a checkpoint taken mid-sequence restores to the exact
    same final state as the uninterrupted run."""
    cfg = small_cfg()
    scene = loop_scene()
    F = 16
    win = synthetic.render_window(scene, F, cfg.shapes.max_points)
    ec = engine.EngineConfig(window=6, max_keyframes=32,
                             submap_points=2048, local_map_kf=3,
                             loop_min_gap=8)

    # uninterrupted run
    eng_a = engine.SlamEngine(cfg, ec)
    for f in range(F):
        eng_a.feed(win["xyz"][f], win["intensity"][f], win["valid"][f])

    # interrupted run: checkpoint after window 2 (11 frames), resume
    eng_b = engine.SlamEngine(cfg, ec)
    for f in range(11):
        eng_b.feed(win["xyz"][f], win["intensity"][f], win["valid"][f])
    assert eng_b.n_frames == 11
    path = eng_b.checkpoint(str(tmp_path / "ckpt"))
    del eng_b

    eng_c = engine.SlamEngine.resume(path, cfg, ec)
    assert eng_c.n_frames == 11
    for f in range(11, F):
        eng_c.feed(win["xyz"][f], win["intensity"][f], win["valid"][f])

    assert eng_c.n_frames == eng_a.n_frames
    np.testing.assert_allclose(eng_c.poses(), eng_a.poses(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(eng_c.state.submap_valid),
                                  np.asarray(eng_a.state.submap_valid))
    np.testing.assert_allclose(np.asarray(eng_c.state.desc),
                               np.asarray(eng_a.state.desc), atol=1e-6)
    assert int(eng_c.state.track_counter) == int(eng_a.state.track_counter)


def test_descriptor_yaw_invariance(rng):
    """A yaw-rotated copy of a scan must retrieve itself with the correct
    sector shift and a near-1 score."""
    pts = rng.uniform(-25, 25, size=(4000, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-1.7, 6.0, size=4000)
    valid = np.ones(4000, bool)
    dcfg = sc.DescriptorConfig()
    d0 = sc.descriptor(jnp.asarray(pts), jnp.asarray(valid), dcfg)

    yaw = 2 * (2 * np.pi / dcfg.sectors)     # exactly two sectors
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    d1 = sc.descriptor(jnp.asarray(pts @ R.T), jnp.asarray(valid), dcfg)

    ret = sc.similarity(d1, d0[None], jnp.ones((1,), bool))
    assert float(ret.scores[0]) > 0.95
    # rotating the SCENE by +yaw rotates the query sensor by -yaw, so the
    # returned bank_T_query yaw is 2*pi - yaw
    assert abs(float(ret.yaw[0]) - (2 * np.pi - yaw)) < 1e-5
