"""Unbounded-sequence engine tests (VERDICT round-4 asks 1 and 4): with
distance-gated keyframe selection the fixed K budget must cover a
trajectory several times longer than max_keyframes, with loops still
closing, ATE/map-contamination floors held, and the keyframe-budget
error genuinely unreachable. Plus loop closure at scale: multiple
accepted loop edges on a double-revisit trajectory and a false-positive
guard (high descriptor score, failing GICP verify -> rejected).

Reference anchor: the arbitrary-window driver loop src/ssc.cpp:1435-1445
(the reference loops over any number of scans; its maps/graphs are
unbounded STL containers - here the fixed-shape analog is the gated
keyframe table)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from dr_using_scv_od_tpu import config
from dr_using_scv_od_tpu.models import engine, odometry, posegraph
from dr_using_scv_od_tpu.utils import synthetic

pytestmark = pytest.mark.slow  # heavy e2e tier (fast tier: -m 'not slow')


def tiny_cfg():
    cfg = config.semantickitti()
    return cfg.replace(
        grid=dataclasses.replace(cfg.grid, sector_res=2.4, azimuth_res=4.0),
        shapes=dataclasses.replace(cfg.shapes, max_points=8192,
                                   max_clusters=256, max_track_points=2048),
        gicp=dataclasses.replace(cfg.gicp, xy_extent=48.0))


@pytest.fixture(scope="module")
def long_run():
    """96 scans - two full circles of a 48-frame loop - through K=28
    keyframe slots with a 10 m distance gate (~1 keyframe per 4 scans)
    and injected odometry drift. Without gating this sequence would
    overrun max_keyframes by ~3.4x."""
    cfg = tiny_cfg()
    spec = synthetic.SceneSpec(
        trajectory="loop", loop_frames=48, loop_radius=18.0,
        ground_pts=6000, building_pts=800, tree_pts=200, car_pts=250,
        n_moving_cars=2)
    scene = synthetic.make_scene(spec)
    F = 96
    win = synthetic.render_window(scene, F, cfg.shapes.max_points)
    ec = engine.EngineConfig(
        window=6, max_keyframes=28, submap_points=2048, local_map_kf=3,
        kf_dist=10.0,
        # gated keyframes land at different circle phases on each lap, so
        # revisit descriptors peak ~0.84-0.88 (vs ~0.70 non-revisit
        # background); the GICP verification gate carries the precision
        loop_min_gap=6, loop_min_score=0.80, loop_top_k=3,
        erasor=dataclasses.replace(engine.erasor_mod.ErasorConfig(),
                                   max_range=45.0, max_pts_per_bin=256),
        erasor_every=2,
        drift_bias=(0.05, 0.0, 0.0, 0.0, 0.0, 0.004))
    eng = engine.SlamEngine(cfg, ec)
    for f in range(F):
        eng.feed(win["xyz"][f], win["intensity"][f], win["valid"][f])
    eng.finalize(final_erasor=True)
    return cfg, win, eng


def test_sequence_much_longer_than_keyframe_budget(long_run):
    """The budget ValueError must be unreachable: 96 scans fit in K=28
    with zero dropped keyframes (the backstop counter stays 0)."""
    _, _, eng = long_run
    assert eng.n_frames == 96
    assert int(eng.state.kf_overflow) == 0
    assert eng.n_keyframes <= eng.ec.max_keyframes
    # the whole point: the sequence is several times the keyframe count
    assert eng.n_frames >= 4 * eng.n_keyframes, \
        (eng.n_frames, eng.n_keyframes)
    # keyframes actually span the trajectory (not all bunched at the
    # start): last keyframe within the final gate distance of the end
    kf = eng.kf_frames()
    assert kf[0] == 0 and kf[-1] >= 96 - 8
    assert np.all(np.diff(kf) > 0)


def test_long_run_ate_and_loops(long_run):
    """Loops must close across the revisit and PGO must beat chained
    odometry under the injected drift; absolute ATE floor pinned."""
    _, win, eng = long_run
    st = eng.state
    assert int(st.n_loops) >= 2, "expected multiple loop edges (top-k)"
    # edges from at least two different windows/queries
    lj = np.asarray(st.loop_j[:int(st.n_loops)])
    li = np.asarray(st.loop_i[:int(st.n_loops)])
    assert len(np.unique(lj)) >= 2
    assert np.all(lj - li >= eng.ec.loop_min_gap)

    gt = jnp.asarray(win["poses"][eng.kf_frames()])
    ate_pgo = float(odometry.ate_rmse(jnp.asarray(eng.poses()), gt))
    chain = posegraph.odometry_chain(st.rel_T[1:eng.n_keyframes])
    ate_chain = float(odometry.ate_rmse(chain, gt))
    assert ate_pgo < 0.8 * ate_chain, (ate_pgo, ate_chain)
    assert ate_pgo < 7.0     # measured 5.49 (chain 8.87) on this scene


def test_long_run_submaps_topped_up(long_run):
    """Non-keyframe scans must CONTRIBUTE: submaps contain points from
    more frames than there are keyframes, and fills exceed what one
    scan's static budget share could deliver."""
    _, _, eng = long_run
    st = eng.state
    n_kf = eng.n_keyframes
    frames_in_map = np.unique(
        np.asarray(st.submap_frame[:n_kf])[np.asarray(
            st.submap_valid[:n_kf])])
    assert len(frames_in_map) > n_kf, \
        "only keyframe scans contributed - top-up never happened"
    fills = np.asarray(st.submap_fill[:n_kf - 1])
    assert np.all(fills > 0)


def test_long_run_map_contamination(long_run):
    """Exact map-level purity via (submap_frame, submap_idx) source ids:
    moving-car returns must stay out of the accumulated map."""
    _, win, eng = long_run
    st = eng.state
    n_kf = eng.n_keyframes
    sval = np.asarray(st.submap_valid[:n_kf])
    sidx = np.asarray(st.submap_idx[:n_kf])
    sfrm = np.asarray(st.submap_frame[:n_kf])
    n_map = n_dyn = 0
    for k in range(n_kf - 1):
        sel = sval[k] & (sidx[k] >= 0) & (sfrm[k] >= 0)
        if not sel.any():
            continue
        lab = win["label"][sfrm[k][sel], sidx[k][sel]]
        n_map += int(sel.sum())
        n_dyn += int((lab == synthetic.LABEL_CAR_MOVING).sum())
    assert n_map > 10000
    contamination = 100.0 * n_dyn / n_map
    assert contamination < 1.0, \
        f"{n_dyn}/{n_map} moving-car returns in map ({contamination:.2f}%)"


def test_budget_error_still_raises_without_gating():
    """With gating OFF the backstop must still fire loudly when scans
    overrun max_keyframes - dropped keyframes are counted in-graph and
    surfaced by the host, never silently overwritten."""
    cfg = tiny_cfg()
    scene = synthetic.make_scene(synthetic.SceneSpec(
        ground_pts=4000, building_pts=400, tree_pts=100, car_pts=100,
        n_moving_cars=0))
    F = 12
    win = synthetic.render_window(scene, F, cfg.shapes.max_points)
    ec = engine.EngineConfig(window=6, max_keyframes=8, submap_points=1024)
    eng = engine.SlamEngine(cfg, ec)
    with pytest.raises(ValueError, match="keyframe budget"):
        for f in range(F):
            eng.feed(win["xyz"][f], win["intensity"][f], win["valid"][f])
    # pre-overflow keyframes are intact (drop semantics, not clamp)
    assert int(jnp.sum(eng.state.kf_frame >= 0)) == ec.max_keyframes


def test_false_positive_loop_rejected():
    """A candidate whose DESCRIPTOR matches perfectly but whose submap
    geometry cannot register against the query scan must be rejected by
    the GICP verification gate (score high, verify fails)."""
    cfg = tiny_cfg()
    scene = synthetic.make_scene(synthetic.SceneSpec(
        ground_pts=6000, building_pts=800, tree_pts=200, car_pts=200,
        n_moving_cars=0))
    F = 6
    win = synthetic.render_window(scene, F, cfg.shapes.max_points)
    ec = engine.EngineConfig(window=6, max_keyframes=32,
                             submap_points=1024, loop_min_gap=2,
                             loop_min_score=0.9)
    eng = engine.SlamEngine(cfg, ec)
    for f in range(F):
        eng.feed(win["xyz"][f], win["intensity"][f], win["valid"][f])
    st = eng.state
    # poison a bank slot: the QUERY frame's own descriptor (score ~1)
    # paired with geometry from another planet (uniform noise far away)
    import jax
    q = 5
    fake = jax.random.uniform(jax.random.PRNGKey(0), (1024, 3),
                              minval=200.0, maxval=260.0)
    st = st.replace(
        desc=st.desc.at[1].set(st.desc[q]),
        submap_xyz=st.submap_xyz.at[1].set(fake),
        submap_valid=st.submap_valid.at[1].set(True))
    xyz = jnp.stack([jnp.asarray(win["xyz"][f]) for f in range(F)])
    valid = jnp.stack([jnp.asarray(win["valid"][f]) for f in range(F)])
    descs = jax.lax.map(
        lambda f: engine.scan_context.descriptor(xyz[f], valid[f], ec.desc),
        jnp.arange(F))
    slots = jnp.arange(F, dtype=jnp.int32)
    # only the poisoned query proposes: nearby-scan queries of a slow ego
    # could legitimately match and verify, which is not what this guards
    is_kf = jnp.arange(F) == q
    (li, _, _, _, nl), accepted, pairs, diag = engine._window_loops(
        st, xyz, valid, descs, slots, is_kf, True, ec, cfg)
    scores = np.asarray(diag[0])
    acc = np.asarray(accepted)
    # the poisoned candidate is the TOP retrieval (score ~1.0) yet must
    # fail GICP verification; the query's other (genuine) candidates may
    # legitimately verify - only the fake one is under test
    assert scores[0] > 0.95, "the poisoned candidate must be retrieved"
    assert not acc[0], "GICP verification must reject the mismatch"
    assert np.all(np.asarray(pairs)[0] == -1)
    # no edge accepted THIS call points at the poisoned slot (edges from
    # the natural run predate the poisoning and don't count)
    n0 = int(eng.state.n_loops)
    lin = np.asarray(li)[n0:int(nl)]
    assert not np.any(lin == 1)
