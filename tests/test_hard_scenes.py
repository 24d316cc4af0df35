"""Hard-scene accuracy floors (round-3 verdict item 7).

Three stress regimes the plain box-world scenes never exercised:
  * cars parked flush against building walls - inside RI3's +-2-voxel
    intensity-fusion range (the fusion could eat the car into the wall;
    if it does, the merged cluster is building-typed and never judged, so
    the failure mode would show as PR loss, not RR loss);
  * a dynamic car that STOPS mid-window (the reference's hardest case -
    its split branch, src/ssc.cpp:1351-1374). GT labels follow
    SemanticKITTI's per-scan convention: the stopped car's points are
    static (10) from the stop frame on;
  * both at once plus heavy tree clutter near the movers' corridor.

Floors pinned just below measured values (full-size grid, CPU):
  wall-parked    PR=99.87 RR=100.0
  stopper        PR=99.89 RR=91.7
  clutter        PR=99.90 RR=86.0
Known, documented divergence driving the clutter RR: a mover passing
within the CVC/RI3 merge range of a tree canopy merges with it and is
tree-typed for those frames, so its points go unjudged (the reference's
sequential merge order has the same failure regime - its per-sequence RR
spans 94.5-97.7 on real data, doc/note.txt).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dr_using_scv_od_tpu import config
from dr_using_scv_od_tpu.eval import metrics
from dr_using_scv_od_tpu.models import pipeline
from dr_using_scv_od_tpu.utils import synthetic


def _run(spec, F=4):
    cfg = config.semantickitti()
    scene = synthetic.make_scene(spec)
    win = synthetic.render_window(scene, F, cfg.shapes.max_points)
    res = pipeline.run_window(
        jnp.asarray(win["xyz"]), jnp.asarray(win["intensity"]),
        jnp.asarray(win["valid"]), jnp.asarray(win["poses"]), cfg)
    m = metrics.removal_metrics(
        jnp.asarray(win["label"][:F - 1]).reshape(-1),
        res.removed[:F - 1].reshape(-1),
        jnp.asarray(win["valid"][:F - 1]).reshape(-1))
    return m, res, win


@pytest.mark.slow
def test_wall_parked_cars_stay_static():
    """Cars 0.3 m from a building wall must not be removed (PR floor) and
    must not suppress detection of the movers (RR floor)."""
    m, _, _ = _run(synthetic.SceneSpec(wall_parked_cars=2))
    assert m.pr > 99.5, f"wall-parked car points removed: PR={m.pr}"
    assert m.rr > 96.0, f"movers missed in wall scene: RR={m.rr}"


@pytest.mark.slow
def test_mover_stopping_mid_window():
    """A car that stops at frame 2 of 6: its moving-phase points must be
    removed, its parked-phase points kept."""
    m, res, win = _run(synthetic.SceneSpec(stop_frame=2), F=6)
    assert m.pr > 99.0, f"stopped car's parked phase removed: PR={m.pr}"
    assert m.rr > 88.0, f"moving phase missed: RR={m.rr}"
    # the stopped car must not be judged dynamic AFTER it stopped: no
    # GT-static points of the final judged frames may be removed in bulk
    lab = np.asarray(win["label"])
    removed = np.asarray(res.removed)
    late_static_removed = (removed[3:5] & (lab[3:5] == 10)).sum()
    late_static = ((lab[3:5] == 10) & np.asarray(win["valid"][3:5])).sum()
    assert late_static_removed < 0.2 * max(late_static, 1), (
        f"{late_static_removed}/{late_static} parked-phase points removed")


@pytest.mark.slow
def test_cluttered_scene_floor():
    """Wall-parked cars + a stopping mover + dense trees near the road.
    RR floor is lower by design: movers passing through tree-canopy merge
    range go tree-typed and unjudged for those frames (documented
    divergence, module docstring)."""
    m, _, _ = _run(synthetic.SceneSpec(wall_parked_cars=2, stop_frame=2,
                                       n_trees=12), F=6)
    assert m.pr > 99.0, f"clutter scene removed static points: PR={m.pr}"
    assert m.rr > 82.0, f"clutter scene RR collapsed: RR={m.rr}"
