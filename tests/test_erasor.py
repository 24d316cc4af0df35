"""ERASOR-style map cleaning test: a car present in the map but absent from
the current scan must be flagged dynamic; ground must be preserved."""

import numpy as np
import pytest
import jax.numpy as jnp

from dr_using_scv_od_tpu.models import erasor


def _scene(rng, with_car):
    """Ground disc + wall + optionally a car box at (10, 0)."""
    n_g = 8000
    r = np.sqrt(rng.uniform(4.0, 40.0 ** 2, n_g))
    th = rng.uniform(0, 2 * np.pi, n_g)
    g = np.stack([r * np.cos(th), r * np.sin(th),
                  rng.normal(scale=0.02, size=n_g) - 1.7], 1)
    w = np.stack([rng.uniform(-15, 15, 2000),
                  np.full(2000, 20.0) + rng.normal(scale=0.02, size=2000),
                  rng.uniform(-1.7, 5, 2000)], 1)
    parts = [g, w]
    kinds = [np.zeros(n_g), np.ones(2000)]
    if with_car:
        car = np.stack([rng.uniform(8, 12.2, 1200),
                        rng.uniform(-0.9, 0.9, 1200),
                        rng.uniform(-1.7, -0.2, 1200)], 1)
        parts.append(car)
        kinds.append(np.full(1200, 2))
    return (np.concatenate(parts).astype(np.float32),
            np.concatenate(kinds).astype(np.int32))


@pytest.mark.slow
def test_departed_car_removed(rng):
    cfg = erasor.ErasorConfig()
    map_pts, map_kind = _scene(rng, with_car=True)     # car was there
    scan_pts, _ = _scene(rng, with_car=False)          # car has left
    ego = jnp.zeros(3)
    res = erasor.clean_map(jnp.asarray(map_pts),
                           jnp.ones(len(map_pts), bool),
                           jnp.asarray(scan_pts),
                           jnp.ones(len(scan_pts), bool), ego, cfg)
    dyn = np.asarray(res.dynamic)
    car = map_kind == 2
    ground = map_kind == 0
    wall = map_kind == 1
    assert dyn[car].mean() > 0.7, f"car removal {dyn[car].mean()}"
    assert dyn[ground].mean() < 0.02, f"ground removed {dyn[ground].mean()}"
    assert dyn[wall].mean() < 0.05, f"wall removed {dyn[wall].mean()}"
    assert int(res.bin_overflow) == 0


def test_static_scene_untouched(rng):
    cfg = erasor.ErasorConfig()
    map_pts, _ = _scene(rng, with_car=True)
    scan_pts, _ = _scene(rng, with_car=True)           # car still there
    res = erasor.clean_map(jnp.asarray(map_pts),
                           jnp.ones(len(map_pts), bool),
                           jnp.asarray(scan_pts),
                           jnp.ones(len(scan_pts), bool), jnp.zeros(3), cfg)
    dyn = np.asarray(res.dynamic)
    assert dyn.mean() < 0.02
