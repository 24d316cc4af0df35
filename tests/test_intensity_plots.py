"""Intensity calibration (src/ssc.cpp:98-153 analog) + plots smoke tests."""

import numpy as np
import jax.numpy as jnp

from dr_using_scv_od_tpu import config
from dr_using_scv_od_tpu.eval import plots
from dr_using_scv_od_tpu.ops import intensity as intensity_ops
from dr_using_scv_od_tpu.ops import quantize


def test_calibration_brightens_oblique_surfaces(rng):
    """Points on a surface seen at a grazing angle get boosted; saturation
    clamps at max_intensity."""
    grid = config.tiny_test().grid
    # vertical wall at x=10: viewing ray ~ perpendicular to wall normal? No:
    # ray along +x, wall normal along x -> cos ~ 1 (no boost). Ground plane
    # seen from above at distance: normal z, ray mostly horizontal -> low
    # cos -> boost.
    n = 400
    xyz = np.stack([rng.uniform(8, 12, n), rng.uniform(-1, 1, n),
                    np.full(n, -1.7) + rng.normal(scale=0.01, size=n)],
                   1).astype(np.float32)
    inten = np.full(n, 50.0, np.float32)
    valid = np.ones(n, bool)
    _, flat, fov = quantize.quantize(jnp.asarray(xyz), jnp.asarray(valid),
                                     grid)
    out = np.asarray(intensity_ops.calibrate_by_orientation(
        jnp.asarray(xyz), jnp.asarray(inten), flat, fov, grid))
    boosted = out[np.asarray(fov)]
    assert boosted.mean() > 55.0, "grazing ground should brighten"
    assert boosted.max() <= 255.0


def test_calibration_clamps_saturation(rng):
    grid = config.tiny_test().grid
    xyz = np.stack([rng.uniform(8, 12, 100), rng.uniform(-1, 1, 100),
                    np.full(100, -1.7)], 1).astype(np.float32)
    inten = np.full(100, 250.0, np.float32)
    valid = np.ones(100, bool)
    _, flat, fov = quantize.quantize(jnp.asarray(xyz), jnp.asarray(valid),
                                     grid)
    out = np.asarray(intensity_ops.calibrate_by_orientation(
        jnp.asarray(xyz), jnp.asarray(inten), flat, fov, grid))
    assert out.max() <= 255.0


def test_plots_write_files(tmp_path):
    rows = [{"threshold": t, "pr": 95.0 + t, "rr": 97.0 - t, "f1": 0.95}
            for t in (0.2, 0.5, 0.8)]
    plots.plot_pr_rr_sensitivity(rows, tmp_path / "pr.png")
    plots.plot_iou_bars({0: 60.0, 1: 65.0, 2: 96.0},
                        {0: "building", 1: "tree", 2: "car"},
                        tmp_path / "iou.png")
    plots.plot_stage_times({"patchwork": 5.0, "cc": 11.0},
                           tmp_path / "time.png")
    if plots._HAS_MPL:
        assert (tmp_path / "pr.png").exists()
        assert (tmp_path / "iou.png").exists()
        assert (tmp_path / "time.png").exists()
