"""Golden tests for APRI quantization + voxel stats against the reference
formulas (src/ssc.cpp:155-195, 253-289)."""

import numpy as np
import jax.numpy as jnp

from dr_using_scv_od_tpu import config
from dr_using_scv_od_tpu.ops import quantize


CFG = config.semantickitti()


def ref_apri(pt, grid):
    """Reference makeApriVec for one point (src/ssc.cpp:158-188)."""
    x, y, z = pt
    dis = np.hypot(x, y)
    ang = np.degrees(np.arctan2(y, x) + (2 * np.pi if y < 0 else 0)) \
        if not (x == 0 and y == 0) else 0.0
    azi = np.degrees(np.arctan2(z, dis))
    if dis < grid.min_dis or dis > grid.max_dis:
        return None
    if ang < grid.min_angle or ang > grid.max_angle:
        return None
    if azi < grid.min_azimuth or azi > grid.max_azimuth:
        return None
    ri = int(np.ceil((dis - grid.min_dis) / grid.range_res)) - 1
    si = int(np.ceil((ang - grid.min_angle) / grid.sector_res)) - 1
    ai = int(np.ceil((azi - grid.min_azimuth) / grid.azimuth_res)) - 1
    # our implementation clips the boundary -1 case to 0
    ri, si, ai = max(ri, 0), max(si, 0), max(ai, 0)
    return ai * grid.range_num * grid.sector_num + ri * grid.sector_num + si


def test_quantize_matches_reference(rng):
    grid = CFG.grid
    pts = rng.uniform(-35, 35, size=(2000, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-3, 6, size=2000)
    valid = np.ones(2000, bool)
    idx3, flat, in_fov = quantize.quantize(jnp.asarray(pts),
                                           jnp.asarray(valid), grid)
    flat = np.asarray(flat)
    in_fov = np.asarray(in_fov)
    for i in range(2000):
        want = ref_apri(pts[i], grid)
        if want is None:
            assert not in_fov[i], f"point {i} should be out of FOV"
        else:
            assert in_fov[i], f"point {i} should be in FOV"
            assert flat[i] == want, (i, pts[i], flat[i], want)


def test_grid_dims_match_reference():
    g = CFG.grid
    # src/ssc.cpp:36-39 with semantickitti.yaml values
    assert g.range_num == int(np.ceil((30.0 - 1.5) / 0.4)) == 72
    assert g.sector_num == 300
    assert g.azimuth_num == 60
    assert g.bin_num == 72 * 300 * 60


def test_voxel_stats(rng):
    grid = config.tiny_test().grid
    n = 500
    pts = rng.uniform(-12, 12, size=(n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2, 2, size=n)
    inten = rng.uniform(0, 255, size=n).astype(np.float32)
    valid = np.ones(n, bool)
    _, flat, in_fov = quantize.quantize(jnp.asarray(pts), jnp.asarray(valid),
                                        grid)
    vg = quantize.voxel_stats(flat, jnp.asarray(inten), in_fov, grid)
    count = np.asarray(vg.count)
    mean = np.asarray(vg.intensity_mean)
    var = np.asarray(vg.intensity_var)
    flat_np, fov_np = np.asarray(flat), np.asarray(in_fov)
    # verify against numpy group-by (reference second pass, ssc.cpp:282-288)
    for v in np.unique(flat_np[fov_np]):
        sel = inten[(flat_np == v) & fov_np]
        assert count[v] == len(sel)
        np.testing.assert_allclose(mean[v], sel.mean(), rtol=1e-4)
        np.testing.assert_allclose(var[v], sel.var(), rtol=1e-3, atol=1e-3)
    assert count.sum() == fov_np.sum()


def test_voxel_stats_moments_matches_voxel_stats(rng):
    """The fused wide-scatter path must reproduce voxel_stats' intensity
    statistics exactly AND the per-voxel xyz moment sums (the planarity
    inputs) against a numpy group-by."""
    grid = config.tiny_test().grid
    n = 500
    pts = rng.uniform(-12, 12, size=(n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2, 2, size=n)
    inten = rng.uniform(0, 255, size=n).astype(np.float32)
    valid = np.ones(n, bool)
    valid[::9] = False
    _, flat, in_fov = quantize.quantize(jnp.asarray(pts),
                                        jnp.asarray(valid), grid)
    vg0 = quantize.voxel_stats(flat, jnp.asarray(inten), in_fov, grid)
    vg, mom = quantize.voxel_stats_moments(
        flat, jnp.asarray(pts), jnp.asarray(inten), in_fov, grid)
    np.testing.assert_array_equal(np.asarray(vg.count),
                                  np.asarray(vg0.count))
    np.testing.assert_allclose(np.asarray(vg.intensity_mean),
                               np.asarray(vg0.intensity_mean), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(vg.intensity_var),
                               np.asarray(vg0.intensity_var),
                               rtol=1e-5, atol=1e-5)
    mom = np.asarray(mom)
    flat_np, fov_np = np.asarray(flat), np.asarray(in_fov)
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    cols = np.stack([x, y, z, x * x, y * y, z * z, x * y, x * z, y * z], 1)
    for v in np.unique(flat_np[fov_np]):
        sel = cols[(flat_np == v) & fov_np]
        np.testing.assert_allclose(mom[v], sel.sum(0), rtol=1e-4,
                                   atol=1e-4)


def test_voxel_downsample(rng):
    n = 1000
    pts = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[::7] = False
    keep = np.asarray(quantize.voxel_downsample(jnp.asarray(pts),
                                                jnp.asarray(valid), 0.5))
    assert not np.any(keep & ~valid)
    # kept points must be unique per leaf and cover every occupied leaf
    ijk = np.floor((pts + 200.0) / 0.5).astype(int)
    leaf_all = {tuple(v) for v in ijk[valid]}
    leaf_kept = [tuple(v) for v in ijk[keep]]
    assert len(leaf_kept) == len(set(leaf_kept))
    assert set(leaf_kept) == leaf_all
