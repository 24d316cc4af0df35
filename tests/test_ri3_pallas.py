"""RI3 Pallas kernel semantic tests (interpret mode): qualifying-edge
merges fuse clusters transitively; non-qualifying neighbours never merge."""

import numpy as np
import jax.numpy as jnp

from dr_using_scv_od_tpu.ops import clustering
from dr_using_scv_od_tpu.ops.pallas import ri3_kernel
import pytest

pytestmark = pytest.mark.slow  # heavy e2e tier (fast tier: -m 'not slow')


def _run(occ, av, var, shape3, search_c=2, cov_th=1.0, diff_th=2.0):
    A, R, S = shape3
    G = A * R * S
    roots = clustering.connected_components(jnp.asarray(occ))
    count = jnp.asarray(occ.reshape(-1).astype(np.int32))
    return np.asarray(ri3_kernel.refine_by_intensity_pallas(
        roots, count, jnp.asarray(av.reshape(-1)),
        jnp.asarray(var.reshape(-1)), shape3, search_c, cov_th, diff_th,
        far_range_frac=1.0, interpret=True)), np.asarray(roots)


def test_merge_via_qualifying_gap():
    """Two clusters 2 voxels apart in sector, matching intensity stats ->
    merged; a third with wrong intensity stays separate."""
    shape3 = (4, 8, 32)
    occ = np.zeros(shape3, bool)
    occ[1, 3, 5] = True            # cluster A
    occ[1, 3, 7] = True            # cluster B (gap of 1 -> chebyshev 2)
    occ[1, 3, 20] = True           # cluster C far away
    av = np.zeros(shape3, np.float32)
    av[1, 3, 5] = 100.0
    av[1, 3, 7] = 101.0            # |diff| <= 2 -> qualifies
    av[1, 3, 20] = 100.0
    var = np.zeros(shape3, np.float32)  # all variance-ok
    fused, roots = _run(occ, av, var, shape3)
    f = fused.reshape(shape3)
    assert f[1, 3, 5] == f[1, 3, 7], "matching intensities must merge"
    assert f[1, 3, 5] != f[1, 3, 20], "distant cluster must not merge"


def test_no_merge_when_variance_bad():
    shape3 = (4, 8, 32)
    occ = np.zeros(shape3, bool)
    occ[1, 3, 5] = True
    occ[1, 3, 7] = True
    av = np.full(shape3, 100.0, np.float32)
    var = np.zeros(shape3, np.float32)
    var[1, 3, 7] = 50.0            # neighbour variance too high
    var[1, 3, 5] = 50.0
    fused, _ = _run(occ, av, var, shape3)
    f = fused.reshape(shape3)
    assert f[1, 3, 5] != f[1, 3, 7]


def test_no_merge_when_intensity_differs():
    shape3 = (4, 8, 32)
    occ = np.zeros(shape3, bool)
    occ[1, 3, 5] = True
    occ[1, 3, 7] = True
    av = np.zeros(shape3, np.float32)
    av[1, 3, 5] = 100.0
    av[1, 3, 7] = 150.0            # |diff| > 2
    var = np.zeros(shape3, np.float32)
    fused, _ = _run(occ, av, var, shape3)
    f = fused.reshape(shape3)
    assert f[1, 3, 5] != f[1, 3, 7]


def test_merged_label_spreads_across_cluster():
    """When an edge merges two clusters, ALL voxels of both take the min
    label (whole-cluster fusion, src/ssc.cpp:613-626)."""
    shape3 = (4, 8, 32)
    occ = np.zeros(shape3, bool)
    occ[1, 3, 2:6] = True          # cluster A: run of 4 (s=2..5)
    occ[1, 3, 7:11] = True         # cluster B: run of 4 (s=7..10), cheb 2
    av = np.zeros(shape3, np.float32)
    av[1, 3, 2:6] = 100.0
    av[1, 3, 7:11] = 101.0
    var = np.zeros(shape3, np.float32)
    # make in-cluster edges non-qualifying on intensity (big var)... but
    # same-cluster propagation must still spread the merged label
    var[1, 3, 3] = 99.0
    var[1, 3, 9] = 99.0
    fused, _ = _run(occ, av, var, shape3)
    f = fused.reshape(shape3)
    labs = set(f[1, 3, 2:6].tolist()) | set(f[1, 3, 7:11].tolist())
    assert len(labs) == 1, f"expected one fused label, got {labs}"


def test_radius_shrink_at_far_range():
    """Beyond far_range_frac * R the neighbourhood shrinks to radius 1
    (src/ssc.cpp:397-399): a 2-gap merge must NOT happen there."""
    shape3 = (4, 16, 32)
    occ = np.zeros(shape3, bool)
    occ[1, 14, 5] = True           # far range bin
    occ[1, 14, 7] = True
    av = np.full(shape3, 100.0, np.float32)
    var = np.zeros(shape3, np.float32)
    A, R, S = shape3
    G = A * R * S
    roots = clustering.connected_components(jnp.asarray(occ))
    fused = np.asarray(ri3_kernel.refine_by_intensity_pallas(
        roots, jnp.asarray(occ.reshape(-1).astype(np.int32)),
        jnp.asarray(av.reshape(-1)), jnp.asarray(var.reshape(-1)),
        shape3, 2, 1.0, 2.0, far_range_frac=0.6, interpret=True))
    f = fused.reshape(shape3)
    assert f[1, 14, 5] != f[1, 14, 7]


def test_parity_with_xla_path_fuzz():
    """The Pallas kernel (interpret mode) and the XLA formulation
    (models/segmentation.refine_by_intensity) must compute the SAME fusion
    partition at fixpoint - they are two lowerings of one semantic."""
    import dataclasses
    from dr_using_scv_od_tpu import config
    from dr_using_scv_od_tpu.models import segmentation
    from dr_using_scv_od_tpu.types import VoxelGrid

    cfg = config.tiny_test()
    cfg = dataclasses.replace(
        cfg, seg=dataclasses.replace(cfg.seg, iteration=24))
    shape3 = cfg.grid.shape
    for seed in range(4):
        rng = np.random.default_rng(seed + 77)
        occ = rng.random(shape3) < 0.06
        av = rng.uniform(0, 12, shape3).astype(np.float32)
        var = rng.uniform(0, 2.5, shape3).astype(np.float32)
        roots = clustering.connected_components(jnp.asarray(occ))
        grid = VoxelGrid(count=jnp.asarray(occ.reshape(-1).astype(np.int32)),
                         intensity_mean=jnp.asarray(av.reshape(-1)),
                         intensity_var=jnp.asarray(var.reshape(-1)))
        xla = np.asarray(segmentation.refine_by_intensity(roots, grid, cfg))
        pal = np.asarray(ri3_kernel.refine_by_intensity_pallas(
            roots, grid.count, grid.intensity_mean, grid.intensity_var,
            shape3, cfg.seg.search_c, cfg.seg.intensity_cov,
            cfg.seg.intensity_diff, cfg.seg.far_range_frac,
            max_outer=32, interpret=True))
        o = occ.reshape(-1)
        # compare PARTITIONS (representatives may differ)
        import collections
        def part(lab):
            groups = collections.defaultdict(set)
            for v in np.nonzero(o)[0]:
                groups[lab[v]].add(int(v))
            return {frozenset(g) for g in groups.values()}
        assert part(xla) == part(pal), f"seed {seed}: partitions differ"
