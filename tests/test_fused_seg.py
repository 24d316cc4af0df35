"""Fused CC+RI3 kernel parity (interpret mode): the union-graph fixpoint
must equal the two-kernel sequence (cc_pallas -> ri3_pallas) and the XLA
reference formulation, partition-for-partition, on random grids."""

import collections
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from dr_using_scv_od_tpu.ops import clustering
from dr_using_scv_od_tpu.ops.pallas import fused_seg, ri3_kernel

pytestmark = pytest.mark.slow  # heavy e2e tier (fast tier: -m 'not slow')


def _partition(lab, occ_flat):
    groups = collections.defaultdict(set)
    for v in np.nonzero(occ_flat)[0]:
        groups[lab[v]].add(int(v))
    return {frozenset(g) for g in groups.values()}


def test_fused_equals_two_kernel_sequence_fuzz():
    shape3 = (6, 16, 64)
    for seed in range(4):
        rng = np.random.default_rng(seed + 5)
        occ = rng.random(shape3) < 0.08
        av = rng.uniform(0, 12, shape3).astype(np.float32)
        var = rng.uniform(0, 2.5, shape3).astype(np.float32)

        roots = clustering.connected_components(jnp.asarray(occ))
        two = np.asarray(ri3_kernel.refine_by_intensity_pallas(
            roots, jnp.asarray(occ.reshape(-1).astype(np.int32)),
            jnp.asarray(av.reshape(-1)), jnp.asarray(var.reshape(-1)),
            shape3, 2, 1.0, 2.0, far_range_frac=0.6, interpret=True))
        one = np.asarray(fused_seg.cluster_labels_pallas(
            jnp.asarray(occ), jnp.asarray(av.reshape(-1)),
            jnp.asarray(var.reshape(-1)), 2, 1.0, 2.0,
            far_range_frac=0.6, interpret=True))
        o = occ.reshape(-1)
        # labels must be IDENTICAL (both report the component's min
        # original flat id), not merely the same partition
        np.testing.assert_array_equal(one[o], two[o])
        # empty cells are self-loops
        own = np.arange(occ.size)
        np.testing.assert_array_equal(one[~o], own[~o])


def test_fused_multi_tile_seam_fuzz():
    """Force multi-tile execution (ab=2 -> 3 tiles on A=6) so tile seams
    and the scratch azimuth wrap are exercised: without the a_iota guard
    on shell offsets, a scratch-edge voxel reads the opposite scratch edge
    (~AB+2H slabs away) as a neighbour and falsely merges clusters."""
    shape3 = (6, 16, 64)
    for seed in range(4):
        rng = np.random.default_rng(seed + 77)
        occ = rng.random(shape3) < 0.25
        av = rng.uniform(0, 4, shape3).astype(np.float32)   # all close
        var = np.zeros(shape3, np.float32)                  # all qualify
        two = np.asarray(ri3_kernel.refine_by_intensity_pallas(
            clustering.connected_components(jnp.asarray(occ)),
            jnp.asarray(occ.reshape(-1).astype(np.int32)),
            jnp.asarray(av.reshape(-1)), jnp.asarray(var.reshape(-1)),
            shape3, 2, 1.0, 8.0, far_range_frac=1.0, interpret=True))
        one = np.asarray(fused_seg.cluster_labels_pallas(
            jnp.asarray(occ), jnp.asarray(av.reshape(-1)),
            jnp.asarray(var.reshape(-1)), 2, 1.0, 8.0,
            far_range_frac=1.0, ab=2, interpret=True))
        o = occ.reshape(-1)
        np.testing.assert_array_equal(one[o], two[o])


def test_fused_no_azimuth_wraparound():
    """Adversarial wrap case. With ab=2/H=2, tile 1's scratch holds global
    slabs 0..5 (rows_a=6) and its interior is slabs 2..3. A voxel X at the
    top scratch edge (a=5) reading the da=+2 shell offset wraps to
    a_iota=(5+2)%6=1 — global slab 1, azimuth distance 4 > search_c.
    Without the a_iota guard X steals the lower label P=(1,5,10) and the
    cheb-1 run scans carry it along the occupied chain
    (5,10)->(4,10..13)->(3,13) INTO the interior in the same invocation,
    falsely merging the two components."""
    shape3 = (6, 16, 64)
    occ = np.zeros(shape3, bool)
    occ[1, 5, 10] = True                      # P: isolated low-id voxel
    occ[5, 5, 10] = True                      # X: wrap-reads P pre-fix
    occ[4, 5, 10:14] = True                   # s-run toward the interior
    occ[3, 5, 13] = True                      # interior landing cell
    av = np.full(shape3, 2.0, np.float32)     # all close in intensity
    var = np.zeros(shape3, np.float32)        # all qualify
    one = np.asarray(fused_seg.cluster_labels_pallas(
        jnp.asarray(occ), jnp.asarray(av.reshape(-1)),
        jnp.asarray(var.reshape(-1)), 2, 1.0, 8.0,
        far_range_frac=1.0, ab=2, interpret=True))
    p = np.ravel_multi_index((1, 5, 10), shape3)
    land = np.ravel_multi_index((3, 5, 13), shape3)
    assert one[p] != one[land], "azimuth wrap merged distant components"


def test_fused_no_shell_equals_cc():
    shape3 = (4, 12, 40)
    rng = np.random.default_rng(11)
    occ = rng.random(shape3) < 0.15
    av = rng.uniform(0, 12, shape3).astype(np.float32)
    var = np.zeros(shape3, np.float32)    # everything qualifies...
    cc = np.asarray(clustering.connected_components(jnp.asarray(occ)))
    one = np.asarray(fused_seg.cluster_labels_pallas(
        jnp.asarray(occ), jnp.asarray(av.reshape(-1)),
        jnp.asarray(var.reshape(-1)), 2, 1.0, 2.0,
        far_range_frac=0.6, enable_shell=False,   # ...but the shell is off
        interpret=True))
    o = occ.reshape(-1)
    np.testing.assert_array_equal(one[o], cc[o])


def test_fused_parity_with_xla_path():
    """Same partition as the XLA formulation (CC + refine_by_intensity run
    to fixpoint) on the tiny config grid."""
    from dr_using_scv_od_tpu import config
    from dr_using_scv_od_tpu.models import segmentation
    from dr_using_scv_od_tpu.types import VoxelGrid

    cfg = config.tiny_test()
    cfg = dataclasses.replace(
        cfg, seg=dataclasses.replace(cfg.seg, iteration=24))
    shape3 = cfg.grid.shape
    for seed in range(3):
        rng = np.random.default_rng(seed + 31)
        occ = rng.random(shape3) < 0.06
        av = rng.uniform(0, 12, shape3).astype(np.float32)
        var = rng.uniform(0, 2.5, shape3).astype(np.float32)
        roots = clustering.connected_components(jnp.asarray(occ))
        grid = VoxelGrid(count=jnp.asarray(occ.reshape(-1).astype(np.int32)),
                         intensity_mean=jnp.asarray(av.reshape(-1)),
                         intensity_var=jnp.asarray(var.reshape(-1)))
        xla = np.asarray(segmentation.refine_by_intensity(roots, grid, cfg))
        one = np.asarray(fused_seg.cluster_labels_pallas(
            jnp.asarray(occ), grid.intensity_mean, grid.intensity_var,
            cfg.seg.search_c, cfg.seg.intensity_cov, cfg.seg.intensity_diff,
            cfg.seg.far_range_frac, interpret=True))
        o = occ.reshape(-1)
        assert _partition(xla, o) == _partition(one, o), \
            f"seed {seed}: partitions differ"
