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
