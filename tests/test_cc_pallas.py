"""Pallas CC kernel equivalence vs the XLA reference implementation
(interpret mode on CPU; compiled path exercised on TPU by bench/pipeline)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dr_using_scv_od_tpu.ops import clustering
from dr_using_scv_od_tpu.ops.pallas import cc_kernel


@pytest.mark.parametrize("shape,density", [
    ((4, 8, 16), 0.3),
    ((12, 16, 24), 0.2),
    ((12, 16, 24), 0.6),
])
def test_pallas_cc_matches_xla(rng, shape, density):
    occ = rng.random(shape) < density
    want = np.asarray(clustering.connected_components(jnp.asarray(occ)))
    got = np.asarray(cc_kernel.connected_components_pallas(
        jnp.asarray(occ), interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_cc_multi_tile_seam(rng, seed):
    """ab=4 on A=12 forces 3 tiles; middle tiles have REAL occupied slabs
    at both scratch edges, so the circular roll wrap is reachable — the
    a_iota guards must stop cross-scratch false cheb-1 edges."""
    r2 = np.random.default_rng(seed + 19)
    occ = r2.random((12, 16, 24)) < 0.35
    want = np.asarray(clustering.connected_components(jnp.asarray(occ)))
    got = np.asarray(cc_kernel.connected_components_pallas(
        jnp.asarray(occ), ab=4, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_cc_no_azimuth_wraparound():
    """With ab=2/H=4, tile 2's scratch holds global slabs 0..9 (rows_a=10)
    with interior slabs 4..5. The top-edge voxel X=(9,5,10) reading da=+1
    wraps to a_iota=0 — global slab 0, azimuth distance 9. Without the
    a_iota guard X steals P=(0,5,10)'s lower label and the azimuth run
    scan carries it down the occupied run a=5..9 into the interior in the
    same invocation."""
    occ = np.zeros((12, 16, 24), bool)
    occ[0, 5, 10] = True           # P: isolated low-id voxel
    occ[5:10, 5, 10] = True        # occupied azimuth run reaching interior
    want = np.asarray(clustering.connected_components(jnp.asarray(occ)))
    got = np.asarray(cc_kernel.connected_components_pallas(
        jnp.asarray(occ), ab=2, interpret=True))
    np.testing.assert_array_equal(got, want)
    p = np.ravel_multi_index((0, 5, 10), (12, 16, 24))
    x = np.ravel_multi_index((5, 5, 10), (12, 16, 24))
    assert got[p] != got[x]


def test_pallas_cc_snake(rng):
    """Long sector run + azimuth/range hops."""
    occ = np.zeros((6, 8, 40), bool)
    occ[2, 3, :] = True            # a long run along sector
    occ[3, 4, 39] = True           # diagonal hop at the end
    occ[0, 0, 0] = True            # isolated voxel
    want = np.asarray(clustering.connected_components(jnp.asarray(occ)))
    got = np.asarray(cc_kernel.connected_components_pallas(
        jnp.asarray(occ), interpret=True))
    np.testing.assert_array_equal(got, want)
