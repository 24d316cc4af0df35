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
