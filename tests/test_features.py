"""Feature descriptor tests (reference API: getDescriptorByEigenValue,
getDescriptorByEnsembleShape, compareFeature - src/ssc.cpp:658-911)."""

import numpy as np
import pytest
import jax.numpy as jnp

from dr_using_scv_od_tpu import config
from dr_using_scv_od_tpu.models import features


CFG = config.tiny_test()


def _two_clusters(rng):
    """Cluster 0: a thin line (high linearity). Cluster 1: a ball."""
    line = np.stack([np.linspace(0, 5, 300),
                     rng.normal(scale=0.01, size=300),
                     rng.normal(scale=0.01, size=300)], 1)
    ball = rng.normal(scale=1.0, size=(300, 3)) + [10, 0, 0]
    xyz = np.concatenate([line, ball]).astype(np.float32)
    pc = np.concatenate([np.zeros(300), np.ones(300)]).astype(np.int32)
    return jnp.asarray(xyz), jnp.asarray(pc)


@pytest.mark.slow
def test_eigen_features_geometry(rng):
    xyz, pc = _two_clusters(rng)
    f = np.asarray(features.eigen_features(xyz, pc, 4, CFG))
    # line: linearity ~1; ball: scattering high, linearity low
    assert f[0, 0] > 0.95
    assert f[1, 0] < 0.4
    assert f[1, 2] > 0.3           # scattering
    assert f[0, 7] == 300 and f[1, 7] == 300


def test_shape_histogram_distinguishes(rng):
    xyz, pc = _two_clusters(rng)
    h = np.asarray(features.shape_histogram(xyz, pc, 4))
    assert h.shape == (4, 10)
    np.testing.assert_allclose(h[0].sum(), 1.0, atol=1e-5)
    np.testing.assert_allclose(h[1].sum(), 1.0, atol=1e-5)
    # the line's D2 is flat-ish; the ball's concentrates at mid distances
    assert np.abs(h[0] - h[1]).sum() > 0.2


def test_compare_weights():
    f1 = jnp.zeros((10,))
    f2 = jnp.ones((10,))
    # sum of the reference weights (src/ssc.cpp:900-909): 2.8 (slot 9 is 0)
    np.testing.assert_allclose(float(features.compare(f1, f2)), 2.8,
                               atol=1e-6)
    # identical descriptors -> 0
    assert float(features.compare(f2, f2)) == 0.0


def test_feature21_concat(rng):
    e = jnp.asarray(rng.normal(size=(3, 11)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(3, 10)).astype(np.float32))
    f = features.feature21(e, s)
    assert f.shape == (3, 21)
    np.testing.assert_array_equal(np.asarray(f[:, :11]), np.asarray(e))
