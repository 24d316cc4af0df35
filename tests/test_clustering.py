"""Connected-components label propagation vs a scipy/python reference
(union-find over 26-neighbourhoods, the fixpoint of src/ssc.cpp:299-419)."""

import numpy as np
import jax.numpy as jnp

from dr_using_scv_od_tpu.ops import clustering


def brute_cc(occ):
    """Union-find CC with 26-connectivity over an [A,R,S] bool grid."""
    A, R, S = occ.shape
    parent = {}

    def find(v):
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    idx = np.argwhere(occ)
    for a, r, s in idx:
        parent[(a, r, s)] = parent.get((a, r, s), (a, r, s))
    for a, r, s in idx:
        for da in (-1, 0, 1):
            for dr in (-1, 0, 1):
                for ds in (-1, 0, 1):
                    na, nr, ns = a + da, r + dr, s + ds
                    if 0 <= na < A and 0 <= nr < R and 0 <= ns < S \
                            and occ[na, nr, ns]:
                        union((a, r, s), (na, nr, ns))
    lab = np.full(occ.size, -1, np.int64)
    for (a, r, s) in idx:
        ra, rr, rs = find((a, r, s))
        lab[(a * R + r) * S + s] = (ra * R + rr) * S + rs
    return lab


def test_cc_random(rng):
    occ = rng.random((6, 10, 14)) < 0.25
    got = np.asarray(clustering.connected_components(jnp.asarray(occ)))
    want = brute_cc(occ)
    occ_flat = occ.reshape(-1)
    np.testing.assert_array_equal(got[occ_flat], want[occ_flat])
    # empty cells are self-loops
    own = np.arange(occ.size)
    np.testing.assert_array_equal(got[~occ_flat], own[~occ_flat])


def test_cc_long_snake():
    """A single long 1-voxel-wide component exercises propagation depth."""
    occ = np.zeros((3, 4, 60), bool)
    occ[1, 1, :] = True
    got = np.asarray(clustering.connected_components(jnp.asarray(occ)))
    labs = got[occ.reshape(-1)]
    assert len(np.unique(labs)) == 1


def test_cc_no_sector_wraparound():
    """Sector 0 and sector S-1 must NOT connect (reference clamps, no wrap,
    src/ssc.cpp:402-403)."""
    occ = np.zeros((1, 1, 12), bool)
    occ[0, 0, 0] = True
    occ[0, 0, 11] = True
    got = np.asarray(clustering.connected_components(jnp.asarray(occ)))
    assert got[0] != got[11]


def test_compact_labels():
    roots_pts = jnp.asarray(np.array([7, 3, 7, 9, 3, 3, 100], np.int32))
    valid = jnp.asarray(np.array([1, 1, 1, 1, 1, 1, 0], bool))
    roots, pc, n, dropped = clustering.compact_labels(roots_pts, valid,
                                                      max_clusters=8,
                                                      sentinel=1000)
    roots, pc = np.asarray(roots), np.asarray(pc)
    assert int(n) == 3 and int(dropped) == 0
    assert list(roots[:3]) == [3, 7, 9]
    np.testing.assert_array_equal(pc, [1, 0, 1, 2, 0, 0, -1])


def test_compact_labels_overflow():
    roots_pts = jnp.asarray(np.arange(10, dtype=np.int32) * 3)
    valid = jnp.ones(10, bool)
    roots, pc, n, dropped = clustering.compact_labels(roots_pts, valid,
                                                      max_clusters=4,
                                                      sentinel=1000)
    assert int(n) == 4 and int(dropped) == 6  # 6 points in dropped clusters
    pc = np.asarray(pc)
    assert np.all(pc[:4] == np.arange(4))
    assert np.all(pc[4:] == -1)
