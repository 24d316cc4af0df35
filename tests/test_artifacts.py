"""Artifact writer tests (saveSegCloud / recordIntensity / remain-map
analogs, src/ssc.cpp:469-569, 1550-1587, src/plotStatic.cpp)."""

import numpy as np

from dr_using_scv_od_tpu.utils import artifacts, io_session


def test_colored_segmentation(rng):
    xyz = rng.normal(size=(10, 3)).astype(np.float32)
    pc = np.array([0, 0, 1, 1, 2, 2, -1, -1, 3, 3], np.int32)
    types = np.array([0, 1, 2, 2], np.int32)        # building/tree/car/car
    states = np.array([-1, -1, 1, 0], np.int32)     # cluster 2 dynamic
    tracks = np.array([-1, -1, 5, 9], np.int32)
    rows = artifacts.colored_segmentation(xyz, pc, types, states, tracks)
    assert rows.shape == (8, 6)                     # -1 points excluded
    np.testing.assert_array_equal(rows[0, 3:], artifacts.COLOR_BUILDING)
    np.testing.assert_array_equal(rows[2, 3:], artifacts.COLOR_TREE)
    np.testing.assert_array_equal(rows[4, 3:], artifacts.COLOR_DYNAMIC)
    # static car keeps its track color, never red
    assert tuple(rows[6, 3:]) != artifacts.COLOR_DYNAMIC


def test_colored_pcd_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(5, 3)).astype(np.float32)
    rgb = np.array([[255, 0, 0]] * 5, np.float32)
    artifacts.write_colored_pcd(tmp_path / "c.pcd",
                                np.concatenate([xyz, rgb], 1))
    data, fields = io_session.read_pcd_fields(tmp_path / "c.pcd")
    assert fields == ["x", "y", "z", "rgb"]
    np.testing.assert_allclose(data[:, :3], xyz, atol=1e-6)
    packed = data[:, 3].view(np.uint32) if data[:, 3].dtype == np.float32 \
        else data[:, 3]
    packed = np.ascontiguousarray(data[:, 3]).view(np.uint32)
    assert np.all((packed >> 16) & 0xFF == 255)


def test_record_intensity(tmp_path):
    count = np.array([0, 3, 0, 2])
    mean = np.array([0.0, 10.0, 0.0, 20.0])
    var = np.array([0.0, 100.0, 0.0, 200.0])
    artifacts.record_intensity(tmp_path / "f0", count, mean, var)
    av = open(tmp_path / "f0_av.txt").read().split()
    cov = open(tmp_path / "f0_cov.txt").read().split()
    assert [float(v) for v in av] == [10.0, 20.0]
    assert [float(v) for v in cov] == [1.0, 2.0]   # scaled by 1/100


def test_remain_map(rng):
    xyz = rng.normal(size=(6, 3)).astype(np.float32)
    labels = np.array([40, 50, 252, 253, 70, 10], np.uint32)
    rows = artifacts.remain_map(xyz, labels)
    np.testing.assert_array_equal(rows[2, 3:], artifacts.COLOR_DYNAMIC)
    np.testing.assert_array_equal(rows[3, 3:], artifacts.COLOR_DYNAMIC)
    assert tuple(rows[0, 3:]) != artifacts.COLOR_DYNAMIC
