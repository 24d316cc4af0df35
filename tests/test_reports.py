"""eval.reports + utils.io_sydney: the analysis-script analogs
(tool/readIntensity.py, tool/feature.py, tool/time.py, tool/car.py)."""

import json

import numpy as np

from dr_using_scv_od_tpu.eval import reports
from dr_using_scv_od_tpu.utils import artifacts, io_sydney


def test_sydney_roundtrip(tmp_path, rng):
    n = 64
    rec = np.zeros(n, io_sydney.SYDNEY_DTYPE)
    rec["x"] = rng.normal(size=n).astype(np.float32)
    rec["y"] = rng.normal(size=n).astype(np.float32)
    rec["z"] = rng.normal(size=n).astype(np.float32)
    rec["intensity"] = rng.integers(0, 255, n).astype(np.uint8)
    rec["pid"] = np.arange(n)
    p = tmp_path / "car.0.bin"
    rec.tofile(p)
    got = io_sydney.read_sydney_bin(p)
    np.testing.assert_allclose(got["xyz"][:, 0], rec["x"])
    np.testing.assert_array_equal(got["pid"], rec["pid"])
    xyzi = io_sydney.sydney_to_xyzi(p)
    assert xyzi.shape == (n, 4) and xyzi.dtype == np.float32
    np.testing.assert_allclose(xyzi[:, 3], rec["intensity"].astype(np.float32))


def test_intensity_dump_report(tmp_path, rng):
    count = np.array([0, 3, 5, 0, 2])
    mean = rng.uniform(0, 30, 5).astype(np.float32)
    var = rng.uniform(0, 100, 5).astype(np.float32)
    artifacts.record_intensity(tmp_path / "0", count, mean, var)
    av, cov = reports.read_intensity_dump(tmp_path / "0")
    assert len(av) == 3 and len(cov) == 3          # occupied voxels only
    np.testing.assert_allclose(av, mean[count > 0], atol=1e-3)
    np.testing.assert_allclose(cov, var[count > 0] / 100.0, atol=1e-3)
    h = reports.intensity_histogram(av, bins=4)
    assert h["n"] == 3 and h["counts"].sum() == 3


def test_cluster_feature_matrix_geometry(rng):
    # cluster 0: horizontal plane; cluster 1: vertical line
    plane = np.c_[rng.uniform(-2, 2, (200, 2)),
                  rng.normal(0, 0.01, 200) + 1.0].astype(np.float32)
    line = np.c_[rng.normal(0, 0.01, (150, 2)),
                 rng.uniform(0, 4, 150)].astype(np.float32)
    xyz = np.concatenate([plane, line])
    pc = np.r_[np.zeros(200, np.int32), np.ones(150, np.int32)]
    f = reports.cluster_feature_matrix(xyz, pc, 2)
    names = reports.FEATURE_NAMES
    plane_f = dict(zip(names, f[0]))
    line_f = dict(zip(names, f[1]))
    assert plane_f["planarity"] > 0.7 and plane_f["scattering"] < 0.05
    assert plane_f["orientation"] < 0.1            # normal ~ +z
    assert line_f["linearity"] > 0.9
    assert abs(plane_f["max_height"] - 1.0) < 0.1
    assert line_f["scale"] > 3.5


def test_per_class_feature_stats(rng):
    xyz = rng.normal(size=(90, 3)).astype(np.float32)
    pc = np.repeat(np.arange(3, dtype=np.int32), 30)
    ctype = np.array([0, 1, 2], np.int32)          # building, tree, car
    stats = reports.per_class_feature_stats(xyz, pc, ctype, 3)
    assert set(stats) == {"building", "tree", "car"}
    assert stats["car"]["planarity"]["n"] == 1


def test_parse_time_log_text_and_json(tmp_path):
    txt = tmp_path / "time.txt"
    txt.write_text("10.0\t20.0\n30.0\t40.0\n")
    res = reports.parse_time_log(txt, ["seg", "track"])
    assert res["summary"] == {"seg": 20.0, "track": 30.0}
    assert res["total_ms"] == 50.0

    js = tmp_path / "time.json"
    js.write_text(json.dumps({"rows": [{"a": 4.0}, {"a": 6.0}],
                              "summary": {}}))
    res = reports.parse_time_log(js)
    assert res["summary"] == {"a": 5.0}
