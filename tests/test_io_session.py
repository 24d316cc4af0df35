"""PCD-session loading + scan accumulation tests (reference is_pcd mode,
src/ssc.cpp:914-925, and ufo_scan, src/makeScan.cpp)."""

import numpy as np
import pytest

from dr_using_scv_od_tpu.utils import io_kitti, io_session


def _write_pose_pcd(path, xyzrpy):
    n = len(xyzrpy)
    fields = "x y z intensity roll pitch yaw time"
    with open(path, "wb") as f:
        f.write((f"VERSION 0.7\nFIELDS {fields}\nSIZE 4 4 4 4 4 4 4 4\n"
                 f"TYPE F F F F F F F F\nCOUNT 1 1 1 1 1 1 1 1\n"
                 f"WIDTH {n}\nHEIGHT 1\nPOINTS {n}\n"
                 "DATA binary\n").encode())
        rows = np.zeros((n, 8), np.float32)
        rows[:, :3] = xyzrpy[:, :3]
        rows[:, 4:7] = xyzrpy[:, 3:]
        f.write(rows.tobytes())


def test_session_window(tmp_path, rng):
    # 3 pcd scans + pose cloud
    for i in range(3):
        xyzi = rng.normal(size=(200, 4)).astype(np.float32)
        io_kitti.write_pcd_xyzi(tmp_path / f"{i}.pcd", xyzi)
    xyzrpy = np.zeros((3, 6), np.float32)
    xyzrpy[:, 0] = [0.0, 1.0, 2.0]
    _write_pose_pcd(tmp_path / "poses.pcd", xyzrpy)

    win = io_session.load_session_window(tmp_path, tmp_path / "poses.pcd",
                                         0, 3, 1, max_points=256)
    assert win["xyz"].shape == (3, 256, 3)
    assert win["valid"].sum() == 600
    np.testing.assert_allclose(win["poses"][1][0, 3], 1.0, atol=1e-6)
    np.testing.assert_allclose(win["poses"][2][0, 3], 2.0, atol=1e-6)


def test_accumulate_scans(rng):
    s0 = rng.normal(size=(50, 4)).astype(np.float32)
    s1 = rng.normal(size=(60, 4)).astype(np.float32)
    T0 = np.eye(4, dtype=np.float32)
    T1 = np.eye(4, dtype=np.float32)
    T1[0, 3] = 2.0   # frame 1 is 2m ahead
    merged = io_session.accumulate_scans([s0, s1], [T0, T1], center=0)
    assert merged.shape == (110, 4)
    # frame1 points must land +2m in x relative to frame0's frame
    np.testing.assert_allclose(merged[50:, 0], s1[:, 0] + 2.0, atol=1e-5)
    np.testing.assert_allclose(merged[50:, 3], s1[:, 3], atol=1e-6)
