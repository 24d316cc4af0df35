"""CLI smoke tests (the reference's executable surface, CMakeLists:82-173)."""

import subprocess
import sys
import os

import numpy as np
import pytest

from dr_using_scv_od_tpu.utils import io_kitti


def _run(args, cwd=None):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)         # drop the axon TPU hook
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run([sys.executable, "-m", "dr_using_scv_od_tpu.cli",
                           *args], capture_output=True, text=True, env=env,
                          cwd=cwd or os.getcwd(), timeout=600)


@pytest.mark.slow
def test_segdf_synthetic(tmp_path):
    r = _run(["segdf", "--profile", "tiny_test", "--frames", "4",
              "--out", str(tmp_path)])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "PR=" in r.stdout and "RR=" in r.stdout
    assert (tmp_path / "000000_static.pcd").exists()
    assert (tmp_path / "000003_dynamic.pcd").exists()


def test_colorize(tmp_path, rng):
    pts = rng.normal(size=(100, 4)).astype(np.float32)
    b = tmp_path / "000000.bin"
    pts.tofile(b)
    out = tmp_path / "c.pcd"
    r = _run(["colorize", "--bin", str(b), "--out", str(out)])
    assert r.returncode == 0, r.stderr[-2000:]
    got = io_kitti.read_pcd_xyzi(out)
    np.testing.assert_array_equal(got, pts)


@pytest.mark.slow
def test_evaluate_artifacts(tmp_path, rng):
    # gt: 1000 static (label 40) + 200 dynamic (label 252)
    gt = rng.normal(size=(1200, 4)).astype(np.float32) * 10
    gt[:, 3] = 40
    gt[1000:, 3] = 252
    est = gt[:1000]  # perfect removal
    io_kitti.write_pcd_xyzi(tmp_path / "gt.pcd", gt)
    io_kitti.write_pcd_xyzi(tmp_path / "est.pcd", est)
    r = _run(["evaluate", "--gt", str(tmp_path / "gt.pcd"),
              "--est", str(tmp_path / "est.pcd")])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "PR=100.00" in r.stdout
    assert "RR=100.00" in r.stdout
