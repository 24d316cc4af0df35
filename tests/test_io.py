"""IO round-trip tests: KITTI bin/label codecs (native C++ + numpy
fallback), PCD read/write, pose loading (reference semantics:
src/ssc.cpp:913-995, 1046-1058)."""

import numpy as np
import pytest

from dr_using_scv_od_tpu.utils import io_kitti


@pytest.fixture
def tmp_scan(tmp_path, rng):
    pts = rng.normal(size=(1000, 4)).astype(np.float32)
    pts[:, 3] = rng.uniform(0, 1, 1000)
    labels = rng.choice([0, 1, 40, 50, 70, 252], size=1000).astype(np.uint32)
    labels |= (rng.integers(0, 5, 1000).astype(np.uint32) << 16)
    bin_path = tmp_path / "000000.bin"
    lab_path = tmp_path / "000000.label"
    pts.tofile(bin_path)
    labels.tofile(lab_path)
    return bin_path, lab_path, pts, labels


def test_bin_label_roundtrip(tmp_scan):
    bin_path, lab_path, pts, labels = tmp_scan
    got_pts = io_kitti.read_bin(bin_path)
    got_lab = io_kitti.read_label(lab_path)
    np.testing.assert_array_equal(got_pts, pts)
    np.testing.assert_array_equal(got_lab, labels)


def test_native_lib_is_used():
    assert io_kitti._native() is not None, \
        "native/libio_native.so missing - run make -C native"


def test_load_scan_drops_unlabeled(tmp_scan):
    bin_path, lab_path, pts, labels = tmp_scan
    xyz, inten, lab = io_kitti.load_scan(bin_path, lab_path,
                                         max_intensity=255.0)
    sem = labels & 0xFFFF
    want = (sem != 0) & (sem != 1)
    assert len(xyz) == want.sum()
    np.testing.assert_allclose(inten, pts[want, 3] * 255.0, rtol=1e-6)


def test_pcd_roundtrip(tmp_path, rng):
    xyzi = rng.normal(size=(500, 4)).astype(np.float32)
    p = tmp_path / "cloud.pcd"
    io_kitti.write_pcd_xyzi(p, xyzi)
    got = io_kitti.read_pcd_xyzi(p)
    np.testing.assert_array_equal(got, xyzi)


def test_load_poses(tmp_path):
    # two identity cam poses + one translated; Tr = identity
    rows = np.zeros((3, 12))
    rows[:, 0] = rows[:, 5] = rows[:, 10] = 1.0
    rows[2, 3] = 5.0  # x translation
    np.savetxt(tmp_path / "poses.txt", rows)
    tr = np.eye(4)
    poses = io_kitti.load_poses(tmp_path / "poses.txt", tr, 0, 3, 2)
    assert poses.shape == (2, 4, 4)
    np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-6)
    np.testing.assert_allclose(poses[1][0, 3], 5.0, atol=1e-6)


def test_load_poses_with_calibration(tmp_path):
    """velo_T = Tr^-1 cam_T Tr (src/ssc.cpp:967)."""
    rng = np.random.default_rng(3)
    rows = np.zeros((1, 12))
    M = np.eye(4)
    M[:3, 3] = [1.0, 2.0, 3.0]
    rows[0] = M[:3, :].reshape(-1)
    np.savetxt(tmp_path / "poses.txt", rows)
    # a simple axis-permuting calibration
    tr = np.array([[0, -1, 0, 0.1], [0, 0, -1, 0.2], [1, 0, 0, 0.3],
                   [0, 0, 0, 1.0]], float)
    poses = io_kitti.load_poses(tmp_path / "poses.txt", tr, 0, 1, 1)
    want = np.linalg.inv(tr) @ M @ tr
    np.testing.assert_allclose(poses[0], want.astype(np.float32), atol=1e-5)


def test_sorted_frame_files(tmp_path):
    for n in [10, 2, 100]:
        (tmp_path / f"{n:06d}.bin").touch()
    files = io_kitti.sorted_frame_files(tmp_path, ".bin")
    assert [int(f.stem) for f in files] == [2, 10, 100]


def _make_sequence(tmp_path, rng, n_frames=6, with_labels=True):
    bins, labs = [], []
    for f in range(n_frames):
        n = int(rng.integers(200, 1200))
        pts = rng.normal(size=(n, 4)).astype(np.float32)
        pts[:, 3] = rng.uniform(0, 1, n)
        b = tmp_path / f"{f:06d}.bin"
        pts.tofile(b)
        bins.append(b)
        if with_labels:
            lab = rng.choice([0, 1, 40, 50, 252], size=n).astype(np.uint32)
            lp = tmp_path / f"{f:06d}.label"
            lab.tofile(lp)
            labs.append(lp)
    return bins, (labs if with_labels else None)


def test_prefetcher_matches_load_scan(tmp_path, rng):
    """The async prefetcher (native or fallback) must yield exactly
    load_scan's output, in file order."""
    from dr_using_scv_od_tpu.utils.prefetch import ScanPrefetcher
    bins, labs = _make_sequence(tmp_path, rng)
    pf = ScanPrefetcher(bins, labs, max_points=4096, depth=2)
    got = list(pf)
    assert len(got) == len(bins)
    for (xyz, inten, lab), b, l in zip(got, bins, labs):
        w_xyz, w_int, w_lab = io_kitti.load_scan(b, l)
        np.testing.assert_array_equal(xyz, w_xyz)
        np.testing.assert_array_equal(inten, w_int)
        np.testing.assert_array_equal(lab, w_lab)


def test_prefetcher_python_fallback_parity(tmp_path, rng):
    """Force the pure-Python tier and check it matches the native tier
    (so environments without the .so see identical streams)."""
    from dr_using_scv_od_tpu.utils.prefetch import ScanPrefetcher
    bins, labs = _make_sequence(tmp_path, rng, n_frames=4)
    pf_native = ScanPrefetcher(bins, labs, max_points=4096, depth=2)
    pf_py = ScanPrefetcher(bins, labs, max_points=4096, depth=2)
    pf_py._lib = None  # force fallback tier
    for (ax, ai, al), (bx, bi, bl) in zip(pf_native, pf_py):
        np.testing.assert_array_equal(ax, bx)
        np.testing.assert_array_equal(ai, bi)
        np.testing.assert_array_equal(al, bl)


def test_prefetcher_no_labels_and_cap(tmp_path, rng):
    from dr_using_scv_od_tpu.utils.prefetch import ScanPrefetcher
    bins, _ = _make_sequence(tmp_path, rng, n_frames=3, with_labels=False)
    cap = 100
    for force_py in (False, True):
        pf = ScanPrefetcher(bins, None, max_points=cap, depth=1)
        if force_py:
            pf._lib = None
        for (xyz, inten, lab), b in zip(pf, bins):
            full = io_kitti.read_bin(b)
            n = min(len(full), cap)
            assert len(xyz) == n
            np.testing.assert_array_equal(xyz, full[:n, :3])
            np.testing.assert_array_equal(lab, np.zeros(n, np.uint32))


def test_prefetcher_decode_error_surfaces(tmp_path, rng):
    from dr_using_scv_od_tpu.utils.prefetch import ScanPrefetcher
    bins, labs = _make_sequence(tmp_path, rng, n_frames=2)
    # truncate one label file -> scan/label mismatch must raise
    data = np.fromfile(labs[1], np.uint32)
    data[:-5].tofile(labs[1])
    for force_py in (False, True):
        pf = ScanPrefetcher(bins, labs, max_points=4096, depth=2)
        if force_py:
            pf._lib = None
        with pytest.raises(IOError):
            list(pf)


def test_prefetcher_depth_exceeds_sequence(tmp_path, rng):
    """Ring deeper than the file list must not deadlock or truncate
    (worker fills fewer slots than capacity, then exits)."""
    from dr_using_scv_od_tpu.utils.prefetch import ScanPrefetcher
    bins, labs = _make_sequence(tmp_path, rng, n_frames=2)
    for force_py in (False, True):
        pf = ScanPrefetcher(bins, labs, max_points=4096, depth=8)
        if force_py:
            pf._lib = None
        assert len(list(pf)) == 2
