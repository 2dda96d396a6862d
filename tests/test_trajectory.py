"""ATE/RPE trajectory metrics (utils/trajectory.py) on synthetic paths."""

import numpy as np

from tsdf_tpu.utils.trajectory import align_rigid, ate, rpe


def _circle_poses(n=40, r=1000.0):
    poses = []
    for i in range(n):
        a = 2 * np.pi * i / n
        p = np.eye(4)
        p[:3, 3] = [r * np.cos(a), r * np.sin(a), 0.3 * r * a]
        c, s = np.cos(a), np.sin(a)
        p[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        poses.append(p)
    return poses


def _rigidly_moved(poses, rot, t):
    g = np.eye(4)
    g[:3, :3] = rot
    g[:3, 3] = t
    return [g @ p for p in poses]


def _rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def test_align_recovers_rigid_transform():
    gt = np.asarray([p[:3, 3] for p in _circle_poses()])
    rot = _rotz(0.7) @ np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0.0]])
    est = gt @ rot.T + np.array([5.0, -3.0, 11.0])
    # align est back onto gt
    s, r, t = align_rigid(est, gt)
    back = s * est @ r.T + t
    np.testing.assert_allclose(back, gt, atol=1e-6)
    assert s == 1.0


def test_ate_gauge_invariance_and_noise_floor():
    gt = _circle_poses()
    est = _rigidly_moved(gt, _rotz(1.1), np.array([500.0, -200.0, 90.0]))
    res = ate(est, gt, align=True)
    assert res["rmse"] < 1e-6  # a gauge transform is not an error

    rng = np.random.RandomState(0)
    noisy = []
    for p in est:
        q = p.copy()
        q[:3, 3] += rng.normal(scale=2.0, size=3)
        noisy.append(q)
    res = ate(noisy, gt, align=True)
    # rmse ~= sqrt(3)*sigma, loosely bounded
    assert 1.0 < res["rmse"] < 6.0
    assert res["max"] >= res["median"]

    unaligned = ate(est, gt, align=False)
    assert unaligned["rmse"] > 100.0  # the gauge shows without alignment


def test_ate_with_scale():
    gt = np.asarray([p[:3, 3] for p in _circle_poses()])
    est_pts = 0.5 * gt
    est = []
    gtp = []
    for i, p in enumerate(_circle_poses()):
        e = p.copy()
        e[:3, 3] = est_pts[i]
        est.append(e)
        gtp.append(p)
    assert ate(est, gtp, align=True, with_scale=True)["rmse"] < 1e-6
    assert ate(est, gtp, align=True, with_scale=False)["rmse"] > 10.0


def test_rpe_detects_drift():
    gt = _circle_poses()
    # constant per-frame drift of 1mm along x
    est = []
    for i, p in enumerate(gt):
        q = p.copy()
        q[:3, 3] = q[:3, 3] + np.array([1.0 * i, 0, 0])
        est.append(q)
    r = rpe(est, gt, delta=1)
    np.testing.assert_allclose(r["trans_rmse"], 1.0, rtol=1e-6)
    assert r["rot_rmse"] < 1e-9

    exact = rpe(gt, gt, delta=3)
    assert exact["trans_rmse"] < 1e-9 and exact["rot_rmse"] < 1e-9
