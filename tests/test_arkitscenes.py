"""ARKitScenes helper tests (synthetic trajectory files)."""

import numpy as np

from bnv_fusion_tpu.datasets import arkitscenes as ak
from bnv_fusion_tpu.utils.motion import so3_log


def _write_traj(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(" ".join(str(float(v)) for v in r) + "\n")


def test_read_trajectory_and_associate(tmp_path):
    # camera moving along +x with no rotation; T_cw has t = -x
    rows = [[t, 0, 0, 0, -t, 0, 0] for t in (0.0, 1.0, 2.0)]
    path = str(tmp_path / "lowres_wide.traj")
    _write_traj(path, rows)
    ts, poses = ak.read_trajectory(path)
    np.testing.assert_allclose(ts, [0, 1, 2])
    # T_wc translation = +t
    np.testing.assert_allclose(poses[1][:3, 3], [1, 0, 0], atol=1e-6)

    mid = ak.associate_pose(ts, poses, 0.5)
    np.testing.assert_allclose(mid[:3, 3], [0.5, 0, 0], atol=1e-6)
    assert ak.associate_pose(ts, poses, 5.0) is None


def test_associate_pose_rotation_interpolation(tmp_path):
    w = np.array([0, 0, np.pi / 2])
    rows = [[0.0, 0, 0, 0, 0, 0, 0], [1.0, *w, 0, 0, 0]]
    path = str(tmp_path / "t.traj")
    _write_traj(path, rows)
    ts, poses = ak.read_trajectory(path)
    mid = ak.associate_pose(ts, poses, 0.5)
    ang = np.linalg.norm(so3_log(mid[:3, :3]))
    assert abs(ang - np.pi / 4) < 1e-6


def test_read_pincam(tmp_path):
    path = str(tmp_path / "c.pincam")
    with open(path, "w") as f:
        f.write("256 192 211.9 211.9 127.9 95.9")
    K = ak.read_pincam(path)
    assert K[0, 0] == np.float32(211.9)
    assert K[1, 2] == np.float32(95.9)


def test_frame_timestamp_from_name():
    assert ak.frame_timestamp_from_name("41069021_3999.233.png") == 3999.233
