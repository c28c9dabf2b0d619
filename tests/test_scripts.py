"""CLI tooling smoke tests (evaluation, preprocessing)."""

import json
import os

import numpy as np
import pytest

from bnv_fusion_tpu.datasets.synth_scene import (SceneSpec, SphereObj,
                                                 gt_mesh)
from bnv_fusion_tpu.mesh import save_ply


@pytest.fixture(scope="module")
def sphere_meshes(tmp_path_factory):
    d = tmp_path_factory.mktemp("meshes")
    scene = SceneSpec(spheres=[SphereObj(np.zeros(3, np.float32), 0.5)])
    gt = gt_mesh(scene, bounds=0.7, resolution=48)
    pred_scene = SceneSpec(
        spheres=[SphereObj(np.array([0.005, 0, 0], np.float32), 0.5)])
    pred = gt_mesh(pred_scene, bounds=0.7, resolution=48)
    gt_path, pred_path = str(d / "gt.ply"), str(d / "pred.ply")
    save_ply(gt_path, gt)
    save_ply(pred_path, pred)
    return pred_path, gt_path


def test_compute_chamfer_cli(sphere_meshes, capsys):
    from bnv_fusion_tpu.scripts.compute_chamfer import main

    pred, gt = sphere_meshes
    assert main([pred, gt, "--n_samples", "5000",
                 "--normal_consistency"]) == 0
    out = capsys.readouterr().out
    assert "fscore" in out and "normal_consistency" in out
    f1 = float([ln for ln in out.splitlines()
                if ln.startswith("fscore")][0].split(":")[1])
    assert f1 > 0.95  # 5 mm offset sphere @ 2.5 cm threshold
    nc = float([ln for ln in out.splitlines()
                if ln.startswith("normal_consistency")][0].split(":")[1])
    assert nc > 0.9


def test_evaluate_bnvf_cli(sphere_meshes, tmp_path, capsys):
    from bnv_fusion_tpu.scripts.evaluate_bnvf import main

    pred, gt = sphere_meshes
    json_out = str(tmp_path / "res.json")
    assert main(["--pred", pred, "--gt", gt, "--n_samples", "5000",
                 "--json_out", json_out]) == 0
    out = capsys.readouterr().out
    assert "mean F1 @0.025" in out
    data = json.load(open(json_out))
    (res,) = data.values()
    assert res["@0.025"]["fscore"] > 0.95
    assert 0 <= res["@0.01"]["fscore"] <= 1


def test_generate_fusion_data_scene3d(tmp_path):
    """scene3d raw layout -> canonical conversion."""
    import cv2

    from bnv_fusion_tpu.scripts.generate_fusion_data import main

    raw = tmp_path / "raw" / "lounge"
    (raw / "lounge_png" / "color").mkdir(parents=True)
    (raw / "lounge_png" / "depth").mkdir(parents=True)
    scene = SceneSpec(spheres=[SphereObj(np.zeros(3, np.float32), 0.5)])
    save_ply(str(raw / "lounge.ply"), gt_mesh(scene, 0.7, 32))
    n = 3
    with open(raw / "lounge_trajectory.log", "w") as f:
        for i in range(n):
            f.write(f"{i} {i} {i}\n")
            T = np.eye(4)
            T[0, 3] = 0.1 * i
            for row in T:
                f.write(" ".join(str(v) for v in row) + "\n")
    for i in range(n):
        cv2.imwrite(str(raw / "lounge_png" / "depth" / f"{i:06d}.png"),
                    np.full((48, 64), 1500, np.uint16))
        cv2.imwrite(str(raw / "lounge_png" / "color" / f"{i:06d}.png"),
                    np.zeros((48, 64, 3), np.uint8))

    out = tmp_path / "canon"
    assert main(["scene3d", "--root", str(tmp_path / "raw"),
                 "--out", str(out), "--seqs", "lounge"]) == 0
    for sub, fname in (("depth", "0.png"), ("image", "0.jpg"),
                       ("pose", "T_wc_0.txt"), ("pose", "intr_mat_0.txt"),
                       ("pose", "dimensions.txt")):
        assert os.path.exists(out / "lounge" / sub / fname)
    T0 = np.loadtxt(out / "lounge" / "pose" / "T_wc_0.txt").reshape(4, 4)
    # recentred: sphere mesh is origin-centered, so pose passes through
    np.testing.assert_allclose(T0, np.eye(4), atol=1e-5)


def test_run_inference_operating_points():
    from bnv_fusion_tpu.scripts.run_inference import OPERATING_POINTS

    # the reference's per-dataset settings (run_inference_on_*.py)
    assert OPERATING_POINTS["scene3d"]["voxel_size"] == 0.01
    assert OPERATING_POINTS["icl_nuim"]["voxel_size"] == 0.02
    assert OPERATING_POINTS["scannet"]["ray_max_dist"] == 5
    assert OPERATING_POINTS["arkit"]["skip"] == 1
