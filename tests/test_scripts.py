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


def test_chained_cli_pipeline(tmp_path, pretrained_tcnn_path):
    """The full user-facing CLI chain (reference SURVEY §3.1 call stack):
    raw scene3d layout -> generate_fusion_data -> canonical reader ->
    run_e2e (fuse + optimize + mesh) -> evaluate_bnvf F-score floor."""
    import cv2

    from bnv_fusion_tpu.run_e2e import main as e2e_main
    from bnv_fusion_tpu.scripts.evaluate_bnvf import main as eval_main
    from bnv_fusion_tpu.scripts.generate_fusion_data import (
        SCENE3D_INTR, main as gen_main)
    from bnv_fusion_tpu.datasets.synth_scene import (look_at_pose,
                                                     render_depth)

    scene = SceneSpec(spheres=[SphereObj(np.zeros(3, np.float32), 0.5)])
    gt = gt_mesh(scene, bounds=0.7, resolution=96)
    gt_path = str(tmp_path / "gt.ply")
    save_ply(gt_path, gt)

    # raw scene3d layout with exact ray-traced depth at the converter's
    # hardcoded 480x640 intrinsics
    raw = tmp_path / "raw" / "chain"
    (raw / "chain_png" / "color").mkdir(parents=True)
    (raw / "chain_png" / "depth").mkdir(parents=True)
    save_ply(str(raw / "chain.ply"), gt)
    n = 10
    poses = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        z = 0.55 if i % 2 == 0 else -0.55
        eye = np.array([1.5 * np.cos(ang), 1.5 * np.sin(ang), z])
        poses.append(look_at_pose(eye, np.zeros(3)))
    with open(raw / "chain_trajectory.log", "w") as f:
        for i, T in enumerate(poses):
            f.write(f"{i} {i} {i}\n")
            for row in T:
                f.write(" ".join(f"{v:.9f}" for v in row) + "\n")
    for i, T in enumerate(poses):
        depth = render_depth(scene, T, SCENE3D_INTR.astype(np.float32),
                             (480, 640))
        cv2.imwrite(str(raw / "chain_png" / "depth" / f"{i:06d}.png"),
                    (depth * 1000).astype(np.uint16))
        # horizontal gradient so colored-mesh export is observable
        grad = np.tile(np.linspace(0, 255, 640, dtype=np.uint8)[None, :,
                                                                None],
                       (480, 1, 3))
        cv2.imwrite(str(raw / "chain_png" / "color" / f"{i:06d}.png"), grad)

    canon = tmp_path / "canon"
    assert gen_main(["scene3d", "--root", str(tmp_path / "raw"),
                     "--out", str(canon), "--seqs", "chain"]) == 0

    out_dir = tmp_path / "out"
    assert e2e_main([
        "dataset=fusion_inference_dataset",
        f"data_dir={canon}",
        "dataset.scan_id=chain",
        "dataset.skip_images=1",
        "dataset.downsample_scale=0.25",   # 480x640 -> 120x160 on CPU
        "dataset.stage_raw_depth=true",    # uint16 staging via the reader
        "dataset.load_color=true",
        "model.fuse_color=true",
        "model.integrate_batch_size=4",    # merged-batch launch path
        "dataset.num_pixels=1024",
        "model.train_ray_splits=256",
        "model.voxel_size=0.04",
        "model.min_pts_in_grid=4",
        "model.table_capacity=262144",
        f"trainer.checkpoint={pretrained_tcnn_path}",
        f"output_dir={out_dir}",
    ]) == 0
    final = str(out_dir / "run_e2e" / "chain" / "final.ply")
    assert os.path.exists(final)
    from bnv_fusion_tpu.mesh import load_ply
    fm = load_ply(final)
    assert fm.colors is not None and len(fm.colors) == len(fm.vertices)
    assert fm.colors.std() > 5.0  # the gradient albedo came through

    json_out = str(tmp_path / "chain_eval.json")
    assert eval_main(["--pred", final, "--gt", gt_path,
                      "--n_samples", "20000", "--json_out", json_out]) == 0
    (res,) = json.load(open(json_out)).values()
    assert res["@0.025"]["fscore"] > 0.5, res


def test_run_inference_operating_points():
    from bnv_fusion_tpu.scripts.run_inference import OPERATING_POINTS

    # the reference's per-dataset settings (run_inference_on_*.py)
    assert OPERATING_POINTS["scene3d"]["voxel_size"] == 0.01
    assert OPERATING_POINTS["icl_nuim"]["voxel_size"] == 0.02
    assert OPERATING_POINTS["scannet"]["ray_max_dist"] == 5
    assert OPERATING_POINTS["arkit"]["skip"] == 1
    # occupancy-sized compaction widths (probe_seg_count.py 0.02; see
    # RESULTS.md: 40.1 -> 54.5 fps, overflow 0) ride only the measured
    # synthetic point — real ScanNet/ICL scenes keep the safe defaults
    assert OPERATING_POINTS["synthetic"]["max_unique_cells_per_frame"] == 32768
    assert "max_unique_cells_per_frame" not in OPERATING_POINTS["scannet"]


def test_run_inference_forwards_width_overrides(monkeypatch):
    import bnv_fusion_tpu.run_e2e as run_e2e
    from bnv_fusion_tpu.scripts import run_inference

    captured = []
    monkeypatch.setattr(run_e2e, "main",
                        lambda overrides: captured.append(list(overrides)))
    assert run_inference.main(["synthetic", "--seqs", "s1",
                               "--checkpoint", "ckpt.ckpt"]) == 0
    (ovr,) = captured
    assert "model.max_unique_cells_per_frame=32768" in ovr
    assert "model.max_unique_per_frame=49152" in ovr
    assert "model.voxel_size=0.02" in ovr
