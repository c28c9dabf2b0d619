"""Config system tests (group composition, overrides, interpolation)."""

import pytest

from bnv_fusion_tpu.config import ConfigNode, config_from_dict, load_config


def test_defaults_compose():
    cfg = load_config([])
    assert cfg.model.name == "lit_fusion_pointnet"
    assert cfg.dataset.name == "synthetic_demo"
    assert cfg.model.voxel_size == 0.01
    assert cfg.model.nerf.num_encoding_fn_xyz == 1


def test_group_swap_and_leaf_override():
    cfg = load_config(["model=fusion_refiner_model",
                       "dataset=fusion_inference_dataset",
                       "model.voxel_size=0.02",
                       "dataset.scan_id=scene3d/lounge"])
    assert cfg.model.name == "lit_fusion_refiner"
    assert cfg.model.voxel_size == 0.02
    assert cfg.dataset.scan_id == "scene3d/lounge"
    assert cfg.dataset.name == "fusion_inference_dataset"


def test_value_parsing_types():
    cfg = load_config(["model.tiny_cuda=false", "trainer.max_epochs=3",
                       "dataset.img_res=[120,160]"])
    assert cfg.model.tiny_cuda is False
    assert cfg.trainer.max_epochs == 3
    assert cfg.dataset.img_res == [120, 160]


def test_interpolation():
    cfg = load_config(["work_dir=/tmp/x"])
    assert cfg.data_dir == "/tmp/x/data/"
    assert cfg.dataset.data_dir == "/tmp/x/data/"


def test_new_leaf_creation():
    cfg = load_config(["model.some.new.leaf=5"])
    assert cfg.model.some.new.leaf == 5


def test_bad_override_rejected():
    with pytest.raises(ValueError):
        load_config(["no_equals_sign"])


def test_confignode_attr_access():
    cfg = config_from_dict({"a": {"b": 1}, "c": [1, {"d": 2}]})
    assert cfg.a.b == 1
    assert cfg.c[1].d == 2
    with pytest.raises(AttributeError):
        _ = cfg.missing
    assert cfg.to_dict()["a"]["b"] == 1


def test_preset_deep_merges_across_groups():
    # preset=fast_e2e retunes model + trainer + optimizer in one override
    # (configs/preset/fast_e2e.yaml); explicit leaf overrides still win
    cfg = load_config(["preset=fast_e2e"])
    assert cfg.model.tsdf_every == 4
    assert cfg.model.ray_tracer.n_fine == 12
    assert cfg.model.ray_tracer.n_coarse == 4
    assert cfg.trainer.global_steps == 48
    assert cfg.trainer.optim_frame_order == "epoch"
    assert cfg.optimizer.lr.initial == 0.002
    assert cfg.preset == "fast_e2e"
    # untouched keys survive the merge
    assert cfg.model.name == "lit_fusion_pointnet"
    assert cfg.trainer.seed == 12345

    cfg2 = load_config(["preset=fast_e2e", "trainer.global_steps=96",
                        "model.ray_tracer.n_fine=20"])
    assert cfg2.trainer.global_steps == 96
    assert cfg2.model.ray_tracer.n_fine == 20
    assert cfg2.model.ray_tracer.n_coarse == 4

    # no preset: defaults untouched
    cfg3 = load_config([])
    assert cfg3.trainer.global_steps == 0
    assert cfg3.get("preset") is None
