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
