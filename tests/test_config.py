import dataclasses

import pytest

from gator_tpu.config import Config, load_config


def test_defaults_match_reference():
    cfg = Config()
    # defaults mirror reference lib/core/config.py:41-91
    assert cfg.DATASET.input_joint_set == "coco"
    assert cfg.MODEL.normal_loss_weight == 0.1
    assert cfg.MODEL.edge_loss_weight == 20
    assert cfg.TRAIN.lr == 1e-3
    assert cfg.TRAIN.lr_step == (30,)
    assert cfg.TEST.batch_size == 64


def test_yaml_round_trip(tmp_path):
    p = tmp_path / "cfg.yml"
    p.write_text(
        "DATASET:\n  input_joint_set: 'human36'\n  train_list: ['Human36M']\n"
        "MODEL:\n  name: 'GAT'\n  alpha: true\n"
        "TRAIN:\n  lr: 0.0008\n  lr_step: [10]\n")
    cfg = load_config(str(p))
    assert cfg.DATASET.input_joint_set == "human36"
    assert cfg.DATASET.train_list == ("Human36M",)
    assert cfg.MODEL.name == "GAT"
    assert cfg.MODEL.alpha is True
    assert cfg.TRAIN.lr == 0.0008
    assert cfg.TRAIN.lr_step == (10,)
    # untouched sections keep defaults
    assert cfg.TEST.shuffle is False


def test_unknown_key_raises(tmp_path):
    p = tmp_path / "bad.yml"
    p.write_text("MODEL:\n  not_a_key: 1\n")
    with pytest.raises(ValueError, match="not_a_key"):
        load_config(str(p))
    p2 = tmp_path / "bad2.yml"
    p2.write_text("NOTASECTION:\n  x: 1\n")
    with pytest.raises(ValueError):
        load_config(str(p2))


def test_overrides_and_immutability():
    cfg = load_config(None, overrides={"MODEL": {"compute_dtype": "bfloat16"}})
    assert cfg.MODEL.compute_dtype == "bfloat16"
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.MODEL.name = "X"
