"""Two-stage training flow through the CLI: stage-1 GAT pretrain produces a
checkpoint that stage-2 GATOR loads as its lifter init
(reference: cfg.MODEL.posenet_pretrained/posenet_path -> GAT.py:125-131)."""
import os

import numpy as np
import pytest
import yaml


def _write_cfg(path, model_name, extra_model=None):
    cfg = {
        "DATASET": {"train_list": ["Synthetic"], "test_list": ["Synthetic"],
                    "input_joint_set": "human36",
                    "target_joint_set": "human36", "use_gt_input": True},
        "MODEL": {"name": model_name, "input_shape": [384, 288],
                  **(extra_model or {})},
        "TRAIN": {"batch_size": 16, "end_epoch": 1, "print_freq": 5,
                  "lr": 0.0008 if model_name == "GAT" else 0.0001,
                  "lr_step": [10], "lr_factor": 0.8},
        "TEST": {"batch_size": 16},
    }
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)


@pytest.mark.slow
def test_stage1_then_stage2(tmp_path):
    from gator_tpu.cli.train import main as train_main

    # stage 1: GAT lifter pretrain
    gat_cfg = str(tmp_path / "gat.yml")
    _write_cfg(gat_cfg, "GAT")
    gat_exp = str(tmp_path / "gat_exp")
    err1 = train_main(["--cfg", gat_cfg, "--synthetic", "--epochs", "1",
                       "--exp_dir", gat_exp])
    assert np.isfinite(err1)
    ckpt_dir = os.path.join(gat_exp, "checkpoint")
    assert os.path.isdir(os.path.join(ckpt_dir, "best"))

    # stage 2: GATOR initialized from the stage-1 lifter
    gator_cfg = str(tmp_path / "gator.yml")
    _write_cfg(gator_cfg, "GATOR",
               {"posenet_pretrained": True, "posenet_path": ckpt_dir})
    gator_exp = str(tmp_path / "gator_exp")
    err2 = train_main(["--cfg", gator_cfg, "--synthetic", "--epochs", "1",
                       "--exp_dir", gator_exp])
    assert np.isfinite(err2)
