from .checkpoint import load_checkpoint, pick_checkpoint, save_checkpoint
from .evaluate import run_eval
from .loop import (jit_data_parallel, make_gat_eval_step,
                   make_gat_train_step, make_gator_eval_step,
                   make_gator_train_step, make_multi_step,
                   with_gt_synthesis)
from .schedule import make_optimizer, multistep_lr
from .state import TrainState

__all__ = [
    "TrainState", "jit_data_parallel", "load_checkpoint",
    "make_gat_eval_step", "make_gat_train_step", "make_gator_eval_step",
    "make_gator_train_step", "make_multi_step", "make_optimizer",
    "multistep_lr",
    "pick_checkpoint", "run_eval", "save_checkpoint", "with_gt_synthesis",
]
