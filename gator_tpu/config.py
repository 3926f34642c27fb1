"""Frozen-dataclass configuration mirroring the reference YAML schema.

The reference mutates a global EasyDict with strict key checking and wipes a
timestamped experiment dir at *import* time
(reference: lib/core/config.py:17-116, side effect at :26-39). Here configs
are immutable values loaded from the same YAML files; experiment dirs are
created explicitly by the CLI, never at import.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import yaml


@dataclasses.dataclass(frozen=True)
class DatasetConfig:
    train_list: Tuple[str, ...] = ("Human36M", "COCO", "MuCo")
    test_list: Tuple[str, ...] = ("PW3D",)
    input_joint_set: str = "coco"
    target_joint_set: str = "human36"
    workers: int = 16
    use_gt_input: bool = True
    BASE_DATA_DIR: str = "data/base_data"


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    name: str = "GATOR"
    input_shape: Tuple[int, int] = (384, 288)   # (H, W)
    normal_loss_weight: float = 1e-1
    edge_loss_weight: float = 20.0
    joint_loss_weight: float = 1e-3
    posenet_pretrained: bool = False
    posenet_path: str = ""
    alpha: bool = False
    # tpu-native extensions (defaults preserve reference behavior)
    embed_dim: int = 128
    depth: int = 6
    num_heads: int = 8
    compute_dtype: str = "float32"   # "bfloat16" for MXU-native inference


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    print_freq: int = 10
    batch_size: int = 64
    shuffle: bool = True
    begin_epoch: int = 1
    end_epoch: int = 40
    edge_loss_start: int = 15
    scheduler: str = "step"
    lr: float = 1e-3
    lr_step: Tuple[int, ...] = (30,)
    lr_factor: float = 0.1
    optimizer: str = "adam"
    wandb: bool = False
    # beyond-reference TPU knobs: "bfloat16" trains with bf16 compute and
    # f32 master params; fused_kernels routes the MDR LBF stack through
    # the training Pallas kernels ("auto" = on for TPU backends)
    precision: str = "float32"
    fused_kernels: str = "auto"      # "auto" | "on" | "off"
    # run K optimizer steps per dispatch (lax.scan over a [K, B, ...]
    # super-batch): amortizes host dispatch overhead K-fold; numerics are
    # bit-identical to K single dispatches. Checkpoint/preemption/log
    # granularity coarsens to K steps.
    steps_per_dispatch: int = 1
    # "on": synthesize the GT mesh INSIDE the jitted train step from raw
    # SMPL/camera params (same math to ~1 ulp; batches shrink from
    # [B, 6890, 3] meshes to ~150 floats/sample). Requires non-COCO input
    # and datasets on the shared make_batch path (H36M / Synthetic).
    # "full": additionally move the 2D-input assembly/augmentation on
    # device — the annotation table lives in HBM and batches are
    # (indices, flips, rots) only (~12 bytes/sample). Additionally
    # requires GT input and a single dataset. Works for BOTH training
    # stages ("on" is gator-only: gat batches carry no mesh).
    # "packed": host-assembled 2D input (~152 B/sample, exact host-path
    # noise/crop code) + device-resident targets/masks/mesh synthesis —
    # covers detector-input, COCO-input, multi-dataset, and gendered
    # recipes (the flagship H36M+COCO+MuCo mix).
    # "auto": best supported fast path ("full", else "packed", else
    # "off").
    gt_in_step: str = "off"    # "auto"|"full"|"device"|"packed"|"on"|"off"
    # device-resident GT-mesh cache for the full/packed/device fast paths:
    # the mesh target is epoch-invariant per row, so it precomputes once
    # per run ([N, V, 3] f32 in HBM) instead of re-running the SMPL
    # forward every step of every epoch. "auto" = on when the table fits
    # a 2 GiB budget (the flagship real-data mix is ~50 GB -> off).
    gt_mesh_cache: str = "auto"      # "auto" | "on" | "off"


@dataclasses.dataclass(frozen=True)
class AugConfig:
    flip: bool = False
    rotate_factor: float = 0.0


@dataclasses.dataclass(frozen=True)
class TestConfig:
    batch_size: int = 64
    shuffle: bool = False
    weight_path: str = ""
    vis: bool = False


@dataclasses.dataclass(frozen=True)
class Config:
    DATASET: DatasetConfig = DatasetConfig()
    MODEL: ModelConfig = ModelConfig()
    TRAIN: TrainConfig = TrainConfig()
    AUG: AugConfig = AugConfig()
    TEST: TestConfig = TestConfig()
    seed: int = 0
    output_dir: str = "experiment"


_SECTIONS = ("DATASET", "MODEL", "TRAIN", "AUG", "TEST")


def _replace_section(section, overrides: dict):
    valid = {f.name for f in dataclasses.fields(section)}
    clean = {}
    for key, val in overrides.items():
        if key not in valid:
            raise ValueError(
                f"{type(section).__name__}.{key} not a valid config key")
        if isinstance(val, list):
            val = tuple(val)
        clean[key] = val
    return dataclasses.replace(section, **clean)


def load_config(yaml_path: Optional[str] = None,
                overrides: Optional[dict] = None) -> Config:
    """Load a reference-schema YAML into an immutable Config.

    Unknown keys raise, mirroring the reference's strict update
    (reference: lib/core/config.py:94-116).
    """
    cfg = Config()
    raw = {}
    if yaml_path:
        with open(yaml_path) as f:
            raw = yaml.safe_load(f) or {}
    if overrides:
        for k, v in overrides.items():
            raw.setdefault(k, {})
            if isinstance(v, dict):
                raw[k] = {**raw[k], **v} if isinstance(raw[k], dict) else v
            else:
                raw[k] = v
    updates = {}
    for key, val in raw.items():
        if key in _SECTIONS:
            if val is None:          # e.g. 'AUG:' with every key commented
                continue
            if not isinstance(val, dict):
                raise ValueError(
                    f"config section {key} must be a mapping, got "
                    f"{type(val).__name__}")
            updates[key] = _replace_section(getattr(cfg, key), val)
        elif hasattr(cfg, key):
            updates[key] = val
        else:
            raise ValueError(f"{key} not a valid config section/key")
    return dataclasses.replace(cfg, **updates)
