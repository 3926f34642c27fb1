"""Shared CLI wiring: config -> assets, datasets, model, pipeline.

Replaces the reference's prepare_network (reference: lib/core/base.py:46-94)
without its global-config / import-side-effect structure.
"""
from __future__ import annotations

import os
import os.path as osp
from typing import List, Optional, Tuple

import jax
import numpy as np

from .. import losses
from ..assets import build_assets
from ..config import Config
from ..data import (DATASETS, BatchPipeline, GtSynthesizer, ProcessOptions,
                    SyntheticDataset)
from ..models import GatSpec, GatorSpec, init_gat, init_gator
from ..train import (TrainState, make_gat_eval_step, make_gat_train_step,
                     make_gator_eval_step, make_gator_train_step,
                     make_optimizer, multistep_lr)
from ..train.schedule import ReduceLROnPlateau


from ._cache import enable_compile_cache  # noqa: E402  (re-export)


def resolve_data_dirs(cfg: Config) -> List[str]:
    dirs = []
    env = os.environ.get("GATOR_DATA_DIR")
    if env:
        dirs.append(env)
    dirs.append(osp.join(os.getcwd(), "data"))
    base = cfg.DATASET.BASE_DATA_DIR
    if base and osp.isdir(base):
        dirs.append(osp.dirname(base.rstrip("/")) or ".")
    return dirs


def make_opts(cfg: Config, is_train: bool) -> ProcessOptions:
    return ProcessOptions(
        input_shape=tuple(cfg.MODEL.input_shape),
        use_gt_input=cfg.DATASET.use_gt_input,
        flip_enabled=cfg.AUG.flip,
        rotate_factor=cfg.AUG.rotate_factor,
        is_train=is_train,
        input_joint_name=cfg.DATASET.input_joint_set,
    )


def build_datasets(cfg: Config, assets, names, is_train: bool,
                   debug: bool = False, synthetic_n: int = 256,
                   synthetic: bool = False, synthesizer=None):
    """Instantiate datasets by reference names; 'Synthetic' needs no
    external data. synthetic=True swaps every name for its in-memory
    stand-in (COCO/MuCo get schema-faithful fabricated tables, everything
    else the SmplTable SyntheticDataset) so any recipe — including the
    mixed flagship detector-input one — runs without downloads."""
    data_dir = None
    for d in resolve_data_dirs(cfg):
        if osp.isdir(d):
            data_dir = d
            break
    opts = make_opts(cfg, is_train)
    out = []
    for name in names:
        if synthetic:
            from ..data.synthetic import (synthetic_coco_dataset,
                                          synthetic_muco_dataset)
            maker = {"COCO": synthetic_coco_dataset,
                     "MuCo": synthetic_muco_dataset}.get(name)
            if maker is not None and is_train:
                out.append(maker(assets, opts, n=synthetic_n,
                                 seed=cfg.seed, synthesizer=synthesizer))
            else:
                out.append(SyntheticDataset(assets, opts, n=synthetic_n,
                                            seed=cfg.seed,
                                            synthesizer=synthesizer))
            continue
        cls = DATASETS[name]
        if name == "Synthetic":
            out.append(SyntheticDataset(assets, opts, n=synthetic_n,
                                        seed=cfg.seed,
                                        synthesizer=synthesizer))
        elif name == "Human36M":
            out.append(cls(assets, opts, data_dir,
                           "train" if is_train else "test", debug=debug))
        elif name == "PW3D":
            out.append(cls(assets, opts, data_dir, "test"))
        else:
            out.append(cls(assets, opts, data_dir, "train"))
    return out


class Session:
    """Everything one training/eval run needs, built once from a Config."""

    def __init__(self, cfg: Config, is_train: bool = True,
                 debug: bool = False, synthetic: bool = False,
                 assets=None, synthetic_n: int = 256):
        self.cfg = cfg
        enable_compile_cache()
        names = (cfg.DATASET.train_list if is_train
                 else cfg.DATASET.test_list)
        # assets depend only on the joint set + data dirs — a paired
        # train/eval session shares one build (SMPL load + graph tables)
        self.assets = assets if assets is not None else build_assets(
            cfg.DATASET.input_joint_set, data_dirs=resolve_data_dirs(cfg))
        self.synth = GtSynthesizer(self.assets)
        self.datasets = build_datasets(cfg, self.assets, names, is_train,
                                       debug=debug,
                                       synthetic_n=synthetic_n,
                                       synthetic=synthetic,
                                       synthesizer=self.synth)
        self.is_gator = cfg.MODEL.name == "GATOR"

        if self.is_gator:
            self.spec = GatorSpec.from_assets(
                self.assets, embed_dim=cfg.MODEL.embed_dim,
                depth=cfg.MODEL.depth, alpha=cfg.MODEL.alpha)
        else:
            self.spec = GatSpec.from_assets(
                self.assets, embed_dim=cfg.MODEL.embed_dim,
                depth=cfg.MODEL.depth)

        batch_size = (cfg.TRAIN.batch_size if is_train
                      else cfg.TEST.batch_size)
        self.gt_in_step = self._resolve_gt_in_step(cfg, is_train)
        mode = {"off": "full_batches", "on": "raw", "full": "index",
                "packed": "packed", "device": "device"}[self.gt_in_step]
        self.pipeline = BatchPipeline(
            self.datasets, self.synth, batch_size,
            shuffle=cfg.TRAIN.shuffle if is_train else cfg.TEST.shuffle,
            seed=cfg.seed, stage="gator" if self.is_gator else "gat",
            drop_last=is_train,
            mode="full" if mode == "full_batches" else mode)
        if self.gt_in_step in ("packed", "device"):
            # eager: packed-mode batches need each dataset's PackedView
            self.packed_table()

        self.target_regressor = (
            self.assets.j_regressor_h36m
            if cfg.DATASET.target_joint_set == "human36"
            else self.assets.j_regressor_coco)

    # -- fast-path resolution ----------------------------------------------

    def _full_mode_ok(self, cfg) -> bool:
        """Eligibility for gt_in_step='full' (index-only batches, whole
        input pipeline in-step): GT 2D input, a non-COCO joint set, one
        shared-path dataset (a single device-resident SmplTable)."""
        return (cfg.DATASET.use_gt_input
                and cfg.DATASET.input_joint_set != "coco"
                and len(self.datasets) == 1
                and all(getattr(d, "supports_raw_batches", False)
                        for d in self.datasets))

    def _packed_mode_ok(self) -> bool:
        """Eligibility for gt_in_step='packed' (host 2D input + device
        targets): every dataset must provide the packed_rows precompute."""
        return all(hasattr(d, "packed_rows") for d in self.datasets)

    def _resolve_gt_in_step(self, cfg, is_train: bool) -> str:
        """Resolve cfg.TRAIN.gt_in_step to the mode this session runs.

        "auto" picks the best fast path the recipe supports: "full" for
        GT-input single-dataset non-COCO sessions, else "device" for
        recipes whose datasets all support the packed precompute (the
        flagship detector-input H36M+COCO+MuCo mix lands here — batches
        are index-only and the 2D input, detector-noise synthesis
        included, assembles in-step on device), else "off". "packed"
        (host-assembled 2D input, bitwise-identical to the host path's
        rng stream) stays available explicitly. Explicit values validate
        strictly and raise when the recipe can't support them."""
        req = cfg.TRAIN.gt_in_step
        if req not in ("off", "on", "full", "packed", "device", "auto"):
            raise ValueError(
                f"TRAIN.gt_in_step must be 'off', 'on', 'full', 'packed',"
                f" 'device', or 'auto'; got {req!r}")
        if not is_train or req == "off":
            return "off"
        if req == "auto":
            if self._full_mode_ok(cfg):
                return "full"
            if self._packed_mode_ok():
                return "device"
            return "off"
        if req in ("packed", "device"):
            if not self._packed_mode_ok():
                bad = [type(d).__name__ for d in self.datasets
                       if not hasattr(d, "packed_rows")]
                raise ValueError(
                    f"TRAIN.gt_in_step={req}: no packed_rows precompute "
                    f"for {bad}")
            return req
        # "on" (in-step GT synthesis) only means something for the gator
        # stage — gat batches carry no mesh, so it degrades to "off"
        if req == "on" and not self.is_gator:
            return "off"
        bad = [type(d).__name__ for d in self.datasets
               if not getattr(d, "supports_raw_batches", False)]
        if cfg.DATASET.input_joint_set == "coco" or bad:
            raise ValueError(
                "TRAIN.gt_in_step on/full needs non-COCO input and "
                f"shared-path datasets (unsupported: {bad}); use "
                "gt_in_step=packed (or auto) for detector/COCO-input "
                "recipes")
        if req == "full" and (len(self.datasets) != 1
                              or not cfg.DATASET.use_gt_input):
            raise ValueError("TRAIN.gt_in_step=full needs GT input and a "
                             "single dataset (one device-resident table)")
        return req

    def packed_table(self):
        """Build (once) and return the canonical packed table for this
        session's datasets (gt_in_step='packed')."""
        if getattr(self, "_packed_table", None) is None:
            from ..data.packed import build_packed_tables
            self._packed_table = build_packed_tables(self.datasets,
                                                     self.synth)
        return self._packed_table

    # -- model/optimizer ---------------------------------------------------

    def init_variables(self, rng: Optional[jax.Array] = None):
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        if self.is_gator:
            return init_gator(self.spec, rng)
        return init_gat(self.spec, rng)

    def make_optimizer(self):
        """Honors cfg.TRAIN.scheduler: 'step' -> MultiStepLR baked into the
        optax schedule; 'platue' [sic, reference spelling] -> injected-lr
        optimizer + host-side ReduceLROnPlateau controller exposed as
        self.plateau (reference: lib/funcs_utils.py:100-107)."""
        cfg = self.cfg
        self.plateau = None
        if cfg.TRAIN.scheduler in ("platue", "plateau"):
            self.plateau = ReduceLROnPlateau(cfg.TRAIN.lr,
                                             cfg.TRAIN.lr_factor)
            return make_optimizer(cfg.TRAIN.optimizer, cfg.TRAIN.lr,
                                  inject=True)
        if cfg.TRAIN.scheduler != "step":
            raise ValueError(
                f"unknown cfg.TRAIN.scheduler {cfg.TRAIN.scheduler!r} "
                "(expected 'step' or 'platue')")
        steps_per_epoch = max(1, len(self.pipeline))
        sched = multistep_lr(cfg.TRAIN.lr, cfg.TRAIN.lr_step,
                             cfg.TRAIN.lr_factor, steps_per_epoch)
        return make_optimizer(cfg.TRAIN.optimizer, sched)

    def _mesh_cache_on(self, n_rows: int) -> bool:
        """Resolve cfg.TRAIN.gt_mesh_cache for a device-resident table of
        n_rows: 'auto' enables the once-per-run GT-mesh precompute when
        [N, V, 3] f32 fits a 2 GiB HBM budget (multi-epoch training then
        pays one SMPL forward per row per RUN instead of per epoch)."""
        req = self.cfg.TRAIN.gt_mesh_cache
        if req not in ("auto", "on", "off"):
            raise ValueError(
                f"TRAIN.gt_mesh_cache must be 'auto', 'on', or 'off'; "
                f"got {req!r}")
        if req != "auto":
            return req == "on"
        v = self.spec.mdr.full_num if self.is_gator else 0
        return bool(v) and n_rows * v * 3 * 4 <= 2 << 30

    def make_steps(self, tx):
        import jax as _jax
        import jax.numpy as _jnp

        cfg = self.cfg
        train_dtype = (_jnp.bfloat16
                       if cfg.TRAIN.precision == "bfloat16"
                       else _jnp.float32)
        if cfg.TRAIN.fused_kernels == "auto":
            # the fused LBF training kernels need a real TPU lowering
            fused = _jax.default_backend() not in ("cpu", "gpu")
        else:
            fused = cfg.TRAIN.fused_kernels == "on"
        if self.is_gator:
            train_step = make_gator_train_step(
                self.spec, self.assets.faces, self.target_regressor,
                losses.LossWeights(
                    normal=cfg.MODEL.normal_loss_weight,
                    edge=cfg.MODEL.edge_loss_weight,
                    joint=cfg.MODEL.joint_loss_weight), tx,
                dtype=train_dtype, fused=fused)
            if getattr(self, "gt_in_step", "off") == "on":
                from ..train.loop import with_gt_synthesis
                train_step = with_gt_synthesis(
                    train_step, self.synth,
                    self.datasets[0].opts.fitting_thr)
            elif getattr(self, "gt_in_step", "off") == "full":
                from ..data.device_pipeline import \
                    with_device_input_pipeline
                ds = self.datasets[0]
                train_step = with_device_input_pipeline(
                    train_step, self.synth, ds.table, ds.joint_set,
                    ds.opts, ds.opts.fitting_thr,
                    mesh_cache=self._mesh_cache_on(len(ds)))
            elif getattr(self, "gt_in_step", "off") in ("packed", "device"):
                from ..data.packed import with_packed_input_pipeline
                table = self.packed_table()
                train_step = with_packed_input_pipeline(
                    train_step, table, self.synth,
                    self.assets.joint_set, stage="gator",
                    opts=self.datasets[0].opts,
                    device_input=self.gt_in_step == "device",
                    mesh_cache=self._mesh_cache_on(len(table)))
            # accuracy-reporting surface: eval ALWAYS runs f32 (bf16 costs
            # a measured ~2.9 mm MPVPE; the <=0.1 mm parity target applies
            # here) — cfg.TRAIN.precision only affects the train step
            eval_step = make_gator_eval_step(
                self.spec, self.target_regressor,
                self.assets.joint_set.eval_joints
                if self.assets.joint_set.name == "human36" else
                (1, 2, 3, 4, 5, 6, 8, 10, 11, 12, 13, 14, 15, 16),
                dtype=_jnp.float32)
        else:
            train_step = make_gat_train_step(self.spec, tx,
                                             dtype=train_dtype,
                                             fused=fused)
            if getattr(self, "gt_in_step", "off") == "full":
                from ..data.device_pipeline import \
                    with_device_input_pipeline_gat
                ds = self.datasets[0]
                train_step = with_device_input_pipeline_gat(
                    train_step, ds.table, ds.joint_set, ds.opts)
            elif getattr(self, "gt_in_step", "off") in ("packed", "device"):
                from ..data.packed import with_packed_input_pipeline
                train_step = with_packed_input_pipeline(
                    train_step, self.packed_table(), self.synth,
                    self.assets.joint_set, stage="gat",
                    opts=self.datasets[0].opts,
                    device_input=self.gt_in_step == "device")
            # same f32 rule as the gator eval step above
            eval_step = make_gat_eval_step(
                self.spec, self.assets.joint_set.eval_joints,
                dtype=_jnp.float32)
        return train_step, eval_step
