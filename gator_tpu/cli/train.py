"""Training CLI: `python -m gator_tpu.cli.train --cfg <yaml> [...]`.

Mirrors main/train.py (reference: main/train.py:1-62): per-epoch train +
eval, best tracking on joint error, checkpoint{N}/best/final, loss plots —
with data-parallel execution over every visible chip and explicit (not
import-time) experiment-dir creation.
"""
from __future__ import annotations

import argparse
import os
import os.path as osp
import signal
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import load_config
from ..parallel import (EpochDeviceStream, make_mesh, replicate, shard_batch,
                        stack_batches, superbatch_sharding)
from ..train import (TrainState, jit_data_parallel, load_checkpoint,
                     make_multi_step, pick_checkpoint, run_eval,
                     save_checkpoint)
from ..train.schedule import set_learning_rate
from ..vis import save_loss_plot
from .common import Session


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train GAT / GATOR on TPU")
    p.add_argument("--cfg", type=str, required=True)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--resume_training", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="train on the synthetic dataset (no downloads)")
    p.add_argument("--synthetic_n", type=int, default=256,
                   help="synthetic dataset size (with --synthetic)")
    p.add_argument("--exp_dir", type=str, default=None)
    p.add_argument("--epochs", type=int, default=None,
                   help="override cfg.TRAIN.end_epoch")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    overrides = {}
    if args.seed is not None:
        overrides["seed"] = args.seed
    cfg = load_config(args.cfg, overrides)

    exp_dir = args.exp_dir or osp.join(
        "experiment", f"exp_{time.strftime('%m-%d_%H%M%S')}")
    ckpt_dir = osp.join(exp_dir, "checkpoint")
    os.makedirs(ckpt_dir, exist_ok=True)
    print(f"experiment dir: {exp_dir}")

    sess = Session(cfg, is_train=True, debug=args.debug,
                   synthetic=args.synthetic,
                   synthetic_n=args.synthetic_n)
    eval_sess = Session(cfg, is_train=False, debug=args.debug,
                        synthetic=args.synthetic, assets=sess.assets)

    # optional experiment tracking (reference: lib/core/base.py:114-120;
    # gated by cfg.TRAIN.wandb and import availability)
    wandb_run = None
    if cfg.TRAIN.wandb:
        try:
            import wandb
            wandb_run = wandb.init(project=cfg.MODEL.name,
                                   name=f"GATOR/{exp_dir}", dir=exp_dir,
                                   job_type="training", reinit=True)
        except Exception as exc:   # wandb not installed / offline
            print(f"wandb disabled ({exc})")

    tx = sess.make_optimizer()
    train_step, eval_step = sess.make_steps(tx)
    variables = sess.init_variables()

    # stage-2 init from a pretrained stage-1 lifter
    # (reference: GAT.py:125-131 via cfg.MODEL.posenet_pretrained/path)
    if sess.is_gator and cfg.MODEL.posenet_pretrained \
            and cfg.MODEL.posenet_path:
        lift = load_checkpoint(
            pick_checkpoint(cfg.MODEL.posenet_path, pick_best=True))
        variables["params"]["pose_lifter"] = jax.tree_util.tree_map(
            jnp.asarray, lift["state"]["params"])
        print(f"loaded pretrained lifter from {cfg.MODEL.posenet_path}")

    state = TrainState.create(variables, tx)
    begin_epoch = cfg.TRAIN.begin_epoch
    loss_history: list = []
    error_history = {"surface": [], "joint": []}
    if args.resume_training:
        restored = load_checkpoint(pick_checkpoint(ckpt_dir),
                                   target_state=state)
        state = restored["state"]
        begin_epoch = int(restored["epoch"]) + 1
        loss_history = list(restored.get("train_log", []))
        th = restored.get("test_log") or {}
        error_history = {"surface": list(th.get("surface", [])),
                         "joint": list(th.get("joint", []))}
        if getattr(sess, "plateau", None) and restored.get("scheduler"):
            sess.plateau.load_state_dict(
                {k: float(v) for k, v in restored["scheduler"].items()})
        print(f"resumed from epoch {begin_epoch - 1}")

    mesh = make_mesh()
    print(f"devices: {jax.device_count()} ({mesh})")
    state = replicate(mesh, state)
    dstep = jit_data_parallel(train_step, mesh)
    # K>1: scan K optimizer steps per dispatch on device (numerics are
    # bit-identical to K single dispatches — test-pinned)
    k_dispatch = max(1, cfg.TRAIN.steps_per_dispatch)
    # shard/stack/transfer batches inside the prefetch worker so
    # host->device copies overlap the step dispatches (through a TPU
    # relay they cost ~ms per MB and otherwise sit on the critical path).
    # With K>1 the worker also groups K host batches and stacks them into
    # one [K, B, ...] super-batch; the epoch tail may yield a single
    # leftover batch.
    if getattr(sess, "gt_in_step", "off") in ("full", "packed", "device"):
        # small batches (~12 B/sample index-only; ~152 B/sample packed):
        # ship the WHOLE epoch in one device_put and slice per-dispatch
        # payloads on device — zero per-dispatch transfers (each costs a
        # non-overlapped ~30 ms round-trip on relay-attached hosts)
        sess.pipeline.chunk = k_dispatch
        sess.pipeline.epoch_transfer = EpochDeviceStream(mesh, k_dispatch)
    elif k_dispatch == 1:
        sess.pipeline.transfer = lambda b: shard_batch(mesh, b)
    else:
        sess.pipeline.chunk = k_dispatch
        sess.pipeline.transfer = lambda bs: (
            (stack_batches(mesh, bs), len(bs)) if len(bs) > 1
            else (shard_batch(mesh, bs[0]), 1))
    dmulti = (jit_data_parallel(make_multi_step(train_step), mesh,
                                batch_spec=superbatch_sharding(mesh))
              if k_dispatch > 1 else None)

    # preemption safety: TPU pods deliver SIGTERM with a grace period —
    # finish the in-flight step, write a resumable checkpoint, exit.
    # (The reference has no preemption handling; its --resume_training is
    # the recovery mechanism this checkpoint feeds.)
    preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        preempted["flag"] = True
        print("SIGTERM received: checkpointing at the end of this step")

    signal.signal(signal.SIGTERM, _on_sigterm)

    end_epoch = (args.epochs if args.epochs is not None
                 else cfg.TRAIN.end_epoch)
    rng = jax.random.PRNGKey(cfg.seed)
    # on resume, the restored error history defines the bar a new epoch
    # must beat — otherwise the first post-resume eval would overwrite
    # best/ with a worse model (reference keeps min(error_history))
    best_joint_err = (float(min(error_history["joint"]))
                      if error_history["joint"] else np.inf)
    for epoch in range(begin_epoch, end_epoch + 1):
        sess.pipeline.set_epoch(epoch)
        edge_on = jnp.asarray(
            1.0 if (sess.is_gator and epoch > cfg.TRAIN.edge_loss_start)
            else 0.0)
        # the epoch loss accumulates as one device scalar (a tiny cached
        # add per step): a float() per step would serialize the host
        # against every step, and stacking N per-step scalars at epoch
        # end would compile an N-operand concat per distinct epoch length
        loss_sum, steps, t0 = jnp.asarray(0.0, jnp.float32), 0, time.time()
        extra = (rng, edge_on) if sess.is_gator else (rng,)
        last_print = 0
        for item in sess.pipeline:
            if k_dispatch > 1:
                # pipeline yields pre-stacked (super-batch, n) items;
                # the epoch tail may be a single batch
                payload, n = item
                run = dmulti if n > 1 else dstep
                state, m = run(state, payload, *extra)
            else:
                # already sharded by the worker-side transfer hook
                state, m = dstep(state, item, *extra)
                n = 1
            # m["loss"] is the mean over the n scanned steps — weight it
            # back so epoch_loss stays the exact per-step mean
            loss_sum = loss_sum + m["loss"] * n
            steps += n
            if preempted["flag"]:
                # resume restarts this epoch (per-epoch checkpoint
                # granularity, like the reference's resume path)
                save_checkpoint(
                    ckpt_dir, state, epoch - 1, loss_history,
                    error_history,
                    scheduler_state=(sess.plateau.state_dict()
                                     if getattr(sess, "plateau", None)
                                     else None))
                print(f"preempted at epoch {epoch} step {steps}; "
                      f"checkpoint written, resume with "
                      f"--resume_training")
                return best_joint_err
            if wandb_run is not None:
                vals = jax.device_get(m)   # one sync for all metrics
                wandb_run.log({f"train_loss/{k}": float(v)
                               for k, v in vals.items()})
            if steps - last_print >= cfg.TRAIN.print_freq:
                last_print = steps
                # ONE device_get for the whole metrics dict: a float()
                # per metric costs a full device round-trip each
                per = jax.device_get(m)
                msg = " ".join(f"{k}: {float(v):.4f}"
                               for k, v in per.items())
                print(f"epoch {epoch} [{steps}/{len(sess.pipeline)}] {msg}")
        epoch_loss = float(loss_sum) / steps if steps else 0.0
        loss_history.append(epoch_loss)
        dt = time.time() - t0
        sps = steps * cfg.TRAIN.batch_size / max(dt, 1e-9)
        print(f"epoch {epoch} loss {epoch_loss:.4f} "
              f"({dt:.1f}s, {sps:.0f} samples/s)")

        # eval, data-parallel over the same mesh with exact per-sample
        # aggregation (reference runs the tester every epoch with running
        # sums: main/train.py:41, lib/core/base.py:224-230)
        res = run_eval(eval_step, state, eval_sess.pipeline, mesh=mesh)
        j_err = float(res.get("joint_err", np.inf))
        s_err = float(res.get("surface_err", np.inf))
        error_history["joint"].append(j_err)
        error_history["surface"].append(s_err)
        print(f"epoch {epoch} MPJPE: {j_err:.2f}  MPVPE: {s_err:.2f}")
        if wandb_run is not None:
            wandb_run.log({"error/MPJPE": j_err, "error/MPVPE": s_err})

        # plateau scheduler steps on the eval metric
        # (reference: lib/funcs_utils.py:106-107 via cfg.TRAIN.scheduler)
        if getattr(sess, "plateau", None) is not None:
            new_lr = sess.plateau.update(j_err)
            state = set_learning_rate(state, new_lr)
            print(f"plateau lr: {new_lr:g}")

        is_best = j_err < best_joint_err
        best_joint_err = min(best_joint_err, j_err)
        save_checkpoint(ckpt_dir, state, epoch, loss_history,
                        error_history, is_best=is_best,
                        is_final=(epoch == end_epoch),
                        scheduler_state=(sess.plateau.state_dict()
                                         if getattr(sess, "plateau", None)
                                         else None))
        save_loss_plot(loss_history, osp.join(exp_dir, "train_loss.pdf"))
    print(f"done; best joint error {best_joint_err:.2f}")
    return best_joint_err


if __name__ == "__main__":
    main()
