"""Packed device pipeline (gt_in_step="packed"): equivalence against the
host batch path for every flagship dataset, the mixed recipe, both stages,
detector input, and gendered tables.

Equivalence semantics: targets/masks and noise-free inputs are pinned at
tight tolerances; the COCO detector-noise simulator's discrete accept/pick
choices can flip on batch-composition ulp differences (the HOST path
itself is not batch-composition-invariant), so the det-noise input is
pinned (a) bitwise through the shared `input_pose2d` given identical
inputs, and (b) by a bounded divergence fraction end to end.
"""
import numpy as np
import pytest

from gator_tpu.data import processing
from gator_tpu.data.gt_synth import GtSynthesizer
from gator_tpu.data.pipeline import BatchPipeline
from gator_tpu.data.synthetic import (SyntheticDataset,
                                      synthetic_coco_dataset,
                                      synthetic_muco_dataset)


@pytest.fixture(scope="module")
def coco_setup(small_assets_coco):
    synth = GtSynthesizer(small_assets_coco)
    opts = processing.ProcessOptions(is_train=True, use_gt_input=True,
                                     input_joint_name="coco",
                                     flip_enabled=True, rotate_factor=30.0)
    dss = [SyntheticDataset(small_assets_coco, opts, n=24, seed=0,
                            synthesizer=synth),
           synthetic_coco_dataset(small_assets_coco, opts, n=20, seed=0,
                                  synthesizer=synth),
           synthetic_muco_dataset(small_assets_coco, opts, n=16, seed=0,
                                  synthesizer=synth)]
    from gator_tpu.data.packed import build_packed_tables
    table = build_packed_tables(dss, synth, chunk=8)
    return synth, opts, dss, table


def _gator_step(assets, alpha=True):
    import jax
    import optax

    from gator_tpu import losses
    from gator_tpu.models import GatorSpec, init_gator
    from gator_tpu.train.loop import make_gator_train_step

    spec = GatorSpec.from_assets(assets, embed_dim=64, depth=1, alpha=alpha)
    tx = optax.adam(1e-3)
    variables = init_gator(spec, jax.random.PRNGKey(0))
    step = make_gator_train_step(spec, assets.faces,
                                 assets.j_regressor_h36m,
                                 losses.LossWeights(), tx)
    return step, variables, tx


TARGET_TOLS = (("lift_pose3d", 2e-3), ("reg_pose3d", 2e-3), ("mesh", 2e-6),
               ("mesh_valid", 0.0), ("reg_valid", 0.0), ("lift_valid", 0.0))


def test_packed_targets_match_host_per_dataset(small_assets_coco,
                                               coco_setup):
    """Every dataset's packed device targets (in-step mesh from effective
    SMPL inputs, lift/reg, fit-gate masks) and GT-input pose2d must
    reproduce its host make_batch, and one full train step must agree."""
    import jax
    import jax.numpy as jnp

    from gator_tpu.data.packed import with_packed_input_pipeline
    from gator_tpu.train import TrainState

    synth, opts, dss, table = coco_setup
    step, variables, tx = _gator_step(small_assets_coco)
    seen = {}

    def spy(state, batch, *extra):
        seen.update(batch)
        return step(state, batch, *extra)

    pstep = with_packed_input_pipeline(step, table, synth,
                                       small_assets_coco.joint_set)
    pspy = with_packed_input_pipeline(spy, table, synth,
                                     small_assets_coco.joint_set)
    key, edge = jax.random.PRNGKey(5), jnp.asarray(1.0)
    for ds in dss:
        idx = np.arange(10)
        full = ds.make_batch(idx, synth, np.random.default_rng(3))
        pk = ds.make_packed_batch(idx, np.random.default_rng(3))
        assert pk["row"].dtype == np.int32
        pspy(TrainState.create(variables, tx),
             {k: jnp.asarray(v) for k, v in pk.items()}, key, edge)
        name = type(ds).__name__
        np.testing.assert_allclose(
            np.asarray(seen["pose2d"]), np.asarray(full["pose2d"]),
            rtol=0, atol=1e-5, err_msg=f"{name}:pose2d")
        for k, atol in TARGET_TOLS:
            np.testing.assert_allclose(
                np.asarray(seen[k]), np.asarray(full[k], np.float32),
                rtol=0, atol=atol, err_msg=f"{name}:{k}")
        s_h, m_h = jax.jit(step)(TrainState.create(variables, tx), full,
                                 key, edge)
        s_p, m_p = jax.jit(pstep)(TrainState.create(variables, tx), pk,
                                  key, edge)
        np.testing.assert_allclose(float(m_p["loss"]), float(m_h["loss"]),
                                   rtol=1e-5, err_msg=name)


def test_packed_mixed_pipeline_matches_full_mode(small_assets_coco,
                                                 coco_setup):
    """BatchPipeline mode='packed' over the H36M+COCO+MuCo mix must yield
    the same batch stream as mode='full' (same seed -> same mixing plan,
    same aug/noise rng consumption per dataset part) and train to the
    same losses, GT-input variant (no discrete noise divergence)."""
    import jax
    import jax.numpy as jnp

    from gator_tpu.data.packed import with_packed_input_pipeline
    from gator_tpu.train import TrainState

    synth, opts, dss, table = coco_setup
    step, variables, tx = _gator_step(small_assets_coco)
    pstep = with_packed_input_pipeline(step, table, synth,
                                       small_assets_coco.joint_set)

    def batches(mode):
        pipe = BatchPipeline(dss, synth, batch_size=12, seed=7,
                             prefetch=0, mode=mode)
        pipe.set_epoch(1)
        return list(pipe)

    full_items, packed_items = batches("full"), batches("packed")
    assert len(full_items) == len(packed_items) == 6   # max_len*3 // 12
    key, edge = jax.random.PRNGKey(5), jnp.asarray(1.0)
    s_h = TrainState.create(variables, tx)
    s_p = TrainState.create(variables, tx)
    jstep, jpstep = jax.jit(step), jax.jit(pstep)
    for fb, pb in zip(full_items, packed_items):
        np.testing.assert_allclose(np.asarray(pb["pose2d"]),
                                   np.asarray(fb["pose2d"]),
                                   rtol=0, atol=1e-5)
        s_h, m_h = jstep(s_h, fb, key, edge)
        s_p, m_p = jpstep(s_p, pb, key, edge)
        np.testing.assert_allclose(float(m_p["loss"]), float(m_h["loss"]),
                                   rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_h.params),
                    jax.tree_util.tree_leaves(s_p.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2.5e-3)


def test_packed_det_input_noise_equivalence(small_assets_coco):
    """Detector-input (use_gt_input=false) COCO-noise path: the packed
    batch runs the EXACT host noise/crop code (`base.input_pose2d`), so
    given identical input joints the output is bitwise identical; across
    the mode boundary (precomputed vs per-batch joint projections, ulp
    apart) only the simulator's discrete picks may flip, and only
    rarely."""
    from gator_tpu.data.base import input_pose2d
    from gator_tpu.data.packed import build_packed_tables

    synth = GtSynthesizer(small_assets_coco)
    opts = processing.ProcessOptions(is_train=True, use_gt_input=False,
                                     input_joint_name="coco")
    ds = synthetic_coco_dataset(small_assets_coco, opts, n=64, seed=0,
                                synthesizer=synth)
    build_packed_tables([ds], synth, chunk=16)
    idx = np.arange(48)

    # (a) bitwise: packed batch == input_pose2d on the packed table's rows
    pk = ds.make_packed_batch(idx, np.random.default_rng(11))
    rng = np.random.default_rng(11)
    from gator_tpu.data.augment import augm_params_batch
    flips, rots = augm_params_batch(True, opts.flip_enabled,
                                    opts.rotate_factor, len(idx), rng)
    ref = input_pose2d(ds.opts, ds.joint_set, rng,
                       ds._packed.joint_img_input[idx], flips, rots)
    np.testing.assert_array_equal(pk["pose2d"], ref)

    # (b) the deterministic precompute matches the per-batch projections
    # (the only cross-path difference is batch-composition ulps)
    t = ds.table
    mesh_mm, _ = synth.smpl_mesh_plain(t.pose[idx], t.shape[idx])
    _, img = synth.coco_weak_perspective(mesh_mm, t.cam_s[idx],
                                         t.cam_t[idx])
    np.testing.assert_allclose(ds._packed.joint_img_input[idx],
                               np.asarray(img)[..., :2],
                               rtol=0, atol=1e-3)

    # (c) distributional equality vs the host full path. NOTE: per-sample
    # identity is NOT a meaningful target here — the noise simulator's
    # discrete accept/pick draws are chaotic to ulp-scale input shifts,
    # and the HOST path itself shifts ulps with batch composition (its
    # joint projections are batched einsums). Same rng, same rows:
    full = ds.make_batch(idx, synth, np.random.default_rng(11))
    p, f = np.asarray(pk["pose2d"]), np.asarray(full["pose2d"])
    assert p.shape == f.shape
    # normalized inputs: per-joint means/stds of the two draws agree
    np.testing.assert_allclose(p.mean(axis=0), f.mean(axis=0),
                               rtol=0, atol=0.35)
    np.testing.assert_allclose(p.std(axis=0), f.std(axis=0),
                               rtol=0.5, atol=0.2)
    # ...and the pipelines agree exactly on which samples were noised
    # (every train det-input sample) and on the un-noised GT-input form
    gt_opts = processing.ProcessOptions(is_train=True, use_gt_input=True,
                                        input_joint_name="coco")
    ds_gt = synthetic_coco_dataset(small_assets_coco, gt_opts, n=64,
                                   seed=0, synthesizer=synth)
    build_packed_tables([ds_gt], synth, chunk=16)
    full_gt = ds_gt.make_batch(idx, synth, np.random.default_rng(11))
    pk_gt = ds_gt.make_packed_batch(idx, np.random.default_rng(11))
    np.testing.assert_allclose(np.asarray(pk_gt["pose2d"]),
                               np.asarray(full_gt["pose2d"]),
                               rtol=0, atol=1e-5)


def test_packed_det_input_h36m_noise_bitwise_path(small_assets):
    """h36m detector input (additive Gaussian noise, no discrete
    branches): packed pose2d matches the host path at ulp tolerance."""
    from gator_tpu.data.packed import build_packed_tables

    synth = GtSynthesizer(small_assets)
    opts = processing.ProcessOptions(is_train=True, use_gt_input=False,
                                     input_joint_name="human36",
                                     flip_enabled=True, rotate_factor=30.0)
    ds = SyntheticDataset(small_assets, opts, n=32, seed=0,
                          synthesizer=synth)
    build_packed_tables([ds], synth, chunk=8)
    idx = np.arange(20)
    full = ds.make_batch(idx, synth, np.random.default_rng(5))
    pk = ds.make_packed_batch(idx, np.random.default_rng(5))
    np.testing.assert_allclose(np.asarray(pk["pose2d"]),
                               np.asarray(full["pose2d"]),
                               rtol=0, atol=1e-5)


def test_packed_gat_stage_matches_host(small_assets_coco, coco_setup):
    """Stage-1 packed batches: pose2d + augmented lift target + per-row
    joint_valid policy (H36M/COCO zero on bad fit, MuCo keeps) must match
    the host gat batches, per dataset and through one CoordLoss step."""
    import jax
    import jax.numpy as jnp
    import optax

    from gator_tpu.data.packed import with_packed_input_pipeline
    from gator_tpu.models import GatSpec, init_gat
    from gator_tpu.train import TrainState, make_gat_train_step

    synth, opts, dss, table = coco_setup
    spec = GatSpec.from_assets(small_assets_coco, embed_dim=64, depth=1)
    tx = optax.adam(1e-3)
    variables = init_gat(spec, jax.random.PRNGKey(0))
    step = make_gat_train_step(spec, tx)
    seen = {}

    def spy(state, batch, *extra):
        seen.update(batch)
        return step(state, batch, *extra)

    pstep = with_packed_input_pipeline(step, table, synth,
                                       small_assets_coco.joint_set,
                                       stage="gat")
    pspy = with_packed_input_pipeline(spy, table, synth,
                                      small_assets_coco.joint_set,
                                      stage="gat")
    key = jax.random.PRNGKey(5)
    for ds in dss:
        idx = np.arange(10)
        full = ds.make_batch(idx, synth, np.random.default_rng(3),
                             stage="gat")
        pk = ds.make_packed_batch(idx, np.random.default_rng(3))
        pspy(TrainState.create(variables, tx),
             {k: jnp.asarray(v) for k, v in pk.items()}, key)
        name = type(ds).__name__
        np.testing.assert_allclose(np.asarray(seen["pose2d"]),
                                   np.asarray(full["pose2d"]),
                                   rtol=0, atol=1e-5, err_msg=name)
        np.testing.assert_allclose(np.asarray(seen["joint_cam"]),
                                   np.asarray(full["joint_cam"]),
                                   rtol=0, atol=2e-3, err_msg=name)
        np.testing.assert_array_equal(np.asarray(seen["joint_valid"]),
                                      np.asarray(full["joint_valid"]),
                                      err_msg=name)
        s_h, m_h = jax.jit(step)(TrainState.create(variables, tx), full,
                                 key)
        s_p, m_p = jax.jit(pstep)(TrainState.create(variables, tx), pk,
                                  key)
        np.testing.assert_allclose(float(m_p["loss"]), float(m_h["loss"]),
                                   rtol=1e-5, err_msg=name)


def test_packed_gendered_rows(small_assets):
    """Gendered tables: the per-present-gender forward + per-row select
    must reproduce the host path's per-gender grouping, with genuinely
    DIFFERENT female/male models."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gator_tpu.assets import smpl_assets
    from gator_tpu.data.packed import (build_packed_tables,
                                       with_packed_input_pipeline)
    from gator_tpu.train import TrainState

    v = small_assets.smpl_gendered["neutral"].vertex_num
    gendered = dict(small_assets.smpl_gendered)
    gendered["female"] = smpl_assets.synthetic_smpl(v, seed=11)
    gendered["male"] = smpl_assets.synthetic_smpl(v, seed=22)
    assets = dataclasses.replace(small_assets, smpl_gendered=gendered)
    synth = GtSynthesizer(assets)
    opts = processing.ProcessOptions(is_train=True, use_gt_input=True,
                                     input_joint_name="human36")
    ds = SyntheticDataset(assets, opts, n=24, seed=0, synthesizer=synth)
    rng = np.random.default_rng(9)
    ds.table.gender[:] = rng.integers(0, 3, len(ds.table))
    table = build_packed_tables([ds], synth, chunk=8)
    assert set(table.genders_present) == {"neutral", "female", "male"}

    step, variables, tx = _gator_step(assets, alpha=True)
    seen = {}

    def spy(state, batch, *extra):
        seen.update(batch)
        return step(state, batch, *extra)

    pspy = with_packed_input_pipeline(spy, table, synth, assets.joint_set)
    idx = np.arange(16)
    full = ds.make_batch(idx, synth, np.random.default_rng(3))
    pk = ds.make_packed_batch(idx, np.random.default_rng(3))
    key, edge = jax.random.PRNGKey(5), jnp.asarray(1.0)
    pspy(TrainState.create(variables, tx),
         {k: jnp.asarray(v_) for k, v_ in pk.items()}, key, edge)
    np.testing.assert_allclose(np.asarray(seen["mesh"]),
                               np.asarray(full["mesh"], np.float32),
                               rtol=0, atol=2e-6)
    np.testing.assert_array_equal(np.asarray(seen["mesh_valid"]),
                                  np.asarray(full["mesh_valid"]))


def test_full_pipeline_gendered_rows(small_assets):
    """gt_in_step='full' (index-only) now supports gendered tables: the
    in-step per-gender smpl_mesh_cam select must match the host path."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gator_tpu.assets import smpl_assets
    from gator_tpu.data.device_pipeline import with_device_input_pipeline
    from gator_tpu.train import TrainState

    v = small_assets.smpl_gendered["neutral"].vertex_num
    gendered = dict(small_assets.smpl_gendered)
    gendered["female"] = smpl_assets.synthetic_smpl(v, seed=11)
    gendered["male"] = smpl_assets.synthetic_smpl(v, seed=22)
    assets = dataclasses.replace(small_assets, smpl_gendered=gendered)
    synth = GtSynthesizer(assets)
    opts = processing.ProcessOptions(is_train=True)
    ds = SyntheticDataset(assets, opts, n=24, seed=0, synthesizer=synth)
    ds.table.gender[:] = np.random.default_rng(9).integers(
        0, 3, len(ds.table))

    step, variables, tx = _gator_step(assets, alpha=True)
    seen = {}

    def spy(state, batch, *extra):
        seen.update(batch)
        return step(state, batch, *extra)

    dspy = with_device_input_pipeline(spy, synth, ds.table, ds.joint_set,
                                      opts, opts.fitting_thr)
    idx = np.arange(16)
    full = ds.make_batch(idx, synth, np.random.default_rng(3))
    index = ds.make_index_batch(idx, np.random.default_rng(3))
    key, edge = jax.random.PRNGKey(5), jnp.asarray(1.0)
    dspy(TrainState.create(variables, tx),
         {k: jnp.asarray(v_) for k, v_ in index.items()}, key, edge)
    np.testing.assert_allclose(np.asarray(seen["mesh"]),
                               np.asarray(full["mesh"], np.float32),
                               rtol=0, atol=2e-6)
    np.testing.assert_array_equal(np.asarray(seen["mesh_valid"]),
                                  np.asarray(full["mesh_valid"]))


def test_packed_mesh_cache_matches_in_step(small_assets_coco, coco_setup):
    """mesh_cache=True (gendered mixed table, device-input mode): the
    once-per-run mesh precompute must reproduce the in-step SMPL
    synthesis exactly — same loss, same post-step params."""
    import jax
    import jax.numpy as jnp

    from gator_tpu.data.packed import (make_device_batch,
                                       with_packed_input_pipeline)
    from gator_tpu.train import TrainState

    synth, opts, dss, table = coco_setup
    det_opts = processing.ProcessOptions(
        is_train=True, use_gt_input=False, input_joint_name="coco",
        flip_enabled=True, rotate_factor=30.0)
    step, variables, tx = _gator_step(small_assets_coco)
    plain = with_packed_input_pipeline(step, table, synth,
                                       small_assets_coco.joint_set,
                                       opts=det_opts, device_input=True)
    cached = with_packed_input_pipeline(step, table, synth,
                                        small_assets_coco.joint_set,
                                        opts=det_opts, device_input=True,
                                        mesh_cache=True)
    pk = make_device_batch(dss[0], np.arange(10),
                           np.random.default_rng(3))
    pk = {k: jnp.asarray(v) for k, v in pk.items()}
    key, edge = jax.random.PRNGKey(5), jnp.asarray(1.0)
    s0 = TrainState.create(variables, tx)
    s_a, m_a = jax.jit(plain)(s0, pk, key, edge)
    s_b, m_b = jax.jit(cached)(s0, pk, key, edge)
    np.testing.assert_allclose(float(m_b["loss"]), float(m_a["loss"]),
                               rtol=1e-6)
    # chunked precompute vs in-step SMPL differ by reduction-tiling ulps;
    # Adam's sqrt(v)+eps normalization amplifies those near zero grad —
    # same first-step noise bound as the other equivalence tests
    for a, b in zip(jax.tree_util.tree_leaves(s_a.params),
                    jax.tree_util.tree_leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2.5e-3)


def test_session_mode_resolution(tmp_path):
    """gt_in_step='auto' must resolve to 'full' for GT-input single-dataset
    recipes, 'device' for the detector-input mixed recipe (index-only
    batches + in-step noise synthesis), and explicit modes must
    validate."""
    import yaml

    from gator_tpu.cli.common import Session
    from gator_tpu.config import load_config

    def cfg_with(train_list, use_gt, joints, gt_in_step, name="GATOR"):
        d = {
            "DATASET": {"train_list": train_list, "test_list": ["PW3D"],
                        "input_joint_set": joints,
                        "target_joint_set": "human36",
                        "use_gt_input": use_gt},
            "MODEL": {"name": name},
            "TRAIN": {"batch_size": 8, "gt_in_step": gt_in_step},
        }
        p = tmp_path / "c.yml"
        p.write_text(yaml.safe_dump(d))
        return load_config(str(p))

    import gator_tpu.assets as gassets
    assets = gassets.build_assets("human36", data_dirs=[],
                                  synthetic_vertex_num=890, seed=0)
    sess = Session(cfg_with(["Human36M"], True, "human36", "auto"),
                   synthetic=True, synthetic_n=16, assets=assets)
    assert sess.gt_in_step == "full"

    assets_c = gassets.build_assets("coco", data_dirs=[],
                                    synthetic_vertex_num=890, seed=0)
    sess = Session(cfg_with(["Human36M", "COCO", "MuCo"], False, "coco",
                            "auto"),
                   synthetic=True, synthetic_n=16, assets=assets_c)
    assert sess.gt_in_step == "device"
    assert len(sess.datasets) == 3
    # explicit 'packed' (host-assembled 2D input) stays available
    sess = Session(cfg_with(["Human36M", "COCO", "MuCo"], False, "coco",
                            "packed"),
                   synthetic=True, synthetic_n=16, assets=assets_c)
    assert sess.gt_in_step == "packed"
    # explicit 'full' on the det mix must raise with a helpful pointer
    with pytest.raises(ValueError, match="packed"):
        Session(cfg_with(["Human36M", "COCO", "MuCo"], False, "coco",
                         "full"),
                synthetic=True, synthetic_n=16, assets=assets_c)
    # eval sessions never engage a fast path
    sess = Session(cfg_with(["Human36M"], True, "human36", "auto"),
                   is_train=False, synthetic=True, synthetic_n=16,
                   assets=assets)
    assert sess.gt_in_step == "off"
