"""Data-layer tests: coords/augment parity vs independent constructions,
noise statistics, GT synthesis consistency, pipeline batching/mixing."""
import numpy as np
import pytest

from gator_tpu.data import (BatchPipeline, GtSynthesizer, ProcessOptions,
                            SyntheticDataset, augment, coords,
                            mixed_epoch_indices, noise)


def test_process_bbox_aspect_snap():
    aspect = 288 / 384
    out = coords.process_bbox(np.array([10, 20, 50, 100]), aspect)
    # aspect preserved, centered on original box
    assert out[2] / out[3] == pytest.approx(aspect)
    np.testing.assert_allclose(out[0] + out[2] / 2, 10 + (50 - 1) / 2,
                               atol=1e-4)
    assert coords.process_bbox(np.array([0, 0, 0, 10]), aspect) is None


def test_cam_projections_roundtrip(rng):
    cam = rng.uniform(1, 5, size=(10, 3)).astype(np.float32) * 1000
    f, c = (1500.0, 1480.0), (500.0, 510.0)
    img = coords.cam2pixel(cam, f, c)
    back = coords.pixel2cam(img, np.array(c), np.array(f))
    np.testing.assert_allclose(back, cam, rtol=1e-5)


def test_world2cam():
    r = np.eye(3)
    t = np.array([1.0, 2, 3])
    out = coords.world2cam(np.zeros((2, 3)), r, t)
    np.testing.assert_allclose(out, np.tile(t, (2, 1)))


def test_affine_transform_maps_center_and_scale():
    center, scale = np.array([100.0, 80.0]), np.array([200.0, 260.0])
    trans = augment.get_affine_transform(center, scale, 0, (288, 384))
    got = augment.affine_transform(center, trans)
    np.testing.assert_allclose(got, [144, 192], atol=1e-4)
    # point at crop's left edge maps to x=0
    edge = augment.affine_transform(center - [100, 0], trans)
    np.testing.assert_allclose(edge[0], 0, atol=1e-4)
    # inverse round-trips
    inv = augment.get_affine_transform(center, scale, 0, (288, 384),
                                       inv=True)
    back = augment.affine_transform(got, inv)
    np.testing.assert_allclose(back, center, atol=1e-3)


def test_affine_rotation_is_about_center():
    center, scale = np.array([50.0, 50.0]), np.array([100.0, 100.0])
    trans = augment.get_affine_transform(center, scale, 90, (100, 100))
    got = augment.affine_transform(center, trans)
    np.testing.assert_allclose(got, [50, 50], atol=1e-4)
    # a point directly above center maps to the side after 90deg rotation
    p = augment.affine_transform(center + [0, -25], trans)
    assert abs(p[1] - 50) < 1e-3 and abs(p[0] - 50) > 20


def test_flip_joints():
    kp = np.array([[10.0, 5], [20, 6], [30, 7]])
    out = augment.flip_2d_joint(kp, 100, ((1, 2),))
    np.testing.assert_allclose(out[0], [89, 5])     # width - x - 1
    np.testing.assert_allclose(out[1], [69, 7])     # swapped pair
    out3 = augment.flip_3d_joint(np.array([[1.0, 2, 3], [4, 5, 6]]), ())
    np.testing.assert_allclose(out3[:, 0], [-1, -4])


def test_j3d_processing_rotation():
    s = np.array([[100.0, 0, 0]])
    out = augment.j3d_processing(s, 90, 0, ())
    np.testing.assert_allclose(out, [[0, -100, 0]], atol=1e-3)


def test_normalize_input_pose_stats():
    joints = np.random.default_rng(0).uniform(
        0, 300, size=(17, 2)).astype(np.float32)
    out = augment.normalize_input_pose(joints, (384, 288))
    np.testing.assert_allclose(out.mean(0), 0, atol=1e-5)
    np.testing.assert_allclose(out.std(0), 1, atol=1e-4)


def test_h36m_syn_error_distribution():
    names = ("Pelvis", "R_Hip", "R_Knee", "R_Ankle", "L_Hip", "L_Knee",
             "L_Ankle", "Torso", "Neck", "Nose", "Head", "L_Shoulder",
             "L_Elbow", "L_Wrist", "R_Shoulder", "R_Elbow", "R_Wrist")
    stats = noise.h36m_error_stats(names)
    assert stats.shape == (17, 5)
    # Nose row reordered correctly (table order differs from joint order)
    np.testing.assert_allclose(stats[9, :2], [0.13, -0.26])
    rng = np.random.default_rng(0)
    errs = np.stack([noise.generate_h36m_syn_error(stats, rng)
                     for _ in range(3000)])
    # pelvis weight 1.0 -> mean ~ (-0.06, -2.37)
    np.testing.assert_allclose(errs[:, 0].mean(0), [-0.06, -2.37], atol=0.2)
    # wrist weight .90 -> ~10% exact zeros
    frac_zero = (errs[:, 16] == 0).all(-1).mean()
    assert 0.05 < frac_zero < 0.15


def test_synthesize_pose_behaviors():
    rng = np.random.default_rng(0)
    joints = np.concatenate(
        [np.random.default_rng(1).uniform(50, 250, (17, 2)),
         np.ones((17, 1))], axis=1).astype(np.float32)
    area = 150.0 * 200.0
    outs = [noise.synthesize_pose(joints, area, np.random.default_rng(s))
            for s in range(20)]
    outs = np.stack(outs)
    # all joints stay valid (good/jitter/miss/inv all set validity 1)
    assert (outs[..., 2] == 1).all()
    # stochastic: different seeds differ
    assert not np.allclose(outs[0], outs[1])
    # most predictions stay near GT (good+jitter dominate)
    d = np.linalg.norm(outs[..., :2] - joints[None, :, :2], axis=-1)
    assert np.median(d) < 60


def test_mixed_epoch_indices_semantics():
    rng = np.random.default_rng(0)
    pairs = mixed_epoch_indices([100, 10, 50], rng)
    assert len(pairs) == 300  # max_len * n_dbs
    for d, n in ((0, 100), (1, 10), (2, 50)):
        sel = pairs[pairs[:, 0] == d]
        assert len(sel) > 0
        assert sel[:, 1].max() < n
    # roughly uniform over datasets
    counts = np.bincount(pairs[:, 0], minlength=3)
    assert counts.min() > 60


@pytest.fixture(scope="module")
def synth_setup(small_assets):
    synth = GtSynthesizer(small_assets)
    opts = ProcessOptions(input_joint_name="human36", is_train=True)
    ds = SyntheticDataset(small_assets, opts, n=48, seed=0,
                          synthesizer=synth)
    return synth, opts, ds


def test_synthetic_dataset_geometry(small_assets, synth_setup):
    synth, opts, ds = synth_setup
    t = ds.table
    assert len(ds) == 48
    # GT joints project to the stored image coords
    img = coords.cam2pixel(t.joint_cam_h36m[0], t.focal[0], t.princpt[0])
    np.testing.assert_allclose(img[:, :2], t.joint_img_h36m[0], atol=1e-2)


def test_gator_batch_contract(small_assets, synth_setup):
    synth, opts, ds = synth_setup
    rng = np.random.default_rng(0)
    batch = ds.make_batch(np.arange(8), synth, rng, stage="gator")
    v = small_assets.vertex_num
    assert batch["pose2d"].shape == (8, 17, 2)
    assert batch["mesh"].shape == (8, v, 3)
    assert batch["lift_pose3d"].shape == (8, 17, 3)
    # per-sample masks broadcast in the loss; the mesh target stays a
    # device array (never round-trips through the host)
    assert batch["mesh_valid"].shape == (8, 1, 1)
    import jax
    assert isinstance(batch["mesh"], jax.Array)
    # inputs standardized per sample
    np.testing.assert_allclose(batch["pose2d"].mean(axis=1), 0, atol=1e-4)
    # mesh target is meters, root-relative (|values| well under 2 m)
    assert np.abs(np.asarray(batch["mesh"])).max() < 2.0
    # lift target consistent with regressing from the GT mesh
    reg = np.einsum("jv,bvc->bjc", small_assets.j_regressor_h36m,
                    batch["mesh"] * 1000)
    np.testing.assert_allclose(reg, batch["reg_pose3d"], atol=2.0)


def test_gat_batch_contract(small_assets, synth_setup):
    synth, opts, ds = synth_setup
    batch = ds.make_batch(np.arange(4), synth, np.random.default_rng(0),
                          stage="gat")
    assert set(batch) == {"pose2d", "joint_cam", "joint_valid"}
    assert batch["joint_cam"].shape == (4, 17, 3)


def test_pipeline_iteration_and_mixing(small_assets, synth_setup):
    synth, opts, _ = synth_setup
    ds1 = SyntheticDataset(small_assets, opts, n=32, seed=1,
                           synthesizer=synth)
    ds2 = SyntheticDataset(small_assets, opts, n=8, seed=2,
                           synthesizer=synth)
    pipe = BatchPipeline([ds1, ds2], synth, batch_size=16, seed=0,
                         prefetch=1)
    batches = list(pipe)
    assert len(pipe) == (32 * 2) // 16
    assert len(batches) == len(pipe)
    for b in batches:
        assert b["pose2d"].shape[0] == 16
    # epochs reshuffle
    pipe.set_epoch(1)
    b2 = next(iter(pipe))
    assert not np.allclose(b2["pose2d"], batches[0]["pose2d"])


def test_batch_crop_matches_scalar_path(small_assets, rng):
    """The vectorized input fast path must agree with the per-sample route
    (rotations and flips included)."""
    from gator_tpu.data import processing
    jset = small_assets.joint_set
    opts = ProcessOptions(input_joint_name="human36", is_train=True)
    b = 6
    joints = rng.uniform(50, 900, size=(b, 17, 2)).astype(np.float32)
    flips = np.array([0, 1, 0, 1, 0, 0])
    rots = np.array([0.0, 0.0, 15.0, -30.0, 7.5, 0.0], np.float32)
    batch = processing.batch_crop_and_normalize(
        joints, jset, opts, flips, rots)
    for i in range(b):
        scalar = processing.crop_and_normalize_input(
            joints[i], jset, opts, np.random.default_rng(0),
            int(flips[i]), float(rots[i]))
        np.testing.assert_allclose(batch[i], scalar, atol=2e-4)


def test_crop_area_batch_matches_scalar(small_assets):
    from gator_tpu.data import processing
    opts = processing.ProcessOptions(is_train=True,
                                     input_joint_name="coco")
    rng = np.random.default_rng(3)
    imgs = rng.uniform(50, 900, size=(16, 19, 2)).astype(np.float32)
    imgs[3] = imgs[3, :1]          # degenerate bbox row
    batched = processing.crop_area_batch(imgs, opts)
    scalar = np.array([processing.crop_area(imgs[i], opts)
                       for i in range(len(imgs))], np.float32)
    np.testing.assert_allclose(batched, scalar, rtol=1e-3)


def test_synthesize_pose_batch_distribution():
    """The batched COCO detector-noise simulator reproduces the scalar
    form's per-joint output distribution (same state machine and radii;
    joints processed in order either way)."""
    from gator_tpu.data import noise

    base = np.zeros((17, 3), np.float32)
    grid = np.random.default_rng(0).uniform(60, 320, size=(17, 2))
    base[:, :2] = grid
    base[:, 2] = 1.0
    area = 384.0 * 288.0
    n = 400

    rng_s = np.random.default_rng(11)
    scalar = np.stack([noise.synthesize_pose(base, area, rng_s)
                       for _ in range(n)])
    rng_b = np.random.default_rng(22)
    batched = noise.synthesize_pose_batch(
        np.tile(base[None], (n, 1, 1)), np.full(n, area, np.float32),
        rng_b)

    vs, vb = scalar[..., 2] > 0, batched[..., 2] > 0
    # valid rates agree (the zero-accepted fallback is rare for both)
    assert abs(vs.mean() - vb.mean()) < 0.02
    for j in range(17):
        ms = scalar[vs[:, j], j, :2].mean(0)
        mb = batched[vb[:, j], j, :2].mean(0)
        ss = scalar[vs[:, j], j, :2].std(0)
        # means within a few standard errors
        np.testing.assert_allclose(mb, ms, atol=6 * ss.max() / np.sqrt(n))
        # robust spread: median GT distance within 25% + 3 px (plain stds
        # are swamped by the rare heavy-tailed miss/inversion outliers at
        # this sample size), and far-outlier rates within binomial noise
        ds = np.linalg.norm(scalar[:, j, :2] - base[j, :2], axis=-1)
        db = np.linalg.norm(batched[:, j, :2] - base[j, :2], axis=-1)
        assert abs(np.median(ds) - np.median(db)) \
            < 0.25 * max(np.median(ds), np.median(db)) + 3.0
        assert abs((ds > 200).mean() - (db > 200).mean()) < 0.03


@pytest.mark.slow
def test_noise_distribution_gate_small_n():
    """CPU-lane version of tools/check_noise_distribution.py (the 1e5-draw
    statistical gate on the batched noise simulator's documented
    deviations): state frequencies and radius KS distance at recipe OKS
    areas, thresholds loosened for the small N."""
    import importlib.util
    import os.path as osp

    tool = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    "tools", "check_noise_distribution.py")
    spec_ = importlib.util.spec_from_file_location("check_noise_dist",
                                                   tool)
    mod = importlib.util.module_from_spec(spec_)
    spec_.loader.exec_module(mod)
    results = mod.run(n=3000, seed=0)
    assert set(results) == {"area_8000", "area_30000", "area_80000"}
    for k, r in results.items():
        assert r["state_freq_max_abs_diff"] <= 0.02, (k, r)
        assert r["radius_ks_distance"] <= 0.04, (k, r)


def test_coco_train_noise_batch_path(small_assets_coco):
    """Train-time COCO detector-noise synthesis runs on the vectorized
    path inside batch_crop_and_normalize (reference applies the scalar
    simulator per sample: Human36M/dataset.py:424-432)."""
    from gator_tpu.data import GtSynthesizer, SyntheticDataset
    from gator_tpu.data.processing import ProcessOptions

    synth = GtSynthesizer(small_assets_coco)
    noisy_opts = ProcessOptions(input_joint_name="coco",
                                use_gt_input=False, is_train=True)
    clean_opts = ProcessOptions(input_joint_name="coco",
                                use_gt_input=True, is_train=True)
    ds_n = SyntheticDataset(small_assets_coco, noisy_opts, n=8, seed=0,
                            synthesizer=synth)
    ds_c = SyntheticDataset(small_assets_coco, clean_opts, n=8, seed=0,
                            synthesizer=synth)
    bn = ds_n.make_batch(np.arange(8), synth, np.random.default_rng(0))
    bc = ds_c.make_batch(np.arange(8), synth, np.random.default_rng(0))
    assert bn["pose2d"].shape == (8, 19, 2)
    # noise perturbs the inputs but targets are identical
    assert not np.allclose(bn["pose2d"], bc["pose2d"], atol=1e-3)
    np.testing.assert_allclose(np.asarray(bn["mesh"]),
                               np.asarray(bc["mesh"]), atol=1e-6)
    assert np.isfinite(bn["pose2d"]).all()


def test_batched_detector_replacement_matches_scalar(small_assets):
    """Test-time detector replacement on the batched path equals the
    scalar crop_and_normalize_input route (same GT-bbox crop transform
    applied to the detector keypoints)."""
    from gator_tpu.data import processing

    rng = np.random.default_rng(4)
    b, j = 6, 17
    gt = rng.uniform(100, 800, size=(b, j, 2)).astype(np.float32)
    det = (gt + rng.normal(0, 12, gt.shape)).astype(np.float32)
    det3 = np.concatenate(
        [det, np.ones((b, j, 1), np.float32)], axis=-1)
    opts = processing.ProcessOptions(is_train=False, use_gt_input=False,
                                     input_joint_name="human36")
    jset = small_assets.joint_set
    batched = processing.batch_crop_and_normalize(
        gt, jset, opts, np.zeros(b, np.int64), np.zeros(b, np.float32),
        detected_pose=det3)
    scalar = np.stack([
        processing.crop_and_normalize_input(
            gt[i], jset, opts, np.random.default_rng(0), 0, 0.0,
            detected_pose=det3[i]) for i in range(b)])
    np.testing.assert_allclose(batched, scalar, atol=2e-4)


def test_batch_crop_degenerate_bbox_matches_scalar_fallback(small_assets):
    """Samples with a degenerate tight bbox must take the scalar path's
    [0,0,1,1] fallback crop in the batched route too — the same values
    as crop_and_normalize_input, not a negative zoom. (A FULLY coincident
    pose still standardizes to NaN on both routes: the reference divides
    by std with no epsilon, dataset.py:388-389 — parity-exact.)"""
    from gator_tpu.data import processing
    jset = small_assets.joint_set
    opts = ProcessOptions(input_joint_name="human36", is_train=True)
    rng_l = np.random.default_rng(5)
    joints = rng_l.uniform(50, 900, size=(4, 17, 2)).astype(np.float32)
    joints[1] = joints[1, :1]              # fully degenerate (w=h=0)
    joints[2, :, 1] = joints[2, 0, 1]      # degenerate in y only
    flips = np.zeros(4, np.int64)
    rots = np.zeros(4, np.float32)
    batch = processing.batch_crop_and_normalize(
        joints, jset, opts, flips, rots)
    for i in range(4):
        scalar = processing.crop_and_normalize_input(
            joints[i], jset, opts, np.random.default_rng(0), 0, 0.0)
        np.testing.assert_allclose(batch[i], scalar, atol=2e-4,
                                   equal_nan=True, err_msg=f"sample {i}")
        np.testing.assert_array_equal(np.isfinite(batch[i]),
                                      np.isfinite(scalar),
                                      err_msg=f"sample {i} finiteness")
    # non-degenerate samples stay fully finite
    assert np.isfinite(batch[0]).all() and np.isfinite(batch[3]).all()


def test_pipeline_worker_exception_propagates(small_assets):
    """A failure inside batch assembly must surface in the consuming
    thread, not silently truncate the epoch."""
    from gator_tpu.data.pipeline import BatchPipeline

    class Boom:
        def __len__(self):
            return 8

        def make_batch(self, indices, synth, rng, stage="gator"):
            raise RuntimeError("assembly exploded")

    pipe = BatchPipeline([Boom()], synthesizer=None, batch_size=4,
                         shuffle=False, prefetch=2)
    with pytest.raises(RuntimeError, match="assembly exploded"):
        list(pipe)


def test_raw_batch_in_step_synthesis_matches_pipeline(small_assets):
    """make_raw_batch + with_gt_synthesis must reproduce the normal
    make_batch path: same rng stream for input/aug assembly, same
    on-device SMPL/fit math (inlined into the step program, so XLA fusion
    may reorder floats by ~1 ulp), so one train step from the same state
    yields matching params to Adam noise scale."""
    import jax
    import jax.numpy as jnp
    import optax

    from gator_tpu import losses
    from gator_tpu.data import processing
    from gator_tpu.data.gt_synth import GtSynthesizer
    from gator_tpu.data.synthetic import SyntheticDataset
    from gator_tpu.models import GatorSpec, init_gator
    from gator_tpu.train import TrainState, with_gt_synthesis
    from gator_tpu.train.loop import make_gator_train_step

    synth = GtSynthesizer(small_assets)
    opts = processing.ProcessOptions(is_train=True)
    ds = SyntheticDataset(small_assets, opts, n=32, seed=0,
                          synthesizer=synth)
    idx = np.arange(8)

    normal = ds.make_batch(idx, synth, np.random.default_rng(3))
    raw = ds.make_raw_batch(idx, np.random.default_rng(3))

    # the host-assembled leaves must be bit-identical (same rng draws)
    for k in ("pose2d", "lift_pose3d", "reg_pose3d"):
        np.testing.assert_array_equal(np.asarray(normal[k]),
                                      np.asarray(raw[k]))
    assert "mesh" not in raw and "smpl_pose" in raw

    spec = GatorSpec.from_assets(small_assets, embed_dim=64, depth=1)
    tx = optax.adam(1e-3)
    variables = init_gator(spec, jax.random.PRNGKey(0))
    step = make_gator_train_step(
        spec, small_assets.faces, small_assets.j_regressor_h36m,
        losses.LossWeights(), tx)
    raw_step = with_gt_synthesis(step, synth, opts.fitting_thr)
    key, edge = jax.random.PRNGKey(9), jnp.asarray(1.0)

    s1 = TrainState.create(variables, tx)
    s1, m1 = jax.jit(step)(s1, normal, key, edge)
    s2 = TrainState.create(variables, tx)
    s2, m2 = jax.jit(raw_step)(s2, raw, key, edge)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    # the in-step mesh differs by ~1 ulp (XLA fuses the synthesis into
    # the loss program), and Adam's first bias-corrected step maps ANY
    # gradient perturbation to an up-to-lr update swing — same 2.5*lr
    # bound as test_data_parallel_step_matches_single_device; real wiring
    # bugs show at O(1e-1)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2.5e-3)


def test_gat_stage_batch_skips_synthesis_unchanged(small_assets):
    """The non-COCO GAT batch must be identical with and without the
    synthesis skip (it never contained a mesh)."""
    from gator_tpu.data import processing
    from gator_tpu.data.gt_synth import GtSynthesizer
    from gator_tpu.data.synthetic import SyntheticDataset

    synth = GtSynthesizer(small_assets)
    opts = processing.ProcessOptions(is_train=True)
    ds = SyntheticDataset(small_assets, opts, n=16, seed=0,
                          synthesizer=synth)
    b = ds.make_batch(np.arange(8), synth, np.random.default_rng(1),
                      stage="gat")
    assert set(b) == {"pose2d", "joint_cam", "joint_valid"}
    assert b["joint_valid"].min() == 1.0


def test_device_input_pipeline_matches_host(small_assets):
    """gt_in_step="full": the jnp input-assembly ports (crop/normalize,
    j3d augmentation) and the index-batch step must reproduce the host
    path, with flip AND rotation augmentation exercised."""
    import jax
    import jax.numpy as jnp
    import optax

    from gator_tpu import losses
    from gator_tpu.data import processing
    from gator_tpu.data.device_pipeline import with_device_input_pipeline
    from gator_tpu.data.gt_synth import GtSynthesizer
    from gator_tpu.data.synthetic import SyntheticDataset
    from gator_tpu.models import GatorSpec, init_gator
    from gator_tpu.train import TrainState
    from gator_tpu.train.loop import make_gator_train_step

    synth = GtSynthesizer(small_assets)
    opts = processing.ProcessOptions(is_train=True, flip_enabled=True,
                                     rotate_factor=30.0)
    ds = SyntheticDataset(small_assets, opts, n=32, seed=0,
                          synthesizer=synth)
    idx = np.arange(12)

    host = ds.make_batch(idx, synth, np.random.default_rng(7))
    index = ds.make_index_batch(idx, np.random.default_rng(7))
    assert set(index) == {"idx", "flips", "rots"}
    assert sum(x.nbytes for x in index.values()) < 16 * len(idx)

    spec = GatorSpec.from_assets(small_assets, embed_dim=64, depth=1)
    tx = optax.adam(1e-3)
    variables = init_gator(spec, jax.random.PRNGKey(0))
    step = make_gator_train_step(
        spec, small_assets.faces, small_assets.j_regressor_h36m,
        losses.LossWeights(), tx)
    dstep = with_device_input_pipeline(step, synth, ds.table,
                                       ds.joint_set, opts,
                                       opts.fitting_thr)

    # intercept the assembled inner batch to pin the ports directly
    seen = {}

    def spy(state, batch, *extra):
        seen.update(batch)
        return step(state, batch, *extra)

    spy_step = with_device_input_pipeline(spy, synth, ds.table,
                                          ds.joint_set, opts,
                                          opts.fitting_thr)
    key, edge = jax.random.PRNGKey(5), jnp.asarray(1.0)
    s0 = TrainState.create(variables, tx)
    # eager pass captures the assembled inner batch as concrete arrays
    spy_step(s0, {k: jnp.asarray(v) for k, v in index.items()}, key, edge)
    s_dev, m_dev = jax.jit(dstep)(s0, index, key, edge)
    # mesh atol: ~1 ulp of fusion reordering at mesh scale; 2e-6 (was
    # 1e-6) since the SMPL tables became traced jit ARGUMENTS instead of
    # baked constants (constargs contract), which shifts XLA's folding
    for k, atol in (("pose2d", 5e-6), ("lift_pose3d", 2e-3),
                    ("reg_pose3d", 2e-3), ("mesh", 2e-6),
                    ("mesh_valid", 0.0)):
        np.testing.assert_allclose(
            np.asarray(seen[k]), np.asarray(host[k], np.float32),
            rtol=0, atol=atol, err_msg=k)

    s_host = TrainState.create(variables, tx)
    s_host, m_host = jax.jit(step)(s_host, host, key, edge)
    np.testing.assert_allclose(float(m_dev["loss"]), float(m_host["loss"]),
                               rtol=1e-5)
    # same Adam first-step noise bound as the other equivalence tests
    for a, b in zip(jax.tree_util.tree_leaves(s_host.params),
                    jax.tree_util.tree_leaves(s_dev.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2.5e-3)


def test_device_pipeline_mesh_cache_matches_in_step(small_assets):
    """mesh_cache=True precomputes the (epoch-invariant) GT mesh + fit
    mask once per run; the cached step must reproduce the in-step
    synthesis exactly — same loss, same assembled targets."""
    import jax
    import jax.numpy as jnp
    import optax

    from gator_tpu import losses
    from gator_tpu.data import processing
    from gator_tpu.data.device_pipeline import with_device_input_pipeline
    from gator_tpu.data.gt_synth import GtSynthesizer
    from gator_tpu.data.synthetic import SyntheticDataset
    from gator_tpu.models import GatorSpec, init_gator
    from gator_tpu.train import TrainState
    from gator_tpu.train.loop import make_gator_train_step

    synth = GtSynthesizer(small_assets)
    opts = processing.ProcessOptions(is_train=True, flip_enabled=True,
                                     rotate_factor=30.0)
    ds = SyntheticDataset(small_assets, opts, n=21, seed=0,   # odd n:
                          synthesizer=synth)                  # wrap pad
    spec = GatorSpec.from_assets(small_assets, embed_dim=64, depth=1)
    tx = optax.adam(1e-3)
    variables = init_gator(spec, jax.random.PRNGKey(0))
    step = make_gator_train_step(
        spec, small_assets.faces, small_assets.j_regressor_h36m,
        losses.LossWeights(), tx)
    plain = with_device_input_pipeline(step, synth, ds.table,
                                       ds.joint_set, opts,
                                       opts.fitting_thr)
    cached = with_device_input_pipeline(step, synth, ds.table,
                                        ds.joint_set, opts,
                                        opts.fitting_thr, mesh_cache=True)
    index = ds.make_index_batch(np.arange(12), np.random.default_rng(7))
    key, edge = jax.random.PRNGKey(5), jnp.asarray(1.0)
    s0 = TrainState.create(variables, tx)
    s_a, m_a = jax.jit(plain)(s0, index, key, edge)
    s_b, m_b = jax.jit(cached)(s0, index, key, edge)
    np.testing.assert_allclose(float(m_b["loss"]), float(m_a["loss"]),
                               rtol=1e-6)
    # same Adam first-step ulp-noise bound as the other equivalence tests
    for a, b in zip(jax.tree_util.tree_leaves(s_a.params),
                    jax.tree_util.tree_leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2.5e-3)


def test_device_input_pipeline_gat_matches_host(small_assets):
    """Stage-1 version of the device pipeline: index batches + in-step
    target assembly must reproduce the host gat batch (flip/rot aug on)
    and one CoordLoss train step."""
    import jax
    import jax.numpy as jnp
    import optax

    from gator_tpu.data import processing
    from gator_tpu.data.device_pipeline import \
        with_device_input_pipeline_gat
    from gator_tpu.data.gt_synth import GtSynthesizer
    from gator_tpu.data.synthetic import SyntheticDataset
    from gator_tpu.models import GatSpec, init_gat
    from gator_tpu.train import TrainState, make_gat_train_step

    synth = GtSynthesizer(small_assets)
    opts = processing.ProcessOptions(is_train=True, flip_enabled=True,
                                     rotate_factor=30.0)
    ds = SyntheticDataset(small_assets, opts, n=32, seed=0,
                          synthesizer=synth)
    idx = np.arange(12)
    host = ds.make_batch(idx, synth, np.random.default_rng(7),
                         stage="gat")
    index = ds.make_index_batch(idx, np.random.default_rng(7),
                                stage="gat")

    spec = GatSpec.from_assets(small_assets, embed_dim=64, depth=1)
    tx = optax.adam(1e-3)
    variables = init_gat(spec, jax.random.PRNGKey(0))
    step = make_gat_train_step(spec, tx)
    dstep = with_device_input_pipeline_gat(step, ds.table, ds.joint_set,
                                           opts)
    key = jax.random.PRNGKey(5)
    s_host, m_host = jax.jit(step)(TrainState.create(variables, tx),
                                   host, key)
    s_dev, m_dev = jax.jit(dstep)(TrainState.create(variables, tx),
                                  index, key)
    np.testing.assert_allclose(float(m_dev["loss"]),
                               float(m_host["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_host.params),
                    jax.tree_util.tree_leaves(s_dev.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2.5e-3)


def test_epoch_device_stream_matches_grouped_transfer(small_assets):
    """EpochDeviceStream (ONE device_put per epoch, payloads sliced out
    of the device-resident [NB, B, ...] tensor) must yield the exact
    payload stream of the per-group stack_batches/shard_batch transfer
    path: same group sizes, same values, and the sharding layouts the
    multi-step / single-step programs expect — including the epoch-tail
    singles policy."""
    import jax

    from gator_tpu.data import processing
    from gator_tpu.data.gt_synth import GtSynthesizer
    from gator_tpu.parallel import (EpochDeviceStream, batch_sharding,
                                    make_mesh, shard_batch, stack_batches,
                                    superbatch_sharding)

    synth = GtSynthesizer(small_assets)
    opts = processing.ProcessOptions(is_train=True, flip_enabled=True,
                                     rotate_factor=30.0)
    ds = SyntheticDataset(small_assets, opts, n=40, seed=0,
                          synthesizer=synth)
    mesh = make_mesh()
    k = 3                       # 40/8 = 5 batches -> one k-group + 2 tails

    def build(epoch_mode):
        pipe = BatchPipeline([ds], synth, batch_size=8, seed=3,
                             prefetch=1, mode="index")
        pipe.chunk = k
        if epoch_mode:
            pipe.epoch_transfer = EpochDeviceStream(mesh, k)
        else:
            pipe.transfer = lambda bs: (
                (stack_batches(mesh, bs), len(bs)) if len(bs) > 1
                else (shard_batch(mesh, bs[0]), 1))
        pipe.set_epoch(2)
        return list(pipe)

    grouped, epoch = build(False), build(True)
    assert [n for _, n in grouped] == [n for _, n in epoch] == [k, 1, 1]
    sh_super, sh_batch = superbatch_sharding(mesh), batch_sharding(mesh)
    for (pg, n), (pe, _) in zip(grouped, epoch):
        want = sh_super if n > 1 else sh_batch
        for key in pg:
            np.testing.assert_array_equal(np.asarray(pg[key]),
                                          np.asarray(pe[key]),
                                          err_msg=key)
            assert pe[key].sharding.is_equivalent_to(
                want, np.asarray(pe[key]).ndim), (key, pe[key].sharding)

    # chunk == 1: plain per-batch payloads with batch sharding
    pipe1 = BatchPipeline([ds], synth, batch_size=8, seed=3,
                          prefetch=0, mode="index")
    pipe1.epoch_transfer = EpochDeviceStream(mesh, 1)
    items = list(pipe1)
    assert len(items) == 5 and isinstance(items[0], dict)
    assert items[0]["idx"].sharding.is_equivalent_to(sh_batch, 1)

    # guard: epoch-granular transfer is index-mode-only
    bad = BatchPipeline([ds], synth, batch_size=8, seed=3, prefetch=0)
    bad.epoch_transfer = EpochDeviceStream(mesh, 1)
    with pytest.raises(ValueError, match="index"):
        list(bad)
