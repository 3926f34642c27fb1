"""Device detector-noise synthesis (data/device_noise.py).

The device form reproduces the host batched simulator
(`noise.synthesize_pose_batch`, itself pinned against the scalar oracle)
state-for-state, but draws from a different RNG (threefry vs PCG64), so
the cross-path contract is DISTRIBUTIONAL — the same contract the host
batched form carries against the scalar form
(tools/check_noise_distribution.py). Pinned here: per-joint error-state
band frequencies, normalized radius quantiles, the h36m Gaussian error's
closed-form moments, and the full in-step device pipeline
(gt_in_step="device") against the host batch path.

Reference behavior being reproduced: lib/noise_utils.py:17-285,
data/Human36M/dataset.py:143-155,421-453.
"""
import numpy as np
import pytest

from gator_tpu.data import processing
from gator_tpu.data.gt_synth import GtSynthesizer
from gator_tpu.data.noise import KPS_SIGMAS, h36m_error_stats
from gator_tpu.data.synthetic import SyntheticDataset, synthetic_coco_dataset

H36M_NAMES = ("Pelvis", "R_Hip", "R_Knee", "R_Ankle", "L_Hip", "L_Knee",
              "L_Ankle", "Torso", "Neck", "Nose", "Head", "L_Shoulder",
              "L_Elbow", "L_Wrist", "R_Shoulder", "R_Elbow", "R_Wrist")


@pytest.fixture(scope="module")
def crop_pose_batch(small_assets_coco):
    """Realistic crop-space 17-joint poses + OKS areas: the synthetic COCO
    dataset's input pixel joints through the production affine crop (the
    exact tensors the device noise sees in-step), tiled to B=4096."""
    import jax.numpy as jnp

    from gator_tpu.data.device_pipeline import affine_crop

    synth = GtSynthesizer(small_assets_coco)
    opts = processing.ProcessOptions(is_train=True, use_gt_input=False,
                                     input_joint_name="coco")
    ds = synthetic_coco_dataset(small_assets_coco, opts, n=64, seed=0,
                                synthesizer=synth)
    img = ds._packed.joint_img_input if hasattr(ds, "_packed") else None
    if img is None:
        from gator_tpu.data.packed import build_packed_tables
        build_packed_tables([ds], synth, chunk=16)
        img = ds._packed.joint_img_input
    crop = np.asarray(affine_crop(
        jnp.asarray(img, jnp.float32), opts.input_shape,
        jnp.zeros(len(img), jnp.float32)))[:, :17]
    areas = processing.crop_area_batch(img, opts)
    reps = 4096 // len(crop)
    return (np.tile(crop, (reps, 1, 1)).astype(np.float32),
            np.tile(areas, reps).astype(np.float32))


def _ks_dist(areas, ks):
    """[B, 17] OKS radius at threshold ks (the simulator's band edges)."""
    var = (KPS_SIGMAS * 2) ** 2
    return np.sqrt(-2.0 * areas[:, None] * var[None] * np.log(ks))


def _band_freqs(out, gt, areas):
    """Per-joint frequencies of the radius bands the error states live in:
    good r<=ks85, jitter ks85<r<=ks50, far r>ks50 (miss + inversion).
    Returns [17, 3]."""
    r = np.linalg.norm(out - gt, axis=-1)
    ks85, ks50 = _ks_dist(areas, 0.85), _ks_dist(areas, 0.50)
    good = (r <= ks85).mean(0)
    jit = ((r > ks85) & (r <= ks50)).mean(0)
    far = (r > ks50).mean(0)
    return np.stack([good, jit, far], axis=1)


def test_state_band_frequencies_match_host(crop_pose_batch):
    """The device synthesizer's per-joint error-state band frequencies
    match the host batched form within binomial noise (B=4096)."""
    import jax
    import jax.numpy as jnp

    from gator_tpu.data.device_noise import synthesize_pose_device
    from gator_tpu.data.noise import synthesize_pose_batch

    joints, areas = crop_pose_batch
    host = synthesize_pose_batch(
        np.concatenate([joints, np.ones_like(joints[..., :1])], axis=-1),
        areas, np.random.default_rng(7))[:, :, :2]
    dev = np.asarray(jax.jit(synthesize_pose_device)(
        jax.random.PRNGKey(7), jnp.asarray(joints), jnp.asarray(areas)))

    fh = _band_freqs(host, joints, areas)
    fd = _band_freqs(dev, joints, areas)
    # per-joint, per-band: |Δp| within ~3.5σ of the two-path binomial
    np.testing.assert_allclose(fd, fh, rtol=0, atol=0.035)
    # pooled over joints: much tighter
    np.testing.assert_allclose(fd.mean(0), fh.mean(0), rtol=0, atol=0.012)
    # sanity vs the probability tables (num_valid=17 -> the "high" rows):
    # the good band holds at least the good-state mass, the far band at
    # least the miss mass, for both paths
    from gator_tpu.data.noise import _INV_P, _JIT_HIGH, _MISS_HIGH
    good_p = 1.0 - (_JIT_HIGH + _MISS_HIGH + _INV_P)
    assert (fd[:, 0] >= good_p - 0.04).all()
    assert (fh[:, 0] >= good_p - 0.04).all()
    assert (fd[:, 2] >= _MISS_HIGH - 0.04).all()


def test_radius_quantiles_match_host(crop_pose_batch):
    """Normalized error-radius quantiles (r / OKS scale, pooled over
    joints) agree between paths — pins the annulus sampling geometry, not
    just the state machine."""
    import jax
    import jax.numpy as jnp

    from gator_tpu.data.device_noise import synthesize_pose_device
    from gator_tpu.data.noise import synthesize_pose_batch

    joints, areas = crop_pose_batch
    host = synthesize_pose_batch(
        np.concatenate([joints, np.ones_like(joints[..., :1])], axis=-1),
        areas, np.random.default_rng(3))[:, :, :2]
    dev = np.asarray(jax.jit(synthesize_pose_device)(
        jax.random.PRNGKey(3), jnp.asarray(joints), jnp.asarray(areas)))

    var = (KPS_SIGMAS * 2) ** 2
    scale = np.sqrt(areas[:, None] * var[None])
    rh = (np.linalg.norm(host - joints, axis=-1) / scale).ravel()
    rd = (np.linalg.norm(dev - joints, axis=-1) / scale).ravel()
    qs = [0.25, 0.5, 0.75, 0.9]
    qh, qd = np.quantile(rh, qs), np.quantile(rd, qs)
    np.testing.assert_allclose(qd, qh, rtol=0.06, atol=0.02)


def test_h36m_error_device_moments():
    """h36m_syn_error_device's closed-form moments: per-joint mean =
    weight * stat_mean * input-shape rescale, keep-rate = weight,
    conditional std = stat_std * rescale (reference:
    Human36M/dataset.py:143-155 + the /256 * input_shape rescale at
    :423)."""
    import jax

    from gator_tpu.data.device_noise import h36m_syn_error_device

    stats = h36m_error_stats(H36M_NAMES)
    b = 20000
    input_shape = (384, 288)
    out = np.asarray(h36m_syn_error_device(
        jax.random.PRNGKey(0), stats, b, input_shape))
    assert out.shape == (b, 17, 2)
    scale = np.array([288 / 256.0, 384 / 256.0], np.float32)

    kept = np.abs(out).sum(-1) > 0
    # keep-rate == weight (weight-1.0 joints are always kept; the
    # P(noise==0 exactly) event has measure zero)
    np.testing.assert_allclose(kept.mean(0), stats[:, 4], rtol=0,
                               atol=0.012)
    # unconditional mean == weight * mean * scale
    np.testing.assert_allclose(
        out.mean(0), stats[:, 4:5] * stats[:, 0:2] * scale[None],
        rtol=0, atol=0.08)
    # conditional std == std * scale (pooled x/y, per joint)
    for j in range(17):
        sel = out[kept[:, j], j]
        np.testing.assert_allclose(sel.std(0), stats[j, 2:4] * scale,
                                   rtol=0.05, atol=0.02)


def _device_session(assets, input_joint, ds_builder, n=64):
    """A det-input dataset + packed table + the device-input wrapped spy
    step; returns (ds, table, call) where call(step, rngseed) returns the
    in-step pose2d."""
    import jax
    import jax.numpy as jnp

    from gator_tpu.data.packed import (build_packed_tables,
                                       make_device_batch,
                                       with_packed_input_pipeline)

    synth = GtSynthesizer(assets)
    opts = processing.ProcessOptions(is_train=True, use_gt_input=False,
                                     input_joint_name=input_joint)
    ds = ds_builder(assets, opts, n=n, seed=0, synthesizer=synth)
    table = build_packed_tables([ds], synth, chunk=16)
    seen = {}

    def spy(state, inner, *extra):
        seen.update(inner)
        return state

    pstep = with_packed_input_pipeline(spy, table, synth, ds.joint_set,
                                       stage="gator", opts=opts,
                                       device_input=True)

    class _State:
        pass

    def call(step_i, rngseed=0):
        st = _State()
        st.step = jnp.asarray(step_i, jnp.int32)
        batch = make_device_batch(ds, np.arange(len(ds)),
                                  np.random.default_rng(11))
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        pstep(st, batch, jax.random.PRNGKey(rngseed), jnp.asarray(True))
        return np.asarray(seen["pose2d"])

    return ds, synth, call


def test_device_pipeline_coco_matches_host_distribution(small_assets_coco):
    """gt_in_step="device", COCO det input: the in-step pose2d is properly
    standardized, step-keyed, deterministic, and matches the host batch
    path's per-joint distribution."""
    ds, synth, call = _device_session(small_assets_coco, "coco",
                                      synthetic_coco_dataset, n=256)
    p = call(0)
    host = np.asarray(ds.make_batch(np.arange(len(ds)), synth,
                                    np.random.default_rng(11))["pose2d"])
    assert p.shape == host.shape
    assert np.isfinite(p).all()
    # per-sample standardization invariant (flip_standardize)
    np.testing.assert_allclose(p.mean(axis=1), 0.0, rtol=0, atol=1e-4)
    np.testing.assert_allclose(p.std(axis=1), 1.0, rtol=0, atol=1e-3)
    # distributional match. Bars calibrated to the estimator noise at
    # B=256: the miss state (p up to 0.1) is heavy-tailed (radii up to
    # ks10), so per-joint std estimates swing ~0.2 BETWEEN steps of the
    # same path; a silently-disabled noise branch measures 0.43 / 0.62
    # against these bars.
    np.testing.assert_allclose(p.mean(axis=0), host.mean(axis=0),
                               rtol=0, atol=0.25)
    np.testing.assert_allclose(p.std(axis=0), host.std(axis=0),
                               rtol=0, atol=0.3)
    # ...and the noise is actually THERE: vs the noise-free device form
    # on the same rows, most joints must have moved (measured 0.90; a
    # disabled branch gives 0.0)
    import jax.numpy as jnp

    from gator_tpu.data.device_pipeline import _flip_perm, crop_normalize_gt
    perm = _flip_perm(ds.joint_set.joint_num, ds.joint_set.flip_pairs)
    nf = np.asarray(crop_normalize_gt(
        jnp.asarray(ds._packed.joint_img_input, jnp.float32), perm,
        ds.opts.input_shape, jnp.zeros(len(ds)), jnp.zeros(len(ds))))
    disp = np.linalg.norm(p - nf, axis=-1)
    assert (disp > 0.05).mean() > 0.5
    # deterministic given (rng, state.step); re-keyed across steps
    np.testing.assert_array_equal(p, call(0))
    assert np.abs(call(1) - p).max() > 1e-3


def test_device_pipeline_h36m_noise_matches_host_distribution(small_assets):
    """gt_in_step="device", human36 det input (additive Gaussian error):
    the device path applies the same per-joint noise law as the host
    path."""
    ds, synth, call = _device_session(small_assets, "human36",
                                      SyntheticDataset, n=256)
    p = call(0)
    host = np.asarray(ds.make_batch(np.arange(len(ds)), synth,
                                    np.random.default_rng(11))["pose2d"])
    assert p.shape == host.shape
    np.testing.assert_allclose(p.mean(axis=1), 0.0, rtol=0, atol=1e-4)
    np.testing.assert_allclose(p.mean(axis=0), host.mean(axis=0),
                               rtol=0, atol=0.12)
    np.testing.assert_allclose(p.std(axis=0), host.std(axis=0),
                               rtol=0.25, atol=0.06)
    np.testing.assert_array_equal(p, call(0))
    assert np.abs(call(1) - p).max() > 1e-4
