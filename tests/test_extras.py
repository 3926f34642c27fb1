"""Tests for auxiliary capability modules: smoothing, mesh ops, coarsening,
MANO, rot6d."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from gator_tpu import smoothing
from gator_tpu.assets import coarsening, mesh_sampling
from gator_tpu.bodymodel import rotations6d
from gator_tpu.bodymodel.mano import (ManoParams, mano_forward,
                                      synthetic_mano)
from gator_tpu.ops import (GraphConvolution, MeshResampler,
                           row_normalized_adjacency)


def test_one_euro_filter_smooths(rng):
    t = np.linspace(0, 4 * np.pi, 200)
    clean = np.sin(t)[:, None]
    noisy = clean + rng.normal(0, 0.3, clean.shape)
    sm = smoothing.one_euro_smooth(noisy, min_cutoff=0.05, beta=0.01)
    assert np.abs(sm - clean).mean() < np.abs(noisy - clean).mean()
    sm_j = np.asarray(smoothing.one_euro_smooth_jax(jnp.asarray(noisy)))
    assert sm_j.shape == noisy.shape
    assert np.isfinite(sm_j).all()


def test_mesh_resampler_roundtrip(rng):
    s = mesh_sampling.synthetic_mesh_sampling(256)
    r = MeshResampler(s)
    x = rng.normal(size=(2, 256, 3)).astype(np.float32)
    down1 = r.downsample(jnp.asarray(x))
    assert down1.shape == (2, 64, 3)
    down2 = r.downsample(down1, 1, 2)
    assert down2.shape == (2, 16, 3)
    up = r.upsample(down1)
    assert up.shape == (2, 256, 3)
    # synthetic down op is group-mean; matches numpy
    np.testing.assert_allclose(
        np.asarray(down1[0]), s.down1 @ x[0], atol=1e-5)


def test_graph_convolution_shapes(rng):
    adj = row_normalized_adjacency(np.eye(17) +
                                   rng.uniform(size=(17, 17)) > 0.7)
    gcn = GraphConvolution(32, adjacency=adj)
    x = jnp.asarray(rng.normal(size=(2, 17, 8)).astype(np.float32))
    params = gcn.init(jax.random.PRNGKey(0), x)
    out = gcn.apply(params, x)
    assert out.shape == (2, 17, 32)


def test_coarsening_pipeline():
    rng = np.random.default_rng(0)
    # a small closed-ish mesh: grid triangulation
    n = 8
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b, c, d = (i * n + j, i * n + j + 1, (i + 1) * n + j,
                          (i + 1) * n + j + 1)
            faces.append([a, b, c])
            faces.append([b, d, c])
    faces = np.array(faces, np.int32)
    joint_adj = np.eye(17, dtype=np.float32)
    for a, b in ((0, 1), (1, 2), (2, 3), (0, 4)):
        joint_adj[a, b] = joint_adj[b, a] = 1
    adjs, laps, perm, perm_rev = coarsening.build_coarse_graphs(
        faces, joint_adj, levels=3)
    # reference layout: levels+1 entries — mesh levels 0..levels-1, then
    # the joint graph spliced over the coarsest (graph_utils.py:92-112)
    assert len(adjs) == 4 and len(laps) == 4
    assert adjs[-1].shape == (17, 17)
    # each level roughly halves (with fake-node padding to powers of 2)
    assert adjs[0].shape[0] >= n * n
    assert adjs[1].shape[0] == adjs[0].shape[0] // 2
    # permutation round trip recovers original indices
    orig = perm_rev[np.arange(n * n)]
    assert len(np.unique(orig)) == n * n
    # MESH laplacians are rescaled to [-1, 1]; the joint laplacian stays
    # raw-normalized in [0, 2] (the reference's range(levels) loop)
    ev = np.linalg.eigvalsh(laps[0].toarray())
    assert ev.min() > -1.01 and ev.max() < 1.01
    ev_j = np.linalg.eigvalsh(laps[-1].toarray())
    assert ev_j.min() > -0.01 and ev_j.max() < 2.01


def test_compute_perm_matches_reference_vector():
    """The reference module's own inline sanity vector
    (lib/coarsening.py:261-262)."""
    out = coarsening.compute_perm(
        [np.array([4, 1, 1, 2, 2, 3, 0, 0, 3]), np.array([2, 1, 0, 1, 0])])
    assert [list(x) for x in out] == [
        [3, 4, 0, 9, 1, 2, 5, 8, 6, 7, 10, 11], [2, 4, 1, 3, 0, 5],
        [0, 1, 2]]


def test_perm_adjacency_places_edges_at_permuted_slots():
    """new[i, j] == old[perm[i], perm[j]] (reference coarsening.py:281-284
    maps old row r to argsort(indices)[r]); fake slots stay zero-degree."""
    import scipy.sparse as sp
    old = np.zeros((3, 3), np.float32)
    old[0, 1] = old[1, 0] = 1.0
    old[1, 2] = old[2, 1] = 2.0
    perm = np.array([1, 3, 0, 2])      # slot3 = fake node
    new = coarsening.perm_adjacency(sp.csr_matrix(old), perm).toarray()
    padded = np.zeros((4, 4), np.float32)
    padded[:3, :3] = old
    np.testing.assert_array_equal(new, padded[perm][:, perm])
    assert new[1].sum() == 0           # fake slot has no edges


def test_hem_matching_properties():
    rng = np.random.default_rng(1)
    import scipy.sparse as sp
    w = sp.random(40, 40, density=0.2, random_state=1)
    w = ((w + w.T) > 0).astype(np.float64).tocsr()
    w.setdiag(0)
    w.eliminate_zeros()
    cluster = coarsening.heavy_edge_matching(w)
    assert cluster.min() == 0
    # each cluster has 1 or 2 members
    counts = np.bincount(cluster)
    assert counts.max() <= 2 and counts.min() >= 1
    # reference scoring: with uniform weights and a strictly-positive
    # score requirement, an isolated vertex stays a singleton
    iso = sp.csr_matrix(np.diag([0.0, 0, 0]))
    c_iso = coarsening.heavy_edge_matching(iso)
    assert len(np.unique(c_iso)) == 3


def test_mano_forward(rng):
    model = synthetic_mano()
    params = ManoParams.from_model(model, ncomps=6, use_pca=True)
    pose = rng.normal(size=(2, 3 + 6)).astype(np.float32)
    betas = rng.normal(size=(2, 10)).astype(np.float32)
    verts, joints = jax.jit(mano_forward)(params, jnp.asarray(pose),
                                          jnp.asarray(betas))
    assert verts.shape == (2, 778, 3)
    assert joints.shape == (2, 16, 3)
    assert np.isfinite(np.asarray(verts)).all()
    # zero pose + flat mean -> template
    flat = ManoParams.from_model(model, ncomps=45, use_pca=False,
                                 flat_hand_mean=True)
    v0, j0 = mano_forward(flat, jnp.zeros((1, 48)), jnp.zeros((1, 10)))
    np.testing.assert_allclose(np.asarray(v0[0]), model.v_template,
                               atol=1e-5)
    reg = model.extended_regressor()
    assert reg.shape == (21, 778)
    np.testing.assert_allclose(reg.sum(1), 1.0, atol=1e-5)


def test_rot6d_matches_torch_reference(rng):
    x = rng.normal(size=(8, 6)).astype(np.float32)
    got = np.asarray(rotations6d.rot6d_to_rotmat(jnp.asarray(x)))
    # orthonormality + det 1
    eye = np.einsum("bij,bkj->bik", got, got)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (8, 1, 1)),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(got), 1.0, atol=1e-5)
    # round trip through the 6d representation
    back = np.asarray(rotations6d.rot6d_to_rotmat(
        rotations6d.rotmat_to_rot6d(jnp.asarray(got))))
    np.testing.assert_allclose(back, got, atol=1e-5)


def test_rotation_projection(rng):
    noisy = np.tile(np.eye(3), (4, 1, 1)) + rng.normal(
        0, 0.1, (4, 3, 3))
    proj = np.asarray(rotations6d.project_to_rotation(
        jnp.asarray(noisy.astype(np.float32))))
    eye = np.einsum("bij,bkj->bik", proj, proj)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (4, 1, 1)),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(proj), 1.0, atol=1e-4)
