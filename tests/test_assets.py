"""Asset-layer tests: adjacency, Floyd–Warshall tables, synthetic SMPL,
mesh sampling, bundle assembly."""
import numpy as np
import pytest

from gator_tpu.assets import (COCO, H36M, SMPL24, build_assets, graphs,
                              mesh_sampling, skeletons, smpl_assets)


def test_h36m_adjacency_symmetric_with_self_loops():
    adj = H36M.adjacency()
    assert adj.shape == (17, 17)
    assert np.array_equal(adj, adj.T)
    assert np.array_equal(np.diag(adj), np.ones(17))
    # pelvis connects to torso (0,7) and both hips (0,1)/(0,4)
    assert adj[0, 7] == 1 and adj[0, 1] == 1 and adj[0, 4] == 1


def test_gat_adjacency_prunes_flip_edges():
    full = H36M.adjacency()
    pruned = skeletons.gat_adjacency(H36M)
    assert full[1, 4] == 1 and pruned[1, 4] == 0
    assert pruned[16, 13] == 0
    # skeleton edges survive
    assert pruned[0, 7] == 1 and pruned[8, 9] == 1


def test_floyd_warshall_simple_chain():
    # 0-1-2-3 chain
    adj = np.eye(4, dtype=np.float32)
    for a, b in ((0, 1), (1, 2), (2, 3)):
        adj[a, b] = adj[b, a] = 1
    dist, path = graphs.floyd_warshall(adj)
    assert dist[0, 3] == 3 and dist[0, 1] == 1 and dist[0, 0] == 0
    assert path[0, 1] == graphs.PATH_SENTINEL  # direct edge
    inter = graphs.reconstruct_path(path, 0, 3)
    assert inter == [1, 2]


def test_floyd_warshall_disconnected_raises():
    adj = np.eye(4, dtype=np.float32)
    adj[0, 1] = adj[1, 0] = 1  # {0,1} and {2,3} disconnected
    with pytest.raises(ValueError):
        graphs.floyd_warshall(adj)


def test_edge_input_matches_manual_expansion():
    adj = np.eye(4, dtype=np.float32)
    for a, b in ((0, 1), (1, 2), (2, 3)):
        adj[a, b] = adj[b, a] = 1
    joints = np.array([[0, 0, 0], [1, 0, 0], [1, 2, 0], [1, 2, 5.0]],
                      dtype=np.float32)
    tables = graphs.build_graph_tables(adj, joints)
    # path 0->3 = 0-1-2-3 with bone lengths 1, 2, 5
    np.testing.assert_allclose(tables.edge_input[0, 3], [1, 2, 5])
    # direct edges have all-zero path features (sentinel semantics)
    np.testing.assert_allclose(tables.edge_input[0, 1], [0, 0, 0])
    # reverse direction uses lower-triangular (zero) edge features:
    # parity with the reference's upper-triangular-only bone matrix
    np.testing.assert_allclose(tables.edge_input[3, 0], [0, 0, 0])
    # hop reciprocal: hop2 -> 1/1, hop3 -> 1/2
    assert tables.hop_recip[0, 2] == 1.0
    assert tables.hop_recip[0, 3] == 0.5


def test_graph_tables_h36m_and_coco():
    for jset in (H36M, COCO):
        adj = skeletons.gat_adjacency(jset)
        joints = np.random.default_rng(0).normal(
            size=(jset.joint_num, 3)).astype(np.float32)
        t = graphs.build_graph_tables(adj, joints)
        assert t.spatial_pos.max() < 10
        assert t.masks_xfeat.shape == (2, jset.joint_num, jset.joint_num)
        # 1-ring mask includes the diagonal, 2-ring excludes it
        assert np.all(np.diag(t.masks_xfeat[0]) == 1)
        assert np.all(np.diag(t.masks_xfeat[1]) == 0)
        assert t.degree.min() >= 1


def test_synthetic_smpl_shapes_and_determinism():
    m1 = smpl_assets.synthetic_smpl(vertex_num=890, seed=0)
    m2 = smpl_assets.synthetic_smpl(vertex_num=890, seed=0)
    np.testing.assert_array_equal(m1.v_template, m2.v_template)
    assert m1.weights.shape == (890, 24)
    np.testing.assert_allclose(m1.weights.sum(1), 1.0, atol=1e-5)
    np.testing.assert_allclose(m1.j_regressor.sum(1), 1.0, atol=1e-5)
    assert m1.posedirs.shape == (890, 3, 207)
    # no degenerate faces
    f = m1.faces
    assert np.all(f[:, 0] != f[:, 1])
    assert np.all(f[:, 1] != f[:, 2])
    assert np.all(f[:, 0] != f[:, 2])
    ext = m1.extended_regressor()
    assert ext.shape == (29, 890)


def test_synthetic_mesh_sampling_shapes():
    s = mesh_sampling.synthetic_mesh_sampling(890)
    assert s.sizes == (890, 223, 56)
    x = np.random.default_rng(0).normal(size=(890, 3)).astype(np.float32)
    coarse = s.downsample(x)
    assert coarse.shape == (56, 3)
    # rows of down matrices are convex averages
    np.testing.assert_allclose(s.down1.sum(1), 1.0, atol=1e-6)


def test_bundle_assembly(small_assets, small_assets_coco):
    a = small_assets
    assert a.joint_num == 17
    assert a.vertex_num == 890
    assert a.coarse_vertex_num == 56
    assert a.vj_relation.shape == (56,)
    assert a.vj_relation.max() < 17
    assert a.j_regressor_h36m.shape == (17, 890)
    c = small_assets_coco
    assert c.joint_num == 19
    assert c.template_joints.shape == (19, 3)
    # coco template joints: last two rows are pelvis & neck midpoints
    base = c.j_regressor_coco @ c.mean_vertices
    np.testing.assert_allclose(
        c.template_joints[17], 0.5 * (base[11] + base[12]), atol=1e-5)
    np.testing.assert_allclose(
        c.template_joints[18], 0.5 * (base[5] + base[6]), atol=1e-5)


def test_smpl24_metadata():
    assert SMPL24.joint_num == 24
    assert len(smpl_assets.KINTREE_PARENTS) == 24
    # parents precede children
    for child, parent in enumerate(smpl_assets.KINTREE_PARENTS):
        assert parent <= child
