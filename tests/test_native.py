"""Native C++ precompute library vs the numpy implementations."""
import subprocess

import numpy as np
import pytest
import scipy.sparse as sp

from gator_tpu.assets import graphs, native, skeletons


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        subprocess.run(["make", "-C", "native"], check=False)
    if not native.available():
        pytest.skip("native library not built")


def test_floyd_warshall_matches_numpy():
    for jset in (skeletons.H36M, skeletons.COCO):
        adj = skeletons.gat_adjacency(jset)
        d_np, p_np = graphs.floyd_warshall(adj)
        d_c, p_c = native.floyd_warshall(adj)
        np.testing.assert_array_equal(d_np, d_c)
        # path matrices may differ (shortest paths are not unique), but
        # must reconstruct paths of identical length
        for i in range(jset.joint_num):
            for j in range(jset.joint_num):
                ln = len(graphs.reconstruct_path(p_c, i, j))
                le = len(graphs.reconstruct_path(p_np, i, j))
                assert ln == le


def test_edge_input_matches_numpy():
    adj = skeletons.gat_adjacency(skeletons.H36M)
    joints = np.random.default_rng(0).normal(
        size=(17, 3)).astype(np.float32)
    d, p = native.floyd_warshall(adj)
    edge_feat = graphs.bone_length_matrix(adj, joints)
    got = native.gen_edge_input(int(d.max()), p, edge_feat)
    expected = graphs.gen_edge_input(int(d.max()), p, edge_feat)
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_build_graph_tables_native_vs_numpy():
    adj = skeletons.gat_adjacency(skeletons.H36M)
    joints = np.random.default_rng(1).normal(
        size=(17, 3)).astype(np.float32)
    t_native = graphs.build_graph_tables(adj, joints, use_native=True)
    t_numpy = graphs.build_graph_tables(adj, joints, use_native=False)
    np.testing.assert_array_equal(t_native.spatial_pos, t_numpy.spatial_pos)
    np.testing.assert_array_equal(t_native.degree, t_numpy.degree)
    # path-dependent features may pick different (equal-length) paths for
    # ties; the hop-1 and hop-2 rows are unique, compare those exactly
    mask = t_numpy.spatial_pos <= 2
    np.testing.assert_allclose(t_native.edge_input[mask],
                               t_numpy.edge_input[mask], atol=1e-6)


def test_hem_match_matches_python():
    from gator_tpu.assets import coarsening
    w = sp.random(60, 60, density=0.15, random_state=0)
    w = ((w + w.T) > 0).astype(np.float64).tocsr()
    w.setdiag(0)
    w.eliminate_zeros()
    c_py = coarsening.heavy_edge_matching(w)
    c_c = native.hem_match(w.astype(np.float32))
    # identical clustering (both use increasing-degree visiting order and
    # the same tie-break: first neighbor in CSR order wins)
    np.testing.assert_array_equal(c_py, c_c)
