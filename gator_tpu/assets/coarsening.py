"""Multilevel graph coarsening (Graclus heavy-edge matching) + Laplacians.

Capability parity with the reference's coarsening module
(reference: lib/coarsening.py:43-322 and lib/graph_utils.py:37-112):
`build_coarse_graphs` produces the per-level adjacencies, rescaled
normalized Laplacians, and the binary-tree vertex permutation (with fake
singleton nodes) that makes pooling a reshape. The GAT model itself only
consumes the joint adjacency (SURVEY.md §2.2 note), but the full pipeline
is provided for downstream graph-conv work.

Implementation is numpy/scipy-free-form (dense for the joint graph, scipy
sparse for mesh-scale graphs) and deterministic: vertices are visited in
increasing-degree order like the reference (coarsening.py:93-94).
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np
import scipy.sparse as sp


def build_mesh_graph(faces: np.ndarray, num_vertex: int) -> sp.csr_matrix:
    """Symmetric binary adjacency from triangle faces
    (reference: lib/graph_utils.py:37-57)."""
    edges = np.concatenate([faces[:, :2], faces[:, 1:], faces[:, ::2]])
    adj = sp.coo_matrix(
        (np.ones(len(edges)), (edges[:, 0], edges[:, 1])),
        shape=(num_vertex, num_vertex), dtype=np.float32)
    adj = adj.tocsr()
    adj.data[:] = 1.0
    adj = adj.maximum(adj.T)
    adj.setdiag(0)
    adj.eliminate_zeros()
    return adj


def heavy_edge_matching(w: sp.csr_matrix,
                        rng: np.random.Generator | None = None
                        ) -> np.ndarray:
    """One Graclus/HEM pass: pair each unmatched vertex with the neighbor
    maximizing the normalized-cut weight w_ij (1/d_i + 1/d_j); visit order =
    increasing degree (deterministic, like reference coarsening.py:67-150).
    Returns cluster ids [N]."""
    n = w.shape[0]
    degree = np.asarray(w.sum(axis=1)).ravel()
    order = np.argsort(degree, kind="stable")
    matched = np.zeros(n, dtype=bool)
    cluster = np.full(n, -1, dtype=np.int64)
    cid = 0
    inv_deg = np.where(degree > 0, 1.0 / np.maximum(degree, 1e-12), 0.0)
    indptr, indices, data = w.indptr, w.indices, w.data
    for v in order:
        if matched[v]:
            continue
        best, best_w = -1, -np.inf
        for k in range(indptr[v], indptr[v + 1]):
            u = indices[k]
            if matched[u] or u == v:
                continue
            score = data[k] * (inv_deg[v] + inv_deg[u])
            if score > best_w:
                best_w, best = score, u
        matched[v] = True
        cluster[v] = cid
        if best >= 0:
            matched[best] = True
            cluster[best] = cid
        cid += 1
    return cluster


def _coarsen_one(w: sp.csr_matrix) -> Tuple[sp.csr_matrix, np.ndarray]:
    cluster = heavy_edge_matching(w)
    n_coarse = int(cluster.max()) + 1
    rows = cluster[w.tocoo().row]
    cols = cluster[w.tocoo().col]
    coo = w.tocoo()
    wc = sp.coo_matrix((coo.data, (rows, cols)),
                       shape=(n_coarse, n_coarse)).tocsr()
    wc.setdiag(0)
    wc.eliminate_zeros()
    return wc, cluster


def compute_perm(parents: List[np.ndarray]) -> List[np.ndarray]:
    """Binary-tree orderings so each coarse vertex's (up to two) children
    sit at consecutive fine indices; singletons get fake children
    (reference: lib/coarsening.py:214-262)."""
    if not parents:
        return []
    n_coarsest = int(parents[-1].max()) + 1
    indices = [np.arange(n_coarsest)]
    for parent in parents[::-1]:
        indices_layer = []
        fake = len(parent)   # fake nodes appended after the real ones
        pool_singletons = list(indices[-1])
        for i in pool_singletons:
            children = list(np.nonzero(parent == i)[0])
            while len(children) < 2:
                children.append(fake)
                fake += 1
            indices_layer.extend(children)
        indices.append(np.array(indices_layer))
    return indices[::-1]


def perm_adjacency(w: sp.csr_matrix, perm: np.ndarray) -> sp.csr_matrix:
    """Extend W with zero-degree fake vertices and permute
    (reference: lib/coarsening.py:265-292)."""
    n = w.shape[0]
    n_new = len(perm)
    if n_new > n:
        pad = sp.csr_matrix((n_new - n, n), dtype=w.dtype)
        w = sp.vstack([w, pad]).tocsc()
        pad = sp.csc_matrix((n_new, n_new - n), dtype=w.dtype)
        w = sp.hstack([w, pad]).tocsr()
    inv = np.argsort(perm)
    return w[inv][:, inv]


def perm_index_reverse(perm: np.ndarray) -> np.ndarray:
    """Fine-level indices of the original vertices after permutation
    (reference: lib/coarsening.py:322)."""
    return np.argsort(np.asarray(perm))


def laplacian(w, normalized: bool = True):
    """(Normalized) graph Laplacian (reference: lib/coarsening.py:6-25)."""
    w = sp.csr_matrix(w)
    d = np.asarray(w.sum(axis=0)).ravel()
    if not normalized:
        return (sp.diags(d) - w).tocsr()
    d_inv_sqrt = 1.0 / np.sqrt(np.maximum(d, 1e-12))
    d_inv_sqrt[d == 0] = 0
    dm = sp.diags(d_inv_sqrt)
    eye = sp.identity(w.shape[0], dtype=w.dtype)
    return (eye - dm @ w @ dm).tocsr()


def lmax_l(lap) -> float:
    """Largest Laplacian eigenvalue (reference: lib/coarsening.py:37-40)."""
    from scipy.sparse.linalg import eigsh
    if lap.shape[0] <= 2:
        return float(np.linalg.eigvalsh(lap.toarray()).max())
    return float(eigsh(lap, k=1, which="LM",
                       return_eigenvectors=False)[0])


def rescale_l(lap, lmax: float, scale: float = 1.0):
    """L <- 2 scale/lmax * L - I (reference: lib/coarsening.py:28-34)."""
    eye = sp.identity(lap.shape[0], format="csr", dtype=lap.dtype)
    return (lap * (2.0 * scale / lmax)) - eye


def coarsen(adj: sp.spmatrix, levels: int):
    """Multilevel coarsening: per-level (permuted) adjacencies + the
    level-0 vertex permutation (reference: lib/coarsening.py:43-64)."""
    w = sp.csr_matrix(adj)
    graphs = [w]
    parents = []
    for _ in range(levels):
        w, cluster = _coarsen_one(w)
        parents.append(cluster)
        graphs.append(w)
    perms = compute_perm(parents)
    graphs_out = []
    for i, g in enumerate(graphs):
        if i < len(perms):
            g = perm_adjacency(g, perms[i])
        graphs_out.append(g.tocsr())
    return graphs_out, perms[0] if perms else np.arange(w.shape[0])


def build_coarse_graphs(mesh_faces: np.ndarray, joint_adjacency: np.ndarray,
                        levels: int = 9):
    """Full reference pipeline: coarsen the mesh graph `levels` times, then
    splice the joint graph as the last level
    (reference: lib/graph_utils.py:92-112).
    Returns (adjacencies, rescaled laplacians, perm, perm_reverse)."""
    num_vertex = int(mesh_faces.max()) + 1
    mesh_adj = build_mesh_graph(mesh_faces, num_vertex)
    graphs, perm0 = coarsen(mesh_adj, levels)
    graphs = graphs[:levels]

    joint = sp.csr_matrix(np.asarray(joint_adjacency, np.float32))
    joint.eliminate_zeros()
    adjacencies = graphs[:-1] + [joint]
    laplacians = []
    for g in adjacencies:
        lap = laplacian(g, normalized=True)
        laplacians.append(rescale_l(lap, lmax_l(lap)))
    return adjacencies, laplacians, perm0, perm_index_reverse(perm0)
