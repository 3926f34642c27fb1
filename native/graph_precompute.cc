// Native ahead-of-time graph precompute for gator_tpu.
//
// The reference keeps this stage in Python (Floyd–Warshall path tables are
// *downloaded* as .npy files; the O(J^2 * pathlen) expansion runs as a
// Python recursion at model construction — reference: lib/models/GAT.py:
// 89-110, lib/models/backbones/modules.py:6-29; the HEM mesh coarsening is
// a per-vertex Python loop, lib/coarsening.py:67-211). This library provides
// the same computations as C exports consumed through ctypes
// (gator_tpu/assets/native.py); the numpy implementations remain as the
// portable fallback and as the cross-check oracle in tests.
//
// Build: `make -C native` (produces libgator_precompute.so).

#include <cstdint>
#include <cmath>
#include <cstring>
#include <vector>
#include <algorithm>
#include <numeric>
#include <limits>

extern "C" {

// All-pairs hop counts + one-intermediate-vertex path matrix.
// adjacency: [n*n] row-major (any nonzero off-diagonal entry = edge).
// dist_out:  [n*n] int32 hop counts (0 diagonal, -1 unreachable).
// path_out:  [n*n] int32 intermediate vertex or `sentinel`.
// Returns 0 on success, 1 if the graph is disconnected.
int gator_floyd_warshall(const float* adjacency, int n, int sentinel,
                         int32_t* dist_out, int32_t* path_out) {
  const int INF = std::numeric_limits<int32_t>::max() / 4;
  std::vector<int32_t> dist(static_cast<size_t>(n) * n, INF);
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j < n; ++j) {
      path_out[i * n + j] = sentinel;
      if (i == j) dist[i * n + j] = 0;
      else if (adjacency[i * n + j] != 0.0f) dist[i * n + j] = 1;
    }
  }
  for (int k = 0; k < n; ++k) {
    for (int i = 0; i < n; ++i) {
      const int32_t dik = dist[i * n + k];
      if (dik >= INF) continue;
      for (int j = 0; j < n; ++j) {
        const int32_t cand = dik + dist[k * n + j];
        if (cand < dist[i * n + j]) {
          dist[i * n + j] = cand;
          path_out[i * n + j] = k;
        }
      }
    }
  }
  int disconnected = 0;
  for (int i = 0; i < n * n; ++i) {
    if (dist[i] >= INF) { dist_out[i] = -1; disconnected = 1; }
    else dist_out[i] = dist[i];
  }
  return disconnected;
}

namespace {
// Append the intermediate vertices of the shortest i->j path.
void collect_path(const int32_t* path, int n, int sentinel, int i, int j,
                  std::vector<int>* out) {
  const int k = path[i * n + j];
  if (k == sentinel) return;
  collect_path(path, n, sentinel, i, k, out);
  out->push_back(k);
  collect_path(path, n, sentinel, k, j, out);
}
}  // namespace

// Expand the path matrix into per-hop edge features [n, n, max_dist]
// (bone lengths along each shortest path; zero-filled elsewhere).
void gator_gen_edge_input(const int32_t* path, const float* edge_feat,
                          int n, int max_dist, int sentinel,
                          float* out /* [n*n*max_dist] */) {
  std::memset(out, 0,
              sizeof(float) * static_cast<size_t>(n) * n * max_dist);
  std::vector<int> hops;
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j < n; ++j) {
      if (i == j || path[i * n + j] == sentinel) continue;
      hops.clear();
      hops.push_back(i);
      collect_path(path, n, sentinel, i, j, &hops);
      hops.push_back(j);
      const int steps = std::min<int>(hops.size() - 1, max_dist);
      for (int s = 0; s < steps; ++s) {
        out[(static_cast<size_t>(i) * n + j) * max_dist + s] =
            edge_feat[hops[s] * n + hops[s + 1]];
      }
    }
  }
}

// One Graclus heavy-edge-matching pass over a symmetric CSR graph,
// mirroring assets/coarsening.py heavy_edge_matching (itself the
// reference's ENABLED "second approach", lib/coarsening.py:186-197):
// visit order = increasing column sum; score(v, u) =
// (2 W_vu + fv[v] + fv[u]) / (d_v + d_u + 1e-9) where fv[i] is the FIRST
// stored value of row i (the reference's vv[rowstart] quirk) and the
// degree is the plain column sum; only strictly positive scores match.
// cluster_out: [n] cluster ids. Returns the number of clusters.
int gator_hem_match(const int32_t* indptr, const int32_t* indices,
                    const float* data, int n, int32_t* cluster_out) {
  std::vector<double> degree(n, 0.0);
  std::vector<double> first_val(n, 0.0);
  for (int v = 0; v < n; ++v) {
    for (int32_t e = indptr[v]; e < indptr[v + 1]; ++e)
      degree[v] += data[e];  // symmetric: row sum == column sum
    if (indptr[v + 1] > indptr[v]) first_val[v] = data[indptr[v]];
  }
  std::vector<int> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return degree[a] < degree[b]; });
  std::vector<char> matched(n, 0);
  std::fill(cluster_out, cluster_out + n, -1);
  int cid = 0;
  for (int idx = 0; idx < n; ++idx) {
    const int v = order[idx];
    if (matched[v]) continue;
    matched[v] = 1;  // before the scan, so self-loop entries are skipped
    int best = -1;
    double best_w = 0.0;
    for (int32_t e = indptr[v]; e < indptr[v + 1]; ++e) {
      const int u = indices[e];
      if (matched[u]) continue;
      const double score = (2.0 * data[e] + first_val[v] + first_val[u]) /
                           (degree[v] + degree[u] + 1e-9);
      if (score > best_w) { best_w = score; best = u; }
    }
    cluster_out[v] = cid;
    if (best >= 0) { matched[best] = 1; cluster_out[best] = cid; }
    ++cid;
  }
  return cid;
}

}  // extern "C"
