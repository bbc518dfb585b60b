// Host-side seed-graph k-NN for the EPIC sparse-to-dense interpolation.
//
// Role (parity): the reference finds, for every match seed, its k
// geodesically-closest seeds over the seed-adjacency graph
// (epic_aux.cpp:44-87). The graph is tiny (≤ a few thousand nodes) and the
// search is inherently sequential per source, so it runs on the host while
// the pixel-level distance transform runs on TPU. This implementation is a
// standard settled-array Dijkstra with early termination, written
// independently of the reference's code.
//
// Build: g++ -O3 -march=native -shared -fPIC -fopenmp geodesic.cpp -o libgeodesic.so
#include <algorithm>
#include <cstdint>
#include <functional>
#include <limits>
#include <queue>
#include <utility>
#include <vector>

extern "C" {

// For each node of an undirected CSR graph, compute the k closest nodes by
// shortest-path distance (the node itself is included and comes first).
//   n_nodes    number of graph nodes
//   row_start  [n_nodes+1] CSR row offsets
//   col        [nnz] CSR column indices
//   weight     [nnz] non-negative edge weights
//   k          neighbours to report per node
//   out_idx    [n_nodes*k] int32; unfilled slots are -1
//   out_dis    [n_nodes*k] float32; unfilled slots are +inf
void geodesic_knn_all(int n_nodes, const int* row_start, const int* col,
                      const float* weight, int k, int* out_idx,
                      float* out_dis) {
  const float inf = std::numeric_limits<float>::infinity();
#pragma omp parallel for schedule(dynamic, 16)
  for (int src = 0; src < n_nodes; ++src) {
    int* idx = out_idx + static_cast<int64_t>(src) * k;
    float* dis = out_dis + static_cast<int64_t>(src) * k;
    std::fill(idx, idx + k, -1);
    std::fill(dis, dis + k, inf);

    // A node is "settled" once popped with its final distance; lazy deletion
    // handles stale queue entries. Stop after k nodes settle.
    std::vector<float> tentative(n_nodes, inf);
    std::vector<char> settled(n_nodes, 0);
    using Entry = std::pair<float, int>;
    std::priority_queue<Entry, std::vector<Entry>, std::greater<Entry>> pq;

    tentative[src] = 0.0f;
    pq.emplace(0.0f, src);
    int found = 0;
    while (found < k && !pq.empty()) {
      const Entry top = pq.top();
      pq.pop();
      const int u = top.second;
      if (settled[u]) continue;
      settled[u] = 1;
      idx[found] = u;
      dis[found] = top.first;
      ++found;
      for (int e = row_start[u]; e < row_start[u + 1]; ++e) {
        const int v = col[e];
        const float cand = top.first + weight[e];
        if (!settled[v] && cand < tentative[v]) {
          tentative[v] = cand;
          pq.emplace(cand, v);
        }
      }
    }
  }
}

}  // extern "C"
