// Host-side graph kernels for the EPIC sparse-to-dense interpolation.
//
// The seed k-NN search (find_nn_graph_arr, epic_aux.cpp:44-87 in the
// reference) is an early-stopping Dijkstra over the seed-adjacency graph —
// inherently sequential per seed and tiny (a few thousand nodes), so it stays
// on the host as native code while the pixel-level distance transform runs on
// TPU.
//
// Build: g++ -O3 -march=native -shared -fPIC -fopenmp geodesic.cpp -o libgeodesic.so
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>
#include <limits>

namespace {

struct NodeDist {
  int node;
  float dis;
};

struct SmallestOnTop {
  bool operator()(const NodeDist& a, const NodeDist& b) const {
    return a.dis > b.dis;
  }
};

const float kInf = std::numeric_limits<float>::infinity();

// Early-stopping Dijkstra from `seed`: fills best[0..nmax) with the nmax
// closest nodes (including the seed itself) and dist with their distances.
// Unfilled slots get best = -1, dist = +inf.
void dijkstra_knn_one(int nr, const int* indptr, const int* indices,
                      const float* data, int seed, int nmax, int* best,
                      float* dist) {
  std::vector<float> done(nr, kInf);
  std::priority_queue<NodeDist, std::vector<NodeDist>, SmallestOnTop> heap;
  heap.push({seed, 0.0f});
  done[seed] = 0.0f;
  int n = 0;
  while (!heap.empty()) {
    NodeDist cur = heap.top();
    heap.pop();
    if (cur.dis > done[cur.node]) continue;
    best[n] = cur.node;
    dist[n] = cur.dis;
    if (++n >= nmax) break;
    for (int i = indptr[cur.node]; i < indptr[cur.node + 1]; ++i) {
      int neigh = indices[i];
      float newd = cur.dis + data[i];
      if (newd >= done[neigh]) continue;
      heap.push({neigh, newd});
      done[neigh] = newd;
    }
  }
  for (; n < nmax; ++n) {
    best[n] = -1;
    dist[n] = kInf;
  }
}

}  // namespace

extern "C" {

// k-NN for every seed over a CSR graph (symmetric weights).
//   nr      number of seeds / graph nodes
//   indptr  [nr+1]
//   indices [nnz]
//   data    [nnz]
//   nmax    neighbors per seed (including the seed itself)
//   best    out [nr * nmax] int32
//   dist    out [nr * nmax] float32
void geodesic_knn_all(int nr, const int* indptr, const int* indices,
                      const float* data, int nmax, int* best, float* dist) {
#pragma omp parallel for schedule(dynamic, 16)
  for (int s = 0; s < nr; ++s) {
    dijkstra_knn_one(nr, indptr, indices, data, s, nmax, best + (int64_t)s * nmax,
                     dist + (int64_t)s * nmax);
  }
}

// Sequential 4-direction sweep distance transform (arg_sweep,
// epic_aux.cpp:92-179). CPU oracle used for validating the TPU min-plus
// fixpoint version and as a host fallback.
//   cost  [ty*tx], dmap in/out [ty*tx], labels in/out [ty*tx]
// Returns the final max change.
float geodesic_dt_sweeps(const float* cost, float* dmap, int* labels, int tx,
                         int ty, int max_iter, float min_change) {
  const signed char xs[4] = {-1, 1, 1, -1};
  const signed char ys[4] = {1, 1, -1, -1};
  float change = -1.0f;
  int end_iter = 4;
  int i = 0;
  while (++i <= end_iter) {
    const int sx = xs[i % 4], sy = ys[i % 4];
    const int bx = sx > 0 ? 0 : tx - 1;
    const int by = sy > 0 ? 0 : ty - 1;
    const int ex = sx > 0 ? tx : -1;
    const int ey = sy > 0 ? ty : -1;
    float max_diff = 0.0f;
    for (int j = by; j != ey; j += sy) {
      for (int x = bx; x != ex; x += sx) {
        float t1, t2;
        int l1, l2;
        if (j == by) {
          t1 = kInf;
          l1 = -1;
        } else {
          t1 = dmap[x + (j - sy) * tx];
          l1 = labels[x + (j - sy) * tx];
        }
        if (x == bx) {
          t2 = kInf;
          l2 = -1;
        } else {
          t2 = dmap[x - sx + j * tx];
          l2 = labels[x - sx + j * tx];
        }
        float dt12 = t1 - t2;
        if (dt12 < 0) dt12 = -dt12;
        const float C = cost[x + j * tx];
        float t0;
        int l0;
        if (dt12 > C) {
          if (t1 < t2) {
            t0 = t1 + C;
            l0 = l1;
          } else {
            t0 = t2 + C;
            l0 = l2;
          }
        } else {
          t0 = 0.5f * (t1 + t2 + sqrtf(2 * C * C - dt12 * dt12));
          l0 = (t1 < t2) ? l1 : l2;
        }
        if (t0 < dmap[x + j * tx]) {
          const float diff = dmap[x + j * tx] - t0;
          if (diff > max_diff) max_diff = diff;
          dmap[x + j * tx] = t0;
          labels[x + j * tx] = l0;
        }
      }
    }
    change = max_diff;
    if (change > min_change) {
      int cap = i + 3;
      end_iter = (max_iter < cap) ? max_iter : cap;  // finish the turn
    }
  }
  return change;
}

}  // extern "C"
