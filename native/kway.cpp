// Native k-way graph/mesh partitioner for geneo4petsc_tpu.
//
// Role: the reference links Metis (METIS_PartMeshDual / METIS_PartMeshNodal,
// src/geneo4PETSc.cpp:381-445) for host-side partitioning.  This is the TPU
// framework's native equivalent: the SAME deterministic algorithm as the
// pure-NumPy fallback (geneo4petsc_tpu/partition/kway.py) — farthest-first
// seeding, balanced multi-source BFS growth, boundary refinement — so both
// implementations produce bit-identical partitions; the native build exists
// for large meshes where the Python graph loops dominate setup time.
//
// C ABI (ctypes-loadable):
//   int g4p_kway_partition(int64_t n, const int64_t* ptr, const int64_t* idx,
//                          int64_t k, int64_t* part, int refine_passes);
//   int g4p_dual_graph_size / g4p_dual_graph   (element adjacency, nCommon=1)
//   int g4p_nodal_graph_size / g4p_nodal_graph (node adjacency)

#include <cstdint>
#include <vector>
#include <deque>
#include <algorithm>
#include <cstring>
#include <cmath>

namespace {

using std::int64_t;
using Vec = std::vector<int64_t>;

constexpr int64_t INF = INT64_MAX;

// BFS distances from a seed set; frontier processed level-by-level with the
// next frontier sorted+deduplicated (matches the NumPy np.unique order).
void bfs_dist(const int64_t* ptr, const int64_t* idx, int64_t n,
              const Vec& seeds, Vec& dist) {
  dist.assign(n, INF);
  Vec frontier;
  for (int64_t s : seeds) { dist[s] = 0; frontier.push_back(s); }
  int64_t d = 0;
  while (!frontier.empty()) {
    ++d;
    Vec next;
    for (int64_t v : frontier)
      for (int64_t e = ptr[v]; e < ptr[v + 1]; ++e) {
        int64_t u = idx[e];
        if (dist[u] > d) next.push_back(u);
      }
    std::sort(next.begin(), next.end());
    next.erase(std::unique(next.begin(), next.end()), next.end());
    Vec keep;
    for (int64_t u : next)
      if (dist[u] > d) { dist[u] = d; keep.push_back(u); }
    frontier.swap(keep);
  }
}

// Farthest-first k-center seeding from a pseudo-peripheral start
// (mirrors kway.py::_pick_seeds: argmax takes the FIRST maximum).
void pick_seeds(const int64_t* ptr, const int64_t* idx, int64_t n, int64_t k,
                Vec& seeds) {
  Vec d0;
  bfs_dist(ptr, idx, n, Vec{0}, d0);
  int64_t s0 = 0, best = -1;
  for (int64_t v = 0; v < n; ++v) {
    int64_t dv = (d0[v] == INF) ? -1 : d0[v];
    if (dv > best) { best = dv; s0 = v; }
  }
  seeds.assign(1, s0);
  Vec mind;
  bfs_dist(ptr, idx, n, Vec{s0}, mind);
  for (int64_t i = 1; i < k; ++i) {
    int64_t s = -1;
    for (int64_t v = 0; v < n; ++v)
      if (mind[v] == INF) { s = v; break; }   // unreached component first
    if (s < 0) {
      int64_t bestd = -1;
      for (int64_t v = 0; v < n; ++v) {
        int64_t dv = (mind[v] == INF) ? -1 : mind[v];
        if (dv > bestd) { bestd = dv; s = v; }
      }
    }
    seeds.push_back(s);
    Vec ds;
    bfs_dist(ptr, idx, n, Vec{s}, ds);
    for (int64_t v = 0; v < n; ++v) mind[v] = std::min(mind[v], ds[v]);
  }
}

void refine(const int64_t* ptr, const int64_t* idx, int64_t n, int64_t k,
            int64_t* part, Vec& sizes, int64_t max_size, int passes) {
  if (n * k > 50000000LL) return;  // same table-size gate as the Python impl
  int64_t min_size = std::max<int64_t>(
      1, static_cast<int64_t>(std::floor(n / (double)k * 0.97)) - 1);
  std::vector<int32_t> conn;
  for (int pass = 0; pass < passes; ++pass) {
    int64_t moved = 0;
    conn.assign(n * k, 0);
    for (int64_t v = 0; v < n; ++v)
      for (int64_t e = ptr[v]; e < ptr[v + 1]; ++e)
        conn[v * k + part[idx[e]]] += 1;
    Vec boundary;
    for (int64_t v = 0; v < n; ++v) {
      int64_t deg = ptr[v + 1] - ptr[v];
      if (conn[v * k + part[v]] < deg) boundary.push_back(v);
    }
    for (int64_t v : boundary) {
      int64_t p_old = part[v];
      if (sizes[p_old] <= min_size) continue;
      const int32_t* cv = &conn[v * k];
      int64_t p_new = 0;
      for (int64_t p = 1; p < k; ++p)
        if (cv[p] > cv[p_new]) p_new = p;   // first maximum
      if (p_new == p_old || cv[p_new] <= cv[p_old]) continue;
      if (sizes[p_new] >= max_size) continue;
      part[v] = p_new;
      sizes[p_old] -= 1;
      sizes[p_new] += 1;
      for (int64_t e = ptr[v]; e < ptr[v + 1]; ++e) {
        conn[idx[e] * k + p_old] -= 1;
        conn[idx[e] * k + p_new] += 1;
      }
      ++moved;
    }
    if (moved == 0) break;
  }
}

}  // namespace

extern "C" {

int g4p_kway_partition(int64_t n, const int64_t* ptr, const int64_t* idx,
                       int64_t k, int64_t* part, int refine_passes) {
  if (k <= 1 || n == 0) { std::memset(part, 0, n * sizeof(int64_t)); return 0; }
  if (k >= n) { for (int64_t v = 0; v < n; ++v) part[v] = v; return 0; }

  int64_t max_size =
      static_cast<int64_t>(std::ceil(n / (double)k * 1.03)) + 1;
  for (int64_t v = 0; v < n; ++v) part[v] = -1;
  Vec seeds;
  pick_seeds(ptr, idx, n, k, seeds);

  std::vector<std::deque<int64_t>> frontiers(k);
  Vec sizes(k, 0);
  for (int64_t p = 0; p < k; ++p) {
    int64_t s = seeds[p];
    if (part[s] == -1) { part[s] = p; sizes[p] += 1; }
    frontiers[p].push_back(s);
  }

  int64_t n_assigned = 0;
  for (int64_t v = 0; v < n; ++v) n_assigned += (part[v] >= 0);
  int64_t next_unassigned = 0;
  while (n_assigned < n) {
    bool progress = false;
    for (int64_t p = 0; p < k; ++p) {
      if (sizes[p] >= max_size) continue;
      int64_t budget = 1;
      while (!frontiers[p].empty() && budget > 0) {
        int64_t v = frontiers[p].front();
        frontiers[p].pop_front();
        bool broke = false;
        for (int64_t e = ptr[v]; e < ptr[v + 1]; ++e) {
          int64_t u = idx[e];
          if (part[u] == -1) {
            part[u] = p;
            sizes[p] += 1;
            n_assigned += 1;
            frontiers[p].push_back(u);
            budget -= 1;
            progress = true;
            if (sizes[p] >= max_size || budget == 0) {
              frontiers[p].push_front(v);
              broke = true;
              break;
            }
          }
        }
        if (broke) break;
      }
    }
    if (!progress) {
      while (next_unassigned < n && part[next_unassigned] != -1)
        ++next_unassigned;
      if (next_unassigned >= n) break;
      int64_t p = 0;
      for (int64_t q = 1; q < k; ++q)
        if (sizes[q] < sizes[p]) p = q;  // first minimum
      part[next_unassigned] = p;
      sizes[p] += 1;
      n_assigned += 1;
      frontiers[p].push_back(next_unassigned);
    }
  }
  refine(ptr, idx, n, k, part, sizes, max_size, refine_passes);
  return 0;
}

// ---- graph construction (dual: elements sharing >= 1 node; nodal: nodes
// sharing an element).  Two-phase: size query then fill, sorted-dedup
// ascending neighbor lists (matching the NumPy CSR construction). ----

static int build_graph(int64_t n_vert, const std::vector<Vec>& adj,
                       int64_t* out_ptr, int64_t* out_idx, int64_t* out_len,
                       bool fill) {
  int64_t total = 0;
  for (int64_t v = 0; v < n_vert; ++v) total += (int64_t)adj[v].size();
  if (!fill) { *out_len = total; return 0; }
  int64_t pos = 0;
  out_ptr[0] = 0;
  for (int64_t v = 0; v < n_vert; ++v) {
    for (int64_t u : adj[v]) out_idx[pos++] = u;
    out_ptr[v + 1] = pos;
  }
  return 0;
}

static void mesh_adjacency(int64_t n_elems, int64_t n_nodes,
                           const int64_t* elem_ptr, const int64_t* elem_idx,
                           bool dual, std::vector<Vec>& adj) {
  // node -> elements
  std::vector<Vec> n2e(n_nodes);
  for (int64_t e = 0; e < n_elems; ++e)
    for (int64_t i = elem_ptr[e]; i < elem_ptr[e + 1]; ++i)
      n2e[elem_idx[i]].push_back(e);
  if (dual) {
    adj.assign(n_elems, Vec());
    for (int64_t nd = 0; nd < n_nodes; ++nd)
      for (int64_t a : n2e[nd])
        for (int64_t b : n2e[nd])
          if (a != b) adj[a].push_back(b);
  } else {
    adj.assign(n_nodes, Vec());
    for (int64_t e = 0; e < n_elems; ++e)
      for (int64_t i = elem_ptr[e]; i < elem_ptr[e + 1]; ++i)
        for (int64_t j = elem_ptr[e]; j < elem_ptr[e + 1]; ++j)
          if (elem_idx[i] != elem_idx[j]) adj[elem_idx[i]].push_back(elem_idx[j]);
  }
  for (auto& a : adj) {
    std::sort(a.begin(), a.end());
    a.erase(std::unique(a.begin(), a.end()), a.end());
  }
}

int g4p_mesh_graph_size(int64_t n_elems, int64_t n_nodes,
                        const int64_t* elem_ptr, const int64_t* elem_idx,
                        int dual, int64_t* n_edges) {
  std::vector<Vec> adj;
  mesh_adjacency(n_elems, n_nodes, elem_ptr, elem_idx, dual != 0, adj);
  int64_t n_vert = dual ? n_elems : n_nodes;
  return build_graph(n_vert, adj, nullptr, nullptr, n_edges, false);
}

int g4p_mesh_graph(int64_t n_elems, int64_t n_nodes,
                   const int64_t* elem_ptr, const int64_t* elem_idx,
                   int dual, int64_t* out_ptr, int64_t* out_idx) {
  std::vector<Vec> adj;
  mesh_adjacency(n_elems, n_nodes, elem_ptr, elem_idx, dual != 0, adj);
  int64_t n_vert = dual ? n_elems : n_nodes;
  int64_t dummy;
  return build_graph(n_vert, adj, out_ptr, out_idx, &dummy, true);
}

}  // extern "C"
