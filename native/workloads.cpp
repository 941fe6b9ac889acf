// Native workload generators for geneo4petsc_tpu's flat-C plugin ABI.
//
// The reference ships its test workloads as dlopen'd C++ shared libraries
// (tst/laplacian/laplacian.cpp, tst/heat/heat.cpp, tst/graph/graph.cpp).
// The TPU framework's plugin ABI is plain C (see
// geneo4petsc_tpu/io/plugin.py): two-phase size-query + fill.  This
// library implements all THREE reference workloads natively — the
// heterogeneous Laplacian, the implicit-Euler heat step (lbd*Laplacian +
// Mass/dt, tst/heat/heat.cpp:24-262) and the irregular resistor-circuit
// graph (tst/graph/graph.cpp:23-208) — with the same element-emission
// order and float-op order as the Python models (geneo4petsc_tpu/models/);
// tests assert bit-identical parity.  Select with a leading
// `--workload laplacian|heat|graph` token (default laplacian).
//
//   int getInputSizes(const char* args, unsigned* nbElem, unsigned* nbNode,
//                     unsigned* idxLen, unsigned* matLen);
//   int getInputFill(const char* args, unsigned* elemPtr, unsigned* elemIdx,
//                    double* elemMat);

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <array>
#include <utility>
#include <set>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct Config {
  std::string workload = "laplacian";
  int size = 4, weak = 1, dim = 3;
  double inp_eps = 0.0001;
  double kappa_max = 1.0;
  std::string interp;
  double lbd = 1.0, dt = 0.1;      // heat
  int level = 1;                   // graph
  bool no_ground = false;          // graph
};

int parse_args(const char* args_c, Config& cfg) {
  std::stringstream ss(args_c ? args_c : "");
  std::string tok;
  while (ss >> tok) {
    if (tok == "--workload") ss >> cfg.workload;
    else if (tok == "--size") ss >> cfg.size;
    else if (tok == "--weakScaling") ss >> cfg.weak;
    else if (tok == "--dim") ss >> cfg.dim;
    else if (tok == "--inpEps") ss >> cfg.inp_eps;
    else if (tok == "--kappa") { ss >> cfg.kappa_max >> cfg.interp; }
    else if (tok == "--lbd") ss >> cfg.lbd;
    else if (tok == "--dt") ss >> cfg.dt;
    else if (tok == "--level") ss >> cfg.level;
    else if (tok == "--noGround") cfg.no_ground = true;
  }
  if (cfg.workload == "graph") return 0;
  if (cfg.dim < 1 || cfg.dim > 3) return 1;
  return 0;
}

int grid_size(const Config& c) {
  if (c.dim == 1) return c.size * c.weak;
  // epsilon guard mirrors models/_grid.py::grid_size: exact-power roots
  // can land just below the integer
  if (c.dim == 2)
    return (int)(std::sqrt((double)c.size * c.size * c.weak) + 1e-9);
  return (int)(std::cbrt((double)c.size * c.size * c.size * c.weak) + 1e-9);
}

void init_kappa(int n, const std::string& interp, double kmax,
                double& alpha, double& beta) {
  alpha = 0.0; beta = 1.0;
  double x_max = (double)(n - 1);
  if (interp == "quad") alpha = (kmax - beta) / (x_max * x_max);
  else if (interp == "lin") alpha = (kmax - beta) / x_max;
  else if (interp == "minmax") { alpha = kmax; beta = x_max / 3.0; }
}

double kappa1(const std::string& interp, double alpha, double x, double beta) {
  if (interp == "quad") return alpha * x * x + beta;
  if (interp == "lin") return alpha * x + beta;
  if (interp == "minmax") {
    if (x >= 2.0 * beta) return 1.0;
    if (x >= beta) return alpha;
    return 1.0;
  }
  return 1.0;
}

struct Emit {
  std::vector<unsigned> ptr{0}, idx;
  std::vector<double> mat;
  unsigned nb_elem = 0;

  void pair(int i, int j, double m00, double m01, double m10, double m11) {
    idx.push_back(i); idx.push_back(j);
    ptr.push_back((unsigned)idx.size());
    mat.push_back(m00); mat.push_back(m01);
    mat.push_back(m10); mat.push_back(m11);
    ++nb_elem;
  }
  void single(int i, double m00) {
    idx.push_back(i);
    ptr.push_back((unsigned)idx.size());
    mat.push_back(m00);
    ++nb_elem;
  }
};

// --- laplacian / heat: shared raster scan (models/_grid.py::scan_grid,
// reference emission order laplacian.cpp:118-189 / heat.cpp:195-255) ---

int generate_grid(const Config& cfg, Emit& em) {
  const bool heat = cfg.workload == "heat";
  int n = grid_size(cfg);
  int d1n = n, d2n = cfg.dim >= 2 ? n : 1, d3n = cfg.dim >= 3 ? n : 1;
  double alpha, beta;
  init_kappa(n, cfg.interp, cfg.kappa_max, alpha, beta);
  const double eps = cfg.inp_eps, lbd = cfg.lbd, dt = cfg.dt;
  // heat mass term entries, computed once in the Python op order
  // (mass_stencil(bc)/dt): 1/3 and 1/6 each divided by dt
  const double mdiag = (1.0 / 3.0) / dt, moff = (1.0 / 6.0) / dt;
  std::set<std::pair<int, int>> seen;
  for (int d3 = 0; d3 < d3n; ++d3)
    for (int d2 = 0; d2 < d2n; ++d2)
      for (int d1 = 0; d1 < d1n; ++d1) {
        int central = d1 + d1n * d2 + d1n * d2n * d3;
        double kap = kappa1(cfg.interp, alpha, d1, beta) *
                     kappa1(cfg.interp, alpha, d2, beta) *
                     kappa1(cfg.interp, alpha, d3, beta);
        // laplacian stencil entries (kappa * [[1+eps,-1],[-1,1+eps]])
        double ldia = kap * (1.0 + eps), loff = kap * -1.0;
        for (int nd = 1; nd <= 3; ++nd)
          for (int off = -1; off <= 1; off += 2) {
            int n1 = d1, n2 = d2, n3 = d3;
            if (nd == 1) n1 += off; else if (nd == 2) n2 += off; else n3 += off;
            if (n1 >= d1n || n2 >= d2n || n3 >= d3n) continue;
            if (n1 < 0 || n2 < 0 || n3 < 0) {
              bool add_bc = (cfg.dim == 1 && nd == 1 && n1 == -1) ||
                            (cfg.dim == 2 && nd == 2 && n2 == -1) ||
                            (cfg.dim == 3 && nd == 3 && n3 == -1);
              if (add_bc) {
                if (heat) em.single(central, lbd * ldia + mdiag);
                else em.single(central, ldia);
              }
              continue;
            }
            int nb = n1 + d1n * n2 + d1n * d2n * n3;
            auto key = std::minmax(central, nb);
            if (!seen.insert(key).second) continue;
            if (heat)
              em.pair(central, nb, lbd * ldia + mdiag, lbd * loff + moff,
                      lbd * loff + moff, lbd * ldia + mdiag);
            else
              em.pair(central, nb, ldia, loff, loff, ldia);
          }
      }
  return 0;
}

// --- graph: central block + concentric levels of 4 cross-connected
// blocks (models/graph.py twin; reference behavior graph.cpp:23-208) ---

struct GraphBuilder {
  Emit& em;
  double inp_eps;
  bool no_ground;
  int node_id;
  // border layout: (up, right, down, left), each sorted ascending
  std::vector<std::array<std::vector<int>, 4>> borders;

  GraphBuilder(Emit& e, double eps, bool ng)
      : em(e), inp_eps(eps), no_ground(ng), node_id(ng ? 0 : 1) {}

  void add(int i, int j, double l) {
    double dia = l * (1.0 + inp_eps), off = l * -1.0;
    em.pair(i, j, dia, off, off, dia);
  }

  void build_block(int bs, bool central, double l) {
    int nid = node_id;
    for (int r = 0; r < bs; ++r) {       // rows
      for (int j = 0; j < bs - 1; ++j) add(nid + j, nid + j + 1, l);
      nid += bs;
    }
    int cid = nid - 1;
    for (int c = 0; c < bs; ++c) {       // columns
      for (int j = 0; j < bs - 1; ++j)
        add(cid - j * bs, cid - (j + 1) * bs, l);
      --cid;
    }
    node_id = nid;

    int last = nid - 1;
    std::array<std::vector<int>, 4> border;   // up, right, down, left
    for (int i = 0; i < bs; ++i) {
      border[0].push_back(last - (bs - 1) * bs - i);
      border[1].push_back(last - i * bs);
      border[2].push_back(last - i);
      border[3].push_back(last - i * bs - (bs - 1));
    }
    for (auto& side : border) std::sort(side.begin(), side.end());
    borders.push_back(border);
    if (central)                          // fake central level = 4 copies
      for (int k = 0; k < 3; ++k) borders.push_back(border);

    if (no_ground) return;
    for (const auto& side : border)
      for (int node : side) add(node, 0, l);
  }
};

int generate_graph(const Config& cfg, Emit& em) {
  int bs = (int)std::sqrt((double)cfg.size * cfg.weak);
  GraphBuilder b(em, cfg.inp_eps, cfg.no_ground);
  b.build_block(bs, true, 1.0);

  // src/dst side pairings per block (models/graph.py:95-109)
  const int h_src[4] = {1, 2, 3, 0}, h_dst[4] = {0, 1, 2, 3};
  const int v_src[4] = {0, 1, 2, 3}, v_dst[4] = {2, 3, 0, 1};
  for (int l = 1; l <= cfg.level; ++l) {
    for (int k = 0; k < 4; ++k) b.build_block(bs, false, (double)(l + 1));
    for (int blk = 0; blk < 4; ++blk) {   // horizontal within level l
      int nxt = (blk + 1) % 4;
      const auto& src = b.borders[4 * l + blk][h_src[blk]];
      const auto& dst = b.borders[4 * l + nxt][h_dst[blk]];
      for (size_t i = 0; i < src.size(); ++i)
        b.add(src[i], dst[i], 0.5 * (l + 1.0));
    }
    for (int blk = 0; blk < 4; ++blk) {   // vertical to level l-1
      const auto& src = b.borders[4 * (l - 1) + blk][v_src[blk]];
      const auto& dst = b.borders[4 * l + blk][v_dst[blk]];
      for (size_t i = 0; i < src.size(); ++i)
        b.add(src[i], dst[i], 0.5 * (l + 1.0));
    }
  }
  return 0;
}

int generate(const Config& cfg, Emit& em) {
  if (cfg.workload == "graph") return generate_graph(cfg, em);
  if (cfg.workload == "heat" || cfg.workload == "laplacian")
    return generate_grid(cfg, em);
  return 1;
}

unsigned count_nodes(const Config& cfg, const Emit& em) {
  if (cfg.workload == "graph") {
    unsigned mx = 0;
    for (unsigned v : em.idx) mx = std::max(mx, v);
    return mx + 1;
  }
  int n = grid_size(cfg);
  long total = (long)n;
  if (cfg.dim >= 2) total *= n;
  if (cfg.dim >= 3) total *= n;
  return (unsigned)total;
}

}  // namespace

extern "C" {

int getInputSizes(const char* args, unsigned* nb_elem, unsigned* nb_node,
                  unsigned* idx_len, unsigned* mat_len) {
  Config cfg;
  if (parse_args(args, cfg)) return 1;
  Emit em;
  if (generate(cfg, em)) return 1;
  *nb_elem = em.nb_elem;
  *nb_node = count_nodes(cfg, em);
  *idx_len = (unsigned)em.idx.size();
  *mat_len = (unsigned)em.mat.size();
  return 0;
}

int getInputFill(const char* args, unsigned* elem_ptr, unsigned* elem_idx,
                 double* elem_mat) {
  Config cfg;
  if (parse_args(args, cfg)) return 1;
  Emit em;
  if (generate(cfg, em)) return 1;
  std::memcpy(elem_ptr, em.ptr.data(), em.ptr.size() * sizeof(unsigned));
  std::memcpy(elem_idx, em.idx.data(), em.idx.size() * sizeof(unsigned));
  std::memcpy(elem_mat, em.mat.data(), em.mat.size() * sizeof(double));
  return 0;
}

}  // extern "C"
