// Native workload generators for geneo4petsc_tpu's flat-C plugin ABI.
//
// The reference ships its test workloads as dlopen'd C++ shared libraries
// (tst/laplacian/laplacian.cpp etc.).  The TPU framework's plugin ABI is
// plain C (see geneo4petsc_tpu/io/plugin.py): two-phase size-query + fill.
// This library implements the heterogeneous Laplacian generator natively
// (same element-emission order and kappa profiles as the Python
// geneo4petsc_tpu/models/laplacian.py — tests assert both agree), serving
// as the native-plugin reference implementation and the fast path for
// very large structured meshes.
//
//   int getInputSizes(const char* args, unsigned* nbElem, unsigned* nbNode,
//                     unsigned* idxLen, unsigned* matLen);
//   int getInputFill(const char* args, unsigned* elemPtr, unsigned* elemIdx,
//                    double* elemMat);

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <utility>
#include <set>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct LapConfig {
  int size = 4, weak = 1, dim = 3;
  double inp_eps = 0.0001;
  double kappa_max = 1.0;
  std::string interp;
};

int parse_args(const char* args_c, LapConfig& cfg) {
  std::stringstream ss(args_c ? args_c : "");
  std::string tok;
  while (ss >> tok) {
    if (tok == "--size") ss >> cfg.size;
    else if (tok == "--weakScaling") ss >> cfg.weak;
    else if (tok == "--dim") ss >> cfg.dim;
    else if (tok == "--inpEps") ss >> cfg.inp_eps;
    else if (tok == "--kappa") { ss >> cfg.kappa_max >> cfg.interp; }
  }
  if (cfg.dim < 1 || cfg.dim > 3) return 1;
  return 0;
}

int grid_size(const LapConfig& c) {
  if (c.dim == 1) return c.size * c.weak;
  if (c.dim == 2) return (int)std::sqrt((double)c.size * c.size * c.weak);
  return (int)std::cbrt((double)c.size * c.size * c.size * c.weak);
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

  void interior(int i, int j, double k, double eps) {
    idx.push_back(i); idx.push_back(j);
    ptr.push_back((unsigned)idx.size());
    mat.push_back(k * (1.0 + eps)); mat.push_back(k * -1.0);
    mat.push_back(k * -1.0); mat.push_back(k * (1.0 + eps));
    ++nb_elem;
  }
  void bc(int i, double k, double eps) {
    idx.push_back(i);
    ptr.push_back((unsigned)idx.size());
    mat.push_back(k * (1.0 + eps));
    ++nb_elem;
  }
};

// Raster scan matching models/_grid.py::scan_grid (and the reference's
// emission order): neighbors along axes 1..3, offsets (-1, +1), Dirichlet
// ghost on the lower face of the last grid axis, unordered-pair dedup.
int generate(const LapConfig& cfg, Emit& em) {
  int n = grid_size(cfg);
  int d1n = n, d2n = cfg.dim >= 2 ? n : 1, d3n = cfg.dim >= 3 ? n : 1;
  double alpha, beta;
  init_kappa(n, cfg.interp, cfg.kappa_max, alpha, beta);
  std::set<std::pair<int, int>> seen;
  for (int d3 = 0; d3 < d3n; ++d3)
    for (int d2 = 0; d2 < d2n; ++d2)
      for (int d1 = 0; d1 < d1n; ++d1) {
        int central = d1 + d1n * d2 + d1n * d2n * d3;
        double kap = kappa1(cfg.interp, alpha, d1, beta) *
                     kappa1(cfg.interp, alpha, d2, beta) *
                     kappa1(cfg.interp, alpha, d3, beta);
        for (int nd = 1; nd <= 3; ++nd)
          for (int off = -1; off <= 1; off += 2) {
            int n1 = d1, n2 = d2, n3 = d3;
            if (nd == 1) n1 += off; else if (nd == 2) n2 += off; else n3 += off;
            if (n1 >= d1n || n2 >= d2n || n3 >= d3n) continue;
            if (n1 < 0 || n2 < 0 || n3 < 0) {
              bool add_bc = (cfg.dim == 1 && nd == 1 && n1 == -1) ||
                            (cfg.dim == 2 && nd == 2 && n2 == -1) ||
                            (cfg.dim == 3 && nd == 3 && n3 == -1);
              if (add_bc) em.bc(central, kap, cfg.inp_eps);
              continue;
            }
            int nb = n1 + d1n * n2 + d1n * d2n * n3;
            auto key = std::minmax(central, nb);
            if (!seen.insert(key).second) continue;
            em.interior(central, nb, kap, cfg.inp_eps);
          }
      }
  return 0;
}

}  // namespace

extern "C" {

int getInputSizes(const char* args, unsigned* nb_elem, unsigned* nb_node,
                  unsigned* idx_len, unsigned* mat_len) {
  LapConfig cfg;
  if (parse_args(args, cfg)) return 1;
  Emit em;
  if (generate(cfg, em)) return 1;
  *nb_elem = em.nb_elem;
  int n = grid_size(cfg);
  long total = (long)n;
  if (cfg.dim >= 2) total *= n;
  if (cfg.dim >= 3) total *= n;
  *nb_node = (unsigned)total;
  *idx_len = (unsigned)em.idx.size();
  *mat_len = (unsigned)em.mat.size();
  return 0;
}

int getInputFill(const char* args, unsigned* elem_ptr, unsigned* elem_idx,
                 double* elem_mat) {
  LapConfig cfg;
  if (parse_args(args, cfg)) return 1;
  Emit em;
  if (generate(cfg, em)) return 1;
  std::memcpy(elem_ptr, em.ptr.data(), em.ptr.size() * sizeof(unsigned));
  std::memcpy(elem_idx, em.idx.data(), em.idx.size() * sizeof(unsigned));
  std::memcpy(elem_mat, em.mat.data(), em.mat.size() * sizeof(double));
  return 0;
}

}  // extern "C"
