"""Smoke/measurement driver for the structured 3D scale path on real TPU.

Usage: python tst/smoke_structured.py [size] [g] [overlap] [lvl2]
Prints per-phase walls + convergence; used to pick the bench config.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("GENEO_SETUP_VERBOSE", "1")
os.environ.setdefault("REFINE_VERBOSE", "1")

size = int(sys.argv[1]) if len(sys.argv) > 1 else 108
g = int(sys.argv[2]) if len(sys.argv) > 2 else 4
overlap = int(sys.argv[3]) if len(sys.argv) > 3 else 2
lvl2 = sys.argv[4] if len(sys.argv) > 4 else "E1"

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from geneo4petsc_tpu.config import GenEOOptions
from geneo4petsc_tpu.structured.grid import laplacian_grid
from geneo4petsc_tpu.structured.solve import solve_structured

t0 = time.perf_counter()
grid = laplacian_grid(size, dim=3, kappa_max=10000.0, interp="minmax")
t_gen = time.perf_counter() - t0
print(f"grid {grid.shape} n={grid.n_nodes} built in {t_gen:.2f}s",
      file=sys.stderr, flush=True)

opts = GenEOOptions()
opts.lvl1, opts.lvl2 = "ASM", lvl2
opts.els2.type = "lobpcg"
opts.cut = int(os.environ.get("SMOKE_CUT", "0"))
opts.els2.max_it = int(os.environ.get("SMOKE_EIG_IT", "50"))

t0 = time.perf_counter()
out = solve_structured(grid, (g, g, g), overlap, geneo=opts, tol=1e-8)
t_all = time.perf_counter() - t0

print(json.dumps({
    "n_dof": out.n_dof, "n_dom": out.n_dom,
    "dim_e": int(out.stats.real_dim_e.sum()),
    "inner_its": out.refined.inner_its, "outer_its": out.refined.outer_its,
    "true_res": out.true_res, "converged": out.converged,
    "timers": {k: round(v, 3) for k, v in out.timers.phases.items()},
    "wall_s": round(t_all, 3), "gen_s": round(t_gen, 3),
    "s_per_mdof": round(t_all / (out.n_dof / 1e6), 3),
    "lobpcg_res_max": float(np.max(getattr(out.stats, "lobpcg_res",
                                           np.zeros(1)))),
}))
