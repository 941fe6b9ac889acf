"""BASELINE.json config runner: exercises the five pinned configurations
(BASELINE.md) and records our iteration counts / dims / timings as JSON.

Config #5 here is a CPU-scale elasticity stand-in exercising the same
PC family on vector-valued DOFs; the FULL-SCALE config #5 — a true
10,077,696-DOF (216^3) 3D SPD system, 64 subdomains, overlap 2, batched
local eigensolves, deflated PCG to true 1e-8 — is the headline bench on
the structured backend: `python bench.py` (runs on the real TPU chip at
~22 s/MDOF; see ROUND2_NOTES.md).

Usage: python tst/baseline.py [--out baseline_results.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get("BASELINE_CPU", "1") == "1":
    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

if os.environ.get("BASELINE_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

from geneo4petsc_tpu.config import DriverOptions, GenEOOptions, KSPOptions
from geneo4petsc_tpu.io.plugin import get_lib_input
from geneo4petsc_tpu.solver import solve_mesh


def run_config(name, lib, lib_args, n_dom, lvl, ksp_type="cg", rtol=1e-8,
               overlap=1, cut=-1):
    mesh = get_lib_input(lib, lib_args)
    g = GenEOOptions(cut=cut)
    g.lvl1, g.lvl2 = lvl.split(",")
    t0 = time.perf_counter()
    out = solve_mesh(mesh, n_dom=n_dom, pc_type="geneo", geneo=g,
                     ksp=KSPOptions(type=ksp_type, rtol=rtol),
                     driver=DriverOptions(add_overlap=overlap))
    wall = time.perf_counter() - t0
    rec = {
        "config": name,
        "n_dof": out.n_dof,
        "n_dom": n_dom,
        "pc": out.pc_name,
        "ksp": ksp_type,
        "rtol": rtol,
        "iterations": out.its,
        "converged": out.converged,
        "true_res": out.true_res,
        "dim_e": int(out.stats.real_dim_e.sum()),
        "nicolaides": int(out.stats.nicolaides.sum()),
        "wall_s": round(wall, 2),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    results = [
        # 1. 2D Laplacian, 4 subdomains, overlap 1, GenEO-1 + ASM, PCG 1e-8
        run_config("1: 2D laplacian ASM+GenEO-1",
                   "laplacian", "--size#32#--dim#2", 4, "ASM,1"),
        # 2. heterogeneous heat, 1e4 jumps, GenEO-2 hybrid Schwarz
        run_config("2: heterogeneous heat GenEO-2 hybrid",
                   "heat", "--size#24#--dim#2#--kappa#10000.#minmax", 4,
                   "SORAS,H2"),
        # 3. irregular graph, variable subdomains, RAS + coarse deflation
        run_config("3: irregular graph RAS+deflation",
                   "graph", "--size#16#--level#2", 6, "RAS,E1",
                   ksp_type="gmres"),
        # 4. 3D high-contrast Laplacian, 64 subdomains, overlap 2,
        #    efficient GenEO, tau-adaptive EV counts (bounded by -geneo_cut:
        #    at this reduced size the 4^3-DOF subdomains with overlap 2 are
        #    nearly all overlap, which makes the unbounded tau-adaptive
        #    coarse space degenerate)
        run_config("4: 3D high-contrast eff-GenEO",
                   "laplacian", "--size#16#--dim#3#--kappa#10000.#minmax",
                   64, "ASM,E1", overlap=2, cut=4),
        # 5. elasticity-style SPD system (reduced-scale stand-in for the
        #    10M-DOF v5p-8 target)
        run_config("5: 2D elasticity high-contrast (reduced)",
                   "elasticity", "--size#48#--nu#0.3#--kappa#1000.#minmax",
                   64, "ASM,H1"),
    ]
    out_path = sys.argv[sys.argv.index("--out") + 1] \
        if "--out" in sys.argv else None
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    ok = all(r["converged"] for r in results)
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
