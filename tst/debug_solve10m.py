"""Reproduce the bench 10M solve failure with full diagnostics.

Usage: python tst/debug_solve10m.py [size] [block(0/1)]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from geneo4petsc_tpu.config import GenEOOptions, KSPOptions
from geneo4petsc_tpu.structured.grid import laplacian_grid
from geneo4petsc_tpu.structured.solve import solve_structured


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 216
    block = (sys.argv[2] if len(sys.argv) > 2 else "1") == "1"
    os.environ["GENEO_KEEP_PENCILS"] = "1"
    print(f"device={jax.devices()[0]} block_layout={block}", flush=True)

    grid = laplacian_grid(size, dim=3, kappa_max=10000.0, interp="minmax")
    opts = GenEOOptions()
    opts.lvl1, opts.lvl2 = "ASM", "E1"
    opts.els2.type = "lobpcg"
    opts.els2.max_it = 50
    opts.cut = 2

    n = grid.n_nodes
    x_true = np.arange(1.0, n + 1)
    passes = int(os.environ.get("DEBUG_PASSES", "2"))
    for p in range(passes):
        t0 = time.perf_counter()
        out = solve_structured(grid, (4, 4, 4), 2, geneo=opts,
                               ksp=KSPOptions(type="cg"), tol=1e-8,
                               block_layout=block)
        dt = time.perf_counter() - t0
        err = float(np.abs(np.asarray(out.x) - x_true).max()) / n
        tag = "cold" if p == 0 else "steady"
        print(f"[{tag}] wall={dt:.1f}s converged={out.converged} "
              f"outer={out.refined.outer_its} "
              f"inner={out.refined.inner_its} "
              f"true_res={out.true_res:.3e} err={err:.3e}", flush=True)
        print(f"[{tag}] history:",
              ["%.3e" % h for h in out.refined.history], flush=True)
        print(f"[{tag}] timers:",
              {k: round(v, 2)
               for k, v in sorted(out.timers.phases.items())}, flush=True)
        del out
        import gc
        gc.collect()


if __name__ == "__main__":
    main()
