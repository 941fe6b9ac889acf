"""Diagnose the 10M setup: print x0/Z/E/LOBPCG health at a given size.

Usage: python tst/debug_setup10m.py [size] [domg] [overlap]
Env: GENEO_TINY_EIGH=xla to A/B the Jacobi tiny-eigh path.
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

from geneo4petsc_tpu.config import GenEOOptions
from geneo4petsc_tpu.structured.decompose import StructuredDecomposition
from geneo4petsc_tpu.structured.geneo import setup_structured
from geneo4petsc_tpu.structured.grid import global_stencil, laplacian_grid
from geneo4petsc_tpu.krylov.refine import op_matvec


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 216
    domg = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    ov = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    cut = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    eig_it = int(os.environ.get("BENCH_EIG_IT", "50"))
    print(f"device={jax.devices()[0]} tiny_eigh="
          f"{os.environ.get('GENEO_TINY_EIGH', 'default')} cut={cut} "
          f"max_it={eig_it}", flush=True)

    grid = laplacian_grid(size, dim=3, kappa_max=10000.0, interp="minmax")
    sd = StructuredDecomposition(grid, (domg,) * 3, ov)
    opts = GenEOOptions()
    opts.lvl1, opts.lvl2 = "ASM", "E1"
    opts.els2.type = "lobpcg"
    opts.els2.max_it = eig_it
    opts.cut = cut

    n = grid.n_nodes
    gop64 = global_stencil(grid, jnp.float64)
    x_true = jnp.arange(1.0, n + 1, dtype=jnp.float64)
    b = op_matvec(gop64, x_true)
    jax.block_until_ready(b)
    print(f"n={n} |b|inf={float(jnp.max(jnp.abs(b))):.3e}", flush=True)

    t0 = time.perf_counter()
    pc, stats = setup_structured(sd, opts, b=jnp.asarray(b, jnp.float32),
                                 dtype=jnp.float32)
    jax.block_until_ready(pc.x0)
    print(f"setup {time.perf_counter() - t0:.1f}s dim_e={pc.dim_e} "
          f"real={stats.real_dim_e.sum()}", flush=True)

    if stats.lobpcg_res is not None:
        r = np.asarray(stats.lobpcg_res)
        print(f"lobpcg kept res: max={np.nanmax(r):.3e} "
              f"median={np.nanmedian(r):.3e} "
              f"n>1e-2={int((r > 1e-2).sum())} "
              f"n>1e-1={int((r > 1e-1).sum())} "
              f"n_nan={np.isnan(r).sum()}", flush=True)
        worst = np.argsort(r)[::-1][:5]
        for p in worst:
            evs = stats.eigenvalues[p] if stats.eigenvalues else []
            print(f"  dom {p}: res={r[p]:.3e} kept={len(evs)} "
                  f"ev={['%.3e' % e for e in evs[:4]]}", flush=True)
    print("tau_loc[:4]", np.asarray(stats.tau_loc)[:4], flush=True)
    z = np.asarray(pc.z) if pc.z is not None else None
    if z is not None:
        print(f"|Z|inf={np.abs(z).max():.3e} n_nan={np.isnan(z).sum()}",
              flush=True)
    ev = np.asarray(pc.e_eig_inv)
    print(f"E^-1 spectrum: min={ev.min():.3e} max={ev.max():.3e} "
          f"n_nan={np.isnan(ev).sum()}", flush=True)
    x0 = np.asarray(pc.x0)
    print(f"|x0|inf={np.abs(x0).max():.3e} n_nan={np.isnan(x0).sum()} "
          f"n_inf={np.isinf(x0).sum()}", flush=True)


if __name__ == "__main__":
    main()
