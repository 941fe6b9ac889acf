"""Per-iteration cost of the PRODUCTION inner CG at the headline shape.

debug_solve10m measured solve_s 2.35 s for 102 inner its (~23 ms/it)
while the component probes say matvec 2.9 + pc_apply 5.5 + vector ops
~1 ms.  This probe times the real jitted inner solver
(_structured_inner_blk_jit) at two max_it caps and differences.

Usage: python tst/probe_inner.py [size]
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
from geneo4petsc_tpu.structured.blockmode import build_block_mode
from geneo4petsc_tpu.structured.decompose import StructuredDecomposition
from geneo4petsc_tpu.structured.geneo import setup_structured
from geneo4petsc_tpu.structured.grid import global_stencil, laplacian_grid
from geneo4petsc_tpu.structured.solve import make_structured_inner
from geneo4petsc_tpu.krylov.refine import op_matvec


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 216
    grid = laplacian_grid(size, dim=3, kappa_max=10000.0, interp="minmax")
    sd = StructuredDecomposition(grid, (4,) * 3, 2)
    opts = GenEOOptions()
    opts.lvl1, opts.lvl2 = "ASM", "E1"
    opts.els2.type = "lobpcg"
    opts.els2.max_it = int(os.environ.get("BENCH_EIG_IT", "50"))
    opts.cut = 2
    n = grid.n_nodes
    gop64 = global_stencil(grid, jnp.float64)
    x_true = jnp.arange(1.0, n + 1, dtype=jnp.float64)
    b = op_matvec(gop64, x_true)
    t0 = time.perf_counter()
    pc, _stats = setup_structured(sd, opts, b=jnp.asarray(b, jnp.float32),
                                  dtype=jnp.float32)
    jax.block_until_ready(pc.x0)
    print(f"setup {time.perf_counter() - t0:.1f}s", flush=True)
    blk = build_block_mode(pc, sd, jnp.float32)

    r32 = jnp.asarray(b / jnp.max(jnp.abs(b)), jnp.float32)

    def timed(cap, reps=4):
        inner = make_structured_inner(blk, inner_max_it=cap)
        res = inner(r32, jnp.float32(1e-12))
        its = int(res.its)
        _ = float(jnp.sum(res.x))
        ts = []
        for _i in range(reps):
            t0 = time.perf_counter()
            res = inner(r32, jnp.float32(1e-12))
            _ = float(jnp.sum(res.x))
            ts.append(time.perf_counter() - t0)
        return min(ts), its

    t10, i10 = timed(10)
    t60, i60 = timed(60)
    print(f"cap10: {t10:.3f}s its={i10}; cap60: {t60:.3f}s its={i60}",
          flush=True)
    if i60 > i10:
        print(f"per-it: {(t60 - t10) / (i60 - i10) * 1e3:.2f} ms",
              flush=True)
    # f64 truth matvec cost (refinement per-outer overhead)
    from geneo4petsc_tpu.krylov.refine import _residual64
    x64 = jnp.asarray(x_true * 0.5)
    r, rn, s = _residual64(gop64, b, x64)
    jax.block_until_ready(r)
    ts = []
    for _i in range(4):
        t0 = time.perf_counter()
        r, rn, s = _residual64(gop64, b, x64)
        _ = float(rn)
        ts.append(time.perf_counter() - t0)
    print(f"f64 truth residual+norm: {min(ts) * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
