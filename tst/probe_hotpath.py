"""Diagnose the per-iteration floor of the structured solve hot path.

Round-3/4 roofline measured ~27 ms per invocation for the stencil
matvec, the FDM apply AND the full pc_apply at 1M DOF — three very
different kernels with near-identical cost, and solve wall/iteration is
size-independent (~70-80 ms/it at 1M and 10M).  That signature says
"fixed per-step cost", not bandwidth.  This probe separates the
candidates on the real chip:

  a) While/fori_loop per-iteration floor: chain of a trivial
     elementwise op (y = y * c + 1) at several sizes;
  b) stencil matvec chain at several sizes (scaling with N?);
  c) FDM apply chain at several sizes;
  d) the same matvec chain UNROLLED (no While) for the loop-overhead
     delta.

Usage: python tst/probe_hotpath.py [sizes...]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_enable_x64", True)


def timed(fn, *args, reps=8):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def per_step(step, op, x, lo=2, hi=22, reps=8, unroll=False):
    if unroll:
        @partial(jax.jit, static_argnames=("m",))
        def chain(o, v, m):
            for _ in range(m):
                v = step(o, v) * 0.5
            return v
    else:
        @partial(jax.jit, static_argnames=("m",))
        def chain(o, v, m):
            return jax.lax.fori_loop(0, m, lambda _, c: step(o, c) * 0.5, v)
    t_lo = timed(partial(chain, m=lo), op, x, reps=reps)
    t_hi = timed(partial(chain, m=hi), op, x, reps=reps)
    return (t_hi - t_lo) / (hi - lo), t_lo, t_hi


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [32, 64, 108]
    from geneo4petsc_tpu.structured.decompose import StructuredDecomposition
    from geneo4petsc_tpu.structured.fdm import (dirichlet_axes, fdm_factor)
    from geneo4petsc_tpu.structured.grid import laplacian_grid
    from geneo4petsc_tpu.structured.halo import halo_gather, to_batch

    print(f"device: {jax.devices()[0]}", flush=True)
    for s in sizes:
        grid = laplacian_grid(s, dim=3, kappa_max=10000.0, interp="minmax")
        from geneo4petsc_tpu.structured.grid import global_stencil
        gop = global_stencil(grid, jnp.float32)
        n = grid.n_nodes
        x = jnp.arange(1.0, n + 1, dtype=jnp.float32) / n
        jax.block_until_ready(x)

        # a) trivial elementwise chain (While floor)
        t_triv, lo_t, hi_t = per_step(lambda _o, v: v + 1.0, None, x)
        # b) stencil matvec chain
        t_mv, lo_m, hi_m = per_step(lambda g, v: g.matvec(v), gop, x)
        # d) unrolled matvec (no While)
        t_mvu, _, _ = per_step(lambda g, v: g.matvec(v), gop, x,
                               unroll=True)

        # c) FDM apply on the matching decomposition
        sd = StructuredDecomposition(grid, (4, 4, 4), 2)
        fac = fdm_factor(dirichlet_axes(sd), dtype=jnp.float32)
        xb = to_batch(halo_gather(x, gop.grid_shape, (4, 4, 4), sd.pad))
        jax.block_until_ready(xb)
        t_fdm, _, _ = per_step(lambda f, v: f.solve(v), fac, xb)

        gbps = 6 * n * 4 / 1e9 / t_mv
        print(f"size {s}^3 (n={n}): while-floor {t_triv*1e3:8.3f} ms | "
              f"matvec {t_mv*1e3:8.3f} ms ({gbps:6.1f} GB/s) | "
              f"matvec-unrolled {t_mvu*1e3:8.3f} ms | "
              f"fdm {t_fdm*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
