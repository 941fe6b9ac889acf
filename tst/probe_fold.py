"""A/B the block-mode fold and matvec variants at the headline shape.

probe_pcapply (r05, this machine) measured the production explicit-fold
local_solve at 6.98 ms vs 5.28 ms for the jax.linear_transpose-derived
fold — the opposite of the ordering that motivated the explicit form.
This probe isolates the two folds (and the two matvec forms) with the
same chain-differencing methodology so the production choice follows the
measurement on the target chip, not a stale one.

Usage: python tst/probe_fold.py [size] [domg] [overlap]
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


def timed(fn, *args, reps=8):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts))


def per_step(step, op, x, lo=2, hi=18, reps=6):
    @partial(jax.jit, static_argnames=("m",))
    def chain(o, v, m):
        return jax.lax.fori_loop(0, m, lambda _, c: step(o, c) * 0.5, v)

    t_lo = timed(partial(chain, m=lo), op, x, reps=reps)
    t_hi = timed(partial(chain, m=hi), op, x, reps=reps)
    while t_hi - t_lo < 8e-3 and hi < 1024:
        hi *= 4
        t_hi = timed(partial(chain, m=hi), op, x, reps=reps)
    return max((t_hi - t_lo) / (hi - lo), 1e-9)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 216
    domg = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    ov = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from geneo4petsc_tpu.structured import halo
    from geneo4petsc_tpu.structured.blockmode import (build_block_mode,
                                                      extend_blocks,
                                                      fold_blocks)
    from geneo4petsc_tpu.structured.decompose import StructuredDecomposition
    from geneo4petsc_tpu.structured.fdm import dirichlet_axes, fdm_factor
    from geneo4petsc_tpu.structured.geneo import StructuredGenEO
    from geneo4petsc_tpu.structured.grid import global_stencil, laplacian_grid

    print(f"device: {jax.devices()[0]}", flush=True)
    grid = laplacian_grid(size, dim=3, kappa_max=10000.0, interp="minmax")
    sd = StructuredDecomposition(grid, (domg,) * 3, ov)
    gop = global_stencil(grid, jnp.float32)
    n = grid.n_nodes
    gs, dg, pad = grid.shape, sd.dom_grid, sd.pad
    print(f"n={n}, local={sd.local_shape}, pad={pad}", flush=True)

    x = jnp.arange(1.0, n + 1, dtype=jnp.float32) / n
    xblk = halo.halo_gather(x, gs, dg, (0, 0, 0))
    fac = fdm_factor(dirichlet_axes(sd), dtype=jnp.float32)
    jax.block_until_ready(xblk)

    gx, gy, gz = dg
    pc_min = StructuredGenEO(
        grid_shape=gs, dom_grid=dg, pad=pad, local_shape=sd.local_shape,
        lvl1="ASM", lvl2=0, hybrid=False, eff_hybrid=False, dim_e=0,
        k_max=0, gop=gop, l1=fac, pou=None,
        maskf=jnp.ones((domg ** 3,) + tuple(sd.local_shape[::-1]),
                       jnp.float32),
        z=None, colids=None, e_evecs=None, e_eig_inv=None,
        x0=jnp.zeros(n, jnp.float32))
    blk = build_block_mode(pc_min, sd, dtype=jnp.float32)
    xf = blk.to_block(x)
    jax.block_until_ready(xf)

    def solve_fold_explicit(f, v):
        xb = v.reshape(blk._shape6)
        ub = f.solve(halo.to_batch(extend_blocks(xb, pad)))
        return fold_blocks(halo.from_batch(ub, dg), pad).reshape(v.shape)

    def solve_fold_lt(f, v):
        xb = v.reshape(blk._shape6)
        ub = f.solve(halo.to_batch(extend_blocks(xb, pad)))
        t = jax.linear_transpose(lambda w: extend_blocks(w, pad), xb)
        (y,) = t(halo.from_batch(ub, dg))
        return y.reshape(v.shape)

    # parity first
    a = solve_fold_explicit(fac, xf)
    b = solve_fold_lt(fac, xf)
    print("fold parity max|diff| =",
          float(jnp.max(jnp.abs(a - b))), flush=True)

    def mv_block(b_, v):
        return b_.matvec(v)

    def mv_global_roundtrip(_o, v):
        """Global stencil with block<->global transposes — what a
        non-block iteration's matvec+layout would cost."""
        xg = blk.from_block(v)
        yg = gop.matvec(xg)
        return blk.to_block(yg)

    rows = [
        ("solve fold=explicit", solve_fold_explicit, fac, xf),
        ("solve fold=linear_transpose", solve_fold_lt, fac, xf),
        ("matvec block st_ext", mv_block, blk, xf),
        ("matvec global+2transposes", mv_global_roundtrip, None, xf),
    ]
    for name, step, op, v in rows:
        t = per_step(step, op, v)
        print(f"{name:30s} {t * 1e3:9.3f} ms", flush=True)


if __name__ == "__main__":
    main()
