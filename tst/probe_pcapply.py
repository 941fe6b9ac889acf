"""Decompose the pc_apply wall (roofline r04: 18.7 ms = 47 GB/s at 10M
DOF, vs 2.4 ms for its FDM component) into its stages on the real chip:

  gather     = transpose (global [nz,ny,nx] -> block [g,g,g,i,i,i])
               + halo extension (pull pad layers from neighbors)
  l1         = batched FDM solve
  scatter    = linear transpose of gather

and measure layout alternatives:

  x_transpose   the 6-D block transpose alone
  x_extend      the halo extension alone (block-resident input)
  x_ext_slice   extension rewritten to move ONLY pad layers
  x_apply_blk   _local_solve with block-resident input/output (what a
                block-layout CG iteration would pay per apply)

Usage: python tst/probe_pcapply.py [size] [domg] [overlap]
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
    """Per-invocation device time by chain differencing (shape-preserving
    step)."""
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
    from geneo4petsc_tpu.structured.decompose import StructuredDecomposition
    from geneo4petsc_tpu.structured.fdm import dirichlet_axes, fdm_factor
    from geneo4petsc_tpu.structured.grid import global_stencil, laplacian_grid

    print(f"device: {jax.devices()[0]}", flush=True)
    grid = laplacian_grid(size, dim=3, kappa_max=10000.0, interp="minmax")
    sd = StructuredDecomposition(grid, (domg,) * 3, ov)
    gop = global_stencil(grid, jnp.float32)
    n = grid.n_nodes
    gs, dg, pad = grid.shape, sd.dom_grid, sd.pad
    print(f"n={n}, local={sd.local_shape}, pad={pad}", flush=True)

    x = jnp.arange(1.0, n + 1, dtype=jnp.float32) / n
    nx, ny, nz = gs
    gx, gy, gz = dg
    # block form WITHOUT halos [gz,gy,gx,iz,iy,ix]
    xblk = halo.halo_gather(x, gs, dg, (0, 0, 0))
    # overlapped local batch
    xb = halo.to_batch(halo.halo_gather(x, gs, dg, pad))
    fac = fdm_factor(dirichlet_axes(sd), dtype=jnp.float32)
    jax.block_until_ready((xblk, xb))

    def transpose_only(_o, v):
        b = halo.halo_gather(v.reshape(-1), gs, dg, (0, 0, 0))
        return b.reshape(v.shape)

    def gather_full(_o, v):
        b = halo.to_batch(halo.halo_gather(v.reshape(-1), gs, dg, pad))
        # shape-preserving for the chain: scatter back
        return halo.halo_scatter_add(
            halo.from_batch(b, dg), gs, dg, pad).reshape(v.shape)

    def extend_only(_o, v):
        b = v
        b = halo._extend_axis(b, gaxis=2, laxis=5, pad=pad[0])
        b = halo._extend_axis(b, gaxis=1, laxis=4, pad=pad[1])
        b = halo._extend_axis(b, gaxis=0, laxis=3, pad=pad[2])
        # crop back (shape-preserving)
        return b[:, :, :, pad[2]:b.shape[3] - pad[2],
                 pad[1]:b.shape[4] - pad[1], pad[0]:b.shape[5] - pad[0]]

    def ext_slice(blocks, gaxis, laxis, p):
        """Move ONLY the pad layers from the neighbor blocks."""
        if p == 0:
            return blocks
        g = blocks.shape[gaxis]
        nl = blocks.shape[laxis]
        lo_src = jax.lax.slice_in_dim(      # donors for the LOW halo
            jax.lax.slice_in_dim(blocks, 0, g - 1, axis=gaxis),
            nl - p, nl, axis=laxis)
        hi_src = jax.lax.slice_in_dim(      # donors for the HIGH halo
            jax.lax.slice_in_dim(blocks, 1, g, axis=gaxis),
            0, p, axis=laxis)
        zshape = list(lo_src.shape)
        zshape[gaxis] = 1
        z = jnp.zeros(zshape, blocks.dtype)
        lo_h = jnp.concatenate([z, lo_src], axis=gaxis)
        hi_h = jnp.concatenate([hi_src, z], axis=gaxis)
        return jnp.concatenate([lo_h, blocks, hi_h], axis=laxis)

    def extend_slice_only(_o, v):
        b = v
        b = ext_slice(b, 2, 5, pad[0])
        b = ext_slice(b, 1, 4, pad[1])
        b = ext_slice(b, 0, 3, pad[2])
        return b[:, :, :, pad[2]:b.shape[3] - pad[2],
                 pad[1]:b.shape[4] - pad[1], pad[0]:b.shape[5] - pad[0]]

    def fdm_only(f, v):
        return f.solve(v)

    def apply_blk(f, v):
        """Block-resident local solve: extend -> fdm -> fold halos back
        (transpose of extension) — the per-apply cost of a block-layout
        iteration."""
        b = ext_slice(v, 2, 5, pad[0])
        b = ext_slice(b, 1, 4, pad[1])
        b = ext_slice(b, 0, 3, pad[2])
        u = f.solve(halo.to_batch(b))
        ub = halo.from_batch(u, dg)
        t = jax.linear_transpose(
            lambda w: ext_slice(ext_slice(ext_slice(w, 2, 5, pad[0]),
                                          1, 4, pad[1]), 0, 3, pad[2]), v)
        (y,) = t(ub)
        return y

    # production block-mode pieces (structured/blockmode.py)
    from geneo4petsc_tpu.structured.blockmode import (
        BlockGenEO, build_block_mode, extend_blocks, fold_blocks)
    from geneo4petsc_tpu.structured.geneo import StructuredGenEO

    def apply_blk_fold(f, v):
        """extend -> fdm -> EXPLICIT fold (the production block apply)."""
        u = f.solve(halo.to_batch(extend_blocks(v, pad)))
        return fold_blocks(halo.from_batch(u, dg), pad)

    pc_min = StructuredGenEO(
        grid_shape=gs, dom_grid=dg, pad=pad, local_shape=sd.local_shape,
        lvl1="ASM", lvl2=0, hybrid=False, eff_hybrid=False, dim_e=0,
        k_max=0, gop=gop, l1=fac, pou=None,
        maskf=jnp.ones((domg ** 3,) + tuple(sd.local_shape[::-1]),
                       jnp.float32),
        z=None, colids=None, e_evecs=None, e_eig_inv=None,
        x0=jnp.zeros(n, jnp.float32))
    blk = build_block_mode(pc_min, sd, dtype=jnp.float32)
    xflat_blk = blk.to_block(x)
    jax.block_until_ready(xflat_blk)

    def matvec_block(b_, v):
        return b_.matvec(v)

    def apply_block_full(b_, v):
        return b_.apply(v)

    def apply_global(f, v):
        b = halo.to_batch(halo.halo_gather(v.reshape(-1), gs, dg, pad))
        u = f.solve(b)
        return halo.halo_scatter_add(
            halo.from_batch(u, dg), gs, dg, pad).reshape(v.shape)

    def matvec(_o, v):
        return gop.matvec(v.reshape(-1)).reshape(v.shape)

    gb_blk = xblk.nbytes / 1e9
    gb_loc = xb.nbytes / 1e9
    rows = [
        ("matvec (global)", matvec, None, x, 6 * n * 4 / 1e9),
        ("transpose only", transpose_only, None, x, 2 * n * 4 / 1e9),
        ("gather+scatter (global)", gather_full, None, x,
         2 * (n * 4 / 1e9 + gb_loc)),
        ("extend only (concat impl)", extend_only, None, xblk, 2 * gb_blk),
        ("extend only (slice impl)", extend_slice_only, None, xblk,
         2 * gb_blk),
        ("fdm solve", fdm_only, fac, xb, 14 * gb_loc),
        ("local_solve (global io)", apply_global, fac, x,
         2 * (n * 4 / 1e9 + gb_loc) + 14 * gb_loc),
        ("local_solve (block io)", apply_blk, fac, xblk,
         2 * gb_blk + 14 * gb_loc),
        ("local_solve (explicit fold)", apply_blk_fold, fac, xblk,
         2 * gb_blk + 14 * gb_loc),
        ("matvec (block st_ext)", matvec_block, blk, xflat_blk,
         6 * n * 4 / 1e9),
        ("pc.apply (block mode)", apply_block_full, blk, xflat_blk,
         2 * gb_blk + 14 * gb_loc),
    ]
    for name, step, op, v, gb in rows:
        t = per_step(step, op, v)
        print(f"{name:28s} {t * 1e3:9.3f} ms  "
              f"({gb / t:7.1f} GB/s analytic)", flush=True)


if __name__ == "__main__":
    main()
