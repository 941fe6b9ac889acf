"""Batched ILU(0) on dense-stored blocks with a sparsity-pattern mask.

PETSc's PCBJACOBI factors each diagonal block with ILU(0) by default — the
reference's `-pc_type bjacobi` comparison PC uses exactly that.  The TPU
formulation: blocks live as padded dense [n_blocks, n, n] arrays plus a
boolean pattern mask; the incomplete factorization is a fori_loop of
batched masked rank-1 updates (right-looking IKJ), and the triangular
solves are fori_loops of batched masked dot products.  All ops vectorize
over the block axis; the sequential dimension is the (small) block size.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def ilu0_factor(a: jax.Array, pattern: jax.Array) -> jax.Array:
    """Batched ILU(0): returns the in-place LU factors (unit lower L below
    the diagonal, U on/above), restricted to `pattern` [b, n, n] bool."""
    n = a.shape[-1]
    a = jnp.where(pattern, a, 0.0)
    idx = jnp.arange(n)

    def step(k, acc):
        akk = acc[:, k, k][:, None]
        below = (idx > k)[None, :] & pattern[:, :, k]
        lcol = jnp.where(below, acc[:, :, k] / akk, 0.0)
        acc = acc.at[:, :, k].set(jnp.where(below, lcol, acc[:, :, k]))
        urow = acc[:, k, :] * (idx > k)[None, :]
        upd = lcol[:, :, None] * urow[:, None, :]
        return acc - jnp.where(pattern, upd, 0.0)

    return jax.lax.fori_loop(0, n - 1, step, a)


@jax.jit
def ilu0_solve(lu: jax.Array, pattern: jax.Array, b: jax.Array) -> jax.Array:
    """Solve (L U) x = b per block with the ILU(0) factors."""
    n = lu.shape[-1]
    idx = jnp.arange(n)
    l_strict = jnp.where(pattern & (idx[:, None] > idx[None, :])[None],
                         lu, 0.0)
    u_full = jnp.where(pattern & (idx[:, None] <= idx[None, :])[None],
                       lu, 0.0)

    def fwd(i, y):
        s = jnp.einsum("bj,bj->b", l_strict[:, i, :], y)
        return y.at[:, i].set(b[:, i] - s)

    y = jax.lax.fori_loop(0, n, fwd, jnp.zeros_like(b))

    def bwd(t, x):
        i = n - 1 - t
        s = jnp.einsum("bj,bj->b", u_full[:, i, :], x)
        diag = u_full[:, i, i]
        return x.at[:, i].set((y[:, i] - s) / jnp.where(diag != 0, diag, 1.0))

    return jax.lax.fori_loop(0, n, bwd, jnp.zeros_like(b))
