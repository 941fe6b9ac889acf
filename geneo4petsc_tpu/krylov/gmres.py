"""Restarted GMRES with PETSc KSPGMRES semantics (the reference's default
outer solver — the driver leaves KSP type at the PETSc default, gmres,
restart 30, left preconditioning, preconditioned residual norm).

Arnoldi is blocked classical Gram-Schmidt with one re-orthogonalization pass
(CGS2): two [m+1, n] matmuls per step — the MXU-friendly formulation (MGS
would be n-vector-at-a-time and bandwidth-bound).  Rows of V beyond the
current Krylov dimension are kept zero, so full-basis matmuls are exact;
the convergence test runs on |g[k+1]| (the Givens-updated residual norm),
checked at every inner step and at each restart entry, exactly like
KSPGMRESCycle.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from . import common as cm


def gmres_solve(matvec: Callable, b: jax.Array,
                pc_apply: Callable | None = None,
                x0: jax.Array | None = None,
                rtol: float = 1e-5, atol: float = 1e-50, dtol: float = 1e4,
                max_it: int = 10000, restart: int = 30,
                norm_type: str = "preconditioned") -> cm.SolveResult:
    del norm_type  # left-preconditioned norm (PETSc gmres default)
    dtype = b.dtype
    n = b.shape[0]
    m = restart
    if pc_apply is None:
        pc_apply = lambda v: v
    if x0 is None:
        x0 = jnp.zeros_like(b)

    # KSPConvergedDefault scales rtol by ||M b||_2 when the norm type is
    # preconditioned (regardless of nonzero initial guess, unless UIRNorm is
    # requested — the reference never does).
    bnorm = jnp.linalg.norm(pc_apply(b))

    history0 = jnp.full(max_it + 1, jnp.nan, dtype)

    def outer_cond(state):
        _, _, reason, _, _, _ = state
        return reason == cm.CONVERGED_ITERATING

    def outer_body(state):
        x, it, reason, rnorm, hist, rnorm0 = state
        r = pc_apply(b - matvec(x))
        beta = jnp.linalg.norm(r)
        rnorm0 = jnp.where(it == 0, beta, rnorm0)
        hist = hist.at[it].set(beta)
        reason = cm.converged_default(beta, bnorm, it, rtol, atol, dtol,
                                      max_it, rnorm0=rnorm0)

        V = jnp.zeros((m + 1, n), dtype)
        V = V.at[0].set(jnp.where(beta > 0, r / beta, 0))
        H = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros(m, dtype)
        sn = jnp.zeros(m, dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(beta)

        def inner_cond(istate):
            k, _, _, _, _, _, it_, reason_, _, _ = istate
            return (k < m) & (reason_ == cm.CONVERGED_ITERATING)

        def inner_body(istate):
            k, V, H, cs, sn, g, it_, reason_, rnorm_, hist_ = istate
            del rnorm_
            w = pc_apply(matvec(V[k]))
            wnorm0 = jnp.linalg.norm(w)
            # CGS2: rows of V beyond k are zero so full matmuls are exact
            h1 = V @ w
            w = w - V.T @ h1
            h2 = V @ w
            w = w - V.T @ h2
            h = h1 + h2
            hk1 = jnp.linalg.norm(w)
            happy = hk1 <= 1e-14 * wnorm0
            V2 = V.at[k + 1].set(jnp.where(happy, 0.0, 1.0)
                                 * jnp.where(hk1 > 0, w / jnp.where(hk1 > 0, hk1, 1.0), 0.0))

            # apply the k previous Givens rotations to the new column
            col = h.at[k + 1].set(hk1)

            def rot_body(j, c):
                t = cs[j] * c[j] + sn[j] * c[j + 1]
                c = c.at[j + 1].set(-sn[j] * c[j] + cs[j] * c[j + 1])
                return c.at[j].set(t)

            col = jax.lax.fori_loop(0, k, rot_body, col)
            denom = jnp.sqrt(col[k] ** 2 + col[k + 1] ** 2)
            denom = jnp.where(denom > 0, denom, 1.0)
            ck = col[k] / denom
            sk = col[k + 1] / denom
            col = col.at[k].set(ck * col[k] + sk * col[k + 1])
            col = col.at[k + 1].set(0.0)
            cs2 = cs.at[k].set(ck)
            sn2 = sn.at[k].set(sk)
            g2 = g.at[k + 1].set(-sk * g[k])
            g2 = g2.at[k].set(ck * g[k])
            H2 = H.at[:, k].set(col)

            it2 = it_ + 1
            rn = jnp.abs(g2[k + 1])
            hist_ = hist_.at[it2].set(rn)
            reason2 = cm.converged_default(rn, bnorm, it2, rtol, atol,
                                           dtol, max_it, rnorm0=rnorm0)
            reason2 = jnp.where(happy & (reason2 == cm.CONVERGED_ITERATING),
                                cm.CONVERGED_HAPPY_BREAKDOWN, reason2)
            return k + 1, V2, H2, cs2, sn2, g2, it2, reason2, rn, hist_

        k, V, H, cs, sn, g, it, reason, rnorm, hist = jax.lax.while_loop(
            inner_cond, inner_body,
            (jnp.int32(0), V, H, cs, sn, g, it, reason, beta, hist))

        # solve the k x k least-squares system and update x;
        # empty columns (j >= k) get unit diagonal and zero rhs -> y_j = 0
        col_ids = jnp.arange(m)
        R = H[:m, :m] + jnp.diag(jnp.where(col_ids >= k, 1.0, 0.0).astype(dtype))
        rhs = jnp.where(col_ids < k, g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(R, rhs, lower=False)
        x = x + V[:m].T @ y
        return x, it, reason, rnorm, hist, rnorm0

    state0 = (x0, jnp.int32(0), jnp.int32(cm.CONVERGED_ITERATING),
              jnp.asarray(jnp.inf, dtype), history0,
              jnp.asarray(jnp.inf, dtype))
    x, it, reason, rnorm, hist, _ = jax.lax.while_loop(
        outer_cond, outer_body, state0)
    return cm.SolveResult(x=x, its=it, reason=reason, rnorm=rnorm,
                          history=hist)
