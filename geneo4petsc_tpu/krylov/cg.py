"""Preconditioned conjugate gradients with PETSc KSPCG semantics.

Left-preconditioned PCG; norm_type selects the convergence quantity
(PETSc KSPSolve_CG):
  * "preconditioned"   -> ||z||_2 = ||M^-1 r||_2   (PETSc default)
  * "unpreconditioned" -> ||r||_2
  * "natural"          -> sqrt(r . z)

Guards mirror PETSc: r.z < 0 -> KSP_DIVERGED_INDEFINITE_PC,
p.Ap <= 0 -> KSP_DIVERGED_INDEFINITE_MAT.  Supports nonzero initial guess
(KSPSetInitialGuessNonzero contract, hdr/geneo.hpp:21-23).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from . import common as cm


def cg_solve(matvec: Callable, b: jax.Array,
             pc_apply: Callable | None = None,
             x0: jax.Array | None = None,
             rtol: float = 1e-5, atol: float = 1e-50, dtol: float = 1e4,
             max_it: int = 10000,
             norm_type: str = "preconditioned",
             stall_its: int | None = None,
             flexible: bool = False) -> cm.SolveResult:
    """stall_its (OFF by default — PETSc has no stagnation test): exit
    with CONVERGED_STEP_LENGTH when the residual norm has not improved
    for `stall_its` consecutive iterations.  Used by the mixed-precision
    refinement drivers, where the f32 roundoff floor is problem-scaled
    and an unreachable rtol would otherwise burn max_it iterations at the
    floor (the f64 outer loop owns true convergence).

    flexible: Polak-Ribiere beta (flexible CG / KSPPIPEFCG family) —
    beta = z_{k+1}.(r_{k+1} - r_k) / z_k.r_k instead of Fletcher-Reeves.
    Mathematically identical for a FIXED SPD preconditioner; required for
    convergence when the preconditioner varies between applications
    (inexact Schwarz: the structured backend's PCG local solves,
    structured/solvers.py — the reference's MUMPS solves are exact so
    PETSc runs plain CG, geneo.cpp:94-124)."""
    dtype = b.dtype
    if pc_apply is None:
        pc_apply = lambda v: v
    if x0 is None:
        x0 = jnp.zeros_like(b)

    # KSPConvergedDefault rtol scale: ||M b|| (preconditioned norm, default),
    # ||b|| (unpreconditioned), sqrt(b . M b) (natural).
    if norm_type == "unpreconditioned":
        bnorm = jnp.linalg.norm(b)
    elif norm_type == "natural":
        bnorm = jnp.sqrt(jnp.abs(jnp.vdot(b, pc_apply(b))))
    else:
        bnorm = jnp.linalg.norm(pc_apply(b))
    eps0 = jnp.asarray(0.0, dtype)

    r0 = b - matvec(x0)
    z0 = pc_apply(r0)
    rz0 = jnp.vdot(r0, z0)

    def res_norm(r, z, rz):
        if norm_type == "unpreconditioned":
            return jnp.linalg.norm(r)
        if norm_type == "natural":
            return jnp.sqrt(jnp.abs(rz))
        return jnp.linalg.norm(z)

    rnorm0 = res_norm(r0, z0, rz0)
    history = jnp.full(max_it + 1, jnp.nan, dtype)
    history = history.at[0].set(rnorm0)
    reason0 = cm.converged_default(rnorm0, bnorm, 0, rtol, atol, dtol, max_it)
    # PETSc checks the indefinite-PC guard before the first iteration too
    reason0 = jnp.where((rz0 < eps0) & (reason0 == 0),
                        cm.DIVERGED_INDEFINITE_PC, reason0)

    def cond(state):
        reason = state[6]
        return reason == cm.CONVERGED_ITERATING

    def body(state):
        x, r, z, p, rz, it, reason, rnorm, hist, best, since = state
        w = matvec(p)
        pw = jnp.vdot(p, w)
        alpha = rz / pw
        x = x + alpha * p
        r_old = r
        r = r - alpha * w
        z2 = pc_apply(r)
        rz2 = jnp.vdot(r, z2)
        it = it + 1
        rn = res_norm(r, z2, rz2)
        hist = hist.at[it].set(rn)
        reason = cm.converged_default(rn, bnorm, it, rtol, atol, dtol,
                                      max_it, rnorm0=rnorm0)
        reason = jnp.where((pw <= eps0) & (reason == 0),
                           cm.DIVERGED_INDEFINITE_MAT, reason)
        reason = jnp.where((rz2 < eps0) & (reason == 0),
                           cm.DIVERGED_INDEFINITE_PC, reason)
        if stall_its is not None:
            # 1% improvement resets the window: genuine convergence beats
            # this easily (even factor-0.99-per-50-its would be ~60k its
            # to 1e-5), while a roundoff-floor bounce does not
            improved = rn < 0.99 * best
            since = jnp.where(improved, jnp.int32(0), since + 1)
            best = jnp.minimum(best, rn)
            reason = jnp.where((since >= stall_its) & (reason == 0),
                               cm.CONVERGED_STEP_LENGTH, reason)
        if flexible:
            beta = (rz2 - jnp.vdot(r_old, z2)) / rz
        else:
            beta = rz2 / rz
        p = z2 + beta * p
        return x, r, z2, p, rz2, it, reason, rn, hist, best, since

    state0 = (x0, r0, z0, z0, rz0, jnp.int32(0), reason0, rnorm0, history,
              rnorm0, jnp.int32(0))
    x, _, _, _, _, it, reason, rnorm, hist, _, _ = jax.lax.while_loop(
        cond, body, state0)
    return cm.SolveResult(x=x, its=it, reason=reason, rnorm=rnorm,
                          history=hist)
