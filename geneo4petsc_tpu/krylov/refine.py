"""Mixed-precision iterative refinement around the f32 Krylov hot path.

The reference runs fully in PETSc doubles.  On TPU the fast path is f32
(MXU) while f64 is software-emulated, so the idiomatic way to reach tight
tolerances (1e-8 true residual) is inner f32 preconditioned Krylov +
outer f64 residual refinement: classic mixed-precision IR, with the f64
residual computed either on-device (emulated, still cheap — one SpMV per
outer step) or host-side through the assembled CSR.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from .cg import cg_solve
from .gmres import gmres_solve

# Module-level jitted helpers, NOT function-local: a fresh ``jax.jit``
# wrapper per call re-traces and re-loads its executable through the
# backend's compile service on every invocation — on tunneled TPU
# platforms each load is an RPC costing ~seconds, and the "steady
# state" solve was paying it again (measured: 4.6 s solve wall at 1M
# AND 10M DOF, size-independent => pure service overhead).  A shared
# wrapper hits jax's in-process trace cache after the first call per
# (pytree structure, shapes) and dispatches in microseconds.


@jax.jit
def op_matvec(op, x):
    """Shared jitted ``op.matvec(x)`` (rhs builds, truth matvecs)."""
    return op.matvec(x)


@jax.jit
def _norm64_safe(r):
    """Overflow-safe 2-norm for TPU-emulated f64: the double-double
    emulation inherits float32's EXPONENT range, so sum-of-squares
    overflows (-> NaN, measured on v5e) once entries pass ~1.3e19 —
    which the bench's 1e8-BC-penalty operators reach in the residual of
    any poor initial guess.  Scale by the nearest power of two >= max|r|
    (exact in binary fp: the scaled norm is bit-equivalent where the
    naive one does not overflow), returning (norm, scale)."""
    m = jnp.max(jnp.abs(r))
    s = jnp.exp2(jnp.ceil(jnp.log2(jnp.maximum(m, 1e-30))))
    s = jnp.where(m > 0, s, 1.0)
    return jnp.linalg.norm(r * (1.0 / s)) * s, s


@jax.jit
def _residual64(op, b, x):
    r = b - op.matvec(x)
    rn, s = _norm64_safe(r)
    return r, rn, s


@jax.jit
def _rescale_x0(b, r, x0):
    """Salvage a PATHOLOGICAL initial guess (first residual >= ||b|| or
    non-finite) by the optimal line scaling alpha = argmin ||b - a A
    x0|| = <b, A x0> / ||A x0||^2, with overflow-safe scaled dots and
    A x0 recovered as b - r (no extra matvec).  A deflation guess from a
    junk-contaminated coarse space can be orders of magnitude too LARGE
    (measured |Q b| ~ 2e11 vs the 1e7-scale solution at the 10M bench);
    alpha = 0 is in the feasible set, so the rescaled start is never
    worse than x = 0 — and if r itself is non-finite every guard below
    collapses alpha to exactly 0 (the plain x = 0 restart).  Healthy
    guesses (rel < 1) are left untouched so their trajectories stay
    bit-stable.  PETSc's nonzero-initial-guess contract has no such
    hazard because its Q is MUMPS-exact."""
    ax = b - r
    _, sa = _norm64_safe(ax)
    _, sb = _norm64_safe(b)
    axs = ax * (1.0 / sa)
    num = jnp.vdot(axs, b * (1.0 / sb))
    den = jnp.vdot(axs, axs)
    alpha = jnp.where(den > 0, num / den * (sb / sa), 0.0)
    alpha = jnp.where(jnp.isfinite(alpha), alpha, 0.0)
    r2 = b - alpha * ax
    rn, s = _norm64_safe(r2)
    return alpha * x0, r2, rn, s


@jax.jit
def _update64(x, dx, s):
    return x + dx.astype(x.dtype) * s


@jax.jit
def _scale32(r, s):
    """(r / s) cast to f32 — the power-of-two scaling is exact, so the
    inner Krylov trajectory is bit-identical to the unscaled one
    wherever the unscaled one stayed finite (CG is scale-equivariant),
    while huge residuals stay inside f32 range."""
    return (r * (1.0 / s)).astype(jnp.float32)


@dataclass
class RefinedResult:
    x: np.ndarray
    outer_its: int
    inner_its: int
    true_res: float
    converged: bool
    history: list


def make_inner_solver(matvec32: Callable, pc_apply32: Callable | None,
                      inner_rtol: float = 1e-6, inner_max_it: int = 2000,
                      ksp_type: str = "cg") -> Callable:
    """Build (and jit once) the inner f32 Krylov correction solver; reuse
    it across refined_solve calls to amortize compilation."""
    del inner_rtol  # the per-call rtol is a traced argument (adaptivity)
    if ksp_type == "cg":
        def inner(r32, rtol):
            return cg_solve(matvec32, r32, pc_apply32, rtol=rtol,
                            max_it=inner_max_it)
    else:
        def inner(r32, rtol):
            return gmres_solve(matvec32, r32, pc_apply32, rtol=rtol,
                               max_it=inner_max_it)
    return jax.jit(inner)


@functools.lru_cache(maxsize=None)
def _pc_inner_jit(eff: bool, ksp_type: str, inner_max_it: int):
    """One shared jitted inner solver per (eff, ksp, max_it) config —
    cached so repeated solves reuse the same wrapper (see module note)."""
    if ksp_type == "cg":
        @jax.jit
        def inner(pc_a, r32, rtol):
            x0 = pc_a.apply_q(r32).astype(r32.dtype) if eff else None
            return cg_solve(pc_a.batch.matvec, r32, pc_a.apply, x0=x0,
                            rtol=rtol, max_it=inner_max_it, stall_its=50)
    else:
        @jax.jit
        def inner(pc_a, r32, rtol):
            x0 = pc_a.apply_q(r32).astype(r32.dtype) if eff else None
            return gmres_solve(pc_a.batch.matvec, r32, pc_a.apply, x0=x0,
                               rtol=rtol, max_it=inner_max_it)
    return inner


def make_pc_inner_solver(pc, inner_max_it: int = 2000,
                         ksp_type: str = "cg"):
    """Inner solver with the preconditioner passed as a traced jit ARGUMENT.

    Closing a jit over the preconditioner pytree embeds its arrays as
    constants, which XLA then constant-folds — compile time blows up with
    operator size (catastrophic on tunneled TPU compile services).  Keeping
    the pytree an argument compiles shape-polymorphically in seconds and
    lets one executable serve any same-shape operator."""
    # efficient-hybrid contract (E-variants, hdr/geneo.hpp:21-23): every
    # solve must start from the deflated guess X0 = Q B — here per outer
    # correction, x0_k = Q r_k — or the simplified apply (which drops the
    # (I - P^T) projection) is not equivalent to the full hybrid one
    eff = bool(getattr(pc, "eff_hybrid", False))
    inner = _pc_inner_jit(eff, ksp_type, int(inner_max_it))
    return lambda r32, rtol: inner(pc, r32, rtol)


def refined_solve_device(op64, b64, inner_solver: Callable,
                         tol: float = 1e-8, inner_rtol: float = 1e-5,
                         max_outer: int = 14,
                         x0=None) -> RefinedResult:
    """Device-resident mixed-precision refinement.

    Same algorithm as refined_solve, but x/r/b live ON the accelerator in
    (emulated) float64 and the truth residual is one f64 matvec per outer
    step — the only host traffic is two scalars per outer pass.  On
    tunneled TPU platforms this removes the dominant solve-phase cost
    (measured at 10M DOF: ~20 s/outer of device->host x pulls + ~14 s of
    host CSR residuals vs <1 s on device).  Requires jax x64 to be
    enabled; the f32 Krylov hot path is unaffected (dtypes are explicit).

    op64: an f64 operator PYTREE exposing ``.matvec`` (GlobalStencil,
    SubdomainBatch, ...).  It is passed as a traced jit argument — closing
    a jit over a multi-MB operator embeds it as HLO constants, which both
    constant-folds at compile time and overflows remote compile-service
    request limits (observed: HTTP 413 at 10M DOF).

    inner_rtol floors at 1e-5 (not 1e-6): the f32 preconditioned-residual
    floor is problem-scaled, and an unreachable inner target makes CG
    burn its full max_it at the floor (measured: 10k wasted its on a 36^3
    high-contrast case); extra f64 outer passes are far cheaper.
    """
    import jax as _jax

    if not _jax.config.jax_enable_x64:
        raise RuntimeError("refined_solve_device requires jax_enable_x64")
    b64 = jnp.asarray(b64, jnp.float64)
    bnorm_j, bscale = _norm64_safe(b64)
    bnorm = float(bnorm_j)
    _residual, _update = _residual64, _update64

    x = jnp.zeros_like(b64) if x0 is None else jnp.asarray(x0, jnp.float64)
    inner_total = 0
    history = []
    converged = False
    best_x, best_rel = x, np.inf
    for outer in range(max_outer):
        if outer == 0 and x0 is None:
            # x = 0 -> r = b exactly: skip one emulated-f64 truth matvec
            # (they are the dominant per-outer cost at scale)
            r, rel, rs = b64, 1.0, bscale
        else:
            r, rn, rs = _residual(op64, b64, x)
            rel = float(rn) / bnorm
        if outer == 0 and x0 is not None and (
                not np.isfinite(rel) or rel >= 1.0):
            # pathological deflation guess: rescale to the line optimum
            # (alpha = 0 recovers the plain x = 0 restart; healthy
            # guesses never enter here, keeping their runs bit-stable)
            x, r, rn, rs = _rescale_x0(b64, r, x)
            rel = float(rn) / bnorm
            if not np.isfinite(rel) or rel > 0.99:
                # a rescaled guess that buys < 1% is junk dressed up:
                # its residual carries poorly-preconditioned coarse-junk
                # components that cost MORE inner iterations than the
                # clean r = b start saves (measured at the 10M bench:
                # 180 inner its from the alpha start vs 133 from zero)
                x = jnp.zeros_like(b64)
                r, rel, rs = b64, 1.0, bscale
        history.append(rel)
        if np.isfinite(rel) and rel < best_rel:
            best_x, best_rel = x, rel
        if rel <= tol:
            converged = True
            break
        if not np.isfinite(rel):
            # the inner correction diverged hard (indefinite PC, PETSc
            # KSP_DIVERGED_INDEFINITE_PC analogue): keep the best finite
            # iterate instead of compounding garbage updates
            break
        need = 0.3 * tol / rel
        rtol_k = float(np.clip(need, inner_rtol, 0.499))
        res = inner_solver(_scale32(r, rs), jnp.float32(rtol_k))
        inner_total += int(res.its)
        x = _update(x, res.x, rs)
    else:
        outer = max_outer
        _r, rn, _rs = _residual(op64, b64, x)
        rel = float(rn) / bnorm
        history.append(rel)
        if np.isfinite(rel) and rel < best_rel:
            best_x, best_rel = x, rel
        converged = rel <= tol

    if not converged and np.isfinite(best_rel):
        x, rel_out = best_x, best_rel
    else:
        rel_out = history[-1]
    return RefinedResult(x=x, outer_its=outer, inner_its=inner_total,
                         true_res=float(rel_out), converged=converged,
                         history=history)


def refined_solve(matvec32: Callable, pc_apply32: Callable | None,
                  b: np.ndarray,
                  residual64: Callable[[np.ndarray], np.ndarray],
                  tol: float = 1e-8,
                  inner_rtol: float = 1e-6,
                  inner_max_it: int = 2000,
                  max_outer: int = 14,
                  ksp_type: str = "cg",
                  x0: np.ndarray | None = None,
                  inner_solver: Callable | None = None) -> RefinedResult:
    """Solve A x = b to ||b - A x|| / ||b|| <= tol (f64 truth).

    matvec32 / pc_apply32: jit-compiled f32 device functions.
    residual64(x) -> b - A x in float64 (host CSR or device f64 SpMV).
    inner_solver: optional prebuilt solver from make_inner_solver.
    """
    b = np.asarray(b, np.float64)
    bnorm = np.linalg.norm(b)
    x = np.zeros_like(b) if x0 is None else np.asarray(x0, np.float64)

    inner_j = inner_solver or make_inner_solver(
        matvec32, pc_apply32, inner_rtol, inner_max_it, ksp_type)

    import os as _os
    import sys as _sys
    import time as _time
    _dbg = _os.environ.get("REFINE_VERBOSE") == "1"
    inner_total = 0
    history = []
    converged = False
    best_x, best_rel = x, np.inf
    for outer in range(max_outer):
        _t0 = _time.perf_counter()
        r = residual64(x)
        rel = np.linalg.norm(r) / bnorm
        _t1 = _time.perf_counter()
        history.append(rel)
        if np.isfinite(rel) and rel < best_rel:
            best_x, best_rel = x, rel
        if rel <= tol:
            converged = True
            break
        if not np.isfinite(rel):
            # diverged inner correction (indefinite PC): stop compounding
            break
        # adaptive inner tolerance: only ask the f32 solve for the reduction
        # still needed (with safety margin), floored at the f32-roundoff
        # limit — avoids re-converging to the floor on every outer pass
        need = 0.3 * tol / rel
        rtol_k = float(np.clip(need, inner_rtol, 0.499))
        # power-of-two pre-scaling, mirroring refined_solve_device's
        # _scale32 BIT-FOR-BIT: the two refinement drivers must hand the
        # inner f32 solver the same numbers or their iteration counts
        # drift apart (tests/test_multiprocess.py pins host-vs-device
        # parity); it also keeps 1e16-scale residuals inside f32 range
        rmax = float(np.max(np.abs(r)))
        rs = float(2.0 ** np.ceil(np.log2(max(rmax, 1e-30)))) \
            if rmax > 0 else 1.0
        res = inner_j(jnp.asarray(r * (1.0 / rs), jnp.float32),
                      jnp.float32(rtol_k))
        its_k = int(res.its)
        _t2 = _time.perf_counter()
        inner_total += its_k
        x = x + np.asarray(res.x, np.float64) * rs
        if _dbg:
            print(f"[refine {outer}] res64 {_t1 - _t0:.2f}s  inner "
                  f"{_t2 - _t1:.2f}s ({its_k} its)  pull+add "
                  f"{_time.perf_counter() - _t2:.2f}s  rel={rel:.2e}",
                  file=_sys.stderr, flush=True)
    else:
        outer = max_outer
        r = residual64(x)
        rel = np.linalg.norm(r) / bnorm
        history.append(rel)
        if np.isfinite(rel) and rel < best_rel:
            best_x, best_rel = x, rel
        converged = rel <= tol

    if not converged and np.isfinite(best_rel):
        x, rel_out = best_x, best_rel
    else:
        rel_out = history[-1]
    return RefinedResult(x=x, outer_its=outer, inner_its=inner_total,
                         true_res=float(rel_out), converged=converged,
                         history=history)
