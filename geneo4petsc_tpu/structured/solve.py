"""End-to-end structured solve driver — the large-scale (10M+ DOF) path.

The structured twin of solver.solve_mesh: grid build -> box decomposition
-> FDM/stencil GenEO setup -> mixed-precision refined CG to the true-f64
tolerance (the reference runs PETSc doubles end-to-end; on TPU the
idiomatic equivalent is f32 Krylov + f64 outer refinement, krylov/refine).
Host memory is O(N) fields (no element lists, no CSR); device memory is
O(N) vectors + O(n_dom L^2) FDM factors + the coarse space.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from ..config import GenEOOptions, KSPOptions
from ..krylov.cg import cg_solve
from ..krylov.gmres import gmres_solve
from ..krylov.refine import RefinedResult, refined_solve
from ..precond.geneo import GenEOStats
from ..utils.timers import Timers
from .decompose import StructuredDecomposition
from .geneo import StructuredGenEO, setup_structured
from .grid import StructuredGrid, laplacian_grid


@dataclass
class StructuredSolveOutput:
    refined: RefinedResult
    x: np.ndarray
    b: np.ndarray
    pc_name: str
    stats: GenEOStats
    timers: Timers
    true_res: float
    n_dof: int
    n_dom: int
    pc: StructuredGenEO

    @property
    def converged(self) -> bool:
        return self.refined.converged

    @property
    def its(self) -> int:
        return self.refined.inner_its


def make_structured_inner(pc: StructuredGenEO, inner_max_it: int = 2000,
                          ksp_type: str = "cg"):
    """Inner f32 Krylov correction solver with the preconditioner as a
    traced jit ARGUMENT (never close a jit over operator pytrees —
    constant folding blows compile time; see krylov/refine)."""
    eff = bool(pc.eff_hybrid)
    solver = cg_solve if ksp_type == "cg" else gmres_solve
    # inner correction solves stop on stagnation: the f32 residual floor
    # is problem-scaled, and the f64 outer loop owns true convergence
    extra = {"stall_its": 50} if ksp_type == "cg" else {}

    @jax.jit
    def inner(pc_a, r32, rtol):
        # the refinement loop hands over f32 residuals; run the Krylov
        # iteration in the preconditioner's own dtype (an f64 pc would
        # otherwise promote the while_loop carry mid-iteration)
        r32 = r32.astype(pc_a.pou.dtype)
        x0 = pc_a.apply_q(r32).astype(r32.dtype) if eff else None
        return solver(pc_a.matvec, r32, pc_a.apply, x0=x0,
                      rtol=rtol, max_it=inner_max_it, **extra)

    return lambda r32, rtol: inner(pc, r32, rtol)


def solve_structured(grid: StructuredGrid, dom_grid, overlap: int,
                     geneo: GenEOOptions | None = None,
                     ksp: KSPOptions | None = None,
                     tol: float = 1e-8, dtype=jnp.float32,
                     timers: Timers | None = None,
                     device_refine: bool | None = None
                     ) -> StructuredSolveOutput:
    """device_refine (default: auto — accelerator backend with x64 on):
    keep x/b/r on the accelerator in emulated f64 and compute the truth
    residual with the device stencil — two scalars of host traffic per
    outer pass instead of an 80 MB round trip (the tunneled-TPU wall)."""
    geneo = geneo or GenEOOptions()
    ksp = ksp or KSPOptions()
    timers = timers or Timers()
    if device_refine is None:
        device_refine = (jax.default_backend() != "cpu"
                         and bool(jax.config.jax_enable_x64))

    t0 = time.perf_counter()
    sd = StructuredDecomposition(grid, tuple(dom_grid), overlap)
    timers.add("partition", time.perf_counter() - t0)

    t0 = time.perf_counter()
    if device_refine:
        from .grid import global_stencil
        from ..krylov.refine import refined_solve_device
        gop64 = global_stencil(grid, jnp.float64)
        n = grid.n_nodes
        x_true = jnp.arange(1.0, n + 1, dtype=jnp.float64)
        # operator as a traced argument (closure constants overflow the
        # remote compile service at scale)
        b = jax.jit(lambda g, x: g.matvec(x))(gop64, x_true)
        jax.block_until_ready(b)
    else:
        _x_true, b = grid.manufactured_rhs()
    timers.add("createA", time.perf_counter() - t0)

    t0 = time.perf_counter()
    pc, stats = setup_structured(sd, geneo, b=jnp.asarray(b, dtype),
                                 dtype=dtype, timers=timers)
    jax.block_until_ready(pc.l1.p)
    timers.add("setup", time.perf_counter() - t0)

    t0 = time.perf_counter()
    # cap the inner correction solves: a stalled-at-the-f32-floor inner
    # must not burn 10k iterations — outer f64 passes pick up the slack
    inner = make_structured_inner(
        pc, inner_max_it=int(min(ksp.max_it, 2000)),
        ksp_type=ksp.type if ksp.type in ("cg", "gmres") else "cg")
    if device_refine:
        ref = refined_solve_device(
            gop64, b, inner, tol=tol,
            x0=pc.x0.astype(jnp.float64) if geneo.eff_hybrid else None)
        true_res = ref.true_res
        x_out = ref.x
    else:
        ref = refined_solve(
            None, None, b, residual64=lambda x: b - grid.matvec(x),
            tol=tol, inner_solver=inner,
            ksp_type=ksp.type if ksp.type in ("cg", "gmres") else "cg",
            x0=np.asarray(pc.x0, np.float64) if geneo.eff_hybrid else None)
        bn = np.linalg.norm(b)
        true_res = float(np.linalg.norm(b - grid.matvec(ref.x)) / bn)
        x_out = ref.x
    timers.add("solve", time.perf_counter() - t0)

    return StructuredSolveOutput(
        refined=ref, x=x_out, b=b, pc_name=geneo.name, stats=stats,
        timers=timers, true_res=true_res, n_dof=grid.n_nodes,
        n_dom=sd.n_dom, pc=pc)


def laplacian_structured(size: int, dim: int = 3, kappa_max: float = 1.0,
                         interp: str = "", inp_eps: float = 0.0001,
                         weak_scaling: int = 1) -> StructuredGrid:
    """Convenience re-export of the vectorized problem builder."""
    return laplacian_grid(size, dim=dim, kappa_max=kappa_max,
                          interp=interp, inp_eps=inp_eps,
                          weak_scaling=weak_scaling)
