"""End-to-end structured solve driver — the large-scale (10M+ DOF) path.

The structured twin of solver.solve_mesh: grid build -> box decomposition
-> FDM/stencil GenEO setup -> mixed-precision refined CG to the true-f64
tolerance (the reference runs PETSc doubles end-to-end; on TPU the
idiomatic equivalent is f32 Krylov + f64 outer refinement, krylov/refine).
Host memory is O(N) fields (no element lists, no CSR); device memory is
O(N) vectors + O(n_dom L^2) FDM factors + the coarse space.
"""

from __future__ import annotations

import functools
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


@functools.lru_cache(maxsize=None)
def _structured_inner_jit(eff: bool, ksp_type: str, flexible: bool,
                          inner_max_it: int):
    """One shared jitted inner solver per config: a fresh ``jax.jit``
    wrapper per solve re-loads its executable through the compile
    service on EVERY call (~seconds over a tunneled TPU); a cached
    wrapper hits the in-process trace cache (see krylov/refine)."""
    solver = cg_solve if ksp_type == "cg" else gmres_solve
    extra = {"stall_its": 50, "flexible": flexible} \
        if ksp_type == "cg" else {}

    @jax.jit
    def inner(pc_a, r32, rtol):
        # the refinement loop hands over f32 residuals; run the Krylov
        # iteration in the preconditioner's own dtype (an f64 pc would
        # otherwise promote the while_loop carry mid-iteration)
        r32 = r32.astype(pc_a.x0.dtype)   # pou is None for lvl2=0 ASM
        x0 = pc_a.apply_q(r32).astype(r32.dtype) if eff else None
        return solver(pc_a.matvec, r32, pc_a.apply, x0=x0,
                      rtol=rtol, max_it=inner_max_it, **extra)

    return inner


@functools.lru_cache(maxsize=None)
def _structured_inner_blk_jit(eff: bool, ksp_type: str, flexible: bool,
                              inner_max_it: int):
    """Block-layout inner solver (structured/blockmode.py): permute the
    residual into domain-brick order ONCE, run the whole Krylov loop on
    block-major vectors (halo extension only — no per-iteration global
    transposes), permute the correction back.  Everything inside one
    jit, so the permutations fuse with the entry/exit casts."""
    import dataclasses as _dc

    solver = cg_solve if ksp_type == "cg" else gmres_solve
    extra = {"stall_its": 50, "flexible": flexible} \
        if ksp_type == "cg" else {}

    @jax.jit
    def inner(pc_b, r32, rtol):
        r32 = r32.astype(pc_b.pc.x0.dtype)
        rb = pc_b.to_block(r32)
        x0 = pc_b.apply_q(rb).astype(rb.dtype) if eff else None
        res = solver(pc_b.matvec, rb, pc_b.apply, x0=x0,
                     rtol=rtol, max_it=inner_max_it, **extra)
        return _dc.replace(res, x=pc_b.from_block(res.x))

    return inner


def make_structured_inner(pc, inner_max_it: int = 2000,
                          ksp_type: str = "cg"):
    """Inner f32 Krylov correction solver with the preconditioner as a
    traced jit ARGUMENT (never close a jit over operator pytrees —
    constant folding blows compile time; see krylov/refine).

    ``pc``: StructuredGenEO (global-layout iteration) or BlockGenEO
    (block-layout iteration, structured/blockmode.py)."""
    from .blockmode import BlockGenEO

    # inner correction solves stop on stagnation: the f32 residual floor
    # is problem-scaled, and the f64 outer loop owns true convergence.
    # Inexact level-1 solves (PCG local solver) make the preconditioner
    # slightly variable -> flexible CG (Polak-Ribiere beta)
    if isinstance(pc, BlockGenEO):
        inner = _structured_inner_blk_jit(
            bool(pc.eff_hybrid), ksp_type, not pc.l1_exact,
            int(inner_max_it))
    else:
        inner = _structured_inner_jit(bool(pc.eff_hybrid), ksp_type,
                                      not pc.l1_exact, int(inner_max_it))
    return lambda r32, rtol: inner(pc, r32, rtol)


def _setup_with_checkpoint(setup_fn, grid, dom_grid, overlap, geneo,
                           dtype, timers):
    """Optional setup-product cache (GENEO_CHECKPOINT_DIR): key the
    finished preconditioner pytree by a configuration fingerprint (incl.
    a hash of the coefficient fields) and skip the eigensolve/E work
    entirely on a warm hit — the reference-exceeding §5.4 design, now
    covering the structured backends too."""
    import hashlib
    import os

    ckpt_dir = os.environ.get("GENEO_CHECKPOINT_DIR", "")
    if not ckpt_dir:
        return setup_fn()
    from ..precond.geneo import GenEOStats
    from ..utils.checkpoint import (config_fingerprint, load_setup_tree,
                                    save_setup_tree)

    h = hashlib.sha256()
    if hasattr(grid, "edge_off"):
        for a in range(3):
            h.update(np.ascontiguousarray(grid.edge_off(a)).tobytes())
        h.update(np.ascontiguousarray(grid.diag()).tobytes())
        kind = "structured"
    else:                                  # ElasticGrid
        h.update(np.ascontiguousarray(grid.e_cell).tobytes())
        h.update(np.asarray([grid.nu, grid.spring]).tobytes())
        kind = "elastic"
    fp = config_fingerprint(
        kind=kind, field_hash=h.hexdigest(),
        shape=grid.shape, dom_grid=tuple(dom_grid), overlap=overlap,
        lvl1=geneo.lvl1, lvl2=geneo.lvl2, tau=geneo.tau,
        gamma=geneo.gamma, optim=geneo.optim, cst=geneo.cst,
        cut=geneo.cut, dtype=str(dtype))
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"{kind}_{fp}.pkl")
    if os.path.exists(path):
        pc = load_setup_tree(path)
        n_dom = int(np.prod(dom_grid))
        stats = GenEOStats(
            estim_dim_e=np.zeros(n_dom, np.int64),
            real_dim_e=np.full(n_dom, -1, np.int64),
            nicolaides=np.zeros(n_dom, np.int64),
            tau_loc=np.full(n_dom, -1.0),
            gamma_loc=np.full(n_dom, -1.0))
        if pc.colids is not None:
            cnts = (np.asarray(pc.colids) < pc.dim_e).sum(axis=1)
            stats.real_dim_e = cnts.astype(np.int64)
        else:
            stats.real_dim_e = np.zeros(n_dom, np.int64)
        timers.add("checkpoint_hit", 1.0)
        return pc, stats
    pc, stats = setup_fn()
    save_setup_tree(path, pc)
    return pc, stats


def solve_structured(grid: StructuredGrid, dom_grid, overlap: int,
                     geneo: GenEOOptions | None = None,
                     ksp: KSPOptions | None = None,
                     tol: float = 1e-8, dtype=jnp.float32,
                     timers: Timers | None = None,
                     device_refine: bool | None = None,
                     n_devices: int | None = None,
                     block_layout: bool | None = None
                     ) -> StructuredSolveOutput:
    """device_refine (default: auto — accelerator backend with x64 on):
    keep x/b/r on the accelerator in emulated f64 and compute the truth
    residual with the device stencil — two scalars of host traffic per
    outer pass instead of an 80 MB round trip (the tunneled-TPU wall).

    n_devices: place the solve on an n-device mesh (the reference's
    `mpirun -n N`, src/geneo4PETSc.cpp:1569-1633): global vectors z-slab
    sharded, the subdomain batch chunk-sharded, the coarse factorization
    replicated — XLA inserts the halo CollectivePermutes and dot-product
    AllReduces (structured/sharded.py).  Requires nz % n_devices == 0
    and n_dom % n_devices == 0.  None (default): single-device layout.

    block_layout (default: env GENEO_BLOCK_LAYOUT=1; single-device
    only): run the inner Krylov loop on block-major vectors so the
    per-iteration PC apply pays only the halo extension, never the
    global<->brick transpose (structured/blockmode.py)."""
    geneo = geneo or GenEOOptions()
    ksp = ksp or KSPOptions()
    timers = timers or Timers()
    # multi-process runs (jax.distributed, the mpirun -n analogue) must
    # keep x/r/b device-resident: host pulls of cross-process sharded
    # arrays are not addressable (parallel/multiproc.py)
    multiproc = jax.process_count() > 1
    if device_refine is None:
        device_refine = bool(jax.config.jax_enable_x64) and (
            jax.default_backend() != "cpu" or multiproc)
    mesh = None
    if n_devices is not None:
        from .sharded import make_mesh
        mesh = make_mesh(n_devices)

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
        from ..krylov.refine import op_matvec
        b_setup = None
        if mesh is not None:
            from .sharded import shard_refine64
            if multiproc:
                # setup runs replicated on process-local arrays; hand it
                # a LOCAL rhs (mixing committed local arrays with global
                # shardings inside one jit is rejected by jax)
                b_setup = op_matvec(gop64, x_true)
            gop64, shard_vec64 = shard_refine64(gop64, mesh)
            x_true = shard_vec64(x_true)
        b = op_matvec(gop64, x_true)
        if b_setup is None:
            b_setup = b
        jax.block_until_ready(b)
    else:
        _x_true, b = grid.manufactured_rhs()
        b_setup = b
    timers.add("createA", time.perf_counter() - t0)

    t0 = time.perf_counter()
    pc, stats = _setup_with_checkpoint(
        lambda: setup_structured(sd, geneo, b=jnp.asarray(b_setup, dtype),
                                 dtype=dtype, timers=timers),
        grid, dom_grid, overlap, geneo, dtype, timers)
    shard_vec = None
    if mesh is not None:
        from .sharded import shard_structured
        _mv, _ap, pc, shard_vec = shard_structured(pc, mesh)
    jax.block_until_ready(jax.tree_util.tree_leaves(pc.l1))
    import os as _os
    if block_layout is None:
        block_layout = _os.environ.get("GENEO_BLOCK_LAYOUT") == "1"
    pc_iter = pc
    if block_layout and mesh is None:
        from .blockmode import build_block_mode
        pc_iter = build_block_mode(pc, sd, dtype)
        jax.block_until_ready(pc_iter.st_ext.diag)
    timers.add("setup", time.perf_counter() - t0)

    t0 = time.perf_counter()
    # cap the inner correction solves: a stalled-at-the-f32-floor inner
    # must not burn 10k iterations — outer f64 passes pick up the slack
    inner = make_structured_inner(
        pc_iter, inner_max_it=int(min(ksp.max_it, 2000)),
        ksp_type=ksp.type if ksp.type in ("cg", "gmres") else "cg")
    if shard_vec is not None:
        # residuals handed over by the refinement loop must carry the
        # z-slab sharding (host-refine passes uncommitted host arrays)
        base_inner = inner
        inner = lambda r32, rtol: base_inner(shard_vec(r32), rtol)
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
