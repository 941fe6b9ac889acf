"""End-to-end solve orchestration (the reference's solve(),
src/geneo4PETSc.cpp:1283-1394, as a library function).

Pipeline: ElementMesh -> partition/decompose -> assemble -> PC setup ->
jit-compiled Krylov solve -> results + true-residual oracle.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from .assembly.assemble import AssembledProblem, assemble
from .config import DriverOptions, GenEOOptions, KSPOptions, default_dtype
from .io import element_input as ei
from .krylov import common as kcm
from .krylov.cg import cg_solve
from .krylov.gmres import gmres_solve
from .partition.decompose import partition_and_decompose
from .precond.bjacobi import setup_bjacobi
from .precond.geneo import GenEOStats, setup_geneo
from .utils.timers import Timers


@dataclass
class SolveOutput:
    result: kcm.SolveResult
    x: np.ndarray
    b: np.ndarray
    pc_name: str
    stats: GenEOStats | None
    timers: Timers
    true_res: float            # || A X - B || / || B ||
    n_dof: int
    n_elems: int
    nnz: int
    n_dom: int
    assembled: AssembledProblem = None
    pc: object = None
    info_l2: str = ""

    @property
    def converged(self) -> bool:
        return int(self.result.reason) >= 0

    @property
    def its(self) -> int:
        return int(self.result.its)


def build_rhs(assembled: AssembledProblem, opt: DriverOptions) -> np.ndarray:
    """Manufactured B = A X with X = (1, 2, ...) unless an RHS file is given
    (createB, src/geneo4PETSc.cpp:807-894)."""
    n = assembled.n_dof
    if opt.inp_file_b:
        return ei.read_rhs_file(opt.inp_file_b, n)
    x = ei.manufactured_solution(n)
    return np.asarray(assembled.a_csr @ x)


def solve_assembled(assembled: AssembledProblem,
                    pc_type: str = "geneo",
                    geneo: GenEOOptions | None = None,
                    ksp: KSPOptions | None = None,
                    b: np.ndarray | None = None,
                    driver: DriverOptions | None = None,
                    timers: Timers | None = None,
                    n_devices: int | None = None) -> SolveOutput:
    """n_devices: run the Krylov iteration on an n-device mesh with
    owner-block sharded vectors + packed all_to_all halo exchange
    (parallel/dist.py — the VecScatter model; the reference's
    `mpirun -n N`, src/geneo4PETSc.cpp:1569-1633).  geneo PCs only;
    iteration counts match the single-device layout (asserted by
    tests + the multichip dryrun).  None (default): single device."""
    geneo = geneo or GenEOOptions()
    ksp = ksp or KSPOptions()
    driver = driver or DriverOptions()
    timers = timers or Timers()
    dtype = default_dtype()

    batch = assembled.batch
    n = assembled.n_dof
    if b is None:
        b = build_rhs(assembled, driver)
    b_j = jnp.asarray(b, dtype)

    # --- PC setup (KSPSetUp equivalent: all the expensive work) ---
    t0 = time.perf_counter()
    stats = None
    x0 = None
    info_l2 = ""
    if pc_type == "geneo":
        pc, stats = setup_geneo(batch, geneo, b=b_j,
                                decomp=assembled.decomp, timers=timers,
                                a_csr=assembled.a_csr)
        jax.block_until_ready(pc.l1_factor)
        pc_name = geneo.name
        x0 = pc.x0
        if geneo.lvl2_num:
            info_l2 = f"{geneo.els2.type} cholesky"
    elif pc_type == "bjacobi":
        pc = setup_bjacobi(assembled.a_csr, batch.n_dom, dtype=dtype)
        jax.block_until_ready(pc.factor)
        pc_name = "bjacobi"
    elif pc_type == "mg":
        from .precond.mg import setup_mg
        pc = setup_mg(assembled.a_csr, dtype=dtype,
                      cycle_type=driver.mg_cycle_type,
                      smooth_down=driver.mg_smooth_down,
                      smooth_up=driver.mg_smooth_up)
        jax.block_until_ready(pc.coarse_factor)
        pc_name = "mg"
    elif pc_type == "none":
        pc = None
        pc_name = "none"
    else:
        raise ValueError(f"unknown pc_type {pc_type}")
    timers.add("ksp_setup", time.perf_counter() - t0)

    # --- Krylov solve, fully jit-compiled ---
    # the hot path uses the accelerator-resident copy of the operator
    # (setup uploads it; on CPU backends this is the same object)
    if pc_type == "geneo":
        op_batch = pc.batch
    elif jax.default_backend() != "cpu":
        op_batch = jax.device_put(batch, jax.devices()[0])
    else:
        op_batch = batch
    kw = dict(rtol=ksp.rtol, atol=ksp.atol, dtol=ksp.dtol,
              max_it=ksp.max_it, norm_type=ksp.norm_type)

    # the operator/PC pytrees are jit ARGUMENTS (closing over them embeds
    # multi-MB constants that XLA constant-folds — compile blow-up)
    solver_fn = cg_solve if ksp.type == "cg" else gmres_solve
    if ksp.type not in ("cg", "gmres"):
        raise ValueError(f"unknown ksp type {ksp.type}")
    extra = {} if ksp.type == "cg" else {"restart": ksp.restart}

    unshard_vec = None
    if n_devices is not None and pc_type == "geneo":
        # mpirun -n N analogue: owner-block sharded vectors + packed
        # all_to_all halos (parallel/dist.py).  The Krylov loop runs
        # eagerly over the shard_map'd matvec/apply — the problem sizes
        # on this path are sweep-scale, so the closure constants are
        # tiny; the 10M+ scale path is solve_structured(n_devices=...).
        from .parallel.dist import dist_geneo
        from .parallel.sharded import make_mesh
        dmesh = make_mesh(n_devices)
        node_part = getattr(assembled.decomp, "node_part", None) \
            if assembled.decomp is not None else None
        mv, pa, _pc_d, shard_vec, unshard_vec = dist_geneo(
            pc, dmesh, node_part=node_part)
        b_run = shard_vec(np.asarray(b, np.dtype(dtype)))
        x0_run = shard_vec(np.asarray(x0)) if x0 is not None \
            else jnp.zeros_like(b_run)

        t0 = time.perf_counter()
        result = solver_fn(mv, b_run, pa, x0=x0_run, **extra, **kw)
        jax.block_until_ready(result.x)
        timers.add("ksp_iterations", time.perf_counter() - t0)
    else:
        if pc is not None:
            def run(op_a, pc_a, bv, x0v):
                return solver_fn(op_a.matvec, bv, pc_a.apply, x0=x0v,
                                 **extra, **kw)
            run_j = jax.jit(run)
            args = (op_batch, pc)
        else:
            def run(op_a, bv, x0v):
                return solver_fn(op_a.matvec, bv, None, x0=x0v,
                                 **extra, **kw)
            run_j = jax.jit(run)
            args = (op_batch,)

        t0 = time.perf_counter()
        result = run_j(*args, b_j,
                       x0 if x0 is not None else jnp.zeros(n, dtype))
        jax.block_until_ready(result.x)
        timers.add("ksp_iterations", time.perf_counter() - t0)

    if unshard_vec is not None:
        x_np = unshard_vec(result.x).astype(np.float64)
    else:
        x_np = np.asarray(result.x, np.float64)
    r = assembled.a_csr @ x_np - b
    bn = np.linalg.norm(b)
    true_res = float(np.linalg.norm(r) / bn) if bn > 0 else float("inf")

    if int(result.reason) < 0:
        # DIVERGED_*: dump Krylov + PC state even with debugging off
        # (checkKSPSolve, src/geneo.cpp:1397-1433)
        from .utils.debug import dump_failure
        dump_failure(result, ksp, pc_name, stats=stats)

    return SolveOutput(result=result, x=x_np, b=np.asarray(b), pc_name=pc_name,
                       stats=stats, timers=timers, true_res=true_res,
                       n_dof=n, n_elems=assembled.mesh.n_elems,
                       nnz=int(np.sum(assembled.nnz_loc)), n_dom=batch.n_dom,
                       assembled=assembled, pc=pc, info_l2=info_l2)


def solve_mesh(mesh: ei.ElementMesh, n_dom: int = 2,
               pc_type: str = "geneo",
               geneo: GenEOOptions | None = None,
               ksp: KSPOptions | None = None,
               driver: DriverOptions | None = None,
               timers: Timers | None = None) -> SolveOutput:
    """partition + decompose + assemble + solve."""
    driver = driver or DriverOptions()
    timers = timers or Timers()
    t0 = time.perf_counter()
    decomp = partition_and_decompose(
        mesh, n_dom, metis_dual=driver.metis_dual,
        add_overlap=driver.add_overlap)
    timers.add("partition", time.perf_counter() - t0)
    t0 = time.perf_counter()
    assembled = assemble(mesh, decomp)
    timers.add("create_a", time.perf_counter() - t0)
    return solve_assembled(assembled, pc_type=pc_type, geneo=geneo, ksp=ksp,
                           driver=driver, timers=timers)
