"""Library embedding API — the PCGenEOSetup equivalent.

The reference has two entry paths into the GenEO PC (SURVEY.md §1): the CLI
driver, and `PCGenEOSetup(PC, Mat ADirLoc, IS mult, IS* intersections)`
(src/geneo.cpp:2518-2572) for external PETSc codes that bring their own
operator + decomposition metadata.  This module is the TPU equivalent: an
external simulation hands us its per-subdomain unassembled blocks +
local-to-global maps + multiplicities + intersections, and gets back a
ready preconditioner and solver handles — no mesh/partitioner involvement.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from .assembly.assemble import SubdomainBatch, _round_up
from .config import GenEOOptions, KSPOptions, default_dtype
from .krylov.cg import cg_solve
from .krylov.gmres import gmres_solve
from .precond.geneo import GenEOPreconditioner, GenEOStats, setup_geneo


@dataclass
class _FakeDecomp:
    """Adapter giving setup_geneo the intersection lists it needs for
    GenEO-2 adaptive gamma."""

    intersections: list
    adj: np.ndarray | None = None

    def adjacency(self) -> np.ndarray:
        if self.adj is None:
            n = len(self.intersections)
            a = np.zeros((n, n), dtype=bool)
            for p, row in enumerate(self.intersections):
                a[p] = np.fromiter(map(len, row), count=n,
                                   dtype=np.int64) > 0
            np.fill_diagonal(a, False)
            self.adj = a
        return self.adj


def make_batch(n_dof: int,
               dof_gids: list[np.ndarray],
               a_neu_blocks: list[np.ndarray],
               dof_mult: list[np.ndarray],
               a_dir_blocks: list[np.ndarray] | None = None,
               a_global=None,
               dtype=None,
               pad_to: int = 8) -> SubdomainBatch:
    """Build a SubdomainBatch from user-provided local data.

    dof_gids[p]:     global DOF indices of domain p (ascending — the
                     reference's sorted-set local ordering contract,
                     geneo4PETSc.cpp:339-344)
    a_neu_blocks[p]: unassembled local (Neumann) matrix, PRE-WEIGHTED so
                     that sum_p R_p^T Aneu_p R_p == A (the reference's
                     1/elemMult scaling contract)
    dof_mult[p]:     DOF multiplicities in the same local order
    a_dir_blocks[p]: optional Dirichlet blocks (assembled-then-restricted);
                     derived from a_global or from the Neumann sum if absent
    a_global:        optional assembled scipy.sparse matrix
    """
    if dtype is None:
        dtype = default_dtype()
    np_dtype = np.dtype(dtype)
    n_dom = len(dof_gids)
    sizes = [len(g) for g in dof_gids]
    n_max = _round_up(max(max(sizes), 1), pad_to)

    gids = np.full((n_dom, n_max), n_dof, dtype=np.int32)
    mask = np.zeros((n_dom, n_max), dtype=bool)
    mult = np.ones((n_dom, n_max), dtype=np_dtype)
    a_neu = np.tile(np.eye(n_max, dtype=np_dtype), (n_dom, 1, 1))
    a_dir = np.tile(np.eye(n_max, dtype=np_dtype), (n_dom, 1, 1))

    if a_dir_blocks is None:
        if a_global is None:
            # derive the assembled operator from the unassembled sum
            import scipy.sparse as sp
            rows, cols, vals = [], [], []
            for p in range(n_dom):
                g = np.asarray(dof_gids[p])
                gi, gj = np.meshgrid(g, g, indexing="ij")
                rows.append(gi.ravel())
                cols.append(gj.ravel())
                vals.append(np.asarray(a_neu_blocks[p]).ravel())
            a_global = sp.coo_matrix(
                (np.concatenate(vals),
                 (np.concatenate(rows), np.concatenate(cols))),
                shape=(n_dof, n_dof)).tocsr()
            a_global.sum_duplicates()

    for p in range(n_dom):
        g = np.asarray(dof_gids[p])
        k = len(g)
        if k == 0:
            continue
        if not (np.diff(g) > 0).all():
            raise ValueError(
                f"domain {p}: dof_gids must be strictly ascending "
                "(sorted-set local ordering)")
        gids[p, :k] = g
        mask[p, :k] = True
        mult[p, :k] = np.asarray(dof_mult[p])
        a_neu[p, :k, :k] = np.asarray(a_neu_blocks[p])
        if a_dir_blocks is not None:
            a_dir[p, :k, :k] = np.asarray(a_dir_blocks[p])
        else:
            a_dir[p, :k, :k] = np.asarray(
                a_global[np.ix_(g, g)].todense())

    perm = np.argsort(gids.ravel(), kind="stable").astype(np.int32)
    return SubdomainBatch(
        n_dof=n_dof, n_dom=n_dom, n_max=n_max,
        gids=jnp.asarray(gids), mask=jnp.asarray(mask),
        mult=jnp.asarray(mult), a_neu=jnp.asarray(a_neu),
        a_dir=jnp.asarray(a_dir),
        scatter_perm=jnp.asarray(perm),
        sorted_gids=jnp.asarray(gids.ravel()[perm]))


def geneo_setup(batch: SubdomainBatch,
                options: GenEOOptions | None = None,
                b: np.ndarray | None = None,
                intersections: list | None = None,
                ) -> tuple[GenEOPreconditioner, GenEOStats]:
    """PCGenEOSetup equivalent: build the preconditioner from a batch.

    ``intersections``: per-pair LOCAL-index lists (only needed for GenEO-2
    adaptive gamma; defaults to 'all domains intersect').
    """
    options = options or GenEOOptions()
    decomp = None
    if intersections is not None:
        decomp = _FakeDecomp(intersections=intersections)
    b_j = None if b is None else jnp.asarray(b, batch.a_neu.dtype)
    return setup_geneo(batch, options, b=b_j, decomp=decomp)


def geneo_solve(batch: SubdomainBatch, b: np.ndarray,
                pc: GenEOPreconditioner,
                ksp: KSPOptions | None = None):
    """Solve A x = b with the batch operator and a set-up preconditioner."""
    ksp = ksp or KSPOptions()
    op = pc.batch  # accelerator-resident copy from setup
    b_j = jnp.asarray(b, op.a_neu.dtype)
    kw = dict(rtol=ksp.rtol, atol=ksp.atol, dtol=ksp.dtol, max_it=ksp.max_it)
    # pc passed as a traced argument (constants would be folded at compile)
    if ksp.type == "cg":
        fn = lambda pc_a, bb: cg_solve(pc_a.batch.matvec, bb, pc_a.apply,
                                       x0=pc_a.x0, **kw)
    else:
        fn = lambda pc_a, bb: gmres_solve(pc_a.batch.matvec, bb, pc_a.apply,
                                          x0=pc_a.x0, restart=ksp.restart,
                                          **kw)
    return jax.jit(fn)(pc, b_j)
