"""Assembly tests: MatIS duality (Neumann vs Dirichlet views), operator
equivalence, scatter/gather (reference: src/geneo4PETSc.cpp:643-805,
src/geneo.cpp:1692-1715)."""

import numpy as np
import jax.numpy as jnp
import pytest

from geneo4petsc_tpu.assembly.assemble import (assemble, robin_blocks)
from geneo4petsc_tpu.io.element_input import read_input_file
from geneo4petsc_tpu.models import graph, laplacian
from geneo4petsc_tpu.partition.decompose import partition_and_decompose


@pytest.fixture(params=["lap-dual", "lap-nodal", "graph-overlap"])
def problem(request):
    if request.param == "lap-dual":
        mesh = laplacian.get_input("--size 6 --dim 2")
        d = partition_and_decompose(mesh, 4, metis_dual=True)
    elif request.param == "lap-nodal":
        mesh = laplacian.get_input("--size 6 --dim 2")
        d = partition_and_decompose(mesh, 4, metis_dual=False)
    else:
        mesh = graph.get_input("--size 4 --level 1")
        d = partition_and_decompose(mesh, 3, add_overlap=1)
    return assemble(mesh, d)


def test_unassembled_sum_reproduces_global(problem):
    """A == sum_d R_d^T Aneu_d R_d — the MatIS invariant (element PoU
    weighting makes the overlapping sum exact)."""
    ap = problem
    n = ap.n_dof
    a_dense = ap.a_csr.toarray()
    acc = np.zeros((n, n))
    gids = np.asarray(ap.batch.gids)
    mask = np.asarray(ap.batch.mask)
    aneu = np.asarray(ap.batch.a_neu)
    for p in range(ap.batch.n_dom):
        k = mask[p].sum()
        g = gids[p, :k]
        acc[np.ix_(g, g)] += aneu[p, :k, :k]
    assert np.allclose(acc, a_dense, atol=1e-12)


def test_dirichlet_is_assembled_restriction(problem):
    ap = problem
    a_dense = ap.a_csr.toarray()
    gids = np.asarray(ap.batch.gids)
    mask = np.asarray(ap.batch.mask)
    adir = np.asarray(ap.batch.a_dir)
    for p in range(ap.batch.n_dom):
        k = mask[p].sum()
        g = gids[p, :k]
        assert np.allclose(adir[p, :k, :k], a_dense[np.ix_(g, g)])


def test_matvec_matches_csr(problem):
    ap = problem
    rng = np.random.default_rng(0)
    x = rng.standard_normal(ap.n_dof)
    y_ref = ap.a_csr @ x
    y = np.asarray(ap.batch.matvec(jnp.asarray(x)))
    assert np.allclose(y, y_ref, atol=1e-11)


def test_gather_scatter_roundtrip(problem):
    ap = problem
    x = np.arange(1.0, ap.n_dof + 1)
    xl = np.asarray(ap.batch.gather(jnp.asarray(x)))
    mask = np.asarray(ap.batch.mask)
    gids = np.asarray(ap.batch.gids)
    assert np.allclose(np.where(mask, xl, 0),
                       np.where(mask, x[np.minimum(gids, ap.n_dof - 1)], 0))
    # scatter-add of multiplicity-scaled gather returns x (PoU identity)
    d = np.asarray(ap.batch.pou)
    back = np.asarray(ap.batch.scatter_add(jnp.asarray(
        np.where(mask, xl * d, 0))))
    assert np.allclose(back, x)


def test_pad_slots_inert(problem):
    ap = problem
    mask = np.asarray(ap.batch.mask)
    aneu = np.asarray(ap.batch.a_neu)
    for p in range(ap.batch.n_dom):
        k = mask[p].sum()
        assert np.allclose(aneu[p, k:, k:], np.eye(ap.batch.n_max - k))
        assert np.allclose(aneu[p, :k, k:], 0)


def test_robin_blocks():
    mesh = laplacian.get_input("--size 6 --dim 2")
    d = partition_and_decompose(mesh, 4, add_overlap=1)
    ap = assemble(mesh, d)
    r0 = np.asarray(robin_blocks(ap.batch, 0.0))
    assert np.allclose(r0, np.asarray(ap.batch.a_dir))
    r1 = np.asarray(robin_blocks(ap.batch, 2.0))
    mult = np.asarray(ap.batch.mult)
    mask = np.asarray(ap.batch.mask)
    border = (mult > 1) & mask
    aneu = np.asarray(ap.batch.a_neu)
    adir = np.asarray(ap.batch.a_dir)
    for p in range(ap.batch.n_dom):
        bsel = np.outer(border[p], border[p])
        expect = adir[p] + 2.0 * np.where(bsel, aneu[p], 0)
        assert np.allclose(r1[p], expect)


def test_nnz_parity_tridiag():
    """The INFO line's 'nnz coefs' counts per-domain local pattern sizes
    (preallocateALoc) — reproduce on the reference tridiag system."""
    mesh = read_input_file("/root/reference/tst/dummy/tridiag.inp",
                           inp_eps=1.0)
    d = partition_and_decompose(mesh, 2)
    ap = assemble(mesh, d)
    # 2 domains covering 8 nodes with a shared interface: local tridiagonal
    # patterns: nnz(tridiag k) = 3k - 2
    expect = sum(3 * len(d.dom_nodes[p]) - 2 for p in range(2))
    assert int(ap.nnz_loc.sum()) == expect
