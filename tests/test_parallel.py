"""Multi-device sharding tests on the 8-device virtual CPU mesh
(the reference tests 'distributed' with 2 local MPI processes — SURVEY.md
§4; here domains shard over jax devices and collectives ride the mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geneo4petsc_tpu.assembly.assemble import assemble
from geneo4petsc_tpu.config import GenEOOptions
from geneo4petsc_tpu.krylov.cg import cg_solve
from geneo4petsc_tpu.krylov.gmres import gmres_solve
from geneo4petsc_tpu.models import graph, laplacian
from geneo4petsc_tpu.parallel.sharded import (make_mesh, shard_geneo,
                                              sharded_matvec)
from geneo4petsc_tpu.partition.decompose import partition_and_decompose
from geneo4petsc_tpu.precond.geneo import setup_geneo

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def problem():
    mesh = laplacian.get_input("--size 16 --dim 2 --kappa 1000. minmax")
    d = partition_and_decompose(mesh, 6, add_overlap=1)
    ap = assemble(mesh, d)
    return mesh, d, ap


def test_sharded_matvec_matches_csr(problem):
    mesh, d, ap = problem
    m = make_mesh(8)
    mv = sharded_matvec(ap.batch, m)
    x = np.random.default_rng(0).standard_normal(mesh.n_nodes)
    y = np.asarray(mv(jnp.asarray(x)))
    assert np.allclose(y, ap.a_csr @ x, atol=1e-9)


@pytest.mark.parametrize("lvl", ["ASM,0", "ASM,1", "ASM,H1", "SORAS,2",
                                 "RAS,1"])
def test_sharded_apply_matches_single_device(problem, lvl):
    mesh, d, ap = problem
    g = GenEOOptions()
    g.lvl1, g.lvl2 = lvl.split(",")
    pc, _ = setup_geneo(ap.batch, g, decomp=d)
    m = make_mesh(8)
    mv, pa, _ = shard_geneo(pc, m)
    x = np.random.default_rng(1).standard_normal(mesh.n_nodes)
    ref = np.asarray(pc.apply(jnp.asarray(x)))
    val = np.asarray(pa(jnp.asarray(x)))
    assert np.allclose(val, ref, atol=1e-9 * max(1, np.abs(ref).max()))


@pytest.mark.parametrize("solver", [cg_solve, gmres_solve])
def test_sharded_full_solve(problem, solver):
    mesh, d, ap = problem
    g = GenEOOptions()
    g.lvl1, g.lvl2 = "ASM", "H1"
    pc, _ = setup_geneo(ap.batch, g, decomp=d)
    m = make_mesh(8)
    mv, pa, _ = shard_geneo(pc, m)
    x_true = np.arange(1.0, mesh.n_nodes + 1)
    b = jnp.asarray(ap.a_csr @ x_true)
    res = jax.jit(lambda bb: solver(mv, bb, pa, rtol=1e-10))(b)
    assert int(res.reason) >= 0
    assert np.allclose(np.asarray(res.x), x_true, atol=1e-4)


def test_sharded_iteration_counts_match_single_device(problem):
    """Determinism requirement (SURVEY.md §5.2): the sharded solve takes the
    same number of iterations as the single-device solve."""
    mesh, d, ap = problem
    g = GenEOOptions()
    g.lvl1, g.lvl2 = "ASM", "1"
    pc, _ = setup_geneo(ap.batch, g, decomp=d)
    b = jnp.asarray(ap.a_csr @ np.arange(1.0, mesh.n_nodes + 1))
    res1 = jax.jit(lambda bb: cg_solve(ap.batch.matvec, bb, pc.apply,
                                       rtol=1e-8))(b)
    m = make_mesh(8)
    mv, pa, _ = shard_geneo(pc, m)
    res8 = jax.jit(lambda bb: cg_solve(mv, bb, pa, rtol=1e-8))(b)
    assert int(res1.its) == int(res8.its)


def test_sharded_irregular_graph():
    """Unstructured intersections (the graph workload) through the sharded
    path — the 'irregular halo exchange' hard part (SURVEY.md §7)."""
    mesh = graph.get_input("--size 4 --level 1")
    d = partition_and_decompose(mesh, 3, add_overlap=1)
    ap = assemble(mesh, d)
    g = GenEOOptions()
    g.lvl1, g.lvl2 = "RAS", "1"
    pc, _ = setup_geneo(ap.batch, g, decomp=d)
    m = make_mesh(8)
    mv, pa, _ = shard_geneo(pc, m)
    x_true = np.arange(1.0, mesh.n_nodes + 1)
    b = jnp.asarray(ap.a_csr @ x_true)
    res = jax.jit(lambda bb: cg_solve(mv, bb, pa, rtol=1e-10))(b)
    assert int(res.reason) >= 0
    assert np.allclose(np.asarray(res.x), x_true, atol=1e-4)
