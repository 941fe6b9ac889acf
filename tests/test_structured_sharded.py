"""Structured multi-device path: z-slab sharding over the CPU mesh.

Mirrors the reference's 2-process golden discipline (tst/dummy/dummy.sh):
the sharded apply must be numerically identical (same math, XLA-inserted
CollectivePermute/AllReduce instead of VecScatter) and CG iteration
counts must match the single-device run exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geneo4petsc_tpu.config import GenEOOptions
from geneo4petsc_tpu.krylov.cg import cg_solve
from geneo4petsc_tpu.structured.decompose import StructuredDecomposition
from geneo4petsc_tpu.structured.geneo import setup_structured
from geneo4petsc_tpu.structured.grid import laplacian_grid
from geneo4petsc_tpu.structured.sharded import make_mesh, shard_structured

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the 8-device CPU mesh")


def _setup(n_dev, size=16, overlap=1, lvl2="1"):
    grid = laplacian_grid(size, dim=3, kappa_max=1000.0, interp="minmax")
    sd = StructuredDecomposition(grid, (2, 2, n_dev), overlap)
    opts = GenEOOptions()
    opts.lvl1, opts.lvl2 = "RAS", lvl2
    pc, _ = setup_structured(sd, opts, dtype=jnp.float64)
    x_true, b = grid.manufactured_rhs()
    return grid, pc, np.asarray(b), x_true


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_apply_matches_single_device(n_dev):
    grid, pc, b, _ = _setup(n_dev)
    mesh = make_mesh(n_dev)
    mv, ap, _pc_sh, shard_vec = shard_structured(pc, mesh)
    bj = jnp.asarray(b)
    ref_mv = np.asarray(pc.matvec(bj), np.float64)
    ref_ap = np.asarray(pc.apply(bj), np.float64)
    got_mv = np.asarray(mv(shard_vec(b)), np.float64)
    got_ap = np.asarray(ap(shard_vec(b)), np.float64)
    np.testing.assert_allclose(got_mv, ref_mv, rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(got_ap, ref_ap, rtol=1e-10, atol=1e-9)


def test_sharded_cg_iteration_count_parity():
    """Iteration-count equality across device counts — the north-star
    determinism property (BASELINE.md)."""
    grid, pc, b, x_true = _setup(8)
    bj = jnp.asarray(b)

    res1 = jax.jit(lambda p, v: cg_solve(p.matvec, v, p.apply,
                                         rtol=1e-10))(pc, bj)
    its1 = int(res1.its)

    mesh = make_mesh(8)
    mv, ap, _pc_sh, shard_vec = shard_structured(pc, mesh)
    res8 = cg_solve(mv, shard_vec(b), ap, rtol=1e-10)
    its8 = int(res8.its)
    assert its1 == its8
    x8 = np.asarray(res8.x, np.float64)
    assert np.allclose(x8, x_true, rtol=1e-5, atol=1e-4)


def test_sharded_geneo2level_converges():
    grid, pc, b, x_true = _setup(8, lvl2="H1")
    mesh = make_mesh(8)
    mv, ap, _pc_sh, shard_vec = shard_structured(pc, mesh)
    res = cg_solve(mv, shard_vec(b), ap, rtol=1e-8)
    assert int(res.reason) > 0
    assert np.allclose(np.asarray(res.x, np.float64), x_true,
                       rtol=1e-5, atol=1e-4)


# ---------------- elastic (vector-DOF) backend ----------------

def _setup_elastic(lvl2="1"):
    from geneo4petsc_tpu.structured.elastic import (elastic_grid,
                                                    setup_elastic)
    g = elastic_grid(8, kappa_max=100.0, interp="minmax", spring=100.0)
    opts = GenEOOptions()
    opts.lvl1, opts.lvl2 = "RAS", lvl2
    opts.cut = 8
    pc, _ = setup_elastic(g, (2, 2, 2), 1, opts, dtype=jnp.float64)
    x_true, b = g.manufactured_rhs()
    return g, pc, np.asarray(b), x_true


def test_elastic_sharded_apply_matches_single_device():
    from geneo4petsc_tpu.structured.sharded import shard_elastic
    g, pc, b, _ = _setup_elastic()
    mv, ap, _pc_sh, shard_vec = shard_elastic(pc, make_mesh(8))
    bj = jnp.asarray(b)
    ref_mv = np.asarray(pc.matvec(bj), np.float64)
    ref_ap = np.asarray(pc.apply(bj), np.float64)
    got_mv = np.asarray(mv(shard_vec(b)), np.float64)
    got_ap = np.asarray(ap(shard_vec(b)), np.float64)
    np.testing.assert_allclose(got_mv, ref_mv, rtol=1e-12, atol=1e-9)
    # the level-1 local solve is PCG iterated to dls1.rtol (1e-5): the
    # sharded reduction order legitimately lands elsewhere inside that
    # convergence band (observed ~1.5e-6 rel), unlike the exact-factor
    # scalar backend — compare at the solver tolerance, not at eps
    np.testing.assert_allclose(got_ap, ref_ap, rtol=3e-5, atol=1e-4)


def test_elastic_sharded_cg_iteration_count_parity():
    from geneo4petsc_tpu.structured.sharded import shard_elastic
    g, pc, b, x_true = _setup_elastic()
    bj = jnp.asarray(b)
    res1 = jax.jit(lambda p, v: cg_solve(p.matvec, v, p.apply, rtol=1e-8,
                                         flexible=True))(pc, bj)
    mv, ap, _pc_sh, shard_vec = shard_elastic(pc, make_mesh(8))
    res8 = cg_solve(mv, shard_vec(b), ap, rtol=1e-8, flexible=True)
    assert int(res1.its) == int(res8.its)
    x8 = np.asarray(res8.x, np.float64)
    rel = np.linalg.norm(g.matvec(x8) - b) / np.linalg.norm(b)
    assert rel < 1e-7
