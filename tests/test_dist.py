"""Distributed generic path (parallel/dist.py): owner-block sharded
vectors + packed all_to_all halo exchange — the VecScatter-equivalent
(src/geneo.cpp:1845-1900) whose wire bytes shrink with the shard count,
unlike the replicated-psum model of parallel/sharded.py.

Parity discipline mirrors the reference's fixed-2-rank golden strategy
(tst/dummy/dummy.sh): every result is pinned against the single-device
path on the same problem."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from geneo4petsc_tpu.assembly.assemble import assemble
from geneo4petsc_tpu.config import GenEOOptions
from geneo4petsc_tpu.krylov.cg import cg_solve
from geneo4petsc_tpu.models import laplacian
from geneo4petsc_tpu.parallel.dist import _build_plan, dist_geneo
from geneo4petsc_tpu.parallel.sharded import make_mesh
from geneo4petsc_tpu.partition.decompose import partition_and_decompose
from geneo4petsc_tpu.precond.geneo import setup_geneo

N_DEV = 8


def _problem(n_dom=16, overlap=1, size=24, kappa=1000.0):
    mesh = laplacian.get_input(
        f"--size {size} --dim 2 --kappa {kappa} minmax")
    decomp = partition_and_decompose(mesh, n_dom, add_overlap=overlap)
    ap = assemble(mesh, decomp)
    b = np.asarray(ap.a_csr @ np.arange(1.0, mesh.n_nodes + 1))
    return mesh, decomp, ap, b


def _setup_pc(ap, decomp, lvl1, lvl2):
    opts = GenEOOptions()
    opts.lvl1, opts.lvl2 = lvl1, lvl2
    return setup_geneo(ap.batch, opts, decomp=decomp)[0]


def test_plan_shard_roundtrip_and_wire_volume():
    mesh, decomp, ap, b = _problem()
    pc = _setup_pc(ap, decomp, "ASM", "1")
    mv, pa, pcd, sv, usv = dist_geneo(pc, make_mesh(N_DEV),
                                      node_part=decomp.node_part)
    x = np.random.default_rng(3).standard_normal(mesh.n_nodes)
    np.testing.assert_array_equal(usv(sv(x)), x)
    # the scaling claim: one halo exchange moves fewer off-device floats
    # than ONE device's share of a replicated psum (n_tot per device)
    from geneo4petsc_tpu.parallel.sharded import _pad_domains
    batch = _pad_domains(pc.batch, ((pc.batch.n_dom + N_DEV - 1)
                                    // N_DEV) * N_DEV)
    plan = _build_plan(np.asarray(batch.gids), np.asarray(batch.mask),
                       mesh.n_nodes, N_DEV, decomp.node_part)
    assert plan.wire_floats_per_exchange < plan.n_tot


@pytest.mark.parametrize("lvl1,lvl2", [
    ("ASM", "1"), ("RAS", "1"), ("SORAS", "H2"), ("ASM", "E1"),
])
def test_matvec_apply_parity(lvl1, lvl2):
    mesh, decomp, ap, b = _problem()
    pc = _setup_pc(ap, decomp, lvl1, lvl2)
    mv, pa, pcd, sv, usv = dist_geneo(pc, make_mesh(N_DEV),
                                      node_part=decomp.node_part)
    x = np.random.default_rng(0).standard_normal(mesh.n_nodes)
    xj = jnp.asarray(x, b.dtype)
    y_ref = np.asarray(pc.batch.matvec(xj))
    np.testing.assert_allclose(usv(mv(sv(x))), y_ref,
                               rtol=1e-12, atol=1e-12)
    z_ref = np.asarray(pc.apply(xj))
    scale = np.abs(z_ref).max()
    np.testing.assert_allclose(usv(pa(sv(x))) / scale, z_ref / scale,
                               rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("n_dom,overlap", [(16, 1), (11, 2)])
def test_cg_iteration_parity(n_dom, overlap):
    """Same iteration count and a converged true residual, single-device
    vs 8-way distributed — the north-star parity metric (BASELINE.md)."""
    mesh, decomp, ap, b = _problem(n_dom=n_dom, overlap=overlap)
    pc = _setup_pc(ap, decomp, "ASM", "H1")
    mv, pa, pcd, sv, usv = dist_geneo(pc, make_mesh(N_DEV),
                                      node_part=decomp.node_part)
    res_ref = cg_solve(pc.batch.matvec, jnp.asarray(b), pc.apply,
                       rtol=1e-8, max_it=300)
    res_d = jax.jit(lambda bv: cg_solve(mv, bv, pa, rtol=1e-8,
                                        max_it=300))(sv(b))
    assert int(res_d.its) == int(res_ref.its)
    xd = usv(res_d.x)
    r = np.linalg.norm(ap.a_csr @ xd - b) / np.linalg.norm(b)
    assert r < 1e-7


def test_ownership_fallback_without_node_part():
    """first-containing-domain ownership (no node_part) stays correct,
    just with larger halos."""
    mesh, decomp, ap, b = _problem()
    pc = _setup_pc(ap, decomp, "RAS", "1")
    mv, pa, pcd, sv, usv = dist_geneo(pc, make_mesh(N_DEV))
    x = np.random.default_rng(1).standard_normal(mesh.n_nodes)
    y_ref = np.asarray(pc.batch.matvec(jnp.asarray(x, b.dtype)))
    np.testing.assert_allclose(usv(mv(sv(x))), y_ref,
                               rtol=1e-12, atol=1e-12)
