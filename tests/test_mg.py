"""Multigrid comparison-PC tests (reference matrix -pc_type mg,
tst/laplacian/laplacianRun.sh:31)."""

import numpy as np
import jax.numpy as jnp

from geneo4petsc_tpu.config import DriverOptions, KSPOptions
from geneo4petsc_tpu.models import laplacian
from geneo4petsc_tpu.solver import solve_mesh


def test_mg_spd_and_symmetric():
    """The V(1,1) cycle must be a symmetric positive-definite operator
    (CG-safety in PETSc's default preconditioned norm)."""
    from geneo4petsc_tpu.assembly.assemble import assemble_global_csr
    from geneo4petsc_tpu.precond.mg import setup_mg

    mesh = laplacian.get_input("--size 12 --dim 2")
    a = assemble_global_csr(mesh)
    pc = setup_mg(a, coarse_max=16)
    n = a.shape[0]
    m = np.stack([np.asarray(pc.apply(jnp.asarray(e)))
                  for e in np.eye(n)], axis=1)
    assert np.allclose(m, m.T, atol=1e-10)
    w = np.linalg.eigvalsh(0.5 * (m + m.T))
    assert w.min() > 0


def test_mg_accelerates_cg():
    mesh = laplacian.get_input("--size 24 --dim 2")
    out_mg = solve_mesh(mesh, n_dom=4, pc_type="mg",
                        ksp=KSPOptions(type="cg", rtol=1e-8))
    out_none = solve_mesh(mesh, n_dom=4, pc_type="none",
                          ksp=KSPOptions(type="cg", rtol=1e-8,
                                         norm_type="unpreconditioned"))
    assert out_mg.converged
    assert out_mg.its < out_none.its
    # solution correctness against the manufactured RHS
    assert np.allclose(np.asarray(out_mg.x),
                       np.arange(1.0, mesh.n_nodes + 1), atol=1e-5)


def test_mg_multilevel_hierarchy():
    """Coarsening must actually recurse (>2 levels on a larger grid)."""
    from geneo4petsc_tpu.assembly.assemble import assemble_global_csr
    from geneo4petsc_tpu.precond.mg import setup_mg

    mesh = laplacian.get_input("--size 40 --dim 2")
    pc = setup_mg(assemble_global_csr(mesh), coarse_max=64)
    assert pc.n_levels >= 3
    assert pc.ns[0] == mesh.n_nodes
    assert all(pc.ns[i] > pc.ns[i + 1] for i in range(pc.n_levels - 1))


def test_mg_cli_runs():
    import io
    from geneo4petsc_tpu import cli

    buf = io.StringIO()
    rc = cli.run(["--inpLibA", "laplacian", "--inpLibArg",
                  "--size 12 --dim 2", "-pc_type", "mg", "--nbPart", "2",
                  "-ksp_type", "cg", "--verbose", "1"], out=buf)
    assert rc == 0
    s = buf.getvalue()
    assert "mg" in s and "converged" in s
