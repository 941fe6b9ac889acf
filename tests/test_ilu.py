"""ILU(0) tests: exactness on patterns with no fill-in, preconditioner
quality on general sparsity, block-Jacobi sub-PC parity."""

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from geneo4petsc_tpu.ops.ilu import ilu0_factor, ilu0_solve


def test_tridiagonal_ilu0_is_exact():
    """Tridiagonal pattern has no fill-in: ILU(0) == LU, solve is exact."""
    n = 12
    a = (np.diag(np.full(n, 4.0)) + np.diag(np.full(n - 1, -1.0), 1)
         + np.diag(np.full(n - 1, -1.0), -1))
    batch = np.stack([a, 2 * a])
    pattern = jnp.asarray(batch != 0)
    lu = ilu0_factor(jnp.asarray(batch), pattern)
    b = np.random.default_rng(0).standard_normal((2, n))
    x = np.asarray(ilu0_solve(lu, pattern, jnp.asarray(b)))
    assert np.allclose(np.einsum("bij,bj->bi", batch, x), b, atol=1e-10)


def test_ilu0_preserves_pattern():
    rng = np.random.default_rng(1)
    a = sp.random(10, 10, density=0.3, random_state=1).toarray()
    a = a + a.T + 10 * np.eye(10)
    batch = a[None]
    pattern = jnp.asarray(batch != 0)
    lu = np.asarray(ilu0_factor(jnp.asarray(batch), pattern))
    assert (lu[~np.asarray(pattern)] == 0).all()


def test_ilu0_preconditions_cg():
    """ILU(0)-bjacobi must cut CG iterations vs unpreconditioned on a 2D
    Laplacian, and the 'exact' sub-PC must be at least as strong."""
    from geneo4petsc_tpu.assembly.assemble import assemble_global_csr
    from geneo4petsc_tpu.krylov.cg import cg_solve
    from geneo4petsc_tpu.models import laplacian
    from geneo4petsc_tpu.precond.bjacobi import setup_bjacobi

    mesh = laplacian.get_input("--size 14 --dim 2")
    a = assemble_global_csr(mesh)
    b = jnp.asarray(a @ np.arange(1.0, mesh.n_nodes + 1))
    a_j = jnp.asarray(a.toarray())
    mv = lambda v: a_j @ v
    its = {}
    res_none = cg_solve(mv, b, None, rtol=1e-8,
                        norm_type="unpreconditioned")
    its["none"] = int(res_none.its)
    for st in ("ilu", "exact"):
        pc = setup_bjacobi(a, 4, sub_type=st)
        res = cg_solve(mv, b, pc.apply, rtol=1e-8)
        assert int(res.reason) >= 0
        its[st] = int(res.its)
    assert its["ilu"] < its["none"]
    assert its["exact"] <= its["ilu"]


def test_bjacobi_cli_golden_still_byte_identical():
    """The dummy bjacobi goldens must stay byte-identical with the ILU(0)
    default (tridiagonal blocks: ILU(0) == exact LU)."""
    import io
    import os

    from geneo4petsc_tpu import cli

    ref = "/root/reference/tst/dummy"
    if not os.path.isdir(ref):
        import pytest
        pytest.skip("reference not mounted")
    buf = io.StringIO()
    rc = cli.run(["--inpFileA", f"{ref}/tridiag.inp", "--inpEps", "1.",
                  "-pc_type", "bjacobi", "--verbose", "2", "--shortRes",
                  "-ksp_atol", "1.e-12", "-ksp_rtol", "1.e-12",
                  "--nbPart", "2", "--metisDual"], out=buf)
    assert rc == 0
    want = open(f"{ref}/tridiag-pc=bjacobi-metis=dual.ref").read()
    assert buf.getvalue() == want
