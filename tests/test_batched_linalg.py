"""Batched linear algebra unit tests: LU (incl. null-pivot fixing),
Sylvester inertia counts, generalized eigh, LU-based level-1 solves."""

import numpy as np
import jax.numpy as jnp

from geneo4petsc_tpu.ops import batched_linalg as bl


def _spd_batch(d=4, n=12, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((d, n, n))
    return np.einsum("dij,dkj->dik", a, a) / n + 0.5 * np.eye(n)


def test_lu_factor_solve():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((3, 10, 10)) + 5 * np.eye(10)  # non-symmetric
    b = rng.standard_normal((3, 10))
    lu = bl.lu_factor(jnp.asarray(a))
    x = np.asarray(bl.lu_solve(lu, jnp.asarray(b)))
    assert np.allclose(np.einsum("dij,dj->di", a, x), b, atol=1e-9)


def test_lu_nullpivot_pseudoinverse_behavior():
    """Singular matrix: the fixed factorization contributes ~0 along the
    null direction (MUMPS ICNTL(24)/CNTL(5) emulation)."""
    q, _ = np.linalg.qr(np.random.default_rng(2).standard_normal((8, 8)))
    w = np.array([3.0, 2.5, 2.0, 1.5, 1.0, 0.5, 0.2, 0.0])  # rank 7
    a = q @ np.diag(w) @ q.T
    lu, piv = bl.lu_factor_nullpivot(jnp.asarray(a))
    import jax.scipy.linalg as jsl
    b = a @ np.ones(8)  # in range(A)
    x = np.asarray(jsl.lu_solve((lu, piv), jnp.asarray(b)))
    assert np.isfinite(x).all()
    # residual small in the range of A
    r = a @ x - b
    assert np.linalg.norm(r) < 1e-6 * np.linalg.norm(b)


def test_sylvester_counts():
    d, n = 3, 10
    a = _spd_batch(d, n)
    b = np.tile(np.eye(n), (d, 1, 1))
    mask = np.ones((d, n), dtype=bool)
    for theta in (0.5, 1.0, 2.0):
        neg, pos = bl.sylvester_counts(jnp.asarray(a), jnp.asarray(b),
                                       jnp.full((d,), theta), jnp.asarray(mask))
        w = np.linalg.eigvalsh(a)
        assert (np.asarray(neg) == (w < theta).sum(axis=1)).all()
        assert (np.asarray(pos) == (w > theta).sum(axis=1)).all()


def test_sylvester_counts_respects_pad():
    d, n, k = 2, 8, 5
    a = np.tile(np.eye(n), (d, 1, 1))
    a[:, :k, :k] = _spd_batch(d, k)[0]
    b = np.tile(np.eye(n), (d, 1, 1))
    mask = np.zeros((d, n), dtype=bool)
    mask[:, :k] = True
    neg, pos = bl.sylvester_counts(jnp.asarray(a), jnp.asarray(b),
                                   jnp.full((d,), 0.5), jnp.asarray(mask))
    w = np.linalg.eigvalsh(a[0, :k, :k])
    assert int(np.asarray(neg)[0]) == int((w < 0.5).sum())


def test_lu_level1_matches_cholesky():
    from geneo4petsc_tpu.config import DriverOptions, GenEOOptions, KSPOptions
    from geneo4petsc_tpu.models import laplacian
    from geneo4petsc_tpu.solver import solve_mesh

    mesh = laplacian.get_input("--size 10 --dim 2")
    its = {}
    for t in ("cholesky", "lu"):
        g = GenEOOptions()
        g.lvl1, g.lvl2 = "ASM", "1"
        g.dls1.type = t
        out = solve_mesh(mesh, n_dom=4, pc_type="geneo", geneo=g,
                         ksp=KSPOptions(type="cg", rtol=1e-10),
                         driver=DriverOptions(add_overlap=1))
        assert out.converged
        its[t] = out.its
    assert its["lu"] == its["cholesky"]


def test_ldlt_inertia_matches_eigvalsh():
    """Unpivoted-LDL^T inertia == eigenvalue sign counts on masked
    batches, for shifts on both sides of the spectrum."""
    import jax.numpy as jnp
    from geneo4petsc_tpu.ops.batched_linalg import ldlt_inertia

    rng = np.random.default_rng(3)
    d, n = 5, 24
    a = rng.standard_normal((d, n, n))
    a = 0.5 * (a + a.transpose(0, 2, 1))
    mask = np.ones((d, n), bool)
    mask[2, 18:] = False          # padded domain
    mask[4, 6:] = False           # tiny domain
    # decouple pads exactly as assembly does (identity diag)
    for p in range(d):
        a[p][~mask[p], :] = 0.0
        a[p][:, ~mask[p]] = 0.0
        a[p][~mask[p], ~mask[p]] = 1.0
    for shift in (-2.0, 0.0, 1.5):
        s = a - shift * np.eye(n)
        neg, pos = ldlt_inertia(jnp.asarray(s), jnp.asarray(mask))
        for p in range(d):
            w = np.linalg.eigvalsh(s[p][np.ix_(mask[p], mask[p])])
            assert int(np.asarray(neg)[p]) == int((w < 0).sum()), (p, shift)
            assert int(np.asarray(pos)[p]) == int((w > 0).sum()), (p, shift)


def test_lobpcg_autocut_from_inertia():
    """cut=0 + lobpcg: the candidate count comes from the Sylvester
    inertia and the GenEO-1 coarse space matches the eigh path."""
    from geneo4petsc_tpu.config import DriverOptions, GenEOOptions, KSPOptions
    from geneo4petsc_tpu.models import laplacian
    from geneo4petsc_tpu.solver import solve_mesh

    mesh = laplacian.get_input("--size 24 --dim 2 --kappa 10000. quad")
    outs = {}
    for els in ("eigh", "lobpcg"):
        g = GenEOOptions()          # no cut
        g.lvl1, g.lvl2 = "ASM", "1"
        g.els2.type = els
        outs[els] = solve_mesh(mesh, n_dom=4, pc_type="geneo", geneo=g,
                               ksp=KSPOptions(type="cg", rtol=1e-8),
                               driver=DriverOptions(add_overlap=1))
    assert outs["lobpcg"].converged
    assert (outs["lobpcg"].stats.estim_dim_e > 0).any()
    assert outs["lobpcg"].its <= outs["eigh"].its + 3
