"""Krylov solver tests: PETSc stopping semantics, reason taxonomy,
nonzero initial guess, restart behavior."""

import numpy as np
import jax.numpy as jnp
import pytest

from geneo4petsc_tpu.krylov import common as cm
from geneo4petsc_tpu.krylov.cg import cg_solve
from geneo4petsc_tpu.krylov.gmres import gmres_solve


def _spd(n, seed=0, cond=100.0):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    w = np.geomspace(1.0, cond, n)
    return q @ np.diag(w) @ q.T


@pytest.fixture
def sys40():
    a = _spd(40)
    x_true = np.arange(1.0, 41.0)
    return a, x_true, a @ x_true


@pytest.mark.parametrize("solver", [cg_solve, gmres_solve])
def test_converges_rtol(sys40, solver):
    a, x_true, b = sys40
    mv = lambda v: jnp.asarray(a) @ v
    res = solver(mv, jnp.asarray(b), rtol=1e-10, max_it=500)
    assert int(res.reason) == cm.CONVERGED_RTOL
    assert np.allclose(np.asarray(res.x), x_true, atol=1e-6)


@pytest.mark.parametrize("solver", [cg_solve, gmres_solve])
def test_converges_atol(sys40, solver):
    a, x_true, b = sys40
    mv = lambda v: jnp.asarray(a) @ v
    res = solver(mv, jnp.asarray(b), rtol=1e-30, atol=1e-6, max_it=500)
    assert int(res.reason) == cm.CONVERGED_ATOL


@pytest.mark.parametrize("solver", [cg_solve, gmres_solve])
def test_diverged_its(sys40, solver):
    a, _, b = sys40
    mv = lambda v: jnp.asarray(a) @ v
    res = solver(mv, jnp.asarray(b), rtol=1e-14, max_it=3)
    assert int(res.reason) == cm.DIVERGED_ITS
    assert int(res.its) == 3


@pytest.mark.parametrize("solver", [cg_solve, gmres_solve])
def test_zero_initial_residual(sys40, solver):
    a, x_true, b = sys40
    mv = lambda v: jnp.asarray(a) @ v
    res = solver(mv, jnp.asarray(b), x0=jnp.asarray(x_true), rtol=1e-8)
    assert int(res.its) == 0
    assert int(res.reason) >= 0


@pytest.mark.parametrize("solver", [cg_solve, gmres_solve])
def test_nonzero_initial_guess_helps(sys40, solver):
    a, x_true, b = sys40
    mv = lambda v: jnp.asarray(a) @ v
    res0 = solver(mv, jnp.asarray(b), rtol=1e-10)
    x0 = jnp.asarray(x_true + 1e-6 * np.ones_like(x_true))
    res1 = solver(mv, jnp.asarray(b), x0=x0, rtol=1e-10)
    assert int(res1.its) < int(res0.its)


@pytest.mark.parametrize("solver", [cg_solve, gmres_solve])
def test_preconditioner_reduces_iterations(sys40, solver):
    a, _, b = sys40
    mv = lambda v: jnp.asarray(a) @ v
    dinv = jnp.asarray(1.0 / np.diag(a))
    ainv = jnp.asarray(np.linalg.inv(a))
    res_jac = solver(mv, jnp.asarray(b), pc_apply=lambda v: dinv * v,
                     rtol=1e-10)
    res_exact = solver(mv, jnp.asarray(b), pc_apply=lambda v: ainv @ v,
                       rtol=1e-10)
    assert int(res_exact.its) <= 2
    assert int(res_exact.reason) >= 0
    assert int(res_jac.reason) >= 0


def test_cg_unpreconditioned_exact_count():
    """CG on an SPD matrix with k distinct eigenvalues converges in k
    iterations (theory check, mirrors PETSc behavior)."""
    q, _ = np.linalg.qr(np.random.default_rng(3).standard_normal((30, 30)))
    w = np.repeat([1.0, 4.0, 9.0], 10)
    a = q @ np.diag(w) @ q.T
    b = np.ones(30)
    mv = lambda v: jnp.asarray(a) @ v
    res = cg_solve(mv, jnp.asarray(b), rtol=1e-10,
                   norm_type="unpreconditioned")
    assert int(res.its) == 3


def test_gmres_restart_still_converges(sys40):
    a, x_true, b = sys40
    mv = lambda v: jnp.asarray(a) @ v
    res = gmres_solve(mv, jnp.asarray(b), rtol=1e-10, restart=7, max_it=2000)
    assert int(res.reason) >= 0
    assert np.allclose(np.asarray(res.x), x_true, atol=1e-5)


def test_history_monotone_prefix(sys40):
    a, _, b = sys40
    mv = lambda v: jnp.asarray(a) @ v
    res = gmres_solve(mv, jnp.asarray(b), rtol=1e-10)
    h = np.asarray(res.history)
    its = int(res.its)
    h = h[:its + 1]
    assert not np.isnan(h).any()
    # GMRES inner residuals are non-increasing
    assert (np.diff(h) <= 1e-9).all()


def test_reason_strings():
    assert cm.reason_string(cm.CONVERGED_RTOL) == "KSP_CONVERGED_RTOL"
    assert cm.reason_string(cm.DIVERGED_ITS) == "KSP_DIVERGED_ITS"
    assert cm.reason_string(cm.DIVERGED_PC_FAILED) == "KSP_DIVERGED_PC_FAILED"


def test_cg_indefinite_matrix_detected():
    a = np.diag([1.0, -1.0, 2.0, 3.0])
    b = np.ones(4)
    res = cg_solve(lambda v: jnp.asarray(a) @ v, jnp.asarray(b), rtol=1e-12)
    assert int(res.reason) == cm.DIVERGED_INDEFINITE_MAT
