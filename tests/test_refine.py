"""Mixed-precision iterative-refinement tests."""

import numpy as np
import jax.numpy as jnp

from geneo4petsc_tpu.krylov.refine import make_inner_solver, refined_solve


def _spd(n, cond=1e4, seed=0):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    return q @ np.diag(np.geomspace(1.0, cond, n)) @ q.T


def test_reaches_beyond_f32_floor():
    a = _spd(60)
    x_true = np.arange(1.0, 61.0)
    b = a @ x_true
    a32 = jnp.asarray(a, jnp.float32)
    r = refined_solve(lambda v: a32 @ v, None, b,
                      lambda x: b - a @ x, tol=1e-10, inner_rtol=1e-5)
    assert r.converged
    assert r.true_res <= 1e-10
    assert np.allclose(r.x, x_true, atol=1e-5)
    assert r.outer_its >= 2  # f32 alone cannot reach 1e-10


def test_adaptive_inner_tolerance_saves_iterations():
    a = _spd(80, cond=1e5, seed=1)
    b = a @ np.ones(80)
    a32 = jnp.asarray(a, jnp.float32)
    inner = make_inner_solver(lambda v: a32 @ v, None, ksp_type="cg")
    r = refined_solve(None, None, b, lambda x: b - a @ x, tol=1e-8,
                      inner_solver=inner)
    # monotone decreasing outer history
    h = np.asarray(r.history)
    assert (np.diff(h) < 0).all()
    assert r.converged


def test_prebuilt_solver_reused():
    a = _spd(40)
    a32 = jnp.asarray(a, jnp.float32)
    inner = make_inner_solver(lambda v: a32 @ v, None)
    for seed in (0, 1):
        b = a @ np.random.default_rng(seed).standard_normal(40)
        r = refined_solve(None, None, b, lambda x: b - a @ x, tol=1e-9,
                          inner_solver=inner)
        assert r.converged
