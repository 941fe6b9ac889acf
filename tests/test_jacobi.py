"""Fixed-sweep batched Jacobi eigh (ops/jacobi.py) vs LAPACK."""

import numpy as np
import pytest

import jax.numpy as jnp

from geneo4petsc_tpu.ops.jacobi import jacobi_eigh


@pytest.mark.parametrize("m", [1, 2, 3, 6, 12, 24])
def test_matches_lapack(m):
    rng = np.random.default_rng(m)
    a = rng.standard_normal((8, m, m))
    a = a + np.swapaxes(a, -1, -2)
    w, v = jacobi_eigh(jnp.asarray(a))
    w, v = np.asarray(w), np.asarray(v)
    wr = np.linalg.eigvalsh(a)
    assert np.abs(w - wr).max() <= 1e-11 * max(np.abs(wr).max(), 1.0)
    # decomposition property + orthogonality
    rec = np.einsum("dij,dj,dkj->dik", v, w, v)
    assert np.abs(rec - a).max() <= 1e-11 * np.abs(a).max()
    vtv = np.einsum("dji,djk->dik", v, v)
    assert np.abs(vtv - np.eye(m)).max() <= 1e-12


def test_ill_conditioned_cluster():
    """Near-degenerate spectra (the whitening gram near convergence is
    ~identity): eigenvalues must still come out to machine precision."""
    rng = np.random.default_rng(0)
    m = 9
    q, _ = np.linalg.qr(rng.standard_normal((m, m)))
    w_true = np.array([1e-12, 1e-9, 1e-6, 1.0, 1.0, 1.0 + 1e-9,
                       2.0, 2.0, 1e6])
    a = (q * w_true) @ q.T
    a = 0.5 * (a + a.T)
    w, _v = jacobi_eigh(jnp.asarray(a[None]))
    wr = np.linalg.eigvalsh(a)
    assert np.abs(np.asarray(w)[0] - wr).max() <= 1e-9 * 1e6


def test_f32_batch():
    rng = np.random.default_rng(3)
    a = rng.standard_normal((16, 6, 6)).astype(np.float32)
    a = a + np.swapaxes(a, -1, -2)
    w, v = jacobi_eigh(jnp.asarray(a))
    wr = np.linalg.eigvalsh(a.astype(np.float64))
    assert np.abs(np.asarray(w, np.float64) - wr).max() <= 1e-4
    assert w.dtype == jnp.float32 and v.dtype == jnp.float32
