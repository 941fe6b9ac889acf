"""Batched symmetric eigendecomposition for TINY matrices (m <= ~48).

``jnp.linalg.eigh`` on TPU lowers to an iterative QDWH/Jacobi routine
with data-dependent while_loops — measured ~0.1 s per call for a
[64, 6, 6] batch, which the LOBPCG loop pays TWICE per iteration
(whitening gram + Rayleigh-Ritz): ~10 s of the 10M-headline eigensolve
wall for matrices with 36 entries.  This module is a fixed-sweep cyclic
Jacobi eigensolver: every rotation is a batched elementwise update over
the [d] axis, no control flow beyond a static python loop, so XLA
compiles it to a straight-line kernel that runs in microseconds.

Convergence: cyclic Jacobi is quadratically convergent; ``sweeps=8``
drives off-diagonal mass to machine precision for m <= 48 (pinned in
tests/test_jacobi.py against numpy.linalg.eigh across conditioning).
Eigenvalues return ASCENDING with their vectors, matching eigh's
contract so call sites swap transparently.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("sweeps",))
def jacobi_eigh(a: jax.Array, sweeps: int = 8):
    """Eigendecomposition of a batched symmetric [..., m, m] matrix.

    Returns (w ascending [..., m], v [..., m, m]) with a = v w v^T.
    Fixed ``sweeps`` cyclic-Jacobi sweeps (static-shape, jit-friendly);
    use for m <= ~48 — the cost grows as sweeps * m^2 rotations, each a
    batched O(m) elementwise update, so large m wants the LAPACK/XLA
    routes instead."""
    m = a.shape[-1]
    dtype = a.dtype
    batch = a.shape[:-2]
    a = 0.5 * (a + jnp.swapaxes(a, -1, -2))
    v = jnp.broadcast_to(jnp.eye(m, dtype=dtype), batch + (m, m))
    if m == 1:
        return a[..., 0], v

    def rotate(a, v, p, q):
        """One batched Jacobi rotation zeroing a[..., p, q]."""
        app = a[..., p, p]
        aqq = a[..., q, q]
        apq = a[..., p, q]
        # rotation angle: theta = (aqq - app) / (2 apq);
        # t = sign(theta) / (|theta| + sqrt(theta^2 + 1))
        small = jnp.abs(apq) <= jnp.finfo(dtype).tiny * 1e3
        theta = jnp.where(small, 1.0, (aqq - app)
                          / (2.0 * jnp.where(small, 1.0, apq)))
        t = jnp.sign(theta) / (jnp.abs(theta)
                               + jnp.sqrt(theta * theta + 1.0))
        t = jnp.where(small, 0.0, t)
        c = (1.0 / jnp.sqrt(t * t + 1.0))[..., None]
        s = (t[..., None]) * c
        # update rows/cols p and q of a:  G^T a G with G the (p,q) givens
        ap = a[..., p, :]
        aq = a[..., q, :]
        ap_new = c * ap - s * aq
        aq_new = s * ap + c * aq
        a = a.at[..., p, :].set(ap_new)
        a = a.at[..., q, :].set(aq_new)
        ap = a[..., :, p]
        aq = a[..., :, q]
        ap_new = c * ap - s * aq
        aq_new = s * ap + c * aq
        a = a.at[..., :, p].set(ap_new)
        a = a.at[..., :, q].set(aq_new)
        # exact zeros on the eliminated pair keep the off-diag decaying
        a = a.at[..., p, q].set(0.0)
        a = a.at[..., q, p].set(0.0)
        vp = v[..., :, p]
        vq = v[..., :, q]
        v = v.at[..., :, p].set(c * vp - s * vq)
        v = v.at[..., :, q].set(s * vp + c * vq)
        return a, v

    def sweep(_, av):
        a, v = av
        for p in range(m - 1):
            for q in range(p + 1, m):
                a, v = rotate(a, v, p, q)
        return a, v

    # one traced sweep body (m(m-1)/2 rotations), iterated by fori_loop
    # — keeps the HLO graph at one sweep's size for any sweep count
    a, v = jax.lax.fori_loop(0, sweeps, sweep, (a, v))

    w = jnp.diagonal(a, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    v = jnp.take_along_axis(v, order[..., None, :], axis=-1)
    return w, v


def use_jacobi(m: int) -> bool:
    """Policy: fixed-sweep Jacobi wins for tiny matrices on accelerator
    backends; LAPACK (cpu) eigh is already fast and exact."""
    import os
    if os.environ.get("GENEO_TINY_EIGH", "") == "xla":
        return False
    # m <= 24 keeps the one-sweep trace at ~3k ops (compile cost is the
    # constraint, not runtime: m=48 sweeps take minutes through a remote
    # compile service)
    return m <= 24 and jax.default_backend() != "cpu"


def tiny_eigh(a: jax.Array, sweeps: int = 8):
    """eigh with the tiny-batched-matrix fast path (see module doc)."""
    if use_jacobi(a.shape[-1]):
        return jacobi_eigh(a, sweeps=sweeps)
    return jnp.linalg.eigh(a)


def _selftest(m=12, d=8, seed=0):   # pragma: no cover - debug helper
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((d, m, m))
    a = a + np.swapaxes(a, -1, -2)
    w, v = jacobi_eigh(jnp.asarray(a))
    wr = np.linalg.eigvalsh(a)
    return float(np.abs(np.asarray(w) - wr).max())
