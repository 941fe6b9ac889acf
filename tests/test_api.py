"""Embedding-API tests (the PCGenEOSetup path, src/geneo.cpp:2518-2572):
an external code brings its own decomposition + local operators."""

import numpy as np
import pytest

from geneo4petsc_tpu import api
from geneo4petsc_tpu.config import GenEOOptions, KSPOptions


def _two_domain_poisson(n=12, overlap=2):
    """Hand-built 1D Poisson split into two overlapping domains, with
    PRE-WEIGHTED Neumann blocks (the reference's 1/elemMult contract)."""
    import scipy.sparse as sp
    a = sp.diags([[-1.0] * (n - 1), [2.0] * n, [-1.0] * (n - 1)],
                 [-1, 0, 1]).tocsr()
    a = a + sp.eye(n) * 0.01
    half = n // 2
    g0 = np.arange(0, half + overlap)
    g1 = np.arange(half - overlap, n)
    shared = np.intersect1d(g0, g1)
    mult = np.ones(n)
    mult[shared] = 2.0

    # split A into unassembled blocks by ownership weights: an entry shared
    # by both domains contributes half to each (the 1/elemMult contract)
    def neu_exact(g):
        k = len(g)
        w = np.zeros((k, k))
        for ii, gi in enumerate(g):
            for jj, gj in enumerate(g):
                v = a[gi, gj]
                if v:
                    m = 2.0 if (gi in shared and gj in shared) else 1.0
                    w[ii, jj] = v / m
        return w

    blocks = [neu_exact(g0), neu_exact(g1)]
    gids = [g0, g1]
    mults = [mult[g0], mult[g1]]
    return n, a, gids, blocks, mults


def test_make_batch_and_solve():
    n, a, gids, blocks, mults = _two_domain_poisson()
    batch = api.make_batch(n, gids, blocks, mults)
    # MatIS invariant holds
    x = np.random.default_rng(0).standard_normal(n)
    import jax.numpy as jnp
    y = np.asarray(batch.matvec(jnp.asarray(x)))
    assert np.allclose(y, a @ x, atol=1e-9)

    opts = GenEOOptions()
    opts.lvl1, opts.lvl2 = "ASM", "1"
    x_true = np.arange(1.0, n + 1)
    b = a @ x_true
    pc, stats = api.geneo_setup(batch, opts, b=b)
    res = api.geneo_solve(batch, b, pc,
                          KSPOptions(type="cg", rtol=1e-10))
    assert int(res.reason) >= 0
    assert np.allclose(np.asarray(res.x), x_true, atol=1e-5)


def test_make_batch_rejects_unsorted_gids():
    n, a, gids, blocks, mults = _two_domain_poisson()
    bad = [gids[0][::-1], gids[1]]
    with pytest.raises(ValueError):
        api.make_batch(n, bad, blocks, mults)


def test_geneo2_with_intersections():
    n, a, gids, blocks, mults = _two_domain_poisson()
    batch = api.make_batch(n, gids, blocks, mults)
    shared = np.intersect1d(gids[0], gids[1])
    i01 = np.searchsorted(gids[0], shared)
    i10 = np.searchsorted(gids[1], shared)
    inter = [[np.zeros(0, np.int64), i01], [i10, np.zeros(0, np.int64)]]
    opts = GenEOOptions()
    opts.lvl1, opts.lvl2 = "SORAS", "2"
    b = a @ np.arange(1.0, n + 1)
    pc, stats = api.geneo_setup(batch, opts, b=b, intersections=inter)
    assert stats.gamma_loc[0] > 1.0  # adaptive gamma computed
    res = api.geneo_solve(batch, b, pc, KSPOptions(rtol=1e-10))
    assert int(res.reason) >= 0
