"""Pallas kernel tests (interpreter mode on CPU; the compiled path runs on
TPU via dls1 type 'inverse_pallas')."""

import numpy as np
import jax.numpy as jnp
import pytest

from geneo4petsc_tpu.ops.pallas_kernels import block_matvec, fused_local_solve


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    d, n = 6, 16
    inv = rng.standard_normal((d, n, n))
    inv = 0.5 * (inv + inv.transpose(0, 2, 1))
    pou = rng.random((d, n)) + 0.5
    mask = rng.random((d, n)) > 0.2
    x = rng.standard_normal((d, n))
    return inv, pou, mask, x


@pytest.mark.parametrize("pre,post", [(False, False), (True, False),
                                      (True, True)])
def test_fused_local_solve(data, pre, post):
    inv, pou, mask, x = data
    y = np.asarray(fused_local_solve(
        jnp.asarray(inv), jnp.asarray(pou), jnp.asarray(mask),
        jnp.asarray(x), pre=pre, post=post, interpret=True))
    xr = x * pou if pre else x
    yr = np.einsum("dij,dj->di", inv, xr)
    if post:
        yr = yr * pou
    yr = np.where(mask, yr, 0)
    assert np.allclose(y, yr, atol=1e-12)


def test_block_matvec(data):
    inv, _, _, x = data
    a = inv + 3.0 * np.eye(inv.shape[-1])
    y = np.asarray(block_matvec(jnp.asarray(a), jnp.asarray(x),
                                interpret=True))
    assert np.allclose(y, np.einsum("dij,dj->di", a, x), atol=1e-12)


def test_end_to_end_pallas_matches_xla(monkeypatch):
    """The pallas-fused preconditioner must produce the same apply as the
    XLA path (interpreter mode)."""
    import geneo4petsc_tpu.ops.pallas_kernels as pk
    orig = pk.fused_local_solve

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pk, "fused_local_solve", interp)

    import dataclasses

    from geneo4petsc_tpu.assembly.assemble import assemble
    from geneo4petsc_tpu.config import GenEOOptions
    from geneo4petsc_tpu.models import laplacian
    from geneo4petsc_tpu.partition.decompose import partition_and_decompose
    from geneo4petsc_tpu.precond.geneo import setup_geneo

    mesh = laplacian.get_input("--size 10 --dim 2")
    d = partition_and_decompose(mesh, 4, add_overlap=1)
    ap = assemble(mesh, d)
    g = GenEOOptions()
    g.lvl1, g.lvl2 = "RAS", "1"
    g.dls1.type = "inverse"
    pc, _ = setup_geneo(ap.batch, g, decomp=d)
    pc_pallas = dataclasses.replace(pc, use_pallas=True)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(mesh.n_nodes))
    y_xla = np.asarray(pc.apply(x))
    y_pal = np.asarray(pc_pallas.apply(x))
    assert np.allclose(y_pal, y_xla, atol=1e-10 * max(1, np.abs(y_xla).max()))
