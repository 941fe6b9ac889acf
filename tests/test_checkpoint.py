"""Checkpoint round-trip: a saved/loaded preconditioner applies identically
and solves with the same iteration count."""

import numpy as np
import jax
import jax.numpy as jnp

from geneo4petsc_tpu.assembly.assemble import assemble
from geneo4petsc_tpu.config import GenEOOptions
from geneo4petsc_tpu.krylov.cg import cg_solve
from geneo4petsc_tpu.models import laplacian
from geneo4petsc_tpu.partition.decompose import partition_and_decompose
from geneo4petsc_tpu.precond.geneo import setup_geneo
from geneo4petsc_tpu.utils.checkpoint import (config_fingerprint, load_pc,
                                              save_pc)


def test_roundtrip(tmp_path):
    mesh = laplacian.get_input("--size 12 --dim 2 --kappa 100. minmax")
    d = partition_and_decompose(mesh, 4, add_overlap=1)
    ap = assemble(mesh, d)
    g = GenEOOptions()
    g.lvl1, g.lvl2 = "SORAS", "H2"
    pc, _ = setup_geneo(ap.batch, g, decomp=d)

    path = tmp_path / f"pc-{config_fingerprint(lvl='SORAS,H2', n=4)}.npz"
    save_pc(str(path), pc)
    pc2 = load_pc(str(path))

    assert pc2.lvl1 == pc.lvl1 and pc2.dim_e == pc.dim_e
    x = jnp.asarray(np.random.default_rng(0).standard_normal(mesh.n_nodes))
    assert np.allclose(np.asarray(pc.apply(x)), np.asarray(pc2.apply(x)))

    b = jnp.asarray(ap.a_csr @ np.arange(1.0, mesh.n_nodes + 1))
    r1 = jax.jit(lambda bb: cg_solve(pc.batch.matvec, bb, pc.apply,
                                     rtol=1e-8))(b)
    r2 = jax.jit(lambda bb: cg_solve(pc2.batch.matvec, bb, pc2.apply,
                                     rtol=1e-8))(b)
    assert int(r1.its) == int(r2.its)
    assert np.allclose(np.asarray(r1.x), np.asarray(r2.x))


def test_structured_setup_checkpoint_roundtrip(tmp_path, monkeypatch):
    """GENEO_CHECKPOINT_DIR: second structured solve loads the pickled
    setup pytree (FDM factors, Z, coarse factorization) and skips the
    eigensolve entirely — the §5.4 design extended to the scale path."""
    import jax.numpy as jnp

    from geneo4petsc_tpu.config import GenEOOptions, KSPOptions
    from geneo4petsc_tpu.structured.grid import laplacian_grid
    from geneo4petsc_tpu.structured.solve import solve_structured

    monkeypatch.setenv("GENEO_CHECKPOINT_DIR", str(tmp_path))
    grid = laplacian_grid(12, dim=3, kappa_max=100.0, interp="minmax")
    g = GenEOOptions()
    g.lvl1, g.lvl2 = "ASM", "E1"
    out1 = solve_structured(grid, (2, 2, 1), 2, geneo=g,
                            ksp=KSPOptions(type="cg"), tol=1e-8)
    assert out1.converged
    files = list(tmp_path.iterdir())
    assert len(files) == 1
    g2 = GenEOOptions()
    g2.lvl1, g2.lvl2 = "ASM", "E1"
    out2 = solve_structured(grid, (2, 2, 1), 2, geneo=g2,
                            ksp=KSPOptions(type="cg"), tol=1e-8)
    assert out2.converged
    assert out2.timers.get("checkpoint_hit") > 0     # warm: no eigensolve
    assert out2.timers.get("l2_eig") == 0.0
    assert out2.its == out1.its                      # identical PC
    # per-domain dimE recovered from the cached colids
    np.testing.assert_array_equal(out2.stats.real_dim_e,
                                  out1.stats.real_dim_e)
