"""GenEO preconditioner tests: all level-1/level-2 variants, manufactured
solutions, GenEO robustness properties, Nicolaides/Sylvester/cut semantics.

Mirrors the reference dummy 21-config matrix (tst/dummy/dummy.sh) on the
same golden systems, plus property tests from the -geneo_chk invariants.
"""

import numpy as np
import pytest

from geneo4petsc_tpu.config import DriverOptions, GenEOOptions, KSPOptions
from geneo4petsc_tpu.io.element_input import read_input_file
from geneo4petsc_tpu.models import laplacian
from geneo4petsc_tpu.solver import solve_mesh

TRIDIAG = "/root/reference/tst/dummy/tridiag.inp"
IDENTITY = "/root/reference/tst/dummy/identity.inp"

LVLS = ["ASM,0", "ASM,1", "ASM,H1", "ASM,E1",
        "SORAS,0", "SORAS,2", "SORAS,H2", "SORAS,E2",
        "RAS,1", "SRAS,1", "ORAS,1"]


def _opts(lvl, **kw):
    g = GenEOOptions(**kw)
    g.lvl1, g.lvl2 = lvl.split(",")
    return g


@pytest.mark.parametrize("lvl", LVLS)
@pytest.mark.parametrize("metis_dual", [True, False])
def test_dummy_tridiag_exact_solution(lvl, metis_dual):
    """The dummy golden behavior: X = (1..8) at tol 1e-12 on 2 domains."""
    mesh = read_input_file(TRIDIAG, inp_eps=1.0)
    out = solve_mesh(mesh, n_dom=2, pc_type="geneo", geneo=_opts(lvl),
                     ksp=KSPOptions(rtol=1e-12, atol=1e-12),
                     driver=DriverOptions(metis_dual=metis_dual))
    assert out.converged
    assert np.allclose(out.x, np.arange(1, 9), atol=1e-9)


@pytest.mark.parametrize("lvl", ["ASM,1", "ASM,H1", "ASM,E1", "SORAS,2"])
def test_dummy_tridiag_overlap1(lvl):
    mesh = read_input_file(TRIDIAG, inp_eps=1.0)
    out = solve_mesh(mesh, n_dom=2, pc_type="geneo", geneo=_opts(lvl),
                     ksp=KSPOptions(rtol=1e-12, atol=1e-12),
                     driver=DriverOptions(add_overlap=1))
    assert out.converged
    assert np.allclose(out.x, np.arange(1, 9), atol=1e-9)


def test_dummy_identity_with_rhs_file():
    mesh = read_input_file(IDENTITY)
    drv = DriverOptions(inp_file_b="/root/reference/tst/dummy/B.inp")
    out = solve_mesh(mesh, n_dom=2, pc_type="geneo", geneo=_opts("ASM,1"),
                     ksp=KSPOptions(rtol=1e-12, atol=1e-12), driver=drv)
    assert out.converged
    assert np.allclose(out.x, np.arange(1, 9), atol=1e-9)


def test_bjacobi_baseline():
    mesh = read_input_file(TRIDIAG, inp_eps=1.0)
    out = solve_mesh(mesh, n_dom=2, pc_type="bjacobi",
                     ksp=KSPOptions(rtol=1e-12, atol=1e-12))
    assert out.converged
    assert np.allclose(out.x, np.arange(1, 9), atol=1e-9)


def test_geneo_cut_bounds_coarse_space():
    mesh = laplacian.get_input("--size 16 --dim 2 --kappa 1000. minmax")
    drv = DriverOptions(add_overlap=1)
    out = solve_mesh(mesh, n_dom=4, pc_type="geneo",
                     geneo=_opts("SORAS,2", cut=4),
                     ksp=KSPOptions(type="cg", rtol=1e-8), driver=drv)
    assert out.converged
    # GenEO-2 halves the cut between its two problems (geneo.cpp:1275):
    # each domain contributes at most 2 + 2 columns
    assert out.stats.real_dim_e.max() <= 4


def test_no_syl_limits_to_one_candidate():
    mesh = laplacian.get_input("--size 16 --dim 2 --kappa 1000. minmax")
    out = solve_mesh(mesh, n_dom=4, pc_type="geneo",
                     geneo=_opts("ASM,1", no_syl=True),
                     ksp=KSPOptions(type="cg", rtol=1e-8))
    assert out.converged
    # EPS default nev=1 per domain (+ possible Nicolaides)
    assert out.stats.real_dim_e.max() <= 2
    assert out.stats.estim_dim_e.sum() == 0  # no Sylvester estimates


def test_sylvester_estimate_matches_real():
    """With Sylvester estimation on and no cut, estim == real (up to
    Nicolaides additions)."""
    mesh = laplacian.get_input("--size 16 --dim 2 --kappa 1000. minmax")
    out = solve_mesh(mesh, n_dom=4, pc_type="geneo", geneo=_opts("ASM,1"),
                     ksp=KSPOptions(type="cg", rtol=1e-8))
    st = out.stats
    assert (st.real_dim_e == st.estim_dim_e + st.nicolaides).all()


def test_geneo_coarse_robustness_high_contrast():
    """The GenEO property: with a high-contrast coefficient the 2-level
    method's iteration count stays bounded as 1-level degrades."""
    mesh = laplacian.get_input("--size 30 --dim 2 --kappa 100000. quad")
    ksp = KSPOptions(type="cg", rtol=1e-8)
    drv = DriverOptions(add_overlap=1)
    its = {}
    for lvl in ("ASM,0", "ASM,H1"):
        out = solve_mesh(mesh, n_dom=8, pc_type="geneo", geneo=_opts(lvl),
                         ksp=ksp, driver=drv)
        assert out.converged
        its[lvl] = out.its
    assert its["ASM,H1"] < its["ASM,0"]


def test_effhybrid_initial_guess_is_qb():
    mesh = laplacian.get_input("--size 10 --dim 2 --kappa 100. minmax")
    out = solve_mesh(mesh, n_dom=4, pc_type="geneo", geneo=_opts("ASM,E1"),
                     ksp=KSPOptions(type="cg", rtol=1e-8))
    assert out.converged
    x0 = np.asarray(out.pc.x0)
    assert np.abs(x0).max() > 0  # X0 = Q B is nonzero


def test_nicolaides_counts_reported():
    mesh = read_input_file(TRIDIAG, inp_eps=1.0)
    out = solve_mesh(mesh, n_dom=2, pc_type="geneo", geneo=_opts("ASM,1"),
                     ksp=KSPOptions(rtol=1e-12, atol=1e-12))
    # diag-dominant tridiag: no near-kernel eigenvalues below tau; the
    # empty-Z fallback adds one constant vector per domain
    assert out.stats.real_dim_e.sum() == out.stats.nicolaides.sum() == 2


def test_pou_positive():
    """-geneo_chk invariant: partition of unity strictly positive
    (geneo.cpp:988-997)."""
    mesh = laplacian.get_input("--size 10 --dim 2")
    out = solve_mesh(mesh, n_dom=4, pc_type="geneo", geneo=_opts("RAS,1"),
                     ksp=KSPOptions(type="cg", rtol=1e-8))
    d = np.asarray(out.pc.pou)
    assert (d > 0).all()
    assert (d <= 1).all()


def test_empty_domains_tolerated():
    """ranks > data path (geneo4PETSc.cpp:1594-1599): empty domains are
    masked out instead of shrinking a communicator."""
    mesh = read_input_file(IDENTITY)
    drv = DriverOptions(inp_file_b="/root/reference/tst/dummy/B.inp")
    out = solve_mesh(mesh, n_dom=5, pc_type="geneo", geneo=_opts("ASM,1"),
                     ksp=KSPOptions(rtol=1e-12, atol=1e-12), driver=drv)
    assert out.converged
    assert np.allclose(out.x, np.arange(1, 9), atol=1e-9)


def test_upload_sparse_roundtrip():
    """COO upload + device scatter-fill reconstructs the dense blocks
    bit-exactly (the tunnel-bandwidth path for the accelerator setup)."""
    import jax
    from geneo4petsc_tpu.precond.geneo import _upload_sparse

    rng = np.random.default_rng(7)
    x = rng.standard_normal((3, 8, 8)).astype(np.float32)
    x[x < 0.8] = 0.0          # sparse-ish, keeps some negatives out
    x[1] = 0.0                # one all-zero block
    got = np.asarray(_upload_sparse(x, jax.devices("cpu")[0]))
    assert got.shape == x.shape
    assert (got == x).all()


def test_geneo_3d_laplacian():
    """End-to-end GenEO-1 on the 3-D hexahedral Laplacian (the reference's
    --dim 3 workload path, laplacian.cpp getInput)."""
    mesh = laplacian.get_input("--size 6 --dim 3 --kappa 1000. quad")
    out = solve_mesh(mesh, n_dom=8, pc_type="geneo", geneo=_opts("RAS,H1"),
                     ksp=KSPOptions(type="cg", rtol=1e-8),
                     driver=DriverOptions(add_overlap=1))
    assert out.converged
    assert out.pc.dim_e > 0
    n = mesh.n_nodes
    assert np.allclose(np.asarray(out.x), np.arange(1.0, n + 1), atol=1e-4)


def test_rank_deficient_e_pruned():
    """dim_e > n_dof forces a rank-deficient raw E; the pivoted-Cholesky
    pruning pass must drop EXACTLY the raw null count, leave an SPD E
    (no truncating-pinv null modes), and the PC must stay nonsingular —
    the principled replacement for MUMPS null-pivot fixing
    (geneo.cpp:76-92)."""
    from geneo4petsc_tpu.precond import geneo as _g

    raw_e = []
    orig = _g.prune_dependent_columns

    def capture(e, dtype):
        raw_e.append(np.asarray(e, np.float64).copy())
        return orig(e, dtype)

    mesh = laplacian.get_input("--size 20 --dim 2 --kappa 100000. quad")
    g = _opts("SORAS,E2")
    old = _g.prune_dependent_columns
    _g.prune_dependent_columns = capture
    try:
        out = solve_mesh(mesh, n_dom=16, pc_type="geneo", geneo=g,
                         ksp=KSPOptions(type="cg", rtol=1e-10, max_it=400),
                         driver=DriverOptions(add_overlap=1))
    finally:
        _g.prune_dependent_columns = old
    assert out.stats.e_pruned > 0
    assert out.stats.e_null == 0            # pruned E is SPD
    assert out.pc.dim_e <= mesh.n_nodes     # rank bound restored
    # dim_e shrank by exactly the raw E's numerical null count
    e0 = raw_e[0]
    ew = np.linalg.eigvalsh(e0)
    tol = e0.shape[0] * np.finfo(np.float64).eps * np.abs(ew).max()
    assert out.stats.e_pruned == int((ew <= tol).sum())
    assert out.pc.dim_e + out.stats.e_pruned == e0.shape[0]
    assert out.converged


def test_rank_deficient_e_no_wrng_line():
    """With pruning in place the rank-deficiency warning must be gone and
    the solve must converge cleanly through the CLI."""
    import io

    from geneo4petsc_tpu import cli

    buf = io.StringIO()
    rc = cli.run(["--inpLibA", "laplacian", "--inpLibArg",
                  "--size 20 --dim 2 --kappa 100000. quad",
                  "-pc_type", "geneo", "-geneo_lvl", "SORAS,E2",
                  "--nbPart", "16", "--addOverlap", "1",
                  "-ksp_type", "cg", "--verbose", "1"], out=buf)
    assert rc == 0
    assert "WRNG: E is rank-deficient" not in buf.getvalue()
    assert "converged" in buf.getvalue()


def test_device_pencils_match_host_construction():
    """The accelerator-path pencil builders must produce exactly the same
    operators as the host path (they only activate on real chips, so pin
    their math here on CPU)."""
    import jax.numpy as jnp

    from geneo4petsc_tpu.assembly.assemble import assemble, robin_blocks
    from geneo4petsc_tpu.partition.decompose import partition_and_decompose
    from geneo4petsc_tpu.precond.geneo import (_dadird, _pencil_g2_device,
                                               _pencil_tau_device,
                                               _with_pad_diag)

    mesh = laplacian.get_input("--size 10 --dim 2 --kappa 100. quad")
    decomp = partition_and_decompose(mesh, 4, add_overlap=1)
    batch = assemble(mesh, decomp, dtype=jnp.float32).batch
    optim = 0.02

    # GenEO-1 tau: (A_Neu steered, D A_Dir D)
    a_dev, b_dev = _pencil_tau_device(batch.a_neu, batch.a_dir, batch.mult,
                                      batch.mask, jnp.float32(1e6))
    a_host = _with_pad_diag(batch.a_neu, batch.mask, 1e6)
    assert (np.asarray(a_dev) == np.asarray(a_host)).all()
    assert np.allclose(np.asarray(b_dev), np.asarray(_dadird(batch)),
                       rtol=1e-6)

    # GenEO-2 tau: (A_Neu steered, A_Rob)
    a_rob = robin_blocks(batch, optim)
    a_dev, b_dev = _pencil_g2_device(batch.a_neu, batch.a_dir, batch.mult,
                                     batch.mask, jnp.float32(optim), "tau")
    assert (np.asarray(a_dev) == np.asarray(a_host)).all()
    assert np.allclose(np.asarray(b_dev), np.asarray(a_rob), rtol=1e-6)

    # GenEO-2 gamma (swapped): (A_Rob steered, D A_Dir D)
    a_dev, b_dev = _pencil_g2_device(batch.a_neu, batch.a_dir, batch.mult,
                                     batch.mask, jnp.float32(optim), "gamma")
    a_host_g = _with_pad_diag(a_rob, batch.mask, 1e6)
    assert np.allclose(np.asarray(a_dev), np.asarray(a_host_g), rtol=1e-6)
    assert np.allclose(np.asarray(b_dev), np.asarray(_dadird(batch)),
                       rtol=1e-6)
