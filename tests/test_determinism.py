"""Determinism tests (SURVEY.md §5.2): the reference enforces determinism
structurally (sorted-set DOF ordering, pinned 2-rank goldens); the TPU
build gets it from XLA — assert bitwise-reproducible solves and stable
iteration counts across repeated runs and across setup reconstruction."""

import numpy as np

from geneo4petsc_tpu.config import DriverOptions, GenEOOptions, KSPOptions
from geneo4petsc_tpu.models import laplacian
from geneo4petsc_tpu.solver import solve_mesh


def _run():
    mesh = laplacian.get_input("--size 14 --dim 2 --kappa 1000. minmax")
    g = GenEOOptions()
    g.lvl1, g.lvl2 = "SORAS", "H2"
    return solve_mesh(mesh, n_dom=4, pc_type="geneo", geneo=g,
                      ksp=KSPOptions(type="cg", rtol=1e-10),
                      driver=DriverOptions(add_overlap=1))


def test_bitwise_reproducible():
    a = _run()
    b = _run()
    assert a.its == b.its
    assert (a.x == b.x).all()  # bitwise
    assert a.stats.real_dim_e.tolist() == b.stats.real_dim_e.tolist()
    h1 = np.asarray(a.result.history)
    h2 = np.asarray(b.result.history)
    assert np.array_equal(h1, h2, equal_nan=True)
