"""Elasticity workload tests: element correctness + GenEO robustness on a
vector-valued problem (rigid-body modes per subdomain)."""

import numpy as np

from geneo4petsc_tpu.assembly.assemble import assemble_global_csr
from geneo4petsc_tpu.config import DriverOptions, GenEOOptions, KSPOptions
from geneo4petsc_tpu.models import elasticity
from geneo4petsc_tpu.solver import solve_mesh


def test_element_stiffness_rigid_modes():
    k = elasticity.q1_plane_strain_stiffness(1.0, 0.3)
    assert np.allclose(k, k.T)
    w = np.linalg.eigvalsh(k)
    # exactly 3 rigid-body modes (2 translations + 1 rotation)
    assert int(np.sum(np.abs(w) < 1e-12)) == 3
    assert w[3] > 0.1
    # translations are in the kernel
    tx = np.zeros(8)
    tx[0::2] = 1.0
    assert np.abs(k @ tx).max() < 1e-12


def test_assembled_spd_and_clamped():
    m = elasticity.get_input("--size 10 --nu 0.3")
    a = assemble_global_csr(m).toarray()
    w = np.linalg.eigvalsh(a)
    assert w.min() > 0  # the clamped face removes all rigid modes


def test_geneo_captures_rigid_modes():
    """Floating subdomains carry rigid modes; the GenEO coarse space must
    pick them up and cut the iteration count substantially."""
    m = elasticity.get_input("--size 12 --nu 0.3 --kappa 1000. minmax")
    ksp = KSPOptions(type="cg", rtol=1e-8)
    drv = DriverOptions(add_overlap=1)
    g0 = GenEOOptions()
    g0.lvl1, g0.lvl2 = "ASM", "0"
    base = solve_mesh(m, n_dom=6, pc_type="geneo", geneo=g0, ksp=ksp,
                      driver=drv)
    g1 = GenEOOptions()
    g1.lvl1, g1.lvl2 = "ASM", "H1"
    two = solve_mesh(m, n_dom=6, pc_type="geneo", geneo=g1, ksp=ksp,
                     driver=drv)
    assert base.converged and two.converged
    assert two.its < 0.6 * base.its
    assert two.stats.real_dim_e.sum() >= 3  # at least the rigid modes


def test_nearly_incompressible_still_solves():
    m = elasticity.get_input("--size 8 --nu 0.45")
    g = GenEOOptions()
    g.lvl1, g.lvl2 = "SORAS", "2"
    out = solve_mesh(m, n_dom=4, pc_type="geneo", geneo=g,
                     ksp=KSPOptions(type="cg", rtol=1e-8),
                     driver=DriverOptions(add_overlap=1))
    assert out.converged
