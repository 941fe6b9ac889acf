"""Roofline accounting (utils/roofline.py) on the CPU backend.

The numbers are meaningless on CPU (peaks table keys TPU device kinds);
what these tests pin is the mechanics the bench relies on: the dict
shape, the analytic solve_phase aggregate, and the measurement budget
that keeps the roofline stage inside the driver's wall (the r04 fix —
an unbounded measurement ran 180+ s past the headline at 10M DOF).
"""

import jax.numpy as jnp

from geneo4petsc_tpu.config import GenEOOptions, KSPOptions
from geneo4petsc_tpu.structured.grid import laplacian_grid
from geneo4petsc_tpu.structured.solve import solve_structured
from geneo4petsc_tpu.utils import roofline as rl


def _solved_pc():
    grid = laplacian_grid(12, dim=3, kappa_max=100.0, interp="minmax")
    opts = GenEOOptions()
    opts.lvl1, opts.lvl2 = "ASM", "E1"
    opts.cut = 2
    out = solve_structured(grid, (2, 2, 2), 1, geneo=opts,
                           ksp=KSPOptions(type="cg"), tol=1e-8)
    assert out.converged
    return out


def test_measure_structured_shape():
    out = _solved_pc()
    r = rl.measure_structured(out.pc, reps=2, solve_s=0.5, inner_its=20)
    for key in ("stencil_matvec", "pc_apply", "solve_phase"):
        assert key in r, key
    mv = r["stencil_matvec"]
    # 12^3 on CPU can difference below the ns floor — only sign-check
    assert mv["time_ms"] >= 0
    assert mv["achieved_gbps"] > 0
    assert "model" in mv
    agg = r["solve_phase"]
    assert agg["inner_its"] == 20
    # 12^3 rounds below the 3-decimal GB print; the rate is nonzero
    assert agg["achieved_gbps"] >= 0
    assert agg["solve_s"] == 0.5


def test_measure_structured_budget_skips_kernels():
    out = _solved_pc()
    r = rl.measure_structured(out.pc, reps=2, solve_s=0.5, inner_its=20,
                              budget_s=0.0)
    # every measured kernel skipped, but the analytic aggregate (free)
    # still lands in the record
    assert "stencil_matvec" not in r
    assert "pc_apply" not in r
    assert set(r["skipped"]) >= {"stencil_matvec", "pc_apply"}
    assert "solve_phase" in r
