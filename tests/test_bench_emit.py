"""Bench artifact emission contract.

The driver records the LAST JSON line of `python bench.py` and keeps
only the last ~2000 chars of stdout: BENCH_r03 (rc=124, nothing printed)
and BENCH_r04 (final line 2.4 kB, tail capture started mid-string) were
both lost to this.  These tests pin the fix: every stdout line bench.py
emits fits the capture window with margin, including a fully-populated
final record, and the bulky content (metric prose, roofline) routes to
BENCH_DETAIL.json instead.
"""

import importlib.util
import json
import os
import sys

import pytest

_BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench.py")


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("bench_mod", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_mod"] = mod
    spec.loader.exec_module(mod)
    return mod


def _full_record():
    """A record shaped like the most complete round-4-style result:
    every stage present (headline + cold + elasticity + roofline),
    worst-case prose lengths taken from BENCH_r04's actual output."""
    return {
        "metric": "x" * 700,                     # r04's metric prose size
        "value": 1.296, "unit": "s/MDOF", "vs_baseline": 34.396,
        "baseline_target_s_per_mdof": 44.564, "pass": "steady",
        "n_dof": 10077696, "n_dom": 64, "overlap": 2, "dim_e": 126,
        "inner_its": 70, "outer_its": 2,
        "true_res": 9.635525648685249e-09,
        "rel_err_max": 3.7210886297820456e-06, "converged": True,
        "setup_s": 11.153, "solve_s": 1.903, "partition_s": 0.0,
        "rhs_s": 0.96, "generator_s": 0.424, "eig_s": 9.746,
        "device": "TPU v5 lite0",
        "cold_setup_s": 26.183, "cold_solve_s": 4.86, "cold_value": 3.08,
        "elas_value": 2.5, "elas_vs_baseline": 17.8,
        "elas_n_dof": 10536192, "elas_dim_e": 448,
        "elas_true_res": 8.1e-09, "elas_converged": True,
        "elas_setup_s": 20.0, "elas_solve_s": 6.3, "elas_eig_s": 15.0,
        "elas_outer_its": 3, "elas_inner_its": 140,
        "elas_metric": "y" * 700,
        "skipped": [], "wall_s": 485.1,
        "roofline": {
            "device_kind": "TPU v5 lite", "hbm_peak_gbps": 819.0,
            "stencil_matvec": {"time_ms": 2.39, "achieved_gbps": 101.1,
                               "achieved_gflops": 59.0,
                               "model": "m" * 60,
                               "frac_of_hbm_peak": 0.123},
            "fdm_apply": {"time_ms": 2.39, "achieved_gbps": 293.0,
                          "achieved_gflops": 3651.6, "model": "m" * 100,
                          "frac_of_hbm_peak": 0.358,
                          "frac_of_mxu_f32_peak": 0.0741},
            "pc_apply": {"time_ms": 18.74, "achieved_gbps": 47.0,
                         "achieved_gflops": 0.0, "model": "m" * 100,
                         "frac_of_hbm_peak": 0.057},
            "lobpcg_step": {"time_ms": 30.0, "achieved_gbps": 200.0,
                            "achieved_gflops": 900.0, "model": "m" * 100,
                            "frac_of_hbm_peak": 0.25, "k": 2},
            "solve_phase": {"inner_its": 70, "solve_s": 1.903,
                            "analytic_gb_per_it": 1.525,
                            "achieved_gbps": 56.1, "model": "m" * 100,
                            "frac_of_hbm_peak": 0.068},
        },
    }


def test_compact_final_line_fits_driver_tail(bench):
    """The worst-case fully-populated compact line stays under the
    1800-byte cap (driver keeps the last 2000 chars)."""
    line = json.dumps(bench._compact(_full_record()))
    assert len(line) < bench.MAX_LINE_BYTES, len(line)
    # and the parsed line carries the headline keys the judge reads
    parsed = json.loads(line)
    for k in ("value", "unit", "vs_baseline", "elas_value", "setup_s",
              "solve_s", "converged", "pc_apply_gbps", "lobpcg_gbps"):
        assert k in parsed, k


def test_emit_sheds_oversized_records(bench, capsys):
    """_emit never prints a line over the cap even when handed a bloated
    record — bulky keys are shed (they live in BENCH_DETAIL.json)."""
    bench._emit(_full_record())
    line = capsys.readouterr().out.strip()
    assert len(line) <= bench.MAX_LINE_BYTES
    json.loads(line)                    # still valid JSON


def test_compact_promotes_roofline_headlines(bench):
    out = bench._compact(_full_record())
    assert out["pc_apply_gbps"] == 47.0
    assert out["pc_apply_frac_hbm"] == 0.057
    assert out["lobpcg_gbps"] == 200.0
    assert out["detail"] == "BENCH_DETAIL.json"


def test_detail_file_roundtrip(bench, tmp_path, monkeypatch):
    p = tmp_path / "BENCH_DETAIL.json"
    monkeypatch.setattr(bench, "_DETAIL_PATH", str(p))
    rec = _full_record()
    bench._write_detail(rec)
    with open(p) as f:
        back = json.load(f)
    assert back["roofline"]["pc_apply"]["achieved_gbps"] == 47.0
    assert back["metric"] == rec["metric"]


def test_stage_emitter_consistency(bench, tmp_path, monkeypatch, capsys):
    """_emit_stage writes the FULL record to the detail file and prints
    ONLY the compact form."""
    p = tmp_path / "BENCH_DETAIL.json"
    monkeypatch.setattr(bench, "_DETAIL_PATH", str(p))
    bench._emit_stage(_full_record())
    line = capsys.readouterr().out.strip()
    assert len(line) <= bench.MAX_LINE_BYTES
    parsed = json.loads(line)
    assert "roofline" not in parsed
    assert parsed["value"] == 1.296
    with open(p) as f:
        assert "roofline" in json.load(f)
