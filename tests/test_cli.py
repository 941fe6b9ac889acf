"""CLI + output-protocol tests: golden byte-parity with the reference's
dummy .ref files (a subset of the 84-config matrix; the full matrix runs in
tst/dummy_check.py), INFO/TIME line structure, plot-tool parseability."""

import io
import os
import re

import numpy as np
import pytest

from geneo4petsc_tpu import cli

REF = "/root/reference/tst/dummy"


def _run(args):
    buf = io.StringIO()
    rc = cli.run(args, out=buf)
    return rc, buf.getvalue()


def _normalize(text):
    text = text.replace("L1 mumps", "L1 cholesky")
    text = text.replace("L2 arpack mumps", "L2 eigh cholesky")
    return text


GOLDEN_SUBSET = [
    ("tridiag", "-pc_type geneo -geneo_lvl ASM,1", "geneoASM1", "dual", ""),
    ("tridiag", "-pc_type geneo -geneo_lvl SORAS,E2", "geneoSORASE2",
     "nodal", ""),
    ("tridiag", "-pc_type bjacobi", "bjacobi", "dual", ""),
    ("identity", "-pc_type geneo -geneo_lvl ASM,H1 --addOverlap 1",
     "geneoASMH1", "dual", "-opt=overlap1"),
    ("identity", "-pc_type geneo -geneo_lvl SORAS,2 -geneo_offload",
     "geneoSORAS2", "nodal", "-opt=offload"),
]


@pytest.mark.parametrize("f,pc,pc_log,metis,opt", GOLDEN_SUBSET)
def test_golden_byte_parity_with_reference(f, pc, pc_log, metis, opt):
    """Output byte-identical to the reference's golden .ref (only the
    solver-name tokens normalized)."""
    args = ["--inpFileA", f"{REF}/{f}.inp"]
    if f == "identity":
        args += ["--inpFileB", f"{REF}/B.inp"]
    else:
        args += ["--inpEps", "1.", "-geneo_cut", "10"]
    args += pc.split()
    args += ["--verbose", "2", "--shortRes", "-ksp_atol", "1.e-12",
             "-ksp_rtol", "1.e-12", "--nbPart", "2",
             "--metisDual" if metis == "dual" else "--metisNodal"]
    rc, out = _run(args)
    assert rc == 0
    ref_path = f"{REF}/{f}-pc={pc_log}-metis={metis}{opt}.ref"
    ref = _normalize(open(ref_path).read())
    assert out == ref


def test_full_result_line_format():
    rc, out = _run(["--inpFileA", f"{REF}/tridiag.inp", "--inpEps", "1.",
                    "-pc_type", "geneo", "-geneo_lvl", "ASM,1",
                    "-ksp_rtol", "1.e-10", "--nbPart", "2"])
    assert rc == 0
    m = re.search(r"INFO: solve - converged \(KSP_CONVERGED_RTOL\), "
                  r"(\d+) iteration\(s\), residual norm ([\d.]+), "
                  r"\|\| AX - B \|\| / \|\| B \|\| ([\d.]+)", out)
    assert m, out
    assert float(m.group(3)) < 1e-8


def test_setup_line_stats():
    rc, out = _run(["--inpFileA", f"{REF}/tridiag.inp", "--inpEps", "1.",
                    "-pc_type", "geneo", "-geneo_lvl", "ASM,1",
                    "--nbPart", "2"])
    m = re.search(r"INFO: setup - estim dimE (\d+) \(local: min (\d+), "
                  r"max (\d+)\), , real dimE (\d+)", out)
    assert m, out


def test_timing_lines_parseable_by_plot_tool(tmp_path):
    rc, out = _run(["--inpLibA", "laplacian", "--inpLibArg",
                    "--size#6#--dim#2", "-pc_type", "geneo",
                    "-geneo_lvl", "ASM,H1", "--nbPart", "2", "--timing"])
    assert rc == 0
    assert "TIME: read input" in out
    assert "L1       setup: Minv" in out
    assert "L2       setup:" in out
    assert "TIME: total time" in out
    # plot tool can parse it
    log = tmp_path / "laplacian-ws=1-size=6-np=2-tol=1e-5-pc=x-metis=dual.log"
    log.write_text(out)
    import sys
    sys.path.insert(0, "/root/repo/tst")
    from plot import parse_log
    r = parse_log(str(log))
    assert r.n_dof == 36
    assert r.nb_it > 0
    assert r.pc == "geneo1HASM"
    assert "solve" in r.times


def test_help():
    rc, out = _run(["--help"])
    assert rc == 0


def test_no_input_error():
    rc, _ = _run(["-pc_type", "bjacobi"])
    assert rc == 1


def test_cmdline_echo():
    rc, out = _run(["--inpFileA", f"{REF}/tridiag.inp", "--inpEps", "1.",
                    "--nbPart", "2", "--cmdLine", "--shortRes"])
    assert "CMD: geneo4petsc_tpu" in out


def test_debug_files(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc, out = _run(["--inpFileA", f"{REF}/tridiag.inp", "--inpEps", "1.",
                    "--nbPart", "2", "--debug", "log",
                    "-pc_type", "geneo", "-geneo_lvl", "ASM,1"])
    assert rc == 0
    assert os.path.exists("debug.input.A.MatIS.log")
    assert os.path.exists("debug.input.B.log")
    assert os.path.exists("debug.output.X.log")
    assert os.path.exists("debug.apply.residual.log")
    x = np.loadtxt("debug.output.X.log")
    assert np.allclose(x, np.arange(1, 9), atol=1e-4)
    hist = open("debug.apply.residual.log").read().splitlines()
    assert hist[0].startswith("Iteration 0: residual")


def test_checks_pass():
    rc, out = _run(["--inpFileA", f"{REF}/tridiag.inp", "--inpEps", "1.",
                    "--nbPart", "2", "-geneo_chk", "log",
                    "-pc_type", "geneo", "-geneo_lvl", "SORAS,2",
                    "--shortRes"])
    assert rc == 0
    assert "converged" in out


def test_structured_cli_path():
    """--structured GX,GY,GZ drives the FDM/stencil scale backend through
    the standard CLI protocol."""
    import io

    from geneo4petsc_tpu import cli

    buf = io.StringIO()
    rc = cli.run(["--inpLibA", "laplacian", "--inpLibArg",
                  "--size#12#--dim#3#--kappa#1000.#minmax",
                  "--structured", "2,2,2", "--addOverlap", "1",
                  "-pc_type", "geneo", "-geneo_lvl", "ASM,E1",
                  "-els2_type", "lobpcg", "-geneo_cut", "2",
                  "-ksp_type", "cg", "-ksp_rtol", "1e-8", "--timing"],
                 out=buf)
    txt = buf.getvalue()
    assert rc == 0
    assert "nb DOFs 1728" in txt
    assert "structured 2x2x2" in txt
    assert "converged" in txt
    assert "TIME: total" in txt


def test_structured_cli_rejects_nonseparable_inputs():
    import io

    from geneo4petsc_tpu import cli

    buf = io.StringIO()
    rc = cli.run(["--inpLibA", "graph", "--inpLibArg", "--size#4",
                  "--structured", "2,2,2", "-pc_type", "geneo",
                  "-geneo_lvl", "ASM,1"], out=buf)
    assert rc == 1
