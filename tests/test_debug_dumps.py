"""Debug/observability subsystem tests: -geneo_dbg file taxonomy, timing
dumps, plot-tool rendering."""

import io
import os

import numpy as np

from geneo4petsc_tpu import cli


def test_geneo_dbg_level2_files(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    buf = io.StringIO()
    rc = cli.run(["--inpLibA", "laplacian", "--inpLibArg",
                  "--size#6#--dim#2", "--nbPart", "3",
                  "-pc_type", "geneo", "-geneo_lvl", "RAS,1",
                  "-geneo_dbg", "log,2", "--shortRes"], out=buf)
    assert rc == 0
    # per-domain files with zero-padded domain ids (reference naming,
    # geneo.cpp:2501-2506)
    assert os.path.exists("debug0.setup.ANeu.log")
    assert os.path.exists("debug2.setup.ADir.log")
    assert os.path.exists("debug1.input.dof.log")
    assert os.path.exists("debug0.setup.Z.log")
    assert os.path.exists("debug0.setup.tau.ev.log")
    assert os.path.exists("debug.setup.E.eig.log")
    assert os.path.exists("debug0.input.intersect.log")
    assert os.path.exists("debug.timing.log")
    # the ANeu dump round-trips as a matrix
    a = np.loadtxt("debug0.setup.ANeu.log")
    assert a.ndim == 2 and a.shape[0] == a.shape[1]
    # dof map lines carry global ids + multiplicities
    line = open("debug0.input.dof.log").readline()
    assert "global index" in line and "multiplicity" in line


def test_geneo_dbg_level1_timing_only(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    buf = io.StringIO()
    rc = cli.run(["--inpLibA", "laplacian", "--inpLibArg",
                  "--size#5#--dim#2", "--nbPart", "2",
                  "-pc_type", "geneo", "-geneo_lvl", "ASM,1",
                  "-geneo_dbg", "log,1", "--shortRes"], out=buf)
    assert rc == 0
    assert os.path.exists("debug.timing.log")
    assert not os.path.exists("debug0.setup.ANeu.log")


def test_plot_renders_png(tmp_path, monkeypatch):
    import subprocess
    import sys

    logdir = tmp_path / "logs"
    logdir.mkdir()
    buf = io.StringIO()
    cli.run(["--inpLibA", "laplacian", "--inpLibArg", "--size#5#--dim#2",
             "--nbPart", "2", "-pc_type", "geneo", "-geneo_lvl", "ASM,1",
             "--timing"], out=buf)
    (logdir / "laplacian-ws=1-size=5-np=2-tol=1e-5-pc=x-metis=dual.log"
     ).write_text(buf.getvalue())
    out_png = tmp_path / "plot.png"
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "tst", "plot.py"),
         str(logdir), "--plot", str(out_png)],
        capture_output=True, text=True, timeout=240,
        env={**os.environ, "JAX_PLATFORM_NAME": "cpu"})
    assert r.returncode == 0, r.stderr
    assert out_png.exists() and out_png.stat().st_size > 1000
    assert "surfaces to plot" in r.stdout


def test_failure_dump_on_divergence(tmp_path, monkeypatch):
    """A DIVERGED_* outer reason must dump Krylov/PC state even with
    debugging off (checkKSPSolve discipline, geneo.cpp:1397-1433)."""
    monkeypatch.chdir(tmp_path)
    buf = io.StringIO()
    rc = cli.run(["--inpLibA", "laplacian", "--inpLibArg",
                  "--size#12#--dim#2#--kappa#100000.#quad", "--nbPart", "4",
                  "-pc_type", "none", "-ksp_type", "cg",
                  "-ksp_max_it", "3", "-ksp_rtol", "1e-12"], out=buf)
    assert rc == 0
    assert "diverged" in buf.getvalue()
    assert os.path.exists("debug.failure.ksp.log")
    txt = open("debug.failure.ksp.log").read()
    assert "DIVERGED" in txt
    assert "residual history" in txt


def test_no_failure_dump_on_convergence(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    buf = io.StringIO()
    rc = cli.run(["--inpLibA", "laplacian", "--inpLibArg",
                  "--size#8#--dim#2", "--nbPart", "2",
                  "-pc_type", "geneo", "-geneo_lvl", "ASM,1",
                  "--shortRes"], out=buf)
    assert rc == 0
    assert not os.path.exists("debug.failure.ksp.log")


def test_eigensolver_residual_wrng_and_check(tmp_path, monkeypatch):
    """Unconverged kept eigenpairs (forced by a 1-iteration LOBPCG) must
    surface as a WRNG line, and -geneo_chk must abort after dumping the
    per-domain EPS state (checkEPSSolve, geneo.cpp:577-624)."""
    monkeypatch.chdir(tmp_path)
    buf = io.StringIO()
    # -els2_eps_tol is pinned BELOW the 1-iteration residual floor: the
    # kept-pair residual magnitude is platform-dependent (f64 CPU LOBPCG
    # leaves ~1e-9, f32 TPU ~1e-2), and the point here is the WRNG/chk
    # plumbing, not the numeric value
    args = ["--inpLibA", "laplacian", "--inpLibArg",
            "--size#16#--dim#2#--kappa#100000.#quad", "--nbPart", "4",
            "-pc_type", "geneo", "-geneo_lvl", "ASM,1",
            "-geneo_cut", "2", "-els2_type", "lobpcg",
            "-els2_max_it", "1", "-els2_eps_tol", "1e-12",
            "-ksp_max_it", "500"]
    rc = cli.run(args, out=buf)
    assert rc == 0
    assert "WRNG: eigensolver residual" in buf.getvalue()
    buf2 = io.StringIO()
    rc2 = cli.run(args + ["-geneo_chk", "log"], out=buf2)
    assert rc2 != 0
    assert any(f.endswith(".eps.failure.log") for f in os.listdir("."))


def test_debug_bin_petsc_binary_roundtrip(tmp_path, monkeypatch):
    """--debug bin writes REAL PetscViewerBinary files (VecLoad/MatLoad
    format: big-endian classids 1211214/1211216) that round-trip."""
    from geneo4petsc_tpu.utils import petsc_format as pf

    monkeypatch.chdir(tmp_path)
    buf = io.StringIO()
    rc = cli.run(["--inpLibA", "laplacian", "--inpLibArg",
                  "--size#6#--dim#2", "--nbPart", "2",
                  "-pc_type", "geneo", "-geneo_lvl", "ASM,1",
                  "--debug", "bin", "--shortRes"], out=buf)
    assert rc == 0
    x = pf.read_vec_bin("debug.output.X.bin")
    b = pf.read_vec_bin("debug.input.B.bin")
    a = pf.read_mat_bin("debug.input.A.bin")
    r = np.linalg.norm(a @ x - b) / np.linalg.norm(b)
    assert r < 1e-4
    # text and binary dumps agree
    xt = np.loadtxt("debug.output.X.log")
    np.testing.assert_allclose(x, xt, rtol=1e-10)


def test_geneo_dbg_sylvester_and_apply_dumps(tmp_path, monkeypatch):
    """-geneo_dbg log,2 writes the sylvester matrix + inertia and the
    per-apply scatter in/out taxonomy (geneo.cpp:2501-2506 naming)."""
    monkeypatch.chdir(tmp_path)
    buf = io.StringIO()
    rc = cli.run(["--inpLibA", "laplacian", "--inpLibArg",
                  "--size#6#--dim#2", "--nbPart", "3",
                  "-pc_type", "geneo", "-geneo_lvl", "RAS,1",
                  "-geneo_dbg", "log,2", "--shortRes"], out=buf)
    assert rc == 0
    assert os.path.exists("debug0.setup.sylvester.tau.log")
    s = np.loadtxt("debug0.setup.sylvester.tau.log")
    assert s.ndim == 2 and s.shape[0] == s.shape[1]
    txt = open("debug0.setup.sylvester.inertia.log").read()
    assert "inertia:" in txt and "eigen values < tau" in txt
    assert os.path.exists("debug0.apply001.scatter.in.log")
    assert os.path.exists("debug.apply001.scatter.out.log")


def test_geneo_dbg_bin_matrices(tmp_path, monkeypatch):
    """-geneo_dbg bin,2: per-domain setup matrices in PetscViewerBinary."""
    from geneo4petsc_tpu.utils import petsc_format as pf

    monkeypatch.chdir(tmp_path)
    buf = io.StringIO()
    rc = cli.run(["--inpLibA", "laplacian", "--inpLibArg",
                  "--size#6#--dim#2", "--nbPart", "2",
                  "-pc_type", "geneo", "-geneo_lvl", "ASM,1",
                  "-geneo_dbg", "bin,2", "--shortRes"], out=buf)
    assert rc == 0
    a = pf.read_mat_bin("debug0.setup.ANeu.bin").toarray()
    assert a.shape[0] == a.shape[1] and a.shape[0] > 0
    # symmetric Neumann block
    np.testing.assert_allclose(a, a.T, atol=1e-12)
