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
