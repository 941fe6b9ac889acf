"""`make check` equivalent (tst/CMakeLists.txt:9-10 role): the golden test
battery.

1. dummy:   the 84-config matrix vs the REFERENCE's byte-golden .ref files
            (tst/dummy_check.py)
2. laplacian/heat/graph: reduced strong+weak sweeps; asserts every run
            converged, the exact log count, and diffs the plot tool's
            deterministic output against tst/golden/<wl>Plot.ref

3. iters:   iteration-count/dimE/nicolaides pins over the full 21-config
            PC matrix (tst/iters.py; self-referential goldens)

Usage: python tst/check.py [dummy|laplacian|heat|graph|iters|all] [--update]
"""

from __future__ import annotations

import io
import os
import shutil
import subprocess
import sys
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "golden")
# reduced matrix: 2 np x 2 metis x 1 tol x 8 PCs x 2 scalings = 64 per
# workload; --full runs the reference's complete 928-log matrix per
# workload (the count asserted by tst/laplacian/laplacianTest.sh:16-19)
EXPECTED_LOGS = {"laplacian": 64, "heat": 64, "graph": 64}
EXPECTED_LOGS_FULL = 928


def run_workload(wl: str, update: bool, full: bool = False) -> int:
    sys.path.insert(0, HERE)
    import plot as plot_mod
    import sweep as sweep_mod

    out_dir = os.path.join("/tmp", f"g4p_check_{wl}" + ("_full" if full
                                                        else ""))
    shutil.rmtree(out_dir, ignore_errors=True)
    for scaling in ("strong", "weak"):
        rc = sweep_mod.run_sweep(wl, scaling, out_dir, full=full)
        if rc != 0:
            print(f"ERROR: {wl} {scaling} sweep failed", file=sys.stderr)
            return 1
    logs = [f for f in os.listdir(out_dir) if f.endswith(".log")]
    expected = EXPECTED_LOGS_FULL if full else EXPECTED_LOGS[wl]
    if len(logs) != expected:
        print(f"ERROR: {wl}: {len(logs)} logs, expected "
              f"{expected}", file=sys.stderr)
        return 1

    buf = io.StringIO()
    argv = sys.argv
    # full mode mirrors the reference's headline plot invocation
    # (laplacianPlot.sh #1: -fi "metis=dual" "ksp=gmres"), so the pinned
    # surface listing is the reference's 58-surface set (modulo the
    # honest mumps->cholesky / arpack->eigh solver tokens —
    # tests/test_sweep_parity.py asserts that equivalence)
    sys.argv = ["plot.py", out_dir] + \
        (["-fi", "metis=dual", "ksp=gmres"] if full else [])
    try:
        with redirect_stdout(buf):
            plot_mod.main()
    finally:
        sys.argv = argv
    got = buf.getvalue()

    ref_path = os.path.join(GOLDEN,
                            f"{wl}Plot{'Full' if full else ''}.ref")
    if update:
        os.makedirs(GOLDEN, exist_ok=True)
        with open(ref_path, "w") as f:
            f.write(got)
        print(f"updated {ref_path}")
        return 0
    want = open(ref_path).read()
    if got != want:
        import difflib
        sys.stderr.writelines(difflib.unified_diff(
            want.splitlines(True), got.splitlines(True), "golden", "got"))
        return 1
    print(f"{wl}: {len(logs)} logs, plot output matches golden")
    return 0


def main() -> int:
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    update = "--update" in sys.argv
    full = "--full" in sys.argv
    rc = 0
    if what in ("dummy", "all"):
        rc |= subprocess.run(
            [sys.executable, os.path.join(HERE, "dummy_check.py")]).returncode
    for wl in ("laplacian", "heat", "graph"):
        if what in (wl, "all"):
            rc |= run_workload(wl, update, full=full)
    if what in ("iters", "all"):
        cmd = [sys.executable, os.path.join(HERE, "iters.py")]
        if update:
            cmd.append("--update")
        rc |= subprocess.run(cmd).returncode
    print("OK" if rc == 0 else "FAILED")
    return rc


if __name__ == "__main__":
    sys.exit(main())
