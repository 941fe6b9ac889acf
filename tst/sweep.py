"""Scaling-sweep runner — the role of tst/{laplacian,heat,graph}Run.sh.

Runs the CLI in-process over the reference's configuration matrix
(strong/weak scaling x metis modes x nbPart x tolerances x the 21-config PC
matrix x optim x tau/gamma variants), writing one log per run with the
reference's log-name encoding so the plot tool can group surfaces.

Usage:
  python tst/sweep.py laplacian strong [--out DIR] [--full]
  python tst/sweep.py heat weak ...
  python tst/sweep.py graph strong ...

Default is a reduced deterministic subset (CI-speed); --full expands to the
reference's full matrix (928 logs per suite).
"""

from __future__ import annotations

import argparse
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from geneo4petsc_tpu import cli  # noqa: E402

# The 22-config PC matrix (laplacianRun.sh:31-51)
PC_MATRIX = [
    "-pc_type#bjacobi",
    "-pc_type#mg",
    "-pc_type#geneo#-geneo_lvl#ASM,0",
    "-pc_type#geneo#-geneo_lvl#ASM,1",
    "-pc_type#geneo#-geneo_lvl#ASM,1##--addOverlap#1",
    "-pc_type#geneo#-geneo_lvl#ASM,1##-geneo_offload",
    "-pc_type#geneo#-geneo_lvl#ASM,H1",
    "-pc_type#geneo#-geneo_lvl#ASM,H1#--addOverlap#1",
    "-pc_type#geneo#-geneo_lvl#ASM,H1#-geneo_offload",
    "-pc_type#geneo#-geneo_lvl#ASM,E1",
    "-pc_type#geneo#-geneo_lvl#ASM,E1#--addOverlap#1",
    "-pc_type#geneo#-geneo_lvl#ASM,E1#-geneo_offload",
    "-pc_type#geneo#-geneo_lvl#SORAS,0",
    "-pc_type#geneo#-geneo_lvl#SORAS,2",
    "-pc_type#geneo#-geneo_lvl#SORAS,2##--addOverlap#1",
    "-pc_type#geneo#-geneo_lvl#SORAS,2##-geneo_offload",
    "-pc_type#geneo#-geneo_lvl#SORAS,H2",
    "-pc_type#geneo#-geneo_lvl#SORAS,H2#--addOverlap#1",
    "-pc_type#geneo#-geneo_lvl#SORAS,H2#-geneo_offload",
    "-pc_type#geneo#-geneo_lvl#SORAS,E2",
    "-pc_type#geneo#-geneo_lvl#SORAS,E2#--addOverlap#1",
    "-pc_type#geneo#-geneo_lvl#SORAS,E2#-geneo_offload",
]

REDUCED_PCS = [PC_MATRIX[0], PC_MATRIX[3], PC_MATRIX[4], PC_MATRIX[6],
               PC_MATRIX[9], PC_MATRIX[13], PC_MATRIX[16], PC_MATRIX[19]]

GENERATOR_ARGS = {
    "laplacian": "--size#{size}#--weakScaling#{ws}#--dim#2",
    "heat": "--size#{size}#--weakScaling#{ws}#--dim#2#--lbd#2.#--dt#0.5",
    "graph": "--size#{size}#--weakScaling#{ws}",
}


def pc_log_name(pc: str) -> str:
    """Log-name token for a PC config (mirrors the dummy.sh munging)."""
    s = pc.replace("#", "").replace("-", "").replace(",", "")
    s = s.replace("pc_type", "").replace("geneo_lvl", "")
    s = s.replace("addOverlap1", "").replace("geneo_offload", "")
    return s


def opt_log_name(pc: str) -> str:
    if "addOverlap" in pc:
        return "overlap1"
    if "offload" in pc:
        return "offload"
    return ""


def run_sweep(workload: str, scaling: str, out_dir: str, full: bool) -> int:
    os.makedirs(out_dir, exist_ok=True)
    strong = scaling == "strong"
    if workload == "graph":
        size = 16 if strong else 8
    else:
        size = 10 if strong else 5
    nps = [1, 2]  # the reference pins np to {1, 2} too (STRONG_MPI="01 02")
    tols = ["1.e-05"] if not full else ["1.e-04", "1.e-05"]
    metis = ["--metisDual", "--metisNodal"]
    # --full reproduces the reference's 22-entry PC matrix
    # (laplacianRun.sh:31-51, incl. mg with its MG_OPT W-cycle options)
    # => 58 configs per (metis, np, tol) cell, 464 logs per scaling,
    # 928 per workload (the count asserted by laplacianTest.sh:16-19).
    # Two reference quirks are reproduced deliberately:
    #   * geneo-0 entries (ASM,0 / SORAS,0) take NO optim/tau/gamma loop
    #     (the OPT_ARRAY geneo-0 branch passes only the dls solver);
    #   * the bash pattern [[ "$p" == *"geneo"*"1"* ]] also matches the
    #     "--addOverlap#1" suffix, so overlap-1 GenEO-2 entries run with
    #     gamma STRIPPED (default 10.) — the gamma=10.00 overlap=1
    #     surfaces frozen in laplacianPlot.ref.
    pcs = PC_MATRIX if full else REDUCED_PCS
    taugamma = ([("0.1", "8."), ("0.2", "12.")] if full
                else [("0.1", "8.")])
    optims = (["0.00", "0.02"] if full else ["0.00"])

    count = 0
    for np_ in nps:
        ws = 1 if strong else np_
        gen_args = GENERATOR_ARGS[workload].format(size=size, ws=ws)
        for m in metis:
            m_log = "dual" if m == "--metisDual" else "nodal"
            for tol in tols:
                for pc in pcs:
                    lvl2 = any(x in pc for x in (",1", ",2", "H1", "H2",
                                                 "E1", "E2"))
                    soras = "SORAS" in pc and lvl2   # geneo-0: no optim loop
                    # the reference's *"geneo"*"1"* pattern quirk: any "1"
                    # after "geneo" (incl. addOverlap 1) strips gamma
                    strip_gamma = lvl2 and "1" in pc.split("geneo", 1)[-1]
                    tg_list = taugamma if lvl2 else [("0.1", "8.")][:1]
                    op_list = optims if soras else ["0.00"]
                    for tau, gamma in (tg_list if lvl2 else [("0.1", "8.")]):
                        for optim in op_list:
                            g_eff = "10." if strip_gamma else gamma
                            name = (f"{workload}-ws={ws}-size={size}"
                                    f"-np={np_}-tol={tol}"
                                    f"-pc={pc_log_name(pc)}"
                                    f"-metis={m_log}")
                            if lvl2:
                                name += f"-tau={tau}-gamma={g_eff}"
                            if soras:
                                name += f"-optim={optim}"
                            o = opt_log_name(pc)
                            if o:
                                name += f"-opt={o}"
                            args = ["--inpLibA", workload,
                                    "--inpLibArg", gen_args,
                                    "--nbPart", str(np_), m,
                                    "-ksp_rtol", tol, "-ksp_atol", tol,
                                    "-ksp_max_it", "1000",
                                    "-ksp_gmres_restart", "1000",
                                    "--timing"]
                            args += pc.replace("##", "#").strip("#").split("#")
                            if "mg" in pc:
                                # MG_OPT (laplacianRun.sh): W cycle, 5/5
                                args += ["-pc_mg_cycle_type", "w",
                                         "-pc_mg_smoothup", "5",
                                         "-pc_mg_smoothdown", "5"]
                            if lvl2:
                                args += ["-geneo_tau", tau]
                                if not strip_gamma:
                                    args += ["-geneo_gamma", gamma]
                            if soras:
                                args += ["-geneo_optim", optim]
                            buf = io.StringIO()
                            rc = cli.run(args, out=buf)
                            log = buf.getvalue()
                            with open(os.path.join(out_dir, name + ".log"),
                                      "w") as f:
                                f.write(log)
                            if "diverged" in log or rc != 0:
                                print(f"ERROR: {name} did not converge",
                                      file=sys.stderr)
                                return 1
                            count += 1
    if full and count != 464:
        # the reference asserts the exact matrix size
        # (tst/laplacian/laplacianTest.sh:16-19: 928 = 464 x 2 scalings)
        print(f"ERROR: full sweep produced {count} logs, expected 464",
              file=sys.stderr)
        return 1
    print(f"Info: {count} run(s) converged")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workload", choices=["laplacian", "heat", "graph"])
    ap.add_argument("scaling", choices=["strong", "weak"])
    ap.add_argument("--out", default=None)
    ap.add_argument("--full", action="store_true")
    a = ap.parse_args()
    out = a.out or os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                f"{a.workload}_logs")
    return run_sweep(a.workload, a.scaling, out, a.full)


if __name__ == "__main__":
    sys.exit(main())
