"""Iteration-count regression goldens over the full 21-config PC matrix.

The north-star metric (BASELINE.md) is "identical iteration counts".  The
dummy battery pins byte-identical X dumps vs the REFERENCE's .ref files,
but those use --shortRes (no counts, tst/dummy/dummy.sh); this harness
pins the counts themselves — iterations, real dimE, nicolaides — for the
reference's complete 21-config PC matrix (laplacianRun.sh:31-51) x
{dual,nodal} metis x the three workloads.

SELF-REFERENTIAL goldens: PETSc+SLEPc are not available in this
environment, so the pinned numbers were produced by THIS repo (first run,
2026-08; `--update`).  They are regression pins against behavior drift,
not cross-implementation parity — the byte-identical dummy X dumps at
rtol 1e-12 remain the cross-implementation anchor (tst/dummy_check.py).

Usage: python tst/iters.py [--update]
"""

from __future__ import annotations

import io
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from geneo4petsc_tpu import cli  # noqa: E402
from sweep import GENERATOR_ARGS, PC_MATRIX, pc_log_name  # noqa: E402

GOLDEN = os.path.join(HERE, "golden", "iteration_counts.json")

_RE_SOLVE = re.compile(r"INFO: solve - (converged|diverged) \([^)]*\), "
                       r"(\d+) iteration\(s\)")
_RE_DIME = re.compile(r"real dimE (\d+) .*nicolaides (\d+)")

SIZES = {"laplacian": 10, "heat": 10, "graph": 16}


def run_matrix() -> dict:
    results: dict[str, dict] = {}
    pcs = [p for p in PC_MATRIX if "mg" not in p]
    for wl in ("laplacian", "heat", "graph"):
        gen_args = GENERATOR_ARGS[wl].format(size=SIZES[wl], ws=1)
        for metis in ("--metisDual", "--metisNodal"):
            m_log = "dual" if metis == "--metisDual" else "nodal"
            for pc in pcs:
                lvl2 = any(x in pc for x in (",1", ",2", "H1", "H2",
                                             "E1", "E2"))
                # the reference's sweep runs both tau/gamma variants for
                # level-2 PCs (laplacianRun.sh matrix)
                variants = ([("0.1", "8."), ("0.2", "12.")] if lvl2
                            else [None])
                for tg in variants:
                    name = f"{wl}-np=2-pc={pc_log_name(pc)}-metis={m_log}"
                    if tg is not None and tg != ("0.1", "8."):
                        name += f"-tau={tg[0]}-gamma={tg[1]}"
                    if "addOverlap" in pc:
                        name += "-overlap1"
                    if "offload" in pc:
                        name += "-offload"
                    args = ["--inpLibA", wl, "--inpLibArg", gen_args,
                            "--nbPart", "2", metis,
                            "-ksp_rtol", "1.e-05", "-ksp_atol", "1.e-05",
                            "-ksp_max_it", "1000",
                            "-ksp_gmres_restart", "1000"]
                    args += pc.replace("##", "#").strip("#").split("#")
                    if tg is not None:
                        args += ["-geneo_tau", tg[0],
                                 "-geneo_gamma", tg[1]]
                    if "SORAS" in pc:
                        args += ["-geneo_optim", "0.00"]
                    buf = io.StringIO()
                    rc = cli.run(args, out=buf)
                    log = buf.getvalue()
                    m = _RE_SOLVE.search(log)
                    if rc != 0 or m is None or m.group(1) != "converged":
                        print(f"ERROR: {name} did not converge:\n{log}",
                              file=sys.stderr)
                        raise SystemExit(1)
                    rec = {"its": int(m.group(2))}
                    md = _RE_DIME.search(log)
                    if md is not None:
                        rec["dim_e"] = int(md.group(1))
                        rec["nicolaides"] = int(md.group(2))
                    results[name] = rec
    return results


# structured-backend pins (round 3): the scale path is regression-pinned
# through the CLI's --structured route, covering the exact-FDM separable
# configs, the general block-tridiag configs (ORAS/SORAS + GenEO-2,
# heat's mass term), and efficient/hybrid variants
STRUCTURED_PCS = {
    "laplacian": ["ASM,0", "ASM,1", "ASM,H1", "ASM,E1", "SRAS,1",
                  "SORAS,0", "SORAS,2", "SORAS,H2", "SORAS,E2"],
    "heat": ["ASM,1", "SRAS,1", "SORAS,2"],
}


def run_structured_matrix() -> dict:
    results: dict[str, dict] = {}
    for wl, pcs in STRUCTURED_PCS.items():
        for lvl in pcs:
            name = f"structured-{wl}-dg=2,2,1-pc={lvl.replace(',', '')}"
            args = ["--inpLibA", wl,
                    "--inpLibArg", "--size#12#--dim#3#--kappa#1000.#minmax",
                    "--structured", "2,2,1", "--addOverlap", "2",
                    "-pc_type", "geneo", "-geneo_lvl", lvl,
                    "-ksp_type", "cg", "-ksp_rtol", "1.e-08"]
            if "SORAS" in lvl:
                args += ["-geneo_optim", "1.0"]
            buf = io.StringIO()
            rc = cli.run(args, out=buf)
            log = buf.getvalue()
            m = _RE_SOLVE.search(log)
            if rc != 0 or m is None or m.group(1) != "converged":
                print(f"ERROR: {name} did not converge:\n{log}",
                      file=sys.stderr)
                raise SystemExit(1)
            rec = {"its": int(m.group(2))}
            md = _RE_DIME.search(log)
            if md is not None:
                rec["dim_e"] = int(md.group(1))
                rec["nicolaides"] = int(md.group(2))
            results[name] = rec
    return results


def main() -> int:
    update = "--update" in sys.argv
    got = run_matrix()
    got.update(run_structured_matrix())
    if update:
        with open(GOLDEN, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
        print(f"Info: pinned {len(got)} configs -> {GOLDEN}")
        return 0
    with open(GOLDEN) as f:
        want = json.load(f)
    bad = []
    for k in sorted(set(want) | set(got)):
        if want.get(k) != got.get(k):
            bad.append(f"  {k}: golden={want.get(k)} got={got.get(k)}")
    if bad:
        print("ERROR: iteration-count drift vs golden:\n"
              + "\n".join(bad), file=sys.stderr)
        return 1
    print(f"Info: {len(got)} configs match the pinned iteration counts")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
