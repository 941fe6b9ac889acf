"""Setup-product checkpointing.

The reference has no resume path (SURVEY.md §5.4) — its closest artifact is
binary state dumps via PetscViewer.  For the TPU build, GenEO setup
(eigensolves + factorizations) dominates cost, so caching the finished
preconditioner is designed in: save/load the full GenEOPreconditioner
pytree (operator blocks, L1 factors/inverses, Z, coarse factorization,
initial guess) to a single compressed .npz, keyed by a config fingerprint.

Loads place arrays on the host and upload once, mirroring setup itself.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np

import jax
import jax.numpy as jnp

from ..assembly.assemble import SubdomainBatch
from ..precond.geneo import GenEOPreconditioner

_META_KEYS = ("lvl1", "lvl2", "hybrid", "eff_hybrid", "dim_e", "k_max",
              "l1_kind", "use_pallas")
_BATCH_META = ("n_dof", "n_dom", "n_max")
_BATCH_ARRAYS = ("gids", "mask", "mult", "a_neu", "a_dir",
                 "scatter_perm", "sorted_gids")
_PC_ARRAYS = ("l1_factor", "pou", "z_loc", "colids", "e_evecs",
              "e_eig_inv", "x0")


def config_fingerprint(**kwargs) -> str:
    """Stable hash of a solve configuration (for cache file naming)."""
    blob = json.dumps(kwargs, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def save_pc(path: str, pc: GenEOPreconditioner) -> None:
    data = {}
    meta = {k: getattr(pc, k) for k in _META_KEYS}
    meta["batch_meta"] = {k: getattr(pc.batch, k) for k in _BATCH_META}
    data["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    for k in _BATCH_ARRAYS:
        v = getattr(pc.batch, k)
        if v is not None:
            data[f"batch.{k}"] = np.asarray(v)
    for k in _PC_ARRAYS:
        v = getattr(pc, k)
        if v is not None:
            data[f"pc.{k}"] = np.asarray(v)
    np.savez_compressed(path, **data)


def load_pc(path: str) -> GenEOPreconditioner:
    z = np.load(path)
    meta = json.loads(bytes(z["__meta__"]).decode())
    bm = meta.pop("batch_meta")

    on_accel = jax.default_backend() != "cpu"
    dev = jax.devices()[0] if on_accel else None

    def arr(key):
        if key not in z:
            return None
        a = jnp.asarray(z[key])
        return jax.device_put(a, dev) if on_accel else a

    batch = SubdomainBatch(
        n_dof=int(bm["n_dof"]), n_dom=int(bm["n_dom"]),
        n_max=int(bm["n_max"]),
        gids=arr("batch.gids"), mask=arr("batch.mask"),
        mult=arr("batch.mult"), a_neu=arr("batch.a_neu"),
        a_dir=arr("batch.a_dir"),
        scatter_perm=arr("batch.scatter_perm"),
        sorted_gids=arr("batch.sorted_gids"))
    return GenEOPreconditioner(
        lvl1=meta["lvl1"], lvl2=int(meta["lvl2"]),
        hybrid=bool(meta["hybrid"]), eff_hybrid=bool(meta["eff_hybrid"]),
        dim_e=int(meta["dim_e"]), k_max=int(meta["k_max"]),
        l1_kind=meta["l1_kind"],
        use_pallas=bool(meta.get("use_pallas", False)), batch=batch,
        l1_factor=arr("pc.l1_factor"), pou=arr("pc.pou"),
        z_loc=arr("pc.z_loc"), colids=arr("pc.colids"),
        e_evecs=arr("pc.e_evecs"), e_eig_inv=arr("pc.e_eig_inv"),
        x0=arr("pc.x0"))


# ---------------- structured / elastic setup products ----------------
#
# The structured backends' preconditioners are registered frozen
# dataclasses whose leaves are arrays (FDM factors, block-tridiag W
# blocks, stencil fields, Z, the coarse factorization), so the whole
# setup product round-trips through pickle with array leaves lowered to
# host numpy — at 10M DOF the saved LOBPCG/E work is minutes
# (SURVEY.md §5.4: caching the expensive setup products is the designed
# extension beyond the reference's dump-only PetscViewer artifacts).

def save_setup_tree(path: str, pc) -> None:
    import pickle

    host = jax.tree_util.tree_map(
        lambda a: np.asarray(a) if isinstance(a, jax.Array) else a, pc)
    with open(path, "wb") as f:
        pickle.dump(host, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_setup_tree(path: str):
    import pickle

    with open(path, "rb") as f:
        host = pickle.load(f)
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if isinstance(a, np.ndarray) else a,
        host)
