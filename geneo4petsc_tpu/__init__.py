"""geneo4petsc_tpu — a TPU-native GenEO two-level Schwarz preconditioning
framework (JAX/XLA/Pallas), built from scratch with the capabilities of
geneo4PETSc/geneo4PETSc.  See SURVEY.md for the reference layer map."""

from . import config  # noqa: F401  (dtype/x64 side effects)

__version__ = "0.1.0"
