"""Test configuration: CPU backend with 8 virtual devices, float64.

Mirrors the reference test strategy (SURVEY.md §4): "distributed" is tested
with local processes — here, a virtual 8-device CPU mesh
(xla_force_host_platform_device_count), and PETSc's double precision is
mirrored with jax x64.
"""

import os

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# NEVER read the persistent compile cache in tests: .jax_cache carries
# XLA:CPU AOT executables compiled on earlier rounds' hosts with
# different CPU features — loading one SIGSEGVs the process (observed:
# full-suite segfault at 88% when a test reached code that sets
# jax_compilation_cache_dir process-wide; the loader itself warns
# "could lead to execution errors such as SIGILL").  CPU compiles are
# fast; tests don't need the cache.
jax.config.update("jax_enable_compilation_cache", False)

import pytest  # noqa: E402

REFERENCE = "/root/reference"


def pytest_collection_modifyitems(config, items):
    """Golden byte-parity tests need the reference checkout mounted."""
    if os.path.isdir(REFERENCE):
        return
    skip = pytest.mark.skip(reason="reference checkout not mounted")
    for item in items:
        path = str(getattr(item, "fspath", ""))
        if "test_cli" in path or "test_input" in path or \
                "test_geneo" in path:
            item.add_marker(skip)
