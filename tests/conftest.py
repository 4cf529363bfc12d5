"""Test configuration: run all tests on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4c).

The container's sitecustomize (PYTHONPATH=/root/.axon_site) imports jax and
registers the single-chip `axon` TPU backend before conftest runs, so env
vars are too late — switch the platform in-process instead."""

import os

os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
try:
    import jax.extend.backend as _jb
    _jb.clear_backends()
except Exception:
    pass

assert jax.devices()[0].platform == "cpu", jax.devices()
