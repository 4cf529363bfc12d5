"""Backend platform selection helper.

The container's sitecustomize imports jax and registers the `axon` TPU
backend before any user code runs, so the JAX_PLATFORMS environment variable
alone is too late to take effect.  Scripts that want the CPU backend (e.g.
diagnostics run while the TPU is busy, or the multi-device CPU-mesh tests)
call `force_cpu_if_requested()` right after importing jax — the same
in-process switch the test conftest uses.
"""

from __future__ import annotations

import os


def force_cpu(n_devices: int = 1) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    if n_devices > 1:
        jax.config.update("jax_num_cpu_devices", n_devices)
    try:
        import jax.extend.backend as _jb
        _jb.clear_backends()
    except Exception:
        pass
    assert jax.devices()[0].platform == "cpu", jax.devices()


def force_cpu_if_requested() -> None:
    """Honor SLAM_PLATFORM=cpu[:N] (used by scripts/ diagnostics)."""
    v = os.environ.get("SLAM_PLATFORM", "")
    if v == "cpu" or v.startswith("cpu:"):
        n = 1
        if ":" in v:
            try:
                n = max(int(v.split(":", 1)[1]), 1)
            except ValueError:
                import warnings
                warnings.warn(f"SLAM_PLATFORM={v!r}: bad device count, using 1")
        force_cpu(n)
