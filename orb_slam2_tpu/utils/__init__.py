"""Host-side utilities (platform forcing, timing)."""

from orb_slam2_tpu.utils.platform import force_cpu_if_requested  # noqa: F401
