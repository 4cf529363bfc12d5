"""Image pyramid + Gaussian blur.

Replaces reference `ORBextractor::ComputePyramid` (ORBextractor.cc:1107-1132,
bilinear resize per level) and the pre-descriptor 7x7 sigma=2 Gaussian blur
(ORBextractor.cc:1086).  Resize uses XLA's bilinear `jax.image.resize`; the
blur is a separable conv that XLA fuses and maps onto the VPU.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def level_shapes(h: int, w: int, n_levels: int, scale: float) -> List[Tuple[int, int]]:
    return [(int(round(h / scale ** i)), int(round(w / scale ** i)))
            for i in range(n_levels)]


def build_pyramid(img: jnp.ndarray, n_levels: int, scale: float) -> List[jnp.ndarray]:
    """img [H, W] float32 in [0, 255] -> list of per-level images."""
    h, w = img.shape
    shapes = level_shapes(h, w, n_levels, scale)
    out = [img]
    for i in range(1, n_levels):
        # resize from previous level like the reference (cascade, not from L0)
        out.append(jax.image.resize(out[-1], shapes[i], method='bilinear'))
    return out


def _gauss_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian with reflect padding (matches cv::GaussianBlur
    BORDER_REFLECT_101 closely enough for descriptor sampling)."""
    k = jnp.asarray(_gauss_kernel1d(ksize, sigma))
    r = ksize // 2
    x = jnp.pad(img, ((r, r), (0, 0)), mode='reflect')
    # vertical pass: sum of shifted rows
    rows = sum(x[i:i + img.shape[0], :] * k[i] for i in range(ksize))
    y = jnp.pad(rows, ((0, 0), (r, r)), mode='reflect')
    cols = sum(y[:, i:i + img.shape[1]] * k[i] for i in range(ksize))
    return cols
