"""3D SSIM / MS-SSIM (pytorch_msssim-equivalent math, JAX).

The reference wraps ``pytorch_msssim.MS_SSIM`` in an Ignite metric
(src/metrics/vqvae.py:12-59) with the window size auto-computed from
the smallest spatial dim (src/utils/vqvae.py:499-544 — reproduced in
:func:`get_ms_ssim_window`).  Math parity: separable Gaussian window
(σ=1.5), K=(0.01, 0.03), data_range 1, 5 scales with the standard
weights, relu-clamped contrast terms, 2× avg-pool between scales.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ssim_3d", "ms_ssim_3d", "get_ms_ssim_window"]

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def get_ms_ssim_window(
    *,
    eval_patch_size: Optional[Sequence[int]] = None,
    roi: Optional[tuple] = None,
    input_shape: Optional[Sequence[int]] = None,
) -> int:
    """Window size rule (reference src/utils/vqvae.py:499-544)."""
    if eval_patch_size:
        min_ps = min(eval_patch_size)
    elif roi:
        if isinstance(roi[0], int):
            min_ps = min(roi)
        else:
            min_ps = min(b - a for a, b in roi)
    elif input_shape:
        min_ps = min(input_shape)
    else:
        raise ValueError("need eval_patch_size, roi or input_shape")

    if min_ps > 160:
        return 11
    win_size = math.floor(((min_ps / 2**4) + 1) / 2)
    if win_size <= 1:
        raise ValueError(
            "Window size for MS-SSIM can't be calculated. Please increase "
            "patch_size's smallest dimension."
        )
    if win_size % 2 == 0:
        win_size += 1
    return win_size


def _gaussian_kernel(win_size: int, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(win_size, dtype=np.float64) - win_size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur3d(x: jax.Array, kernel: np.ndarray) -> jax.Array:
    """Separable 'valid' Gaussian filtering over D, H, W of
    (B, D, H, W, C)."""
    k = jnp.asarray(kernel)
    for axis in (1, 2, 3):
        c = x.shape[-1]
        spatial = [1, 1, 1]
        spatial[axis - 1] = k.shape[0]
        # depthwise kernel, DHWIO layout with I=1 (grouped conv)
        w = jnp.broadcast_to(
            k.reshape(tuple(spatial) + (1, 1)), tuple(spatial) + (1, c)
        )
        x = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=(1, 1, 1),
            padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=c,
        )
    return x


def _ssim_parts(x, y, win_size, data_range=1.0, k1=0.01, k2=0.03):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    kern = _gaussian_kernel(win_size)

    mu_x = _blur3d(x, kern)
    mu_y = _blur3d(y, kern)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = _blur3d(x * x, kern) - mu_xx
    sigma_yy = _blur3d(y * y, kern) - mu_yy
    sigma_xy = _blur3d(x * y, kern) - mu_xy

    cs = (2 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ssim_map = ((2 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs
    return jnp.mean(ssim_map, axis=(1, 2, 3, 4)), jnp.mean(cs, axis=(1, 2, 3, 4))


def ssim_3d(
    y_pred: jax.Array, y: jax.Array, *, win_size: int = 11, data_range: float = 1.0
) -> jax.Array:
    """Mean single-scale SSIM over the batch; inputs (B, D, H, W, C)."""
    s, _ = _ssim_parts(
        jnp.asarray(y_pred, jnp.float32), jnp.asarray(y, jnp.float32),
        win_size, data_range,
    )
    return jnp.mean(s)


def _avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID"
    ) / 8.0


def ms_ssim_3d(
    y_pred: jax.Array,
    y: jax.Array,
    *,
    win_size: int = 11,
    data_range: float = 1.0,
    weights: Sequence[float] = _MSSSIM_WEIGHTS,
) -> jax.Array:
    """Multi-scale SSIM over (B, D, H, W, C) volumes in [0, 1]."""
    x = jnp.asarray(y_pred, jnp.float32)
    t = jnp.asarray(y, jnp.float32)
    levels = len(weights)
    mcs = []
    val = None
    for i in range(levels):
        s, cs = _ssim_parts(x, t, win_size, data_range)
        if i < levels - 1:
            mcs.append(jax.nn.relu(cs))
            x = _avg_pool2(x)
            t = _avg_pool2(t)
        else:
            val = jax.nn.relu(s)
    result = val ** weights[-1]
    for w, cs in zip(weights[:-1], mcs):
        result = result * cs**w
    return jnp.mean(result)
