"""Evaluation metrics (jittable, channels-last 3D volumes).

Rebuild of the reference metric set: ``MAE`` / ``MSE`` /
``MultiScaleSSIM`` Ignite metrics (src/metrics/vqvae.py:12-124, backed
by pytorch_msssim) and transformer ``CE`` (src/metrics/transformer.py:
11-49).  Cross-rank reduction (the reference's ``@sync_all_reduce``)
is implicit under pjit (global means over sharded batches) — callers
just jit these over sharded arrays.
"""

from synthanatomy_tpu.metrics.regression import mae, mse
from synthanatomy_tpu.metrics.ssim import get_ms_ssim_window, ms_ssim_3d, ssim_3d
from synthanatomy_tpu.metrics.classification import ce_metric

__all__ = [
    "mae",
    "mse",
    "ms_ssim_3d",
    "ssim_3d",
    "get_ms_ssim_window",
    "ce_metric",
]
