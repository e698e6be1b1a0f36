"""Evaluation metrics (his_evaluators-compatible subset)."""

from impersonator_tpu.metrics.metrics import (  # noqa: F401
    ssim,
    psnr,
    perceptual_distance,
    TYPES_QUALITIES,
    PairedMetricRunner,
)
