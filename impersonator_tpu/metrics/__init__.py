"""Evaluation metrics (his_evaluators-compatible subset)."""

from impersonator_tpu.metrics.metrics import (  # noqa: F401
    ssim,
    psnr,
    perceptual_distance,
    TYPES_QUALITIES,
    PairedMetricRunner,
)
from impersonator_tpu.metrics.unpaired import (  # noqa: F401
    UnpairedMetricRunner,
    frechet_distance,
    inception_score,
    gaussian_stats,
)
