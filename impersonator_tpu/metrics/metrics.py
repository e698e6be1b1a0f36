"""Image-quality metrics on device.

Covers the paired metrics of the reference evaluation suite
(``thirdparty/his_evaluators/metrics/metrics.py:16-1081``):

* :func:`ssim` — structural similarity with the skimage/Wang parameters
  the reference uses (gaussian window σ=1.5, K1=.01, K2=.03, L=data range);
* :func:`psnr`;
* :func:`perceptual_distance` — LPIPS-style normalized deep-feature
  distance over our VGG19 slices (exact LPIPS parity needs the converted
  LPIPS linear weights via tools/convert_weights; without them this is a
  consistent relative metric).

Unpaired metrics (IS/FID/reid) are defined in terms of a feature
extractor + statistics and gated on converted InceptionV3 weights.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

TYPES_QUALITIES = {
    "ssim": "higher",
    "psnr": "higher",
    "lps": "lower",
}


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    ax = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(ax ** 2) / (2 * sigma ** 2))
    k = g[:, None] * g[None, :]
    return k / jnp.sum(k)


@partial(jax.jit, static_argnames=("data_range",))
def ssim(a: jax.Array, b: jax.Array, data_range: float = 2.0) -> jax.Array:
    """Mean SSIM over a batch. a, b: (B, H, W, C) in [-1, 1] (range 2)."""
    k = _gaussian_kernel()[:, :, None, None]  # HWIO, per-channel depthwise
    c = a.shape[-1]
    kernel = jnp.tile(k, (1, 1, 1, c))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    mu_a, mu_b = filt(a), filt(b)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    s_aa = filt(a * a) - mu_aa
    s_bb = filt(b * b) - mu_bb
    s_ab = filt(a * b) - mu_ab

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    num = (2 * mu_ab + c1) * (2 * s_ab + c2)
    den = (mu_aa + mu_bb + c1) * (s_aa + s_bb + c2)
    return jnp.mean(num / den)


@partial(jax.jit, static_argnames=("data_range",))
def psnr(a: jax.Array, b: jax.Array, data_range: float = 2.0) -> jax.Array:
    mse = jnp.mean((a - b) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def perceptual_distance(vgg, vgg_params, a, b,
                        lin_weights: Sequence | None = None) -> jax.Array:
    """LPIPS-style distance: unit-normalize each feature map across
    channels, mean squared diff per layer, optional learned per-channel
    linear weights, sum over layers."""
    fa = vgg.apply(vgg_params, a)
    fb = vgg.apply(vgg_params, b)
    total = 0.0
    for i, (x, y) in enumerate(zip(fa, fb)):
        xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-10)
        yn = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-10)
        d = (xn - yn) ** 2
        if lin_weights is not None:
            d = d * lin_weights[i]
            total = total + jnp.mean(jnp.sum(d, axis=-1))
        else:
            total = total + jnp.mean(jnp.sum(d, axis=-1) / d.shape[-1])
    return total


class PairedMetricRunner:
    """Frame-paired evaluation (his_evaluators base.py:57-96):
    accumulates ssim/psnr/lps over (pred, ref) batches.

    Accumulation is FRAME-weighted (Σ batch_mean·batch_size / Σ size), not
    batch-weighted — videos of different lengths would otherwise skew the
    mean (the reference averages equal fixed-size loader batches, so its
    np.mean over batches is also frame-weighted up to the last partial
    batch).

    ``lps`` needs an LPIPS apply fn — pass ``lpips_apply(a, b) -> (B,)``
    built from converted weights (metrics.zoo.LPIPS), or fall back to
    ``vgg``+``vgg_params`` for the unweighted VGG distance (a consistent
    relative metric, NOT reference LPIPS)."""

    def __init__(self, metric_types=("ssim", "psnr"), vgg=None,
                 vgg_params=None, lpips_apply=None):
        self.metric_types = list(metric_types)
        self.vgg = vgg
        self.vgg_params = vgg_params
        self.lpips_apply = lpips_apply
        self._sums = {m: 0.0 for m in self.metric_types}
        self._frames = 0

    def update(self, preds, refs):
        preds = jnp.asarray(preds)
        refs = jnp.asarray(refs)
        n = preds.shape[0]
        for m in self.metric_types:
            if m == "ssim":
                v = float(ssim(preds, refs))
            elif m == "psnr":
                v = float(psnr(preds, refs))
            elif m == "lps":
                if self.lpips_apply is not None:
                    v = float(jnp.mean(self.lpips_apply(preds, refs)))
                else:
                    v = float(perceptual_distance(self.vgg, self.vgg_params,
                                                  preds, refs))
            else:
                raise ValueError(m)
            self._sums[m] += v * n
        self._frames += n

    def evaluate(self) -> dict:
        return {m: self._sums[m] / max(self._frames, 1)
                for m in self.metric_types}
