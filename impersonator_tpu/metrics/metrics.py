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
    """Mean SSIM over a batch. a, b: (B, H, W, C) in [-1, 1] (range 2).

    Deliberately matches the REFERENCE's convention, which converts to
    [-1, 1] and calls skimage with the dtype-inferred data_range=2
    (his_evaluators/metrics/metrics.py:456-492 SSIMMetric.preprocess/
    forward). Note SSIM's luminance term is not shift-invariant, so
    scores on [-1,1] data differ from canonical SSIM on [0,1] pixels —
    but the reference's published numbers were computed exactly this
    way, and comparability wins."""
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


def sspe_score(pred_smpls, ref_smpls) -> float:
    """Scale-Shape-Pose absolute error between two (B, 85) theta batches
    (ssp_abs_err_score_func, his_evaluators metrics.py:398-418):
    mean |Δscale| + mean Σ|Δshape| + mean Σ|Δ(cam+pose)|."""
    p = np.asarray(pred_smpls, np.float64)
    r = np.asarray(ref_smpls, np.float64)
    scale_err = np.mean(np.abs(p[:, 0] - r[:, 0]))
    shape_err = np.mean(np.sum(np.abs(p[:, -10:] - r[:, -10:]), axis=1))
    pose_err = np.mean(np.sum(np.abs(p[:, 0:-10] - r[:, 0:-10]), axis=1))
    return float(scale_err + shape_err + pose_err)


def _paired_cosine(a, b) -> float:
    from impersonator_tpu.metrics.unpaired import matched_cosine
    return matched_cosine(a, b)


class PairedMetricRunner:
    """Frame-paired evaluation (his_evaluators base.py:57-96):
    accumulates ssim/psnr/lps — plus the reference's embedding-paired
    types face-CS / OS-CS-reid (evaluate.py:135 pair_types) and SSPE
    (metrics.py:1048-1111) — over (pred, ref) batches.

    Accumulation is FRAME-weighted (Σ batch_mean·batch_size / Σ size), not
    batch-weighted — videos of different lengths would otherwise skew the
    mean (the reference averages equal fixed-size loader batches, so its
    np.mean over batches is also frame-weighted up to the last partial
    batch).

    ``lps`` needs an LPIPS apply fn — pass ``lpips_apply(a, b) -> (B,)``
    built from converted weights (metrics.zoo.LPIPS), or fall back to
    ``vgg``+``vgg_params`` for the unweighted VGG distance (a consistent
    relative metric, NOT reference LPIPS).

    * ``SSPE`` needs ``hmr_fn(imgs) -> (B, 85)`` thetas;
    * ``face-CS`` needs ``face_fn(imgs[, bboxes])`` — pass SMPL-head
      bboxes through ``update`` so embeddings are head crops, matching
      the reference's MTCNN-cropped convention (metrics.py:887-1024);
    * ``OS-CS-reid`` needs ``reid_fn(imgs) -> (B, D)``."""

    def __init__(self, metric_types=("ssim", "psnr"), vgg=None,
                 vgg_params=None, lpips_apply=None, hmr_fn=None,
                 face_fn=None, reid_fn=None):
        self.metric_types = list(metric_types)
        self.vgg = vgg
        self.vgg_params = vgg_params
        self.lpips_apply = lpips_apply
        self.hmr_fn = hmr_fn
        self.face_fn = face_fn
        self.reid_fn = reid_fn
        self._sums = {m: 0.0 for m in self.metric_types}
        self._frames = 0

    def _face_embed(self, imgs, bboxes):
        from impersonator_tpu.metrics.unpaired import accepts_bboxes
        if bboxes is not None and accepts_bboxes(self.face_fn):
            return self.face_fn(imgs, bboxes)
        return self.face_fn(imgs)

    def update(self, preds, refs, pred_bboxes=None, ref_bboxes=None,
               pred_body_bboxes=None, ref_body_bboxes=None):
        """``pred_body_bboxes``/``ref_body_bboxes``: (N, 4) fractional
        person boxes — when given, OS-CS-reid embeds person CROPS at the
        reid net's native 256x128 patch, matching the reference's
        YOLOv3-cropped convention (metrics.py:784-832); boxes come from
        SMPL geometry or metrics.yolo.YoloHumanDetector.body_bboxes."""
        preds = jnp.asarray(preds)
        refs = jnp.asarray(refs)
        n = preds.shape[0]

        def reid_embed(imgs, boxes):
            if boxes is not None:
                from impersonator_tpu.models.losses import (
                    crop_resize_fractional)
                imgs = crop_resize_fractional(imgs, jnp.asarray(boxes),
                                              256, 128)
            return self.reid_fn(imgs)
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
            elif m == "SSPE":
                v = sspe_score(self.hmr_fn(preds), self.hmr_fn(refs))
            elif m == "face-CS":
                v = _paired_cosine(self._face_embed(preds, pred_bboxes),
                                   self._face_embed(refs, ref_bboxes))
            elif m == "OS-CS-reid":
                v = _paired_cosine(reid_embed(preds, pred_body_bboxes),
                                   reid_embed(refs, ref_body_bboxes))
            else:
                raise ValueError(m)
            self._sums[m] += v * n
        self._frames += n

    def merge(self, other: "PairedMetricRunner") -> None:
        """Fold another runner's accumulated sums in — lets a per-video
        runner feed the aggregate without recomputing every metric."""
        assert self.metric_types == other.metric_types
        for m in self.metric_types:
            self._sums[m] += other._sums[m]
        self._frames += other._frames

    def evaluate(self) -> dict:
        return {m: self._sums[m] / max(self._frames, 1)
                for m in self.metric_types}
