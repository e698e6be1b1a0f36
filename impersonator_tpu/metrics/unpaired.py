"""Unpaired metrics: Inception Score and Fréchet distance.

Mirrors the his_evaluators unpaired suite (metrics/metrics.py IS/FID and
the reid Fréchet variants): the math is feature-extractor-agnostic —
the reference's InceptionV3/OSNet/PCB weights convert through
tools/convert_weights-style mappings; without them any embedding network
(e.g. our VGG19 slices pooled) gives a consistent relative metric.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID between two Gaussians (metrics.py FID implementation):
    |mu1-mu2|² + Tr(S1 + S2 - 2·sqrt(S1·S2)). Runs in float64 numpy — the
    matrix sqrt is an offline eval-time op, not a device kernel."""
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    s1 = np.asarray(sigma1, np.float64)
    s2 = np.asarray(sigma2, np.float64)
    diff = mu1 - mu2

    # sqrt(S1 S2) via eigen-decomposition of the symmetrized product
    offset = np.eye(s1.shape[0]) * eps
    prod = (s1 + offset) @ (s2 + offset)
    eigvals, eigvecs = np.linalg.eig(prod)
    sqrt_prod = (eigvecs * np.sqrt(np.maximum(eigvals, 0))) @ np.linalg.inv(eigvecs)
    tr_covmean = np.trace(sqrt_prod.real)
    return float(diff @ diff + np.trace(s1) + np.trace(s2) - 2 * tr_covmean)


def gaussian_stats(features: np.ndarray):
    """(N, D) features -> (mu (D,), sigma (D, D))."""
    f = np.asarray(features, np.float64)
    mu = f.mean(axis=0)
    sigma = np.cov(f, rowvar=False)
    return mu, sigma


def inception_score(probs: np.ndarray, splits: int = 10) -> float:
    """IS from class probabilities (N, C): exp(E_x KL(p(y|x) || p(y)))."""
    probs = np.asarray(probs, np.float64)
    n = probs.shape[0]
    scores = []
    for part in np.array_split(probs, splits):
        if len(part) == 0:
            continue
        py = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(part + 1e-12) - np.log(py + 1e-12))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    return float(np.mean(scores))


class UnpairedMetricRunner:
    """Accumulate embedding features for pred/ref sets, then score
    (his_evaluators base.py UnpairedMetricRunner contract)."""

    def __init__(self, embed_fn: Callable):
        """embed_fn: (N, H, W, 3) [-1,1] -> (N, D) embeddings."""
        self.embed_fn = embed_fn
        self._pred = []
        self._ref = []

    def update(self, preds, refs=None):
        self._pred.append(np.asarray(self.embed_fn(jnp.asarray(preds))))
        if refs is not None:
            self._ref.append(np.asarray(self.embed_fn(jnp.asarray(refs))))

    def evaluate(self) -> dict:
        pred = np.concatenate(self._pred)
        out = {}
        if self._ref:
            ref = np.concatenate(self._ref)
            mu1, s1 = gaussian_stats(pred)
            mu2, s2 = gaussian_stats(ref)
            out["fd"] = frechet_distance(mu1, s1, mu2, s2)
            # cosine similarity of matched embeddings when counts align
            if len(pred) == len(ref):
                pn = pred / np.maximum(
                    np.linalg.norm(pred, axis=1, keepdims=True), 1e-9)
                rn = ref / np.maximum(
                    np.linalg.norm(ref, axis=1, keepdims=True), 1e-9)
                out["cs"] = float((pn * rn).sum(axis=1).mean())
        return out


def vgg_embed_fn(vgg, vgg_params):
    """Default embedding: global-average-pooled deepest VGG slice."""

    @jax.jit
    def embed(imgs):
        feats = vgg.apply(vgg_params, imgs)
        return jnp.mean(feats[-1], axis=(1, 2))

    return embed
