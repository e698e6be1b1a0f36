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


def accepts_bboxes(fn: Callable) -> bool:
    """Whether a face extractor takes a second (bboxes) argument —
    probed from the signature ONCE rather than catching TypeError per
    call, which would silently fall back to full-frame embeddings on
    any internal TypeError and mix cropped/uncropped features within
    one run."""
    import inspect
    try:
        return len(inspect.signature(fn).parameters) >= 2
    except (TypeError, ValueError):
        return False


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID between two Gaussians (metrics.py FID implementation):
    |mu1-mu2|² + Tr(S1 + S2 - 2·sqrt(S1·S2)). Runs in float64 numpy — the
    matrix sqrt is an offline eval-time op, not a device kernel."""
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    s1 = np.asarray(sigma1, np.float64)
    s2 = np.asarray(sigma2, np.float64)
    diff = mu1 - mu2

    # Tr sqrt(S1 S2) via the SYMMETRIC route: the eigenvalues of S1·S2
    # equal those of A = S1^(1/2) S2 S1^(1/2), which is symmetric PSD —
    # so two eighs give the trace stably. The naive eig+inv of the
    # non-symmetric product amplifies error catastrophically for the
    # rank-deficient covariances FID always has (N frames << 2048 dims).
    offset = np.eye(s1.shape[0]) * eps
    w1, v1 = np.linalg.eigh(s1 + offset)
    s1_half = (v1 * np.sqrt(np.maximum(w1, 0.0))) @ v1.T
    a = s1_half @ (s2 + offset) @ s1_half
    wa = np.linalg.eigvalsh((a + a.T) / 2.0)
    tr_covmean = np.sum(np.sqrt(np.maximum(wa, 0.0)))
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


def matched_cosine(pred: np.ndarray, ref: np.ndarray) -> float:
    """Mean row-wise cosine similarity of matched embeddings — the ONE
    implementation behind both the paired (face-CS/OS-CS-reid) and
    unpaired CS metrics."""
    pred = np.asarray(pred, np.float64)
    ref = np.asarray(ref, np.float64)
    pn = pred / np.maximum(np.linalg.norm(pred, axis=1, keepdims=True), 1e-9)
    rn = ref / np.maximum(np.linalg.norm(ref, axis=1, keepdims=True), 1e-9)
    return float((pn * rn).sum(axis=1).mean())


_cosine = matched_cosine   # internal alias (pre-rename call sites)


class UnpairedMetricRunner:
    """Unpaired suite with pluggable extractors, matching the reference's
    per-type result keys (his_evaluators base.py:99-341):

    * ``inception_fn(imgs) -> (pool (N,2048), probs (N,C))`` drives
      ``fid`` (Fréchet on pool feats) and ``is`` (split-KL on probs);
    * ``reid_fn(imgs) -> (N,D)`` drives ``OS-freid`` (Fréchet) and
      ``OS-CS-reid`` (matched cosine);
    * ``face_fn(imgs) -> (N,D)`` drives ``face-FD`` and ``face-CS``.

    Extractors left None simply skip their metrics (the reference
    instead requires the vendored weights at import time). All image
    batches are (N, H, W, 3) in [-1, 1]; extractor-internal resizing
    (e.g. 299² for inception) is the extractor's job.
    """

    def __init__(self, inception_fn: Callable | None = None,
                 reid_fn: Callable | None = None,
                 face_fn: Callable | None = None,
                 embed_fn: Callable | None = None,
                 pcb_fn: Callable | None = None):
        self.inception_fn = inception_fn
        self.reid_fn = reid_fn        # OSNet -> OS-freid / OS-CS-reid
        self.pcb_fn = pcb_fn          # PCB   -> PCB-freid / PCB-CS-reid
        self.face_fn = face_fn
        self.embed_fn = embed_fn   # generic fallback -> {"fd","cs"}
        self._acc = {k: {"pred": [], "ref": []}
                     for k in ("inc", "reid", "pcb", "face", "embed")}
        self._probs = []

    def update(self, preds, refs=None, pred_bboxes=None, ref_bboxes=None,
               pred_body_bboxes=None, ref_body_bboxes=None):
        """``pred_bboxes``/``ref_bboxes``: (N, 4) fractional head boxes —
        when given, the face extractor embeds head CROPS rather than full
        frames, matching the reference's MTCNN-cropped 160² convention
        (metrics.py:887-1024; boxes here derive from SMPL head kps).

        ``pred_body_bboxes``/``ref_body_bboxes``: (N, 4) fractional
        PERSON boxes — when given, the reid extractors embed person
        crops at their native patch sizes (OSNet 256x128, PCB 384x192),
        matching the reference's YOLOv3-cropped reid convention
        (metrics.py:784-832)."""
        preds = jnp.asarray(preds)
        refs = jnp.asarray(refs) if refs is not None else None

        def both(key, fn):
            self._acc[key]["pred"].append(np.asarray(fn(preds)))
            if refs is not None:
                self._acc[key]["ref"].append(np.asarray(fn(refs)))

        def body_crop(fn, h, w):
            def wrapped(imgs):
                boxes = (pred_body_bboxes if imgs is preds
                         else ref_body_bboxes)
                if boxes is None:
                    return fn(imgs)
                from impersonator_tpu.models.losses import (
                    crop_resize_fractional)
                return fn(crop_resize_fractional(
                    imgs, jnp.asarray(boxes), h, w))
            return wrapped

        if self.inception_fn is not None:
            pool, probs = self.inception_fn(preds)
            self._acc["inc"]["pred"].append(np.asarray(pool))
            self._probs.append(np.asarray(probs))
            if refs is not None:
                pool_r, _ = self.inception_fn(refs)
                self._acc["inc"]["ref"].append(np.asarray(pool_r))
        if self.reid_fn is not None:
            both("reid", body_crop(self.reid_fn, 256, 128))
        if self.pcb_fn is not None:
            both("pcb", body_crop(self.pcb_fn, 384, 192))
        if self.face_fn is not None:
            crops = accepts_bboxes(self.face_fn)

            def face(imgs):
                boxes = pred_bboxes if imgs is preds else ref_bboxes
                if boxes is not None and crops:
                    return self.face_fn(imgs, jnp.asarray(boxes))
                return self.face_fn(imgs)
            both("face", face)
        if self.embed_fn is not None:
            both("embed", self.embed_fn)

    @staticmethod
    def _fd(pred, ref):
        mu1, s1 = gaussian_stats(pred)
        mu2, s2 = gaussian_stats(ref)
        return frechet_distance(mu1, s1, mu2, s2)

    def evaluate(self) -> dict:
        out = {}

        def cat(key, which):
            lst = self._acc[key][which]
            return np.concatenate(lst) if lst else None

        if self._probs:
            out["is"] = inception_score(np.concatenate(self._probs))
        for key, fd_name, cs_name in (("inc", "fid", None),
                                      ("reid", "OS-freid", "OS-CS-reid"),
                                      ("pcb", "PCB-freid", "PCB-CS-reid"),
                                      ("face", "face-FD", "face-CS"),
                                      ("embed", "fd", "cs")):
            pred, ref = cat(key, "pred"), cat(key, "ref")
            if pred is None or ref is None or not len(ref):
                continue
            out[fd_name] = self._fd(pred, ref)
            if cs_name and len(pred) == len(ref):
                out[cs_name] = _cosine(pred, ref)
        return out


def vgg_embed_fn(vgg, vgg_params):
    """Default embedding: global-average-pooled deepest VGG slice."""

    @jax.jit
    def embed(imgs):
        feats = vgg.apply(vgg_params, imgs)
        return jnp.mean(feats[-1], axis=(1, 2))

    return embed


def inception_embed_fn(params):
    """FID/IS extractor from converted InceptionV3 weights
    (metrics.zoo.InceptionV3 tree). imgs (N,H,W,3) in [-1,1] are resized
    to 299² with align_corners=False, exactly the reference preprocess
    (metrics.py:666,737); returns (pool (N,2048), probs (N,1000)).

    Note: the reference registers InceptionV3 with output_blocks=[3] so
    its IS softmaxes pool features — a known bug its own README flags as
    superseded; we softmax real logits."""
    from impersonator_tpu.metrics.zoo import InceptionV3
    from impersonator_tpu.ops.sampler import resize_bilinear_torch

    model = InceptionV3()

    @jax.jit
    def fn(imgs):
        x = resize_bilinear_torch(imgs, 299, 299)
        pool, logits = model.apply(params, x)
        return pool, jax.nn.softmax(logits, axis=-1)

    return fn


def facenet_ir_embed_fn(tree):
    """Face-identity embedding from InceptionResnetV1 — the embedder the
    reference actually uses for face-CS/face-FD (metrics.py:279,990,
    normalize=False). The reference crops faces with MTCNN; here frames
    resize to the 160² recognition size directly (pass bboxes from the
    SMPL head keypoints via losses.head_bbox_from_kps +
    crop_resize_fractional for crop-faithful scores — no detector net
    is needed when the pose is known)."""
    from impersonator_tpu.metrics.zoo import InceptionResnetV1
    from impersonator_tpu.ops.sampler import resize_bilinear_torch

    model = InceptionResnetV1()

    @jax.jit
    def fn(imgs, bboxes=None):
        if bboxes is not None:
            from impersonator_tpu.models.losses import (
                crop_resize_fractional)
            x = crop_resize_fractional(imgs, bboxes, 160, 160)
        else:
            x = resize_bilinear_torch(imgs, 160, 160)
        return model.apply(tree, x)

    return fn


def senet_face_embed_fn(tree):
    """Face-identity embedding from the VGGFace2 SENet50 (2048-d pooled
    top feature) on 224² resized frames — the reference's higher-capacity
    face backbone (networks/facenet.py:193, weights senet50_ft.pkl);
    drives face-CS/face-FD like sphere_face_embed_fn."""
    from impersonator_tpu.models.facenet import SENet50
    from impersonator_tpu.ops.sampler import resize_bilinear_torch

    model = SENet50()

    @jax.jit
    def fn(imgs):
        x = resize_bilinear_torch(imgs, 224, 224)
        return model.apply(tree, x)[1]

    return fn


def sphere_face_embed_fn(params):
    """Face-identity embedding from Sphere20a (fc5, 512-d) on 112×96
    resized frames — drives face-CS/face-FD. (The reference uses
    MTCNN+InceptionResnetV1 crops, metrics.py:887-1024; sphereface is the
    identity net the training stack already vendors — same metric family,
    converter-tested.)"""
    from impersonator_tpu.models.facenet import Sphere20a
    from impersonator_tpu.ops.sampler import resize_bilinear_torch

    model = Sphere20a()

    @jax.jit
    def fn(imgs):
        x = resize_bilinear_torch(imgs, 112, 96)
        return model.apply(params, x)[-1]

    return fn
