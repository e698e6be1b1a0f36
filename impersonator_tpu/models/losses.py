"""Loss stack for the adversarial trainer and test-time personalization.

Covers the reference's ``networks/networks.py:83-422``:

* ``Vgg19`` — 5-slice VGG19 feature extractor;
* ``vgg_loss`` — weighted multi-scale L1 (VGGLoss :171-186);
* ``style_loss`` — gram-matrix L1 at 224² (StyleLoss :401-422);
* ``face_loss`` — SphereFace perceptual distance on
  head crops located by cocoplus keypoints or bboxes (:211-398);
* ``lsgan_loss`` — LSGAN objective (impersonator_trainer.py:413-414);
* ``tv_smooth`` — mask total-variation (:416-418);
* ``head_bbox_from_kps`` / ``body_bbox_from_kps`` — keypoint-driven crop
  rectangles (impersonator_trainer.py:85-165), kept fractional/static so
  they jit.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from impersonator_tpu.models.facenet import Sphere20a
from impersonator_tpu.ops.sampler import resize_bilinear_align, grid_sample

NECK_IDS = 12  # cocoplus neck index (impersonator_trainer.py:93)


# --------------------------------------------------------------------------
# VGG19
# --------------------------------------------------------------------------

_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
            512, 512, 512, 512, "M", 512]  # up to slice 5 (conv5_1)


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


class Vgg19(nn.Module):
    """First 30 torchvision vgg19.features layers grouped into 5 slices
    ending after the ReLU of conv1_2/2_2/3_2/4_2/5_1 (networks.py:137-160);
    2x2 maxpool between stages. Weights convert from torchvision via
    tools/convert_weights; returns the 5 slice features."""

    @nn.compact
    def __call__(self, x) -> list:
        feats = []
        i = 0
        for item in _VGG_CFG:
            if item == "M":
                x = _maxpool2(x)
            else:
                x = nn.Conv(item, (3, 3), padding=((1, 1), (1, 1)),
                            name=f"conv_{i}")(x)
                x = jax.nn.relu(x)
                if i in (1, 3, 5, 9, 13):
                    feats.append(x)
                i += 1
        return feats


VGG_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


def vgg_loss(feats_x: Sequence, feats_y: Sequence) -> jax.Array:
    """Σ w_i · L1(x_i, stop_grad(y_i)) (VGGLoss, networks.py:171-186)."""
    total = 0.0
    for w, fx, fy in zip(VGG_WEIGHTS, feats_x, feats_y):
        total = total + w * jnp.mean(jnp.abs(fx - jax.lax.stop_gradient(fy)))
    return total


def _gram(feat):
    """(B, H, W, C) -> (B, C, C) gram matrix (StyleLoss.gram)."""
    b, h, w, c = feat.shape
    m = feat.reshape(b, h * w, c)
    return jnp.einsum("bnc,bnd->bcd", m, m)


def style_loss(feats_x: Sequence, feats_y: Sequence) -> jax.Array:
    """Gram L1 normalized by spatial size (StyleLoss, networks.py:401-422).
    Callers resize inputs to 224² first, as the reference does."""
    total = 0.0
    for fx, fy in zip(feats_x, feats_y):
        h, w = fx.shape[1], fx.shape[2]
        total = total + jnp.mean(jnp.abs(_gram(fx) - _gram(fy))) / (h * w)
    return total


# --------------------------------------------------------------------------
# Face loss
# --------------------------------------------------------------------------

FACE_H, FACE_W = 112, 96  # SphereFace input (networks.py:223)


def head_bbox_from_kps(kps: jax.Array) -> jax.Array:
    """cocoplus kps (B, 19, 2) in [-1,1] -> fractional bbox
    (B, 4 = [min_x, max_x, min_y, max_y]) in [0, 1].

    Same algebra as BodyRecoveryFlow.cal_head_bbox
    (impersonator_trainer.py:85-126) before its pixel quantization; kept
    fractional so crops stay jittable (the quantization is a no-op for
    the bilinear crop-resize used downstream).
    """
    k = (kps + 1.0) / 2.0
    head = k[:, NECK_IDS:, :]
    min_x = jnp.clip(jnp.min(head[..., 0], axis=1) - 0.05, 0.0, 1.0)
    max_x = jnp.clip(jnp.max(head[..., 0], axis=1) + 0.05, 0.0, 1.0)
    min_y = jnp.clip(jnp.min(head[..., 1], axis=1) - 0.05, 0.0, 1.0)
    max_y = jnp.clip(jnp.max(head[..., 1], axis=1), 0.0, 1.0)
    return jnp.stack([min_x, max_x, min_y, max_y], axis=1)


def body_bbox_from_kps(kps: jax.Array, factor: float = 1.2) -> jax.Array:
    """Fractional body bbox (cal_body_bbox, impersonator_trainer.py:128-165)."""
    k = (kps + 1.0) / 2.0
    min_x = jnp.min(k[..., 0], axis=1)
    max_x = jnp.max(k[..., 0], axis=1)
    mid_x = (min_x + max_x) / 2
    w = (max_x - min_x) * factor
    min_y = jnp.min(k[..., 1], axis=1)
    max_y = jnp.max(k[..., 1], axis=1)
    mid_y = (min_y + max_y) / 2
    h = (max_y - min_y) * factor
    return jnp.stack([
        jnp.clip(mid_x - w / 2, 0.0, 1.0),
        jnp.clip(mid_x + w / 2, 0.0, 1.0),
        jnp.clip(mid_y - h / 2, 0.0, 1.0),
        jnp.clip(mid_y + h / 2, 0.0, 1.0),
    ], axis=1)


def crop_resize_fractional(imgs: jax.Array, bbox: jax.Array,
                           out_h: int, out_w: int) -> jax.Array:
    """Bilinearly crop fractional bboxes (B,4=[x0,x1,y0,y1] in [0,1]) to a
    fixed size — the jittable replacement for the reference's python
    per-sample slicing loops (networks.py:291-330)."""
    b = imgs.shape[0]
    x0, x1, y0, y1 = (bbox[:, i] for i in range(4))

    def grid_axis(a0, a1, n):
        t = jnp.arange(n, dtype=jnp.float32) / max(n - 1, 1)
        return (a0[:, None] + t[None, :] * (a1 - a0)[:, None]) * 2.0 - 1.0

    gx = grid_axis(x0, x1, out_w)
    gy = grid_axis(y0, y1, out_h)
    grid = jnp.stack([
        jnp.broadcast_to(gx[:, None, :], (b, out_h, out_w)),
        jnp.broadcast_to(gy[:, :, None], (b, out_h, out_w)),
    ], axis=-1)
    return grid_sample(imgs, grid)


def face_loss_from_feats(feats1: Sequence, feats2: Sequence) -> jax.Array:
    """Σ L1(f1_i, stop_grad(f2_i)) over Sphere20a features
    (FaceLoss.compute_loss, networks.py:273-287)."""
    total = 0.0
    for f1, f2 in zip(feats1, feats2):
        total = total + jnp.mean(jnp.abs(f1 - jax.lax.stop_gradient(f2)))
    return total


def face_loss(face_net, face_params, imgs1, imgs2,
              bbox1=None, bbox2=None, kps1=None, kps2=None) -> jax.Array:
    """Crop heads (by kps or bbox), run the face net, L1 over features.

    Mirrors FaceLoss.forward (networks.py:230-271) minus its imgs1/imgs2
    copy-paste bug (SURVEY §7.4: the reference resizes imgs1 in the imgs2
    branch). face_net is Sphere20a (112×96 crops) or SENet50 (224×224,
    selected in the reference by 'senet' in the checkpoint path,
    networks.py:214-222)."""
    from impersonator_tpu.models.facenet import SENet50
    is_senet = isinstance(face_net, SENet50)
    fh, fw = (224, 224) if is_senet else (FACE_H, FACE_W)
    if kps1 is not None:
        bbox1 = head_bbox_from_kps(kps1)
    if kps2 is not None:
        bbox2 = head_bbox_from_kps(kps2)
    head1 = (crop_resize_fractional(imgs1, bbox1, fh, fw)
             if bbox1 is not None else resize_bilinear_align(imgs1, fh, fw))
    head2 = (crop_resize_fractional(imgs2, bbox2, fh, fw)
             if bbox2 is not None else resize_bilinear_align(imgs2, fh, fw))
    f1 = face_net.apply(face_params, head1)
    f2 = face_net.apply(face_params, head2)
    if is_senet:
        f1, f2 = f1[0], f2[0]     # (stage feats, embed) -> stage feats
    return face_loss_from_feats(f1, f2)


# --------------------------------------------------------------------------
# GAN / regularizers
# --------------------------------------------------------------------------

def lsgan_loss(pred: jax.Array, target: float) -> jax.Array:
    """mean((pred - target)^2) — Impersonator._compute_loss_D
    (impersonator_trainer.py:413-414). Targets: real 1, fake -1 (D), 0 (G
    adversarial, :370)."""
    return jnp.mean((pred - target) ** 2)


def tv_smooth(mat: jax.Array) -> jax.Array:
    """Mask total variation, NHWC (impersonator_trainer.py:416-418)."""
    return (jnp.mean(jnp.abs(mat[:, :, :-1, :] - mat[:, :, 1:, :]))
            + jnp.mean(jnp.abs(mat[:, :-1, :, :] - mat[:, 1:, :, :])))


def l1(a, b):
    return jnp.mean(jnp.abs(a - b))


def bce(pred, target, eps: float = 1e-7):
    """torch nn.BCELoss on probabilities (mask loss, trainer opt mask_bce)."""
    p = jnp.clip(pred, eps, 1.0 - eps)
    return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


def mse(a, b):
    return jnp.mean((a - b) ** 2)


def hmr_loss(hmr, hmr_params, x, y):
    """L1 distance between HMR theta regressions of two image batches
    (HMRLoss, networks.py:189-208) — a body-structure perceptual loss."""
    tx = hmr.apply(hmr_params, x)
    ty = hmr.apply(hmr_params, y)
    return jnp.mean(jnp.abs(tx - jax.lax.stop_gradient(ty)))
