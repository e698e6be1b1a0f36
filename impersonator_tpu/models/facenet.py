"""Face-identity networks (flax.linen, NHWC).

* :class:`Sphere20a` mirrors the reference SphereFace backbone
  (``networks/facenet.py:199-282``): 4 stages of strided conv + PReLU
  residual pairs, returning the 4 stage features + the 512-d fc
  embedding — consumed by FaceLoss as a perceptual distance. The fc6
  angular head is dropped, exactly like the reference's checkpoint
  loader (networks.py:407-419).
  Input: (B, 112, 96, 3) in [-1, 1].

* :class:`SENet50` mirrors the reference's VGGFace2 SE-ResNet-50
  (``networks/facenet.py:66-197``): Bottleneck blocks whose stride sits
  on the FIRST 1×1 conv (a VGGFace2 quirk — torchvision puts it on the
  3×3) with an inline squeeze-excite (global pool → 1×1 down/16 → relu
  → 1×1 up → sigmoid gate), ceil-mode 3×3/2 stem pool, layers
  [3, 4, 6, 3]. Returns the 5 stage features (get_feat=True contract,
  facenet.py:165-190) plus the 2048-d pooled embedding that drives the
  face-CS / face-FD metrics.
  Input: (B, 224, 224, 3), VGGFace2 preprocessing is the caller's job.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from impersonator_tpu.models.layers import BatchNorm, max_pool_ceil


class PReLU(nn.Module):
    """torch nn.PReLU(num_parameters=C), per-channel slope (init 0.25)."""

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (x.shape[-1],))
        return jnp.where(x >= 0, x, a * x)


class _ConvPReLU(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=((1, 1), (1, 1)), name="conv")(x)
        return PReLU(name="prelu")(x)


class Sphere20a(nn.Module):
    """Returns [stage1, stage2, stage3, stage4, fc5] features."""

    @nn.compact
    def __call__(self, x):
        feats = []

        def res_pair(x, feat, idx):
            h = _ConvPReLU(feat, name=f"{idx}a")(x)
            h = _ConvPReLU(feat, name=f"{idx}b")(h)
            return x + h

        x = _ConvPReLU(64, 2, name="conv1_1")(x)
        x = res_pair(x, 64, "conv1_2")
        feats.append(x)

        x = _ConvPReLU(128, 2, name="conv2_1")(x)
        x = res_pair(x, 128, "conv2_2")
        x = res_pair(x, 128, "conv2_4")
        feats.append(x)

        x = _ConvPReLU(256, 2, name="conv3_1")(x)
        x = res_pair(x, 256, "conv3_2")
        x = res_pair(x, 256, "conv3_4")
        x = res_pair(x, 256, "conv3_6")
        x = res_pair(x, 256, "conv3_8")
        feats.append(x)

        x = _ConvPReLU(512, 2, name="conv4_1")(x)
        x = res_pair(x, 512, "conv4_2")
        feats.append(x)

        # torch flattens NCHW (C,H,W) order; transpose before reshape so a
        # converted fc5 weight matches.
        flat = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
        feats.append(nn.Dense(512, name="fc5")(flat))
        return feats


class SEBottleneck(nn.Module):
    """facenet.py:66-116 — 1×1(stride)/3×3/1×1 with SE gate via conv4/5."""

    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        st = (self.stride, self.stride)
        out = nn.Conv(self.planes, (1, 1), st, padding="VALID",
                      use_bias=False, name="conv1")(x)
        out = jax.nn.relu(BatchNorm(name="bn1")(out))
        out = nn.Conv(self.planes, (3, 3), (1, 1),
                      padding=((1, 1), (1, 1)), use_bias=False,
                      name="conv2")(out)
        out = jax.nn.relu(BatchNorm(name="bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), padding="VALID",
                      use_bias=False, name="conv3")(out)
        out = BatchNorm(name="bn3")(out)

        # squeeze-excite (compress_rate 16, facenet.py:82-107)
        se = jnp.mean(out, axis=(1, 2), keepdims=True)
        se = nn.Conv(self.planes * 4 // 16, (1, 1), name="conv4")(se)
        se = jax.nn.relu(se)
        se = nn.Conv(self.planes * 4, (1, 1), name="conv5")(se)
        se = jax.nn.sigmoid(se)

        if self.downsample:
            residual = nn.Conv(self.planes * 4, (1, 1), st, padding="VALID",
                               use_bias=False, name="downsample_conv")(x)
            residual = BatchNorm(name="downsample_bn")(residual)
        return jax.nn.relu(se * out + residual)


class SENet50(nn.Module):
    """VGGFace2 SE-ResNet-50 (facenet.py:119-197, senet50()).

    Returns ([x0..x4 stage features], embed) where embed is the 2048-d
    global-average-pooled top feature (the include_top fc head is
    dropped — the eval metrics consume the embedding, not the 8631-way
    VGGFace2 logits)."""

    layers: tuple = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1")(x)
        x = jax.nn.relu(BatchNorm(name="bn1")(x))
        x0 = max_pool_ceil(x, 3, 2)

        feats = [x0]
        x = x0
        inplanes = 64
        for li, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers)):
            stride = 1 if li == 0 else 2
            for b in range(blocks):
                s = stride if b == 0 else 1
                down = b == 0 and (s != 1 or inplanes != planes * 4)
                x = SEBottleneck(planes, s, down,
                                 name=f"layer{li + 1}_{b}")(x)
            inplanes = planes * 4
            feats.append(x)
        embed = jnp.mean(x, axis=(1, 2))
        return feats, embed
