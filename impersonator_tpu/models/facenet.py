"""Sphere20a face-identity network (flax.linen, NHWC).

Mirrors the reference SphereFace backbone (``networks/facenet.py:199-282``):
4 stages of strided conv + PReLU residual pairs, returning the 4 stage
features + the 512-d fc embedding — consumed by FaceLoss as a perceptual
distance. The fc6 angular head is dropped, exactly like the reference's
checkpoint loader (networks.py:407-419).

Input: (B, 112, 96, 3) in [-1, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


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
