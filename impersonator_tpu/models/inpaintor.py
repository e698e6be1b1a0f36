"""DeepFill-v2 background inpaintor (flax.linen, NHWC).

Re-implements the reference's gated-convolution coarse→refine network
with one spatial self-attention block (``networks/inpaintor.py:12-230``).
The self-attention matmuls land on the MXU; everything else is gated
convs that XLA fuses.

Interface parity: ``__call__(imgs, masks, only_x=...)`` where masks mark
the region to synthesize (body pixels at test time, imitator.py:124-131).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from impersonator_tpu.models.layers import BatchNorm, leaky_relu


def _get_pad(size, ksize, stride, atrous=1):
    out = math.ceil(float(size) / stride)
    return int(((out - 1) * stride + atrous * (ksize - 1) + 1 - size) / 2)


class GatedConv(nn.Module):
    """x = act(conv(x)) * sigmoid(mask_conv(x)); optional batchnorm
    (inpaintor.py:12-47)."""

    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    batch_norm: bool = True
    activation: bool = True  # LeakyReLU(0.2) when True, identity when False

    @nn.compact
    def __call__(self, x):
        def conv(name):
            return nn.Conv(
                self.features, (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=((self.padding, self.padding),
                         (self.padding, self.padding)),
                kernel_dilation=(self.dilation, self.dilation),
                kernel_init=nn.initializers.he_normal(), name=name)(x)

        h = conv("conv")
        gate = jax.nn.sigmoid(conv("mask_conv"))
        h = (leaky_relu(h) if self.activation else h) * gate
        if self.batch_norm:
            h = BatchNorm(name="bn")(h, use_running_average=True)
        return h


class GatedDeConv(nn.Module):
    """2x nearest upsample + gated conv (inpaintor.py:50-69)."""

    features: int
    kernel: int
    padding: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
        return GatedConv(self.features, self.kernel, 1, self.padding,
                         name="conv")(x)


class SelfAttention(nn.Module):
    """Spatial SAGAN-style attention (inpaintor.py:71-107)."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        n = h * w
        q = nn.Conv(c // 8, (1, 1), name="query")(x).reshape(b, n, c // 8)
        k = nn.Conv(c // 8, (1, 1), name="key")(x).reshape(b, n, c // 8)
        v = nn.Conv(c, (1, 1), name="value")(x).reshape(b, n, c)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k), axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
        return gamma * out + x


class InpaintSANet(nn.Module):
    """Coarse→refine gated inpainting (inpaintor.py:110-230). c_dim is the
    input channel count of [masked_img, mask]."""

    c_dim: int = 4
    cnum: int = 32

    def setup(self):
        cn = self.cnum

        def gc(i, f, k, s, p, d=1, act=True):
            return GatedConv(f, k, s, p, dilation=d, activation=act,
                             name=f"{i}")

        self.coarse_net = [
            gc("c0", cn, 5, 1, _get_pad(256, 5, 1)),
            gc("c1", 2 * cn, 4, 2, _get_pad(256, 4, 2)),
            gc("c2", 2 * cn, 3, 1, _get_pad(128, 3, 1)),
            gc("c3", 4 * cn, 4, 2, _get_pad(128, 4, 2)),
            gc("c4", 4 * cn, 3, 1, _get_pad(64, 3, 1)),
            gc("c5", 4 * cn, 3, 1, _get_pad(64, 3, 1)),
            gc("c6", 4 * cn, 3, 1, _get_pad(64, 3, 1, 2), d=2),
            gc("c7", 4 * cn, 3, 1, _get_pad(64, 3, 1, 4), d=4),
            gc("c8", 4 * cn, 3, 1, _get_pad(64, 3, 1, 8), d=8),
            gc("c9", 4 * cn, 3, 1, _get_pad(64, 3, 1, 16), d=16),
            gc("c10", 4 * cn, 3, 1, _get_pad(64, 3, 1)),
            gc("c11", 4 * cn, 3, 1, _get_pad(64, 3, 1)),
            GatedDeConv(2 * cn, 3, _get_pad(128, 3, 1), name="c12"),
            gc("c13", 2 * cn, 3, 1, _get_pad(128, 3, 1)),
            GatedDeConv(cn, 3, _get_pad(256, 3, 1), name="c14"),
            gc("c15", cn // 2, 3, 1, _get_pad(256, 3, 1)),
            gc("c16", 3, 3, 1, _get_pad(128, 3, 1), act=False),
        ]
        self.refine_conv_net = [
            gc("r0", cn, 5, 1, _get_pad(256, 5, 1)),
            gc("r1", cn, 4, 2, _get_pad(256, 4, 2)),
            gc("r2", 2 * cn, 3, 1, _get_pad(128, 3, 1)),
            gc("r3", 2 * cn, 4, 2, _get_pad(128, 4, 2)),
            gc("r4", 4 * cn, 3, 1, _get_pad(64, 3, 1)),
            gc("r5", 4 * cn, 3, 1, _get_pad(64, 3, 1)),
            gc("r6", 4 * cn, 3, 1, _get_pad(64, 3, 1)),
            gc("r7", 4 * cn, 3, 1, _get_pad(64, 3, 1, 2), d=2),
            gc("r8", 4 * cn, 3, 1, _get_pad(64, 3, 1, 4), d=4),
            gc("r9", 4 * cn, 3, 1, _get_pad(64, 3, 1, 8), d=8),
            gc("r10", 4 * cn, 3, 1, _get_pad(64, 3, 1, 16), d=16),
        ]
        self.refine_attn = SelfAttention(name="attn")
        self.refine_upsample_net = [
            gc("u0", 4 * cn, 3, 1, _get_pad(64, 3, 1)),
            gc("u1", 4 * cn, 3, 1, _get_pad(64, 3, 1)),
            GatedDeConv(2 * cn, 3, _get_pad(128, 3, 1), name="u2"),
            gc("u3", 2 * cn, 3, 1, _get_pad(128, 3, 1)),
            GatedDeConv(cn, 3, _get_pad(256, 3, 1), name="u4"),
            gc("u5", cn // 2, 3, 1, _get_pad(256, 3, 1)),
            gc("u6", 3, 3, 1, _get_pad(256, 3, 1), act=False),
        ]

    def __call__(self, imgs, masks, only_out: bool = False, only_x: bool = False):
        """imgs (B,H,W,3) in [-1,1]; masks (B,H,W,1), 1 = synthesize."""
        masked = imgs * (1 - masks) + masks
        x = jnp.concatenate([masked, masks], axis=-1)
        for layer in self.coarse_net:
            x = layer(x)
        coarse = jnp.clip(x, -1.0, 1.0)

        masked = imgs * (1 - masks) + coarse * masks
        x = jnp.concatenate([masked, masks], axis=-1)
        for layer in self.refine_conv_net:
            x = layer(x)
        x = self.refine_attn(x)
        for layer in self.refine_upsample_net:
            x = layer(x)
        x = jnp.clip(x, -1.0, 1.0)

        comp = x * masks + imgs * (1 - masks)
        if only_out:
            return comp
        if only_x:
            return x
        return coarse, x, comp
