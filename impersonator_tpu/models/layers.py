"""Building-block layers with exact PyTorch numerical semantics, NHWC.

Everything here exists so that (a) checkpoints converted from the
reference reproduce identical activations and (b) freshly trained models
follow the same inductive biases (init distribution, norm epsilons).

* ``Conv`` — cross-correlation with symmetric zero padding (torch Conv2d).
* ``ConvTransposeTorch`` — torch ConvTranspose2d(k, s, p, output_padding)
  expressed as an input-dilated convolution with a flipped kernel
  (the generator upsampling path, generator.py:110).
* ``InstanceNorm`` — affine instance norm, eps 1e-5 (generator.py:14-17).
* ``BatchNormEval`` — inference-mode batchnorm driven by converted
  running stats (HMR encoder, deepfillv2).
* ``max_pool_ceil`` — torch max_pool2d(ceil_mode=True) (hmr.py:153,281).

Conv weights default to N(0, 0.02) like NetworkBase.init_weights
(networks/networks.py:54-59).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

conv_init = nn.initializers.normal(stddev=0.02)


def narrow_head_conv(x, k, phases: int = 4, force_phase: bool = False):
    """Odd-K 'same' stride-1 conv with FEW output channels, computed as a
    space-to-depth phase conv so the MXU's 128 output lanes stay busy.

    A direct KxK conv to cout<=4 channels uses 4/128 output lanes. Instead,
    the KxK kernel is embedded at ``phases**2`` spatial offsets inside a
    (K+phases-1)^2 kernel and run as ONE stride-``phases`` conv producing
    ``phases**2 * cout`` channels at 1/phases resolution — each output
    channel block is one output-pixel phase of the original conv — then
    depth-to-space'd back. Bit-exact (same taps, same accumulation dtype);
    (K+S-1)^2/K^2 ≈ 2x more MACs at 16x better lane occupancy nets ~2.4x
    measured on v5e for the 7x7 64->4 generator regress head at 256^2.

    Falls back to the direct conv when H or W is not divisible by
    ``phases`` (or the input is tiny), and on the CPU backend — there the
    phase form is strictly worse (2x the MACs, no lane win) and its
    different accumulation grouping costs ~1e-3 extra conv deviation in
    the CPU codegen, which the multichip dryrun's sharded-vs-replicated
    gradient gates are tight enough to notice. Requires odd K; padding is
    K//2 ('same'), matching torch Conv2d(k, padding=k//2).
    """
    K, _, cin, cout = k.shape
    assert K % 2 == 1, "narrow_head_conv: kernel must be odd (same padding)"
    P = K // 2
    B, H, W, _ = x.shape
    S = phases
    dn = ("NHWC", "HWIO", "NHWC")
    if (H % S or W % S or min(H, W) < K + S
            or (not force_phase and jax.default_backend() == "cpu")):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((P, P), (P, P)), dimension_numbers=dn)
    shifted = [
        jnp.pad(k, ((py, S - 1 - py), (px, S - 1 - px), (0, 0), (0, 0)))
        for py in range(S) for px in range(S)
    ]
    kp = jnp.stack(shifted, axis=-2)            # (K+S-1, K+S-1, cin, S*S, cout)
    kp = kp.reshape(K + S - 1, K + S - 1, cin, S * S * cout)
    y = jax.lax.conv_general_dilated(
        x, kp, (S, S), ((P, P), (P, P)), dimension_numbers=dn)
    ho, wo = y.shape[1], y.shape[2]
    y = y.reshape(B, ho, wo, S, S, cout).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, ho * S, wo * S, cout)


class Conv(nn.Module):
    """torch nn.Conv2d equivalent (NHWC, HWIO weights)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        p = self.padding
        return nn.Conv(
            features=self.features,
            kernel_size=(k, k),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            kernel_init=conv_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv",
        )(x)


class ConvTransposeTorch(nn.Module):
    """torch nn.ConvTranspose2d(kernel, stride, padding, output_padding).

    Implemented as lhs-dilated conv with spatially flipped HWIO kernel:
    out = (in-1)*s - 2p + k + op  — exact torch sizing. The generator uses
    (k=3 or 4, s=2, p=1, op=1) for clean 2× upsampling (generator.py:48,110).
    """

    features: int
    kernel_size: int
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        k, s, p, op = self.kernel_size, self.stride, self.padding, self.output_padding
        in_feat = x.shape[-1]
        kernel = self.param("kernel", conv_init, (k, k, in_feat, self.features))
        pad = (k - 1 - p, k - 1 - p + op)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype or x.dtype),
            jnp.flip(kernel, (0, 1)).astype(self.dtype or kernel.dtype),
            window_strides=(1, 1),
            padding=(pad, pad),
            lhs_dilation=(s, s),
            rhs_dilation=(1, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


class InstanceNorm(nn.Module):
    """nn.InstanceNorm2d(affine=True), eps=1e-5, per (sample, channel).

    Statistics always accumulate in fp32 so the module is safe under a
    bf16 compute policy (65k-element spatial reductions lose precision in
    bf16); the output returns in the input dtype."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.var(xf, axis=(1, 2), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(x.dtype)


class BatchNorm(nn.Module):
    """torch nn.BatchNorm2d. train=True uses batch stats (and returns
    updated running stats via flax mutable collections); eval uses the
    stored running stats — matching torch .train()/.eval()."""

    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    eps: float = 1e-5
    use_running_average: bool = True

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        use_ra = (self.use_running_average
                  if use_running_average is None else use_running_average)
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = jnp.mean(x, axis=(0, 1, 2))
            var = jnp.var(x, axis=(0, 1, 2))
            if not self.is_initializing():
                n = x.shape[0] * x.shape[1] * x.shape[2]
                unbiased = var * n / max(n - 1, 1)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * scale + bias


def leaky_relu(x, slope=0.2):
    return jax.nn.leaky_relu(x, negative_slope=slope)


def max_pool_ceil(x, window: int, stride: int):
    """torch F.max_pool2d(kernel, stride, ceil_mode=True), NHWC."""
    h, w = x.shape[1], x.shape[2]

    def pad_amount(size):
        out = -(-(size - window) // stride) + 1  # ceil
        return (out - 1) * stride + window - size

    ph, pw = pad_amount(h), pad_amount(w)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (0, ph), (0, pw), (0, 0)),
    )


def avg_pool(x, window: int, stride: int | None = None):
    """torch F.avg_pool2d (count_include_pad irrelevant: no padding)."""
    stride = stride or window
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )
    return summed / float(window * window)


def max_pool(x, window: int, stride: int, padding: int = 0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


class ConvINReLU(nn.Module):
    """Conv -> InstanceNorm -> ReLU, the generator's encoder unit."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features, self.kernel_size, self.stride, self.padding,
                 use_bias=False, name="conv")(x)
        x = InstanceNorm(name="norm")(x)
        return jax.nn.relu(x)


class DeconvINReLU(nn.Module):
    """ConvTranspose -> InstanceNorm -> ReLU, the decoder unit."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, x):
        x = ConvTransposeTorch(self.features, self.kernel_size, stride=2,
                               padding=1, output_padding=1, use_bias=False,
                               name="deconv")(x)
        x = InstanceNorm(name="norm")(x)
        return jax.nn.relu(x)


class ResidualBlock(nn.Module):
    """conv3x3 -> IN -> relu -> conv3x3 -> IN, residual add
    (generator.py:8-20)."""

    features: int

    @nn.compact
    def __call__(self, x):
        h = Conv(self.features, 3, 1, 1, use_bias=False, name="conv1")(x)
        h = InstanceNorm(name="norm1")(h)
        h = jax.nn.relu(h)
        h = Conv(self.features, 3, 1, 1, use_bias=False, name="conv2")(h)
        h = InstanceNorm(name="norm2")(h)
        return x + h
