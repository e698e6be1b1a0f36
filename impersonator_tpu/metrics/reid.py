"""OSNet person-reID encoder (flax.linen, NHWC) for OS-CS-reid/OS-freid.

Mirrors the reference's vendored OSNet
(``thirdparty/his_evaluators/his_evaluators/metrics/OSreid/OSNet.py``):
omni-scale blocks whose 4 Lite-3x3 streams share ONE ChannelGate
(OSNet.py:165,181), the ``osnet_ibn_x1_0`` variant actually loaded by
the evaluator (``encoder.py:29``) with instance norm in the stem and
stage-2 blocks, transition Conv1x1+AvgPool2 between stages, and a
512-d fc (Linear + BatchNorm1d + ReLU) embedding head — eval-mode
forward returns that embedding (OSNet.py:291-299).

Weights convert from the released ``osnet_ibn_x1_0_imagenet.pth`` via
``tools/convert_weights.py osnet``; parity is proven against a
functional-torch oracle in tests/torch_ref.py (random weights, exact
key naming), so correctness does not depend on the released file.

Input contract (encoder.py:86-100): (B, 256, 128, 3) patches,
ImageNet-normalized. :func:`osnet_reid_embed_fn` resizes full frames
and normalizes from [-1, 1].
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from impersonator_tpu.models.layers import BatchNorm, InstanceNorm, max_pool


class ConvBNRelu(nn.Module):
    """ConvLayer / Conv1x1 / Conv3x3 (OSNet.py:10-75); IN swaps the BN
    for an affine instance norm (the IBN variant's stem)."""

    features: int
    kernel: int = 1
    stride: int = 1
    padding: int = 0
    use_in: bool = False
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    (self.stride, self.stride),
                    padding=((self.padding, self.padding),
                             (self.padding, self.padding)),
                    use_bias=False, name="conv")(x)
        x = (InstanceNorm(name="bn")(x) if self.use_in
             else BatchNorm(name="bn")(x))
        return jax.nn.relu(x) if self.relu else x


class LightConv3x3(nn.Module):
    """1x1 (linear) + depthwise 3x3 + BN + relu (OSNet.py:78-96)."""

    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    name="conv1")(x)
        x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=self.features, use_bias=False,
                    name="conv2")(x)
        x = BatchNorm(name="bn")(x)
        return jax.nn.relu(x)


class ChannelGate(nn.Module):
    """Squeeze-excite gate, sigmoid activation (OSNet.py:102-139)."""

    features: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(self.features // self.reduction, (1, 1),
                    name="fc1")(g)
        g = jax.nn.relu(g)
        g = nn.Conv(self.features, (1, 1), name="fc2")(g)
        return x * jax.nn.sigmoid(g)


class OSBlock(nn.Module):
    """Omni-scale block: 4 streams of 1..4 Lite convs, ONE shared gate,
    bottleneck 1x1s, residual (OSNet.py:142-188)."""

    features: int
    use_in: bool = False
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        mid = self.features // self.reduction
        residual = x
        x1 = ConvBNRelu(mid, name="conv1")(x)
        gate = ChannelGate(mid, name="gate")
        x2 = 0.0
        for si, depth in enumerate((1, 2, 3, 4)):
            h = x1
            for d in range(depth):
                sub = "" if depth == 1 else f"_{d}"
                h = LightConv3x3(mid, name=f"conv2{'abcd'[si]}{sub}")(h)
            x2 = x2 + gate(h)
        x3 = ConvBNRelu(self.features, relu=False, name="conv3")(x2)
        if residual.shape[-1] != self.features:
            residual = ConvBNRelu(self.features, relu=False,
                                  name="downsample")(residual)
        out = x3 + residual
        if self.use_in:
            out = InstanceNorm(name="IN")(out)
        return jax.nn.relu(out)


class OSNet(nn.Module):
    """osnet_ibn_x1_0 (OSNet.py:336-341): channels (64, 256, 384, 512),
    2 blocks per stage, IN in stem + stage 2. Returns the 512-d
    eval-mode embedding."""

    channels: Sequence[int] = (64, 256, 384, 512)
    feature_dim: int = 512
    use_in: bool = True

    @nn.compact
    def __call__(self, x):
        c = self.channels
        x = ConvBNRelu(c[0], kernel=7, stride=2, padding=3,
                       use_in=self.use_in, name="conv1")(x)
        x = max_pool(x, 3, 2, padding=1)
        for b in range(2):
            x = OSBlock(c[1], use_in=self.use_in, name=f"conv2_{b}")(x)
        x = ConvBNRelu(c[1], name="conv2_t")(x)
        x = nn.avg_pool(x, (2, 2), (2, 2))
        for b in range(2):
            x = OSBlock(c[2], name=f"conv3_{b}")(x)
        x = ConvBNRelu(c[2], name="conv3_t")(x)
        x = nn.avg_pool(x, (2, 2), (2, 2))
        for b in range(2):
            x = OSBlock(c[3], name=f"conv4_{b}")(x)
        x = ConvBNRelu(c[3], name="conv5")(x)
        v = jnp.mean(x, axis=(1, 2))
        v = nn.Dense(self.feature_dim, name="fc")(v)
        # BatchNorm1d on (B, D): same eval-mode affine as 2d
        v = BatchNorm(name="fc_bn")(v[:, None, None, :])[:, 0, 0, :]
        return jax.nn.relu(v)


# ImageNet normalization the reference encoder applies (encoder.py:
# norm_mean/std passed from metrics.py:233-246)
_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def osnet_reid_embed_fn(tree):
    """Frame-level reid embedding driving OS-CS-reid / OS-freid: resize
    frames ([-1, 1]) to the 256×128 patch size with align_corners=True
    (encoder.py:86), ImageNet-normalize, OSNet embed."""
    from impersonator_tpu.ops.sampler import resize_bilinear_align

    model = OSNet()

    @jax.jit
    def fn(imgs):
        x = resize_bilinear_align(imgs, 256, 128)
        x01 = (x + 1.0) * 0.5
        mean = jnp.asarray(_IMAGENET_MEAN, x01.dtype)
        std = jnp.asarray(_IMAGENET_STD, x01.dtype)
        return model.apply(tree, (x01 - mean) / std)

    return fn


# --------------------------------------------------------------------------
# PCB (part-based ResNet50) reid — the reference's second reid metric
# --------------------------------------------------------------------------


class ResBottleneck(nn.Module):
    """torchvision Bottleneck (BN flavor, stride on conv2)."""

    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        st = (self.stride, self.stride)
        h = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        h = jax.nn.relu(BatchNorm(name="bn1")(h))
        h = nn.Conv(self.planes, (3, 3), st, padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv2")(h)
        h = jax.nn.relu(BatchNorm(name="bn2")(h))
        h = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                    name="conv3")(h)
        h = BatchNorm(name="bn3")(h)
        if self.downsample:
            residual = nn.Conv(self.planes * 4, (1, 1), st,
                               use_bias=False, name="downsample_conv")(x)
            residual = BatchNorm(name="downsample_bn")(residual)
        return jax.nn.relu(h + residual)


class PCBReid(nn.Module):
    """PCB_test (PCBreid/model.py:197-220): torchvision ResNet50 with
    layer4[0] stride forced to 1, pooled to 6 vertical parts. Returns
    (B, 6, 2048) raw part features; :func:`pcb_embed` applies the
    1/sqrt(6) part-L2 normalization + flatten (person_dist.py:138-142).
    Input: (B, 384, 192, 3) ImageNet-normalized."""

    layers: Sequence[int] = (3, 4, 6, 3)
    parts: int = 6

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1")(x)
        x = jax.nn.relu(BatchNorm(name="bn1")(x))
        x = max_pool(x, 3, 2, padding=1)
        inplanes = 64
        for li, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers)):
            # layer4 keeps stride 1 (PCB: removed final downsample)
            stride = 1 if li in (0, 3) else 2
            for b in range(blocks):
                s = stride if b == 0 else 1
                down = b == 0 and (s != 1 or inplanes != planes * 4)
                x = ResBottleneck(planes, s, down,
                                  name=f"layer{li + 1}_{b}")(x)
            inplanes = planes * 4
        b_, h, w, c = x.shape
        assert h % self.parts == 0, (h, self.parts)
        x = x.reshape(b_, self.parts, h // self.parts, w, c)
        return jnp.mean(x, axis=(2, 3))     # AdaptiveAvgPool2d((6, 1))


def pcb_embed(parts: jax.Array, eps: float = 1e-12) -> jax.Array:
    """(B, 6, 2048) -> (B, 12288): per-part L2 norm scaled by sqrt(6)
    then flattened in torch's (C, parts) order (person_dist.py:138-142
    operates on (B, 2048, 6))."""
    n = jnp.sqrt(jnp.sum(parts * parts, axis=-1, keepdims=True))
    normed = parts / (n * jnp.sqrt(float(parts.shape[1])) + eps)
    return normed.transpose(0, 2, 1).reshape(parts.shape[0], -1)


def pcb_reid_embed_fn(tree):
    """Frame-level PCB embedding: 384×192 align-corners resize, ImageNet
    norm, 6-part features, normalized flatten."""
    from impersonator_tpu.ops.sampler import resize_bilinear_align

    model = PCBReid()

    @jax.jit
    def fn(imgs):
        x = resize_bilinear_align(imgs, 384, 192)
        x01 = (x + 1.0) * 0.5
        mean = jnp.asarray(_IMAGENET_MEAN, x01.dtype)
        std = jnp.asarray(_IMAGENET_STD, x01.dtype)
        return pcb_embed(model.apply(tree, (x01 - mean) / std))

    return fn
