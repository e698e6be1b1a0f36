"""Metric model zoo: LPIPS (alex backbone + learned lin heads) and
InceptionV3 (FID pool3 features + IS logits), in flax.

TPU-native re-implementations of the reference evaluation nets
(`/root/reference/thirdparty/his_evaluators/his_evaluators/metrics/lpips/
models/networks_basic.py:65-168` PNetLin with net='alex', and
`metrics/metrics.py:16-167` InceptionV3 = torchvision inception_v3 split
into blocks). Weights convert from the released torch checkpoints via
``tools/convert_weights.py lpips_lin | alexnet | inception``; converter
parity is proven against functional-torch oracles in
``tests/torch_ref.py`` (random weights, exact key naming), so correctness
does not depend on having the released files in this environment.

All modules are NHWC and jittable; inputs follow the reference contracts:
LPIPS takes images in [-1, 1]; InceptionV3 takes images already resized
to 299² in [-1, 1] (the reference's FID/IS preprocess does x*2-1 then a
bilinear align_corners=False resize — use
``ops.sampler.resize_bilinear_torch`` or host-side resize).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from impersonator_tpu.models.layers import (BatchNorm, Conv, max_pool,
                                            max_pool_ceil)

# --------------------------------------------------------------------------
# LPIPS: AlexNet feature slices + 1x1 lin heads
# --------------------------------------------------------------------------

# (out_ch, kernel, stride, pad) of torchvision alexnet.features convs;
# LPIPS slices end after each conv's ReLU (networks_basic.py chns
# [64,192,384,256,256]; pretrained_networks.py alexnet slices).
_ALEX_CONVS = ((64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
               (256, 3, 1, 1), (256, 3, 1, 1))
# a 3x3/2 maxpool precedes conv2 and conv3 (features[2], features[5])
_ALEX_POOL_BEFORE = (False, True, True, False, False)

LPIPS_CHNS = (64, 192, 384, 256, 256)

# PNetLin input scaling (networks_basic.py:102-103): per-RGB shift/scale
# applied to [-1,1] images.
_LPIPS_SHIFT = (-0.030, -0.088, -0.188)
_LPIPS_SCALE = (0.458, 0.448, 0.450)


class AlexFeatures(nn.Module):
    """torchvision alexnet.features up to relu5, returning the 5 LPIPS
    slice outputs."""

    @nn.compact
    def __call__(self, x) -> list:
        feats = []
        for i, (ch, k, s, p) in enumerate(_ALEX_CONVS):
            if _ALEX_POOL_BEFORE[i]:
                x = max_pool(x, 3, 2)
            x = Conv(ch, k, s, p, name=f"conv{i}")(x)
            x = jax.nn.relu(x)
            feats.append(x)
        return feats


# torchvision vgg16.features conv indices + channels; LPIPS vgg slices
# end after relu{1_2,2_2,3_3,4_3,5_3} (pretrained_networks.py vgg16,
# slices [0:4)[4:9)[9:16)[16:23)[23:30)); 2x2/2 pools open slices 2-5.
_VGG16_SLICES = (
    ((0, 64), (2, 64)),
    ((5, 128), (7, 128)),
    ((10, 256), (12, 256), (14, 256)),
    ((17, 512), (19, 512), (21, 512)),
    ((24, 512), (26, 512), (28, 512)),
)
VGG16_CHNS = (64, 128, 256, 512, 512)


class VGG16Features(nn.Module):
    """torchvision vgg16.features split into the 5 LPIPS slices. Conv
    params are named ``conv{torch features idx}`` so the converter maps
    the released state_dict keys one-to-one."""

    @nn.compact
    def __call__(self, x) -> list:
        feats = []
        for si, convs in enumerate(_VGG16_SLICES):
            if si > 0:
                x = max_pool(x, 2, 2)
            for ti, ch in convs:
                x = jax.nn.relu(Conv(ch, 3, 1, 1, name=f"conv{ti}")(x))
            feats.append(x)
        return feats


class Fire(nn.Module):
    """torchvision squeezenet Fire: 1x1 squeeze -> relu -> parallel
    1x1/3x3 expands -> relu -> channel concat."""

    squeeze_ch: int
    expand_ch: int

    @nn.compact
    def __call__(self, x):
        s = jax.nn.relu(Conv(self.squeeze_ch, 1, name="squeeze")(x))
        e1 = jax.nn.relu(Conv(self.expand_ch, 1, name="expand1x1")(s))
        e3 = jax.nn.relu(Conv(self.expand_ch, 3, 1, 1, name="expand3x3")(s))
        return jnp.concatenate([e1, e3], axis=-1)


# squeezenet1_1 features: (torch idx, squeeze_ch, expand_ch) per Fire;
# LPIPS squeeze slices (pretrained_networks.py squeezenet):
# [0:2)[2:5)[5:8)[8:10)[10:11)[11:12)[12:13) — 3x3/2 ceil-mode pools at
# torch idx 2/5/8 open slices 2-4.
_SQUEEZE_FIRES = ((3, 16, 64), (4, 16, 64), (6, 32, 128), (7, 32, 128),
                  (9, 48, 192), (10, 48, 192), (11, 64, 256),
                  (12, 64, 256))
_SQUEEZE_SLICE_ENDS = (4, 7, 9, 10, 11, 12)   # last fire idx per slice 2+
SQUEEZE_CHNS = (64, 128, 256, 384, 384, 512, 512)


class SqueezeFeatures(nn.Module):
    """torchvision squeezenet1_1.features split into the 7 LPIPS
    slices. The stem conv is ``conv0``; Fires are ``fire{torch idx}``."""

    @nn.compact
    def __call__(self, x) -> list:
        feats = []
        x = jax.nn.relu(Conv(64, 3, 2, 0, name="conv0")(x))
        feats.append(x)
        prev_end = 2   # torch idx of the first un-consumed feature
        for end in _SQUEEZE_SLICE_ENDS:
            for ti, sq, ex in _SQUEEZE_FIRES:
                if prev_end <= ti <= end:
                    if ti in (3, 6, 9):   # pool precedes fires 3/6/9
                        x = max_pool_ceil(x, 3, 2)
                    x = Fire(sq, ex, name=f"fire{ti}")(x)
            prev_end = end + 1
            feats.append(x)
        return feats


_LPIPS_NETS = {
    "alex": (AlexFeatures, LPIPS_CHNS),
    "vgg": (VGG16Features, VGG16_CHNS),
    "squeeze": (SqueezeFeatures, SQUEEZE_CHNS),
}


class LPIPS(nn.Module):
    """net-lin LPIPS distance (PNetLin.forward, v0.1 semantics): scale
    inputs, extract backbone features, unit-normalize over channels,
    squared diff, learned per-channel 1x1 lin head, spatial mean, sum
    over the slices. ``net`` picks the backbone — alex (the reference
    evaluator's choice, metrics.py:211), vgg (vgg16) or squeeze
    (squeezenet1_1); the released lin heads for all three ship in the
    reference tree (metrics/lpips/weights/v0.{0,1}/). Returns (B,)
    distances for (B,H,W,3) in [-1,1]."""

    net: str = "alex"

    @nn.compact
    def __call__(self, a, b) -> jax.Array:
        backbone_cls, chns = _LPIPS_NETS[self.net]
        shift = jnp.asarray(_LPIPS_SHIFT, a.dtype)
        scale = jnp.asarray(_LPIPS_SCALE, a.dtype)
        backbone = backbone_cls(name=self.net)
        fa = backbone((a - shift) / scale)
        fb = backbone((b - shift) / scale)
        total = 0.0
        for i, (x, y) in enumerate(zip(fa, fb)):
            # util.normalize_tensor: x / (||x||_C + 1e-10)
            xn = x / (jnp.sqrt(jnp.sum(x * x, -1, keepdims=True)) + 1e-10)
            yn = y / (jnp.sqrt(jnp.sum(y * y, -1, keepdims=True)) + 1e-10)
            d = (xn - yn) ** 2
            # NetLinLayer: dropout (inactive at eval) + 1x1 conv, no bias
            w = self.param(f"lin{i}", nn.initializers.constant(
                1.0 / chns[i]), (chns[i],))
            total = total + jnp.mean(jnp.einsum("bhwc,c->bhw", d, w),
                                     axis=(1, 2))
        return total


# --------------------------------------------------------------------------
# InceptionV3 (torchvision architecture, eval mode)
# --------------------------------------------------------------------------


class BasicConv2d(nn.Module):
    """conv(bias=False) + BN(eps=1e-3) + relu — torchvision BasicConv2d."""

    features: int
    kernel: tuple
    stride: int = 1
    padding: tuple = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel,
                    strides=(self.stride, self.stride),
                    padding=self.padding, use_bias=False, name="conv")(x)
        x = BatchNorm(eps=1e-3, name="bn")(x)
        return jax.nn.relu(x)


def _avg_pool3(x):
    """F.avg_pool2d(x, 3, stride=1, padding=1) with count_include_pad=True
    (torchvision InceptionA/C/E branch_pool)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    return s / 9.0


def _p(h, w):
    return ((h, h), (w, w))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=_p(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=_p(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=_p(1, 1), name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1),
                         name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=_p(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=_p(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_p(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=_p(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=_p(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=_p(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=_p(0, 3), name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=_p(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_p(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=_p(0, 1), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=_p(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=_p(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=_p(0, 1), name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=_p(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Eval-mode torchvision inception_v3 returning (pool3, logits):
    pool3 (B, 2048) drives FID, logits (B, 1000) drive IS. Input: (B,
    299, 299, 3) in [-1, 1] (the reference feeds exactly this —
    metrics.py:634-702 preprocess)."""

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=_p(1, 1), name="Conv2d_2b_3x3")(x)
        x = max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = max_pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        pool = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d((1,1))
        logits = nn.Dense(1000, name="fc")(pool)
        return pool, logits


# --------------------------------------------------------------------------
# InceptionResnetV1 (facenet-pytorch) — the reference's face-recognition
# embedder for face-CS / face-FD
# --------------------------------------------------------------------------
# Mirrors thirdparty/his_evaluators/.../facenet_pytorch/models/
# inception_resnet_v1.py:9-303 (vggface2 weights, classify=False). The
# evaluator embeds MTCNN-cropped 160² faces with normalize=False
# (metrics.py:990); here crops come from the SMPL-derived head bbox the
# pipeline already knows (models/losses.head_bbox_from_kps) — no face
# detector net is needed on TPU.


class _IRBranch(nn.Module):
    """Sequential BasicConv2d chain (kernel, stride, padding) specs."""

    specs: tuple

    @nn.compact
    def __call__(self, x):
        for i, (ch, k, s, p) in enumerate(self.specs):
            x = BasicConv2d(ch, k, s, p, name=str(i))(x)
        return x


class IRBlock35(nn.Module):
    """Block35 (inception_resnet_v1.py:33-64), residual scale 0.17."""

    scale: float = 0.17

    @nn.compact
    def __call__(self, x):
        b0 = BasicConv2d(32, (1, 1), name="branch0")(x)
        b1 = _IRBranch(((32, (1, 1), 1, _p(0, 0)),
                        (32, (3, 3), 1, _p(1, 1))), name="branch1")(x)
        b2 = _IRBranch(((32, (1, 1), 1, _p(0, 0)),
                        (32, (3, 3), 1, _p(1, 1)),
                        (32, (3, 3), 1, _p(1, 1))), name="branch2")(x)
        out = jnp.concatenate([b0, b1, b2], axis=-1)
        out = nn.Conv(256, (1, 1), name="conv2d")(out)
        return jax.nn.relu(out * self.scale + x)


class IRBlock17(nn.Module):
    scale: float = 0.10

    @nn.compact
    def __call__(self, x):
        b0 = BasicConv2d(128, (1, 1), name="branch0")(x)
        b1 = _IRBranch(((128, (1, 1), 1, _p(0, 0)),
                        (128, (1, 7), 1, _p(0, 3)),
                        (128, (7, 1), 1, _p(3, 0))), name="branch1")(x)
        out = jnp.concatenate([b0, b1], axis=-1)
        out = nn.Conv(896, (1, 1), name="conv2d")(out)
        return jax.nn.relu(out * self.scale + x)


class IRBlock8(nn.Module):
    scale: float = 0.20
    no_relu: bool = False

    @nn.compact
    def __call__(self, x):
        b0 = BasicConv2d(192, (1, 1), name="branch0")(x)
        b1 = _IRBranch(((192, (1, 1), 1, _p(0, 0)),
                        (192, (1, 3), 1, _p(0, 1)),
                        (192, (3, 1), 1, _p(1, 0))), name="branch1")(x)
        out = jnp.concatenate([b0, b1], axis=-1)
        out = nn.Conv(1792, (1, 1), name="conv2d")(out)
        out = out * self.scale + x
        return out if self.no_relu else jax.nn.relu(out)


class InceptionResnetV1(nn.Module):
    """Returns raw 512-d embeddings (last_bn output, normalize=False —
    the evaluator's call convention, metrics.py:990). Input: (B, 160,
    160, 3) standardized faces in [-1, 1]."""

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(32, (3, 3), 2, name="conv2d_1a")(x)
        x = BasicConv2d(32, (3, 3), name="conv2d_2a")(x)
        x = BasicConv2d(64, (3, 3), padding=_p(1, 1), name="conv2d_2b")(x)
        x = max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), name="conv2d_3b")(x)
        x = BasicConv2d(192, (3, 3), name="conv2d_4a")(x)
        x = BasicConv2d(256, (3, 3), 2, name="conv2d_4b")(x)
        for i in range(5):
            x = IRBlock35(name=f"repeat_1_{i}")(x)
        # Mixed_6a
        b0 = BasicConv2d(384, (3, 3), 2, name="mixed_6a_branch0")(x)
        b1 = _IRBranch(((192, (1, 1), 1, _p(0, 0)),
                        (192, (3, 3), 1, _p(1, 1)),
                        (256, (3, 3), 2, _p(0, 0))),
                       name="mixed_6a_branch1")(x)
        x = jnp.concatenate([b0, b1, max_pool(x, 3, 2)], axis=-1)
        for i in range(10):
            x = IRBlock17(name=f"repeat_2_{i}")(x)
        # Mixed_7a
        b0 = _IRBranch(((256, (1, 1), 1, _p(0, 0)),
                        (384, (3, 3), 2, _p(0, 0))),
                       name="mixed_7a_branch0")(x)
        b1 = _IRBranch(((256, (1, 1), 1, _p(0, 0)),
                        (256, (3, 3), 2, _p(0, 0))),
                       name="mixed_7a_branch1")(x)
        b2 = _IRBranch(((256, (1, 1), 1, _p(0, 0)),
                        (256, (3, 3), 1, _p(1, 1)),
                        (256, (3, 3), 2, _p(0, 0))),
                       name="mixed_7a_branch2")(x)
        x = jnp.concatenate([b0, b1, b2, max_pool(x, 3, 2)], axis=-1)
        for i in range(5):
            x = IRBlock8(name=f"repeat_3_{i}")(x)
        # final Block8: noReLU AND unit scale (torch default, :252)
        x = IRBlock8(scale=1.0, no_relu=True, name="block8")(x)
        v = jnp.mean(x, axis=(1, 2))
        v = nn.Dense(512, use_bias=False, name="last_linear")(v)
        # BatchNorm1d eps 1e-3 on (B, 512)
        from impersonator_tpu.models.layers import BatchNorm as _BN
        v = _BN(eps=1e-3, name="last_bn")(v[:, None, None, :])[:, 0, 0, :]
        return v
