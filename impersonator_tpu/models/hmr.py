"""HMR 3D pose/shape regressor (flax.linen, NHWC).

Re-implements the reference's TF-ported PreAct-ResNet50 encoder + IEF
theta regressor (``networks/hmr.py:38-330``), preserving its quirks so the
released ``hmr_tf2pt.pth`` weights convert exactly:

* stem conv 7×7/2 WITH bias, maxpool 3×3/2 ceil_mode (hmr.py:124,153,281);
* bottleneck: preact BN, conv3 has bias, shortcut conv1x1(+bias) only when
  channels change, otherwise stride-subsample via 1×1 maxpool
  (hmr.py:65-116, subsample :21-35);
* stride sits on the LAST block of each layer; layer4 has stride 1
  (_make_layer, hmr.py:131-147);
* trailing BN + relu + 7×7 global avgpool (hmr.py:128-129,159-164);
* IEF: theta ← theta + MLP([feat, theta]) × 3 iterations starting from
  mean_theta (ThetaRegressor, hmr.py:213-252).

The network always runs in eval mode inside this framework (it is a
frozen preprocessor everywhere in the reference), so BatchNorm uses the
converted running stats.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from impersonator_tpu.models.layers import BatchNorm, avg_pool, max_pool, max_pool_ceil

_torch_conv_init = nn.initializers.he_normal()


class _Conv(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            use_bias=self.use_bias, kernel_init=_torch_conv_init,
            name="conv")(x)


class PreActBottleneck(nn.Module):
    """hmr.py:65-116. expansion = 4."""

    planes: int
    stride: int = 1
    has_shortcut: bool = False

    @nn.compact
    def __call__(self, x):
        preact = jax.nn.relu(BatchNorm(name="bn1")(x))
        if self.has_shortcut:
            shortcut = _Conv(self.planes * 4, 1, self.stride, 0,
                             use_bias=True, name="shortcut")(preact)
        else:
            # subsample(x, stride): identity or 1x1 maxpool stride s
            shortcut = x if self.stride == 1 else max_pool(x, 1, self.stride)
        h = _Conv(self.planes, 1, 1, 0, name="conv1")(preact)
        h = jax.nn.relu(BatchNorm(name="bn2")(h))
        h = _Conv(self.planes, 3, self.stride, 1, name="conv2")(h)
        h = jax.nn.relu(BatchNorm(name="bn3")(h))
        h = _Conv(self.planes * 4, 1, 1, 0, use_bias=True, name="conv3")(h)
        return h + shortcut


class PreActResNet50(nn.Module):
    """hmr.py:119-165 with num_blocks [3,4,6,3]."""

    num_blocks: tuple = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x):
        x = _Conv(64, 7, 2, 3, use_bias=True, name="conv1")(x)
        x = max_pool_ceil(x, 3, 2)
        in_planes = 64
        strides = (2, 2, 2, 1)
        planes_seq = (64, 128, 256, 512)
        for li, (planes, nb, stride) in enumerate(
                zip(planes_seq, self.num_blocks, strides), start=1):
            for bi in range(nb):
                # stride on the LAST block (hmr.py:140-147)
                s = stride if (bi == nb - 1 and bi > 0) else 1
                has_short = in_planes != planes * 4
                x = PreActBottleneck(planes, s, has_short,
                                     name=f"layer{li}_{bi}")(x)
                in_planes = planes * 4
        x = jax.nn.relu(BatchNorm(name="post_bn")(x))
        x = avg_pool(x, 7)
        return x.reshape(x.shape[0], -1)


class ThetaRegressor(nn.Module):
    """IEF loop (hmr.py:213-252). Dropout is inert: the net is frozen."""

    out_dim: int = 85
    iterations: int = 3

    @nn.compact
    def __call__(self, feat):
        b = feat.shape[0]
        mean_theta = self.param(
            "mean_theta", nn.initializers.zeros, (self.out_dim,))
        theta = jnp.broadcast_to(mean_theta, (b, self.out_dim))
        fc1 = nn.Dense(1024, name="fc1")
        fc2 = nn.Dense(1024, name="fc2")
        fc3 = nn.Dense(self.out_dim, name="fc3",
                       kernel_init=nn.initializers.xavier_normal())
        for _ in range(self.iterations):
            h = jnp.concatenate([feat, theta], axis=1)
            h = jax.nn.relu(fc1(h))
            h = jax.nn.relu(fc2(h))
            theta = theta + fc3(h)
        return theta


class HumanModelRecovery(nn.Module):
    """Encoder + IEF (hmr.py:255-300). Input: (B, 224, 224, 3) in [-1,1].
    Returns theta (B, 85). SMPL decode lives in ops.smpl.get_details —
    the body model is framework state, not network state."""

    theta_dim: int = 85
    iterations: int = 3

    @nn.compact
    def __call__(self, x):
        feat = PreActResNet50(name="resnet")(x)
        return ThetaRegressor(self.theta_dim, self.iterations,
                              name="regressor")(feat)
