"""PatchGAN discriminators (flax.linen, NHWC).

Mirrors reference ``networks/discriminator.py``: 70×70-style PatchGAN
(:8-57), global+local pair (:60-96), multi-scale stack (:99-127).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from impersonator_tpu.models.layers import (
    BatchNorm,
    Conv,
    InstanceNorm,
    leaky_relu,
)
from impersonator_tpu.ops.sampler import resize_bilinear_align


class _Norm(nn.Module):
    norm_type: str = "instance"
    train: bool = False

    @nn.compact
    def __call__(self, x):
        if self.norm_type == "batch":
            return BatchNorm(name="bn")(x, use_running_average=not self.train)
        if self.norm_type == "instance":
            return InstanceNorm(name="in")(x)
        raise ValueError(self.norm_type)


class PatchDiscriminator(nn.Module):
    """n_layers PatchGAN, LSGAN head (discriminator.py:8-57)."""

    ndf: int = 64
    n_layers: int = 4
    norm_type: str = "instance"
    use_sigmoid: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_bias = self.norm_type != "batch"
        x = Conv(self.ndf, 4, 2, 1, use_bias=True, name="conv_0")(x)
        x = leaky_relu(x)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            x = Conv(self.ndf * nf_mult, 4, 2, 1, use_bias=use_bias,
                     name=f"conv_{n}")(x)
            x = _Norm(self.norm_type, train, name=f"norm_{n}")(x)
            x = leaky_relu(x)
        nf_mult = min(2 ** self.n_layers, 8)
        x = Conv(self.ndf * nf_mult, 4, 1, 1, use_bias=use_bias,
                 name=f"conv_{self.n_layers}")(x)
        x = _Norm(self.norm_type, train, name=f"norm_{self.n_layers}")(x)
        x = leaky_relu(x)
        x = Conv(1, 4, 1, 1, use_bias=True, name="head")(x)
        if self.use_sigmoid:
            x = jax.nn.sigmoid(x)
        return x


def crop_resize_bbox(imgs: jax.Array, bboxes: jax.Array, out_h: int, out_w: int):
    """Crop per-sample bboxes and resize, without dynamic shapes.

    imgs: (B, H, W, C); bboxes: (B, 4) = [min_x, max_x, min_y, max_y] in
    pixel units. The reference loops with python slicing + interpolate
    (discriminator.py:82-96); here the crop-resize is a single bilinear
    gather on an affine grid (align_corners semantics preserved: the
    output grid spans [min, max-1] inclusive like x[min:max] resized).
    """
    b, h, w, _ = imgs.shape
    min_x, max_x, min_y, max_y = (bboxes[:, i].astype(jnp.float32) for i in range(4))

    def axis_grid(mn, mx, n_out, size):
        # torch crop x[mn:mx] has endpoints [mn, mx-1]; align_corners=True
        # resize spans them inclusively.
        span = jnp.maximum(mx - mn - 1.0, 0.0)
        t = jnp.arange(n_out, dtype=jnp.float32) / max(n_out - 1, 1)
        coords = mn[:, None] + t[None, :] * span[:, None]
        return coords / (size - 1) * 2.0 - 1.0  # normalized for grid_sample

    gx = axis_grid(min_x, max_x, out_w, w)  # (B, out_w)
    gy = axis_grid(min_y, max_y, out_h, h)  # (B, out_h)
    grid = jnp.stack(
        [jnp.broadcast_to(gx[:, None, :], (b, out_h, out_w)),
         jnp.broadcast_to(gy[:, :, None], (b, out_h, out_w))],
        axis=-1,
    )
    from impersonator_tpu.ops.sampler import grid_sample
    return grid_sample(imgs, grid)


class GlobalLocalDiscriminator(nn.Module):
    """Global (4ch bg) + body-crop local discriminator pair
    (discriminator.py:60-96)."""

    ndf: int = 64
    n_layers: int = 3
    norm_type: str = "instance"
    use_sigmoid: bool = False

    def setup(self):
        self.global_model = PatchDiscriminator(
            self.ndf, self.n_layers, self.norm_type, self.use_sigmoid,
            name="global_model")
        self.local_model = PatchDiscriminator(
            self.ndf, self.n_layers, self.norm_type, self.use_sigmoid,
            name="local_model")

    def __call__(self, global_x, local_x, local_rects, train: bool = False):
        g = self.global_model(global_x, train=train)
        crops = crop_resize_bbox(local_x, local_rects,
                                 local_x.shape[1], local_x.shape[2])
        l = self.local_model(crops, train=train)
        return jnp.concatenate([g, l], axis=0)


class MultiScaleDiscriminator(nn.Module):
    """Per-scale PatchGANs (discriminator.py:99-127)."""

    n_scales: int = 5
    ndf: int = 64
    n_layers: int = 3
    use_sigmoid: bool = False

    def setup(self):
        self.scale_models = [
            PatchDiscriminator(self.ndf, self.n_layers,
                               use_sigmoid=self.use_sigmoid, name=f"scale_{i}")
            for i in range(self.n_scales)
        ]

    def __call__(self, xs, train: bool = False):
        return [m(x, train=train) for m, x in zip(self.scale_models, xs)]
