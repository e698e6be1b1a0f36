"""Liquid Warping GAN generator (flax.linen, NHWC).

Re-design of the reference's three-stream generator
(``networks/generator.py:8-320``):

* ``bg_model``  — ResNet encoder/decoder that inpaints the background;
* ``src_model`` — ResUnet encoding the source identity;
* ``tsf_model`` — ResUnet synthesizing the transferred frame, where at
  every encoder stage and every bottleneck res-block the source features
  are warped by the (resized) correspondence flow T and ADDED into the
  tsf stream — the Liquid Warping Block (generator.py:216-243).

Flows are (B, H, W, 2) in [-1, 1] with -2 marking background (samples 0).
All warps use the torch-parity ``ops.sampler`` primitives.

The class exposes the same entry points as the reference:
``__call__`` (training fwd), ``encode_src`` (cache source features),
``inference`` (cached-feature per-frame decode), ``infer_front``
(both streams live), ``swap`` (dual-source appearance transfer).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from impersonator_tpu.models.layers import (
    Conv,
    ConvINReLU,
    DeconvINReLU,
    InstanceNorm,
    ResidualBlock,
    narrow_head_conv,
)
from impersonator_tpu.ops.sampler import grid_sample, resize_flow


def warp(x, t_full):
    """LWB warp: resize T to x's resolution, bilinear sample
    (generator.py:312-320)."""
    return grid_sample(x, resize_flow(t_full, x.shape[1], x.shape[2]))


class ResNetGenerator(nn.Module):
    """Plain encoder/bottleneck/decoder (the BG stream;
    generator.py:23-65)."""

    conv_dim: int = 64
    repeat_num: int = 6
    k_size: int = 3
    n_down: int = 3

    @nn.compact
    def __call__(self, x):
        d = self.conv_dim
        x = ConvINReLU(d, 7, 1, 3, name="stem")(x)
        for i in range(self.n_down):
            d *= 2
            x = ConvINReLU(d, self.k_size, 2, 1, name=f"down_{i}")(x)
        for i in range(self.repeat_num):
            x = ResidualBlock(d, name=f"res_{i}")(x)
        for i in range(self.n_down):
            d //= 2
            x = DeconvINReLU(d, self.k_size, name=f"up_{i}")(x)
        rgb = Conv(3, 7, 1, 3, use_bias=False, name="rgb")
        if self.is_initializing():
            return jnp.tanh(rgb(x))
        k = rgb.variables["params"]["conv"]["kernel"]
        dt = jnp.promote_types(x.dtype, k.dtype)
        return jnp.tanh(narrow_head_conv(x.astype(dt), k.astype(dt)))


class ResUnetGenerator(nn.Module):
    """U-net with residual bottleneck; regress heads: tanh RGB +
    sigmoid attention mask (generator.py:68-184)."""

    conv_dim: int = 64
    repeat_num: int = 6
    k_size: int = 3
    n_down: int = 3

    def setup(self):
        d = self.conv_dim
        encoders = [ConvINReLU(d, 7, 1, 3, name="enc_0")]
        for i in range(self.n_down):
            d *= 2
            encoders.append(ConvINReLU(d, self.k_size, 2, 1, name=f"enc_{i + 1}"))
        self.encoders = encoders
        self.resnets = [ResidualBlock(d, name=f"res_{i}")
                        for i in range(self.repeat_num)]
        decoders, skippers = [], []
        for i in range(self.n_down):
            decoders.append(DeconvINReLU(d // 2, self.k_size, name=f"dec_{i}"))
            # skip merge: conv(k, s=1, p=1) over [skip, up] (generator.py:115-119)
            skippers.append(ConvINReLU(d // 2, self.k_size, 1, 1, name=f"skip_{i}"))
            d //= 2
        self.decoders = decoders
        self.skippers = skippers
        self.img_reg = Conv(3, 7, 1, 3, use_bias=False, name="img_reg")
        self.att_reg = Conv(1, 7, 1, 3, use_bias=False, name="att_reg")

    def encode(self, x) -> list:
        outs = [self.encoders[0](x)]
        for enc in self.encoders[1:]:
            outs.append(enc(outs[-1]))
        return outs

    def run_resnets(self, x) -> list:
        outs = []
        for block in self.resnets:
            x = block(x)
            outs.append(x)
        return outs

    def decode(self, x, encoder_outs):
        for i, (dec, skip_conv) in enumerate(zip(self.decoders, self.skippers)):
            x = dec(x)
            skip = encoder_outs[self.n_down - 1 - i]
            x = skip_conv(jnp.concatenate([skip, x], axis=-1))
        return x

    def regress(self, x):
        """Fused RGB+attention head: one 7x7 conv with the img/att kernels
        concatenated along output channels. Param tree is unchanged (the
        two Conv submodules still own their kernels) so checkpoints and
        converters are untouched; the fusion halves the full-res HBM
        reads of the decoder feature map (two 64->3/64->1 convs each
        re-stream the 256^2 x 64 tensor; measured ~40% faster on v5e)."""
        if self.is_initializing():
            return jnp.tanh(self.img_reg(x)), jax.nn.sigmoid(self.att_reg(x))
        ki = self.img_reg.variables["params"]["conv"]["kernel"]
        ka = self.att_reg.variables["params"]["conv"]["kernel"]
        k = jnp.concatenate([ki, ka], axis=-1)
        dt = jnp.promote_types(x.dtype, k.dtype)
        # narrow_head_conv: the 64->4 head only fills 4 of the MXU's 128
        # output lanes; the space-to-depth phase form runs ~2.4x faster
        # at 256^2 on v5e and is bit-exact (see layers.narrow_head_conv).
        out = narrow_head_conv(x.astype(dt), k.astype(dt))
        return jnp.tanh(out[..., :3]), jax.nn.sigmoid(out[..., 3:])

    def __call__(self, x):
        enc = self.encode(x)
        h = enc[-1]
        for block in self.resnets:
            h = block(h)
        return self.regress(self.decode(h, enc))

    def inference(self, x):
        """Source-feature cache: encoder stages + every res-block output
        (generator.py:136-147)."""
        enc = self.encode(x)
        return enc, self.run_resnets(enc[-1])


class ImpersonatorGenerator(nn.Module):
    """Three-stream LWB generator (generator.py:187-320)."""

    bg_dim: int = 4
    src_dim: int = 6
    tsf_dim: int = 6
    conv_dim: int = 64
    repeat_num: int = 6
    n_down: int = 3

    def setup(self):
        # the concat-gather LWB paths below index src_res[0]/[-1] and
        # slice uniform d-wide channel blocks; >=1 res block (reference
        # default 6) and the shared-width invariant are required
        assert self.repeat_num >= 1, \
            "ImpersonatorGenerator needs repeat_num >= 1"
        self.bg_model = ResNetGenerator(self.conv_dim, self.repeat_num,
                                        k_size=3, n_down=self.n_down, name="bg_model")
        self.src_model = ResUnetGenerator(self.conv_dim, self.repeat_num,
                                          k_size=3, n_down=self.n_down, name="src_model")
        self.tsf_model = ResUnetGenerator(self.conv_dim, self.repeat_num,
                                          k_size=3, n_down=self.n_down, name="tsf_model")

    def __call__(self, bg_inputs, src_inputs, tsf_inputs, t):
        """Training forward (generator.py:204-211). All inputs NHWC;
        t: (B, H, W, 2)."""
        img_bg = self.bg_model(bg_inputs)
        src_img, src_mask, tsf_img, tsf_mask = self.infer_front(
            src_inputs, tsf_inputs, t)
        return img_bg, src_img, src_mask, tsf_img, tsf_mask

    def run_bg(self, bg_inputs):
        return self.bg_model(bg_inputs)

    def encode_src(self, src_inputs):
        return self.src_model.inference(src_inputs)

    def infer_front(self, src_inputs, tsf_inputs, t):
        """Both streams live, LWB at every stage (generator.py:216-243).

        The src stream never reads from tsf, so its full encoder + res
        chain runs FIRST and all six bottleneck warps collapse into one
        channel-concatenated gather (see :meth:`inference` — same
        values, 6x fewer gather index sets)."""
        src_enc = self.src_model.encode(src_inputs)
        src_res = self.src_model.run_resnets(src_enc[-1])

        tsf_x = self.tsf_model.encoders[0](tsf_inputs)
        tsf_enc = [tsf_x]
        for i in range(1, self.n_down + 1):
            tsf_x = self.tsf_model.encoders[i](tsf_x) + warp(src_enc[i], t)
            tsf_enc.append(tsf_x)

        if src_res:  # repeat_num=0 degrades to a plain encoder-decoder
            t_scale = resize_flow(t, src_res[-1].shape[1],
                                  src_res[-1].shape[2])
            d = src_res[0].shape[-1]
            assert all(r.shape[-1] == d for r in src_res)
            warped = grid_sample(jnp.concatenate(src_res, axis=-1), t_scale)
            for i in range(self.repeat_num):
                tsf_x = (self.tsf_model.resnets[i](tsf_x)
                         + warped[..., i * d:(i + 1) * d])

        src_img, src_mask = self.src_model.regress(
            self.src_model.decode(src_res[-1] if src_res else src_enc[-1],
                                  src_enc))
        tsf_img, tsf_mask = self.tsf_model.regress(
            self.tsf_model.decode(tsf_x, tsf_enc))
        return src_img, src_mask, tsf_img, tsf_mask

    def inference(self, src_encoder_outs, src_resnet_outs, tsf_inputs, t):
        """Per-frame decode against cached source features
        (generator.py:277-301) — the hot path of motion imitation."""
        tsf_x = self.tsf_model.encoders[0](tsf_inputs)
        tsf_enc = [tsf_x]
        for i in range(1, self.n_down + 1):
            src_x = src_encoder_outs[i]
            tsf_x = self.tsf_model.encoders[i](tsf_x) + warp(src_x, t)
            tsf_enc.append(tsf_x)

        # all six res-block warps share t_scale AND their sources are
        # cached constants — ONE gather over the channel-concatenated
        # stack replaces 6 (x4-corner) gathers: same rows, same lerp,
        # bit-identical, but a single index-staging pass (TPU gathers
        # pay per row fetch, not per byte)
        if src_resnet_outs:  # empty iff repeat_num=0
            t_scale = resize_flow(t, src_x.shape[1], src_x.shape[2])
            d = src_resnet_outs[0].shape[-1]
            assert all(r.shape[-1] == d for r in src_resnet_outs)
            warped = grid_sample(jnp.concatenate(src_resnet_outs, axis=-1),
                                 t_scale)
            for i in range(self.repeat_num):
                tsf_x = (self.tsf_model.resnets[i](tsf_x)
                         + warped[..., i * d:(i + 1) * d])

        return self.tsf_model.regress(self.tsf_model.decode(tsf_x, tsf_enc))

    def swap(self, tsf_inputs, src_encoder_outs12, src_encoder_outs21,
             src_resnet_outs12, src_resnet_outs21, t12, t21):
        """Dual-source LWB for appearance transfer (generator.py:245-275):
        both warped feature sets are summed into the tsf stream."""
        tsf_x = self.tsf_model.encoders[0](tsf_inputs)
        tsf_enc = [tsf_x]
        for i in range(1, self.n_down + 1):
            w12 = warp(src_encoder_outs12[i], t12)
            w21 = warp(src_encoder_outs21[i], t21)
            tsf_x = self.tsf_model.encoders[i](tsf_x) + w12 + w21
            tsf_enc.append(tsf_x)

        if src_resnet_outs12:  # empty iff repeat_num=0
            h, w_ = tsf_x.shape[1], tsf_x.shape[2]
            t12s = resize_flow(t12, h, w_)
            t21s = resize_flow(t21, h, w_)
            d = src_resnet_outs12[0].shape[-1]
            assert all(r.shape[-1] == d
                       for r in (*src_resnet_outs12, *src_resnet_outs21))
            w12s = grid_sample(jnp.concatenate(src_resnet_outs12, axis=-1),
                               t12s)
            w21s = grid_sample(jnp.concatenate(src_resnet_outs21, axis=-1),
                               t21s)
            for i in range(self.repeat_num):
                sl = slice(i * d, (i + 1) * d)
                tsf_x = (self.tsf_model.resnets[i](tsf_x)
                         + w12s[..., sl] + w21s[..., sl])

        return self.tsf_model.regress(self.tsf_model.decode(tsf_x, tsf_enc))
