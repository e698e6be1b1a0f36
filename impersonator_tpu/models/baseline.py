"""Paper-ablation baseline generators.

The reference ships three ablations of the Liquid Warping Block
(``networks/baseline.py``, driven by ``models/baseline.py`` — note the
reference drivers are stale/dead code, SURVEY §7.4; here the generators
are live and share the production trainer):

* :class:`ConcatGenerator` — W/O any warping: source image+cond and
  synthesized tsf image+cond are early-concatenated into ONE ResUnet
  (networks/baseline.py:186-213).
* texture warping — warp only the IMAGE by T and feed a plain ResUnet
  (no feature warping): expressed here as :func:`texture_warp_inputs` +
  ConcatGenerator-style single stream.
* feature warping — warp features only at the bottleneck entry, one LWB
  connection instead of one per stage: :class:`FeatureWarpingGenerator`.

All reuse the production ResNet/ResUnet stacks (models/generator.py).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from impersonator_tpu.models.generator import (
    ResNetGenerator,
    ResUnetGenerator,
    warp,
)
from impersonator_tpu.ops.sampler import grid_sample, resize_flow


class ConcatGenerator(nn.Module):
    """Early-concat ablation (networks/baseline.py:186-213)."""

    bg_dim: int = 4
    src_dim: int = 6
    tsf_dim: int = 6
    conv_dim: int = 64
    repeat_num: int = 6
    n_down: int = 3

    def setup(self):
        self.bg_model = ResNetGenerator(self.conv_dim, self.repeat_num,
                                        k_size=3, n_down=self.n_down,
                                        name="bg_model")
        # 3 (src img) + src cond + tsf stream channels in one encoder
        self.tsf_model = ResUnetGenerator(self.conv_dim, self.repeat_num,
                                          k_size=3, n_down=self.n_down,
                                          name="tsf_model")

    def __call__(self, bg_inputs, inputs):
        img_bg = self.bg_model(bg_inputs)
        tsf_img, tsf_mask = self.tsf_model(inputs)
        return img_bg, tsf_img, tsf_mask

    def inference(self, inputs):
        return self.tsf_model(inputs)


def texture_warp_inputs(src_img, t, tsf_cond):
    """Texture-warping ablation input: warp PIXELS by T, no feature
    warping (models/baseline.py TextureWarpingBaseline contract)."""
    warped = grid_sample(src_img, t)
    return jnp.concatenate([warped, tsf_cond], axis=-1)


class FeatureWarpingGenerator(nn.Module):
    """Feature-warping ablation: a single warp of the source bottleneck
    features added once at the tsf bottleneck entry (instead of the LWB's
    per-stage connections) — models/baseline.py FeatureWarpingBaseline."""

    bg_dim: int = 4
    src_dim: int = 6
    tsf_dim: int = 6
    conv_dim: int = 64
    repeat_num: int = 6
    n_down: int = 3

    def setup(self):
        self.bg_model = ResNetGenerator(self.conv_dim, self.repeat_num,
                                        k_size=3, n_down=self.n_down,
                                        name="bg_model")
        self.src_model = ResUnetGenerator(self.conv_dim, self.repeat_num,
                                          k_size=3, n_down=self.n_down,
                                          name="src_model")
        self.tsf_model = ResUnetGenerator(self.conv_dim, self.repeat_num,
                                          k_size=3, n_down=self.n_down,
                                          name="tsf_model")

    def __call__(self, bg_inputs, src_inputs, tsf_inputs, t):
        img_bg = self.bg_model(bg_inputs)

        src_enc = self.src_model.encode(src_inputs)
        src_x = src_enc[-1]
        for block in self.src_model.resnets:
            src_x = block(src_x)
        src_img, src_mask = self.src_model.regress(
            self.src_model.decode(src_x, src_enc))

        tsf_enc = self.tsf_model.encode(tsf_inputs)
        # single feature-warp connection at the bottleneck entry
        tsf_x = tsf_enc[-1] + warp(src_enc[-1], t)
        for block in self.tsf_model.resnets:
            tsf_x = block(tsf_x)
        tsf_img, tsf_mask = self.tsf_model.regress(
            self.tsf_model.decode(tsf_x, tsf_enc))
        return img_bg, src_img, src_mask, tsf_img, tsf_mask
