"""Paper-ablation baseline trainers (concat / texture_warping /
feature_warping).

Re-design of the reference's three ablation drivers
(``models/baseline.py``: ConcatBaseline :13-443, TextureWarpingBaseline
:444-930, FeatureWarpingBaseline :931-1407 — stale/dead in the reference,
live here). All three share one loss recipe (``_optimize_G``
:221-243/:1155-1177: LSGAN adv + L1 rec + VGG + face + mask-MSE +
mask-TV) and one conditional PatchGAN D over
``[img, src_cond, tsf_cond]``; they differ only in how generator inputs
are built (``set_input_cond``):

* **concat** (:128-154) — no warping at all: one ResUnet over the
  early-concat ``[src_img, src_cond, tsf_cond]``.
* **texture_warping** (:560-585) — warp PIXELS only: extract the
  source's per-face texture, re-render it in the target pose
  (renderer.render_textured), decode ``[tex_render, tsf_cond]``.
* **feature_warping** (:1050-1086) — warp FEATURES once at the
  bottleneck (models/baseline.py FeatureWarpingBaseline; our
  FeatureWarpingGenerator) instead of the LWB's per-stage links.

TPU-native notes: input construction is pure/stop-gradded and lives
inside the same jitted train step (no host round-trip between "set
input" and "optimize"); the textured render is 4 gathers (bilinear
corners), fused by XLA.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from impersonator_tpu.assets import SMPLAssets
from impersonator_tpu.config import TrainConfig
from impersonator_tpu.models import PatchDiscriminator
from impersonator_tpu.models import losses as L
from impersonator_tpu.models.baseline import (
    ConcatGenerator,
    FeatureWarpingGenerator,
)
from impersonator_tpu.ops import morphology, smpl as smpl_ops
from impersonator_tpu.tasks.renderer import SMPLRenderer
from impersonator_tpu.tasks.trainer import TrainState, Trainer, build_trainer

BASELINE_MODES = ("concat", "texture_warping", "feature_warping")


def baseline_recovery_flow(renderer: SMPLRenderer,
                           smpl_params: smpl_ops.SMPLParams, parents,
                           src_img, ref_img, src_smpl, ref_smpl,
                           mode: str):
    """Frozen preprocessing for one ablation mode (set_input_cond of the
    matching reference baseline). Returns generator/discriminator inputs;
    everything stop-gradded."""
    src_info = smpl_ops.get_details(smpl_params, src_smpl, parents)
    ref_info = smpl_ops.get_details(smpl_params, ref_smpl, parents)

    src_f2verts, src_fim, _ = renderer.render_fim_wim(
        src_info["cam"], src_info["verts"])
    src_cond = renderer.encode_fim(src_fim)
    _, ref_fim, ref_wim = renderer.render_fim_wim(
        ref_info["cam"], ref_info["verts"])
    tsf_cond = renderer.encode_fim(ref_fim)

    src_bg_mask = morphology.morph(src_cond[..., -1:], ks=15, mode="erode")
    input_g_bg = jnp.concatenate([src_img * src_bg_mask, src_bg_mask], -1)
    tsf_crop_mask = morphology.morph(tsf_cond[..., -1:], ks=3, mode="erode")

    out = {
        "input_G_bg": input_g_bg,
        "src_cond": src_cond,
        "tsf_cond": tsf_cond,
        "tsf_crop_mask": tsf_crop_mask,
        "head_bbox": L.head_bbox_from_kps(ref_info["j2d"]),
    }
    if mode == "concat":
        # baseline.py:145: [src_img, src_cond, desired_cond] in one stream
        out["input_G"] = jnp.concatenate([src_img, src_cond, tsf_cond], -1)
    elif mode == "texture_warping":
        # baseline.py:560-580: re-render source texture in the tgt pose
        tex = renderer.extract_texture(src_img, src_info["cam"],
                                       src_info["verts"])
        tex_render = renderer.render_textured(ref_fim, ref_wim, tex)
        out["input_G"] = jnp.concatenate([tex_render, tsf_cond], -1)
    elif mode == "feature_warping":
        # baseline.py:1060-1086: masked src stream + cond-only tsf stream
        # + one bottleneck warp T
        src_crop_mask = morphology.morph(src_cond[..., -1:], ks=3,
                                         mode="erode")
        out["input_G_src"] = jnp.concatenate(
            [src_img * (1 - src_crop_mask), src_cond], -1)
        out["input_G_tsf"] = tsf_cond
        src_f2pts = renderer.f2pts_from_f2verts(src_f2verts)
        out["T"] = renderer.cal_bc_transform(src_f2pts, ref_fim, ref_wim)
    else:
        raise ValueError(f"unknown baseline mode {mode}")
    return jax.tree_util.tree_map(
        lambda x: jax.lax.stop_gradient(x) if x is not None else None, out)


@dataclasses.dataclass
class BaselineTrainer:
    """Shares Trainer's checkpoint/LR/state contract so cli/train.py
    drives it unchanged."""

    mode: str
    inner: Trainer          # carries cfg/renderer/hmr/vgg/face/optax
    generator: Any
    discriminator: PatchDiscriminator

    @property
    def cfg(self):
        return self.inner.cfg

    def epoch_lr(self, epoch, base=None):
        return self.inner.epoch_lr(epoch, base)

    def set_lr(self, state, lr_g, lr_d=None):
        return self.inner.set_lr(state, lr_g, lr_d)

    def init_state(self, rng=None) -> TrainState:
        cfg = self.cfg
        rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
        s = cfg.image_size
        k1, k2 = jax.random.split(rng)
        if self.mode == "feature_warping":
            g_params = jax.jit(self.generator.init)(
                k1, jnp.zeros((1, s, s, 4)), jnp.zeros((1, s, s, 6)),
                jnp.zeros((1, s, s, 3)), jnp.zeros((1, s, s, 2)))
        else:
            nc = 9 if self.mode == "concat" else 6
            g_params = jax.jit(self.generator.init)(
                k1, jnp.zeros((1, s, s, 4)), jnp.zeros((1, s, s, nc)))
        d_params = jax.jit(self.discriminator.init)(
            k2, jnp.zeros((1, s, s, 9)))
        return TrainState(
            g_params=g_params, d_params=d_params,
            g_opt=self.inner.g_tx.init(g_params),
            d_opt=self.inner.d_tx.init(d_params),
            step=jnp.zeros((), jnp.int32))


def build_baseline_trainer(cfg: TrainConfig, assets: SMPLAssets | None = None,
                           rng=None) -> BaselineTrainer:
    assert cfg.model in BASELINE_MODES, cfg.model
    inner = build_trainer(cfg, assets, rng)
    if cfg.model == "feature_warping":
        gen = FeatureWarpingGenerator(repeat_num=cfg.repeat_num)
    else:
        gen = ConcatGenerator(repeat_num=cfg.repeat_num)
    # conditional PatchGAN over [img(3), src_cond(3), tsf_cond(3)]
    # (baseline.py:60-62: input_nc = 3 + D_cond_nc)
    disc = PatchDiscriminator(n_layers=cfg.d_layers,
                              norm_type=cfg.norm_type)
    return BaselineTrainer(cfg.model, inner, gen, disc)


def make_train_step(trainer: BaselineTrainer, train_d: bool = True):
    """(state, batch) -> (state, metrics) for one ablation step.

    Same batch contract as the production trainer: {'images':
    (B,2,S,S,3), 'smpls': (B,2,85)}.
    """
    cfg = trainer.cfg
    mode = trainer.mode
    inner = trainer.inner
    gen, disc = trainer.generator, trainer.discriminator
    renderer, smpl_params = inner.renderer, inner.smpl_params
    parents = inner.assets.parents

    def g_forward(g_params, inputs):
        if mode == "feature_warping":
            fake_bg, _, _, tsf_color, tsf_mask = gen.apply(
                g_params, inputs["input_G_bg"], inputs["input_G_src"],
                inputs["input_G_tsf"], inputs["T"])
        else:
            fake_bg, tsf_color, tsf_mask = gen.apply(
                g_params, inputs["input_G_bg"], inputs["input_G"])
        # baseline forward: composite against the generated background
        # (baseline.py:185-198: fake = mask*bg + (1-mask)*color)
        fake_tsf = tsf_mask * fake_bg + (1 - tsf_mask) * tsf_color
        return fake_bg, fake_tsf, tsf_mask

    def d_input(img, inputs):
        return jnp.concatenate([img, inputs["src_cond"],
                                inputs["tsf_cond"]], -1)

    def g_loss_fn(g_params, d_params, inputs, real_tsf):
        fake_bg, fake_tsf, fake_mask = g_forward(g_params, inputs)
        d_fake = disc.apply(d_params, d_input(fake_tsf, inputs))
        loss_adv = L.lsgan_loss(d_fake, 0.0) * cfg.lambda_D_prob
        loss_rec = L.l1(fake_tsf, real_tsf) * cfg.lambda_rec
        loss_vgg = 0.0
        if cfg.use_vgg:
            fx = inner.vgg.apply(inner.vgg_params, fake_tsf)
            fy = inner.vgg.apply(inner.vgg_params, real_tsf)
            loss_vgg = L.vgg_loss(fx, fy) * cfg.lambda_tsf
        loss_face = 0.0
        if cfg.use_face:
            loss_face = L.face_loss(
                inner.face, inner.face_params, fake_tsf, real_tsf,
                bbox1=inputs["head_bbox"], bbox2=inputs["head_bbox"],
            ) * cfg.lambda_face
        loss_mask = L.mse(fake_mask,
                          inputs["tsf_crop_mask"]) * cfg.lambda_mask
        loss_mask_tv = L.tv_smooth(fake_mask) * cfg.lambda_mask_smooth
        total = (loss_adv + loss_rec + loss_vgg + loss_face + loss_mask
                 + loss_mask_tv)
        metrics = {"g_adv": loss_adv, "g_rec": loss_rec, "g_vgg": loss_vgg,
                   "g_face": loss_face, "g_mask": loss_mask,
                   "g_mask_tv": loss_mask_tv, "g_total": total}
        return total, (metrics, fake_tsf)

    def d_loss_fn(d_params, inputs, fake_tsf, real_tsf):
        d_real = disc.apply(d_params, d_input(real_tsf, inputs))
        d_fake = disc.apply(d_params,
                            d_input(jax.lax.stop_gradient(fake_tsf), inputs))
        loss_real = L.lsgan_loss(d_real, 1.0) * cfg.lambda_D_prob
        loss_fake = L.lsgan_loss(d_fake, -1.0) * cfg.lambda_D_prob
        return loss_real + loss_fake, {"d_real": loss_real,
                                       "d_fake": loss_fake}

    def train_step(state: TrainState, batch):
        images, smpls = batch["images"], batch["smpls"]
        src_img, tsf_img = images[:, 0], images[:, 1]
        inputs = baseline_recovery_flow(
            renderer, smpl_params, parents, src_img, tsf_img,
            smpls[:, 0], smpls[:, 1], mode)

        (g_total, (g_metrics, fake_tsf)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params, state.d_params,
                                     inputs, tsf_img)
        g_updates, g_opt = inner.g_tx.update(g_grads, state.g_opt,
                                             state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        metrics = dict(g_metrics)
        d_params, d_opt = state.d_params, state.d_opt
        if train_d:
            (d_total, d_metrics), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.d_params, inputs, fake_tsf,
                                         tsf_img)
            d_updates, d_opt = inner.d_tx.update(d_grads, state.d_opt,
                                                 state.d_params)
            d_params = optax.apply_updates(state.d_params, d_updates)
            metrics.update(d_metrics)
            metrics["d_total"] = d_total

        new_state = TrainState(g_params, d_params, g_opt, d_opt,
                               state.step + 1)
        return new_state, metrics

    return train_step
