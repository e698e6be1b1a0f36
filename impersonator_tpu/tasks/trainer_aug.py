"""Augmented adversarial trainer: iPER + Places2 backgrounds.

Re-design of ``models/impersonator_trainer_aug.py:12-589``: on top of the
base trainer, a random Places2 image is masked with the SOURCE body
silhouette and the BG stream is trained to restore it (so the inpainting
generalizes past iPER's studio backgrounds). The discriminator becomes
Global (restored background + mask) + Local (body-cropped tsf)
(GlobalLocalDiscriminator; _optimize_G/_optimize_D :375-422).

Batch contract adds 'bg' (B, S, S, 3) — ImPerPlaceDataset provides it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from impersonator_tpu.assets import SMPLAssets
from impersonator_tpu.config import TrainConfig
from impersonator_tpu.models import GlobalLocalDiscriminator
from impersonator_tpu.models import losses as L
from impersonator_tpu.ops import morphology
from impersonator_tpu.ops.sampler import resize_bilinear_align
from impersonator_tpu.tasks.trainer import (
    TrainState,
    Trainer,
    body_recovery_flow,
    build_trainer,
    make_policy,
)


def build_aug_trainer(cfg: TrainConfig, assets: SMPLAssets | None = None,
                      rng=None) -> Trainer:
    """Base trainer with the discriminator swapped for Global+Local
    (n_layers follows --d_layers like the base PatchGAN; the reference
    aug trainer also builds its D at n_layers=4,
    impersonator_trainer_aug.py:220-222)."""
    trainer = build_trainer(cfg, assets, rng)
    trainer.discriminator = GlobalLocalDiscriminator(
        ndf=64, n_layers=cfg.d_layers, norm_type=cfg.norm_type)
    return trainer


def init_aug_state(trainer: Trainer, rng=None) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(trainer.cfg.seed)
    s = trainer.cfg.image_size
    k1, k2 = jax.random.split(rng)
    g_params = jax.jit(trainer.generator.init)(
        k1, jnp.zeros((1, s, s, 4)), jnp.zeros((1, s, s, 6)),
        jnp.zeros((1, s, s, 6)), jnp.zeros((1, s, s, 2)))
    d_params = jax.jit(trainer.discriminator.init)(
        k2, jnp.zeros((1, s, s, 4)), jnp.zeros((1, s, s, 6)),
        jnp.zeros((1, 4), jnp.float32))
    return TrainState(g_params, d_params, trainer.g_tx.init(g_params),
                      trainer.d_tx.init(d_params), jnp.zeros((), jnp.int32))


def make_aug_train_step(trainer: Trainer, train_d: bool = True):
    """(state, batch{'images','smpls','bg'}) -> (state, metrics)."""
    cfg = trainer.cfg
    gen, disc = trainer.generator, trainer.discriminator
    renderer, smpl_params = trainer.renderer, trainer.smpl_params
    parents = trainer.assets.parents
    # same --train_dtype mixed-precision policy as the base trainer
    _pol = make_policy(cfg)

    def prepare(batch):
        images, smpls, aug_bg = batch["images"], batch["smpls"], batch["bg"]
        src_img, tsf_img = images[:, 0], images[:, 1]
        inputs = body_recovery_flow(
            renderer, smpl_params, parents, src_img, tsf_img,
            smpls[:, 0], smpls[:, 1], bg_both=cfg.bg_both)
        # extra stream: the Places2 image masked by the SOURCE silhouette
        # (BodyRecoveryFlow.forward aug path, trainer_aug.py:67-69)
        src_bg_mask = inputs["input_G_bg"][..., -1:]
        input_g_aug_bg = jnp.concatenate([aug_bg * src_bg_mask, src_bg_mask],
                                         axis=-1)
        inputs["input_G_aug_bg"] = jax.lax.stop_gradient(input_g_aug_bg)
        return inputs, src_img, tsf_img, aug_bg

    def _g_forward(g_params, inputs):
        streams = [inputs["input_G_bg"], inputs["input_G_aug_bg"]]
        if cfg.bg_both:
            streams.append(inputs["input_G_tsf_bg"])
        bg_in = jnp.concatenate(streams, axis=0)
        fake_bg, src_color, src_mask, tsf_color, tsf_mask = _pol(
            gen.apply, g_params, bg_in, inputs["input_G_src"],
            inputs["input_G_tsf"], inputs["T"])
        bs = src_color.shape[0]
        src_bg = fake_bg[:bs]
        aug_bg = fake_bg[bs:2 * bs]
        tsf_bg = fake_bg[2 * bs:3 * bs] if cfg.bg_both else src_bg
        fake_src = src_mask * src_bg + (1 - src_mask) * src_color
        fake_tsf = tsf_mask * tsf_bg + (1 - tsf_mask) * tsf_color
        fake_masks = jnp.concatenate([src_mask, tsf_mask], axis=0)
        return aug_bg, fake_src, fake_tsf, fake_masks

    # --remat like the base trainer: recompute G activations in the
    # backward pass instead of holding them in HBM
    g_forward = jax.checkpoint(_g_forward) if cfg.remat else _g_forward

    def d_apply(d_params, fake_aug_bg, tsf_imgs, inputs):
        global_x = jnp.concatenate(
            [fake_aug_bg, inputs["input_G_aug_bg"][..., -1:]], axis=-1)
        local_x = jnp.concatenate(
            [tsf_imgs, inputs["input_G_tsf"][..., 3:]], axis=-1)
        s = float(trainer.cfg.image_size)
        rects = inputs["body_bbox"] * s  # fractional -> pixel units
        return _pol(disc.apply, d_params, global_x, local_x, rects)

    def g_loss_fn(g_params, d_params, inputs, real_src, real_tsf, real_bg):
        fake_aug_bg, fake_src, fake_tsf, fake_masks = g_forward(
            g_params, inputs)

        d_fake = d_apply(d_params, fake_aug_bg, fake_tsf, inputs)
        loss_adv = L.lsgan_loss(d_fake, 0.0) * cfg.lambda_D_prob
        loss_rec = L.l1(fake_src, real_src) * cfg.lambda_rec

        loss_tsf = 0.0
        if cfg.use_vgg:
            vgg = lambda x: _pol(trainer.vgg.apply,  # noqa: E731
                                 trainer.vgg_params, x)
            loss_tsf = (L.vgg_loss(vgg(fake_tsf), vgg(real_tsf))
                        + L.vgg_loss(vgg(fake_aug_bg), vgg(real_bg))
                        ) * cfg.lambda_tsf
        loss_style = 0.0
        if cfg.use_style and cfg.lambda_style > 0:
            vgg224 = lambda x: _pol(  # noqa: E731
                trainer.vgg.apply, trainer.vgg_params,
                resize_bilinear_align(x, 224, 224))
            loss_style = (L.style_loss(vgg224(fake_tsf), vgg224(real_tsf))
                          + L.style_loss(vgg224(fake_aug_bg), vgg224(real_bg))
                          ) * cfg.lambda_style
        loss_face = 0.0
        if cfg.use_face:
            loss_face = L.face_loss(
                trainer.face, trainer.face_params, fake_tsf, real_tsf,
                bbox1=inputs["head_bbox"], bbox2=inputs["head_bbox"],
            ) * cfg.lambda_face

        bg_mask = jnp.concatenate(
            [inputs["src_crop_mask"], inputs["tsf_crop_mask"]], axis=0)
        mask_fn = L.bce if cfg.mask_bce else L.mse
        loss_mask = mask_fn(fake_masks, bg_mask) * cfg.lambda_mask
        loss_smooth = (L.tv_smooth(fake_masks) * cfg.lambda_mask_smooth
                       if cfg.lambda_mask_smooth else 0.0)

        total = (loss_adv + loss_rec + loss_tsf + loss_style + loss_face
                 + loss_mask + loss_smooth)
        metrics = {"g_adv": loss_adv, "g_rec": loss_rec, "g_tsf": loss_tsf,
                   "g_style": loss_style, "g_face": loss_face,
                   "g_mask": loss_mask, "g_mask_smooth": loss_smooth,
                   "g_total": total}
        return total, (metrics, fake_aug_bg, fake_tsf)

    def d_loss_fn(d_params, fake_aug_bg, fake_tsf, real_bg, real_tsf, inputs):
        d_fake = d_apply(d_params, jax.lax.stop_gradient(fake_aug_bg),
                         jax.lax.stop_gradient(fake_tsf), inputs)
        d_real = d_apply(d_params, real_bg, real_tsf, inputs)
        loss = (L.lsgan_loss(d_real, 1.0) + L.lsgan_loss(d_fake, -1.0)) \
            * cfg.lambda_D_prob
        return loss, {"d_real": jnp.mean(d_real), "d_fake": jnp.mean(d_fake),
                      "d_loss": loss}

    def train_step(state: TrainState, batch):
        inputs, src_img, tsf_img, real_bg = prepare(batch)

        (_, (metrics, fake_aug_bg, fake_tsf)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(
                state.g_params, state.d_params, inputs, src_img, tsf_img,
                real_bg)
        g_updates, g_opt = trainer.g_tx.update(g_grads, state.g_opt,
                                               state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        if train_d:
            (_, d_metrics), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(
                    state.d_params, fake_aug_bg, fake_tsf, real_bg, tsf_img,
                    inputs)
            d_updates, d_opt = trainer.d_tx.update(d_grads, state.d_opt,
                                                   state.d_params)
            d_params = optax.apply_updates(state.d_params, d_updates)
            metrics.update(d_metrics)
        else:
            d_params, d_opt = state.d_params, state.d_opt
        return TrainState(g_params, d_params, g_opt, d_opt, state.step + 1), \
            metrics

    return train_step
