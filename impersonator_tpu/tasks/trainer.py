"""Adversarial LWB trainer (iPER recipe).

Re-design of ``models/impersonator_trainer.py:12-508``:

* :func:`body_recovery_flow` — the frozen HMR+renderer preprocessing that
  turns (src_img, ref_img, src_smpl, ref_smpl) into generator inputs,
  the flow T, crop masks and head/body bboxes (BodyRecoveryFlow.forward,
  :43-83). Pure, stop-gradded, jittable.
* :class:`TrainState` — G/D params + optax states + step/lr bookkeeping.
* :func:`make_train_step` — ONE compiled function running the full
  G update (adv + rec + VGG + style + face + mask + TV,
  ``_optimize_G`` :367-394) and optionally the D LSGAN update
  (``_optimize_D`` :396-411). Under a data mesh the gradient all-reduce
  over ICI is inserted by XLA — no DataParallel analog needed.

LR schedule: fixed for ``nepochs_no_decay`` then linear to ``final_lr``
(update_learning_rate, :492-507) via optax.inject_hyperparams.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from impersonator_tpu.assets import SMPLAssets
from impersonator_tpu.config import TrainConfig
from impersonator_tpu.models import (
    HumanModelRecovery,
    ImpersonatorGenerator,
    PatchDiscriminator,
)
from impersonator_tpu.models import losses as L
from impersonator_tpu.models.facenet import Sphere20a
from impersonator_tpu.models.losses import Vgg19
from impersonator_tpu.ops import morphology, smpl as smpl_ops
from impersonator_tpu.ops.sampler import (grid_sample_patched,
                                          resize_bilinear_align)
from impersonator_tpu.tasks.renderer import SMPLRenderer


# --------------------------------------------------------------------------
# Frozen preprocessing (BodyRecoveryFlow)
# --------------------------------------------------------------------------

def body_recovery_flow(renderer: SMPLRenderer,
                       smpl_params: smpl_ops.SMPLParams, parents,
                       src_img, ref_img, src_smpl, ref_smpl,
                       bg_both: bool = False):
    """(B,S,S,3) images in [-1,1] + (B,85) thetas -> generator inputs.

    Mirrors BodyRecoveryFlow.forward (impersonator_trainer.py:43-83); all
    outputs are stop-gradded (the torch version runs under no_grad).
    """
    src_info = smpl_ops.get_details(smpl_params, src_smpl, parents)
    ref_info = smpl_ops.get_details(smpl_params, ref_smpl, parents)

    src_f2verts, src_fim, _ = renderer.render_fim_wim(
        src_info["cam"], src_info["verts"])
    src_f2pts = renderer.f2pts_from_f2verts(src_f2verts)
    src_cond = renderer.encode_fim(src_fim)
    src_crop_mask = morphology.morph(src_cond[..., -1:], ks=3, mode="erode")

    # fused raster+flow on TPU (ops/rasterizer.rasterize_flow_bucket);
    # classic two-step elsewhere — identical semantics
    ref_fim, t = renderer.render_flow(
        ref_info["cam"], ref_info["verts"], src_f2pts)
    ref_cond = renderer.encode_fim(ref_fim)
    syn_img = grid_sample_patched(src_img, t)

    input_g_src = jnp.concatenate([src_img * (1 - src_crop_mask), src_cond], -1)
    input_g_tsf = jnp.concatenate([syn_img, ref_cond], -1)

    src_bg_mask = morphology.morph(src_cond[..., -1:], ks=15, mode="erode")
    input_g_src_bg = jnp.concatenate([src_img * src_bg_mask, src_bg_mask], -1)
    if bg_both:
        ref_bg_mask = morphology.morph(ref_cond[..., -1:], ks=15, mode="erode")
        input_g_tsf_bg = jnp.concatenate([ref_img * ref_bg_mask, ref_bg_mask], -1)
    else:
        input_g_tsf_bg = None

    tsf_crop_mask = morphology.morph(ref_cond[..., -1:], ks=3, mode="erode")
    head_bbox = L.head_bbox_from_kps(ref_info["j2d"])
    body_bbox = L.body_bbox_from_kps(ref_info["j2d"])

    out = {
        "input_G_bg": input_g_src_bg,
        "input_G_tsf_bg": input_g_tsf_bg,
        "input_G_src": input_g_src,
        "input_G_tsf": input_g_tsf,
        "T": t,
        "src_crop_mask": src_crop_mask,
        "tsf_crop_mask": tsf_crop_mask,
        "head_bbox": head_bbox,
        "body_bbox": body_bbox,
    }
    return jax.tree_util.tree_map(
        lambda x: None if x is None else jax.lax.stop_gradient(x), out)


# --------------------------------------------------------------------------
# Train state
# --------------------------------------------------------------------------

class TrainState(NamedTuple):
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    step: jax.Array


@dataclasses.dataclass
class Trainer:
    cfg: TrainConfig
    assets: SMPLAssets
    renderer: SMPLRenderer
    smpl_params: smpl_ops.SMPLParams
    generator: ImpersonatorGenerator
    discriminator: PatchDiscriminator
    hmr: HumanModelRecovery
    hmr_params: Any
    vgg: Optional[Vgg19]
    vgg_params: Any
    face: Any                     # Sphere20a | SENet50 | None
    face_params: Any
    g_tx: Any
    d_tx: Any

    def init_state(self, rng=None) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        s = self.cfg.image_size
        k1, k2 = jax.random.split(rng)
        g_params = jax.jit(self.generator.init)(
            k1, jnp.zeros((1, s, s, 4)), jnp.zeros((1, s, s, 6)),
            jnp.zeros((1, s, s, 6)), jnp.zeros((1, s, s, 2)))
        d_params = jax.jit(self.discriminator.init)(k2, jnp.zeros((1, s, s, 6)))
        return TrainState(
            g_params=g_params, d_params=d_params,
            g_opt=self.g_tx.init(g_params), d_opt=self.d_tx.init(d_params),
            step=jnp.zeros((), jnp.int32))

    def epoch_lr(self, epoch: int, base: float | None = None) -> float:
        """LR for 0-indexed ``epoch``. Reference semantics: the per-epoch
        decay (base − final_lr)/nepochs_decay is applied at the END of
        every 1-indexed epoch > nepochs_no_decay (train.py:51-53,
        update_learning_rate :492-507) — so epochs 0..nepochs_no_decay
        run at ``base`` and each later epoch runs one step lower, with
        final_lr reached after the last epoch. ``base`` defaults to lr_G;
        pass cfg.lr_D for the discriminator's independent schedule
        (the reference decays G and D separately, :492-507)."""
        cfg = self.cfg
        base = cfg.lr_G if base is None else base
        step = (base - cfg.final_lr) / max(cfg.nepochs_decay, 1)
        return base - step * max(0, epoch - cfg.nepochs_no_decay)

    def set_lr(self, state: TrainState, lr_g: float,
               lr_d: float | None = None) -> TrainState:
        g_opt = state.g_opt
        d_opt = state.d_opt
        g_opt.hyperparams["learning_rate"] = jnp.asarray(lr_g, jnp.float32)
        d_opt.hyperparams["learning_rate"] = jnp.asarray(
            lr_g if lr_d is None else lr_d, jnp.float32)
        return state._replace(g_opt=g_opt, d_opt=d_opt)


def build_trainer(cfg: TrainConfig, assets: SMPLAssets | None = None,
                  rng=None) -> Trainer:
    assets = assets if assets is not None else cfg.assets()
    renderer = SMPLRenderer.create(assets, image_size=cfg.image_size,
                                   map_name=cfg.map_name, tex_size=cfg.tex_size)
    smpl_params = smpl_ops.SMPLParams.from_assets(assets)

    cond_nc = 3
    generator = ImpersonatorGenerator(
        bg_dim=4, src_dim=3 + cond_nc, tsf_dim=3 + cond_nc,
        repeat_num=cfg.repeat_num)
    discriminator = PatchDiscriminator(ndf=64, n_layers=cfg.d_layers,
                                       norm_type=cfg.norm_type)

    rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed + 7)
    k1, k2, k3 = jax.random.split(rng, 3)
    hmr = HumanModelRecovery()
    hmr_params = jax.jit(hmr.init)(k1, jnp.zeros((1, 224, 224, 3)))
    hmr_params["params"]["regressor"]["mean_theta"] = jnp.asarray(
        assets.mean_theta)

    vgg = vgg_params = None
    if cfg.use_vgg or cfg.use_style:
        vgg = Vgg19()
        vgg_params = jax.jit(vgg.init)(k2, jnp.zeros((1, 64, 64, 3)))
    face = face_params = None
    if cfg.use_face:
        # backbone picked by checkpoint path, like the reference
        # (networks.py:214-222: 'senet' in path -> SENet50 at 224²)
        if "senet" in (cfg.face_model or ""):
            from impersonator_tpu.models.facenet import SENet50
            face = SENet50()
            face_params = jax.jit(face.init)(k3, jnp.zeros((1, 224, 224, 3)))
        else:
            face = Sphere20a()
            face_params = jax.jit(face.init)(
                k3, jnp.zeros((1, L.FACE_H, L.FACE_W, 3)))

    g_tx = optax.inject_hyperparams(optax.adam)(
        learning_rate=cfg.lr_G, b1=cfg.G_adam_b1, b2=cfg.G_adam_b2)
    d_tx = optax.inject_hyperparams(optax.adam)(
        learning_rate=cfg.lr_D, b1=cfg.D_adam_b1, b2=cfg.D_adam_b2)

    return Trainer(cfg, assets, renderer, smpl_params, generator,
                   discriminator, hmr, hmr_params, vgg, vgg_params,
                   face, face_params, g_tx, d_tx)


# --------------------------------------------------------------------------
# The fused train step
# --------------------------------------------------------------------------

def make_loss_fns(trainer: Trainer):
    """(g_loss_fn, d_loss_fn) over PRECOMPUTED body_recovery_flow inputs.

    Exposed separately from :func:`make_train_step` so sharding
    equivalence checks can grad the REAL loss on fixed inputs — the
    rasterizer's near-tie z-buffer pixels can legitimately flip under
    different GSPMD partitionings, so cross-sharding gradient comparison
    is only well-defined given fixed inputs (driver dryrun stage 3)."""
    cfg = trainer.cfg
    gen, disc = trainer.generator, trainer.discriminator
    _pol = make_policy(cfg)

    def _g_forward(g_params, inputs):
        """Trainer forward (impersonator_trainer.forward :325-346)."""
        if cfg.bg_both:
            bg_in = jnp.concatenate(
                [inputs["input_G_bg"], inputs["input_G_tsf_bg"]], axis=0)
        else:
            bg_in = inputs["input_G_bg"]
        fake_bg, src_color, src_mask, tsf_color, tsf_mask = _pol(
            gen.apply, g_params, bg_in, inputs["input_G_src"],
            inputs["input_G_tsf"], inputs["T"])
        bs = src_color.shape[0]
        src_bg = fake_bg[:bs]
        tsf_bg = fake_bg[bs:] if cfg.bg_both else src_bg
        fake_src = src_mask * src_bg + (1 - src_mask) * src_color
        fake_tsf = tsf_mask * tsf_bg + (1 - tsf_mask) * tsf_color
        fake_masks = jnp.concatenate([src_mask, tsf_mask], axis=0)
        return fake_bg, fake_src, fake_tsf, fake_masks

    # --remat: recompute G activations in the backward pass instead of
    # keeping them in HBM (config.py remat)
    g_forward = jax.checkpoint(_g_forward) if cfg.remat else _g_forward

    def g_loss_fn(g_params, d_params, inputs, real_src, real_tsf):
        fake_bg, fake_src, fake_tsf, fake_masks = g_forward(g_params, inputs)
        tsf_cond = inputs["input_G_tsf"][..., 3:]

        fake_input_d = jnp.concatenate([fake_tsf, tsf_cond], axis=-1)
        d_fake = _pol(disc.apply, d_params, fake_input_d)
        loss_adv = L.lsgan_loss(d_fake, 0.0) * cfg.lambda_D_prob
        loss_rec = L.l1(fake_src, real_src) * cfg.lambda_rec

        loss_tsf = 0.0
        if cfg.use_vgg:
            fx = _pol(trainer.vgg.apply, trainer.vgg_params, fake_tsf)
            fy = _pol(trainer.vgg.apply, trainer.vgg_params, real_tsf)
            loss_tsf = L.vgg_loss(fx, fy) * cfg.lambda_tsf

        loss_style = 0.0
        if cfg.use_style and cfg.lambda_style > 0:
            fx = _pol(trainer.vgg.apply, trainer.vgg_params,
                      resize_bilinear_align(fake_tsf, 224, 224))
            fy = _pol(trainer.vgg.apply, trainer.vgg_params,
                      resize_bilinear_align(real_tsf, 224, 224))
            loss_style = L.style_loss(fx, fy) * cfg.lambda_style

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
        loss_mask_smooth = (L.tv_smooth(fake_masks) * cfg.lambda_mask_smooth
                            if cfg.lambda_mask_smooth else 0.0)

        total = (loss_adv + loss_rec + loss_tsf + loss_style + loss_face
                 + loss_mask + loss_mask_smooth)
        metrics = {
            "g_adv": loss_adv, "g_rec": loss_rec, "g_tsf": loss_tsf,
            "g_style": loss_style, "g_face": loss_face, "g_mask": loss_mask,
            "g_mask_smooth": loss_mask_smooth, "g_total": total,
        }
        return total, (metrics, fake_tsf)

    def d_loss_fn(d_params, fake_tsf, real_tsf, tsf_cond):
        fake_in = jnp.concatenate(
            [jax.lax.stop_gradient(fake_tsf), tsf_cond], axis=-1)
        real_in = jnp.concatenate([real_tsf, tsf_cond], axis=-1)
        d_real = _pol(disc.apply, d_params, real_in)
        d_fake = _pol(disc.apply, d_params, fake_in)
        loss = (L.lsgan_loss(d_real, 1.0) + L.lsgan_loss(d_fake, -1.0)) \
            * cfg.lambda_D_prob
        return loss, {"d_real": jnp.mean(d_real), "d_fake": jnp.mean(d_fake),
                      "d_loss": loss}

    return g_loss_fn, d_loss_fn


def make_policy(cfg):
    """Mixed-precision policy for a train step (cfg.train_dtype): fp32
    master params are cast to bf16 for the G/D/VGG forwards; grads flow
    through the cast back into fp32 optax accumulators; every loss term
    is computed on fp32-restored outputs. Flow fields (last dim 2) stay
    fp32 for coordinate precision, mirroring inference's gen_apply
    policy (tasks/imitator.py:109-130). Shared by the base and aug
    trainers so --train_dtype behaves identically in both."""
    tdtype = (jnp.bfloat16
              if getattr(cfg, "train_dtype", "float32") == "bfloat16"
              else None)

    def _pol(apply_fn, params, *args):
        if tdtype is None:
            return apply_fn(params, *args)
        from impersonator_tpu.tasks.imitator import _cast_tree
        params = _cast_tree(params, tdtype)

        def cast_in(a):
            if isinstance(a, (list, tuple)):
                return type(a)(cast_in(x) for x in a)
            if (hasattr(a, "dtype") and a.dtype == jnp.float32
                    and a.ndim == 4 and a.shape[-1] != 2):
                return a.astype(tdtype)
            return a

        out = apply_fn(params, *(cast_in(a) for a in args))
        return jax.tree_util.tree_map(
            lambda x: (x.astype(jnp.float32) if hasattr(x, "dtype")
                       and x.dtype == tdtype else x), out)

    return _pol


def make_train_step(trainer: Trainer, train_d: bool = True,
                    eval_only: bool = False):
    """Build the jittable step: (state, batch) -> (state, metrics).

    batch: {'images': (B, 2, S, S, 3), 'smpls': (B, 2, 85)} — the iPER
    pair-sampler contract (impersonator_trainer.set_input :289-314).
    ``eval_only``: return (state, batch) -> metrics computing the same
    losses with NO updates (the validation pass).
    """
    cfg = trainer.cfg
    renderer, smpl_params = trainer.renderer, trainer.smpl_params
    parents = trainer.assets.parents
    g_loss_fn, d_loss_fn = make_loss_fns(trainer)

    def eval_step(state: TrainState, batch):
        """Eval-mode G/D losses on a held-out batch, NO parameter updates
        (the reference's _display_visualizer_val, train.py:91-137)."""
        images, smpls = batch["images"], batch["smpls"]
        src_img, tsf_img = images[:, 0], images[:, 1]
        inputs = body_recovery_flow(
            renderer, smpl_params, parents, src_img, tsf_img,
            smpls[:, 0], smpls[:, 1], bg_both=cfg.bg_both)
        _, (metrics, fake_tsf) = g_loss_fn(
            state.g_params, state.d_params, inputs, src_img, tsf_img)
        tsf_cond = inputs["input_G_tsf"][..., 3:]
        _, d_metrics = d_loss_fn(state.d_params, fake_tsf, tsf_img, tsf_cond)
        metrics.update(d_metrics)
        return metrics

    if eval_only:
        return eval_step

    def train_step(state: TrainState, batch):
        images, smpls = batch["images"], batch["smpls"]
        src_img, tsf_img = images[:, 0], images[:, 1]
        src_smpl, tsf_smpl = smpls[:, 0], smpls[:, 1]

        inputs = body_recovery_flow(
            renderer, smpl_params, parents, src_img, tsf_img,
            src_smpl, tsf_smpl, bg_both=cfg.bg_both)

        (g_loss, (metrics, fake_tsf)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(
                state.g_params, state.d_params, inputs, src_img, tsf_img)
        g_updates, g_opt = trainer.g_tx.update(
            g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        if train_d:
            tsf_cond = inputs["input_G_tsf"][..., 3:]
            (d_loss, d_metrics), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(
                    state.d_params, fake_tsf, tsf_img, tsf_cond)
            d_updates, d_opt = trainer.d_tx.update(
                d_grads, state.d_opt, state.d_params)
            d_params = optax.apply_updates(state.d_params, d_updates)
            metrics.update(d_metrics)
        else:
            d_params, d_opt = state.d_params, state.d_opt

        new_state = TrainState(g_params, d_params, g_opt, d_opt,
                               state.step + 1)
        return new_state, metrics

    return train_step


def make_visuals_fn(trainer: Trainer):
    """Jittable (state, batch) -> image dict for the periodic visual dump
    (the reference's display cadence, train.py:62-85 +
    get_current_visuals, impersonator_trainer.py:428-454). Kept separate
    from the train step so the hot loop carries no visual bandwidth."""
    cfg = trainer.cfg
    gen = trainer.generator
    renderer, smpl_params = trainer.renderer, trainer.smpl_params
    parents = trainer.assets.parents

    def visuals(state: TrainState, batch):
        images, smpls = batch["images"], batch["smpls"]
        src_img, tsf_img = images[:, 0], images[:, 1]
        inputs = body_recovery_flow(
            renderer, smpl_params, parents, src_img, tsf_img,
            smpls[:, 0], smpls[:, 1], bg_both=cfg.bg_both)
        bg_in = (jnp.concatenate(
            [inputs["input_G_bg"], inputs["input_G_tsf_bg"]], axis=0)
            if cfg.bg_both else inputs["input_G_bg"])
        fake_bg, src_color, src_mask, tsf_color, tsf_mask = gen.apply(
            state.g_params, bg_in, inputs["input_G_src"],
            inputs["input_G_tsf"], inputs["T"])
        bs = src_color.shape[0]
        fake_src = src_mask * fake_bg[:bs] + (1 - src_mask) * src_color
        tsf_bg = fake_bg[bs:] if cfg.bg_both else fake_bg[:bs]
        fake_tsf = tsf_mask * tsf_bg + (1 - tsf_mask) * tsf_color
        return {
            "1_real_img": src_img, "2_input_tsf": inputs["input_G_tsf"][..., :3],
            "3_fake_src": fake_src, "4_fake_tsf": fake_tsf,
            "5_fake_bg": fake_bg[:bs], "6_real_tsf": tsf_img,
            "7_fake_mask": jnp.repeat(tsf_mask, 3, axis=-1),
        }

    return visuals
