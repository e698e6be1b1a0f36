"""Test-time adaptive personalization ("post_tune").

Re-design of the reference's meta-imitate + MetaCycleDataSet + 5-epoch
Adam fine-tune pipeline (run_imitator.py:21-211, imitator.py:344-472,
PairSampleDataset.preprocess data/dataset.py:249-324).

The reference renders prior poses, pickles per-pair tensors to disk, then
reloads them through a dataloader. Here the pair set is built ON DEVICE
(:func:`build_meta_pairs`) and the inner Adam loop is a single jitted
step over the generator parameters (:func:`make_tune_step`) — no disk
round trip, no host↔device ping-pong.

Loss (imitator.post_personalize :434-452):
    10·cycle L1 + 10·structure + face + 5·mask BCE
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from impersonator_tpu.models import losses as L
from impersonator_tpu.ops import morphology, smpl as smpl_ops
from impersonator_tpu.ops.sampler import grid_sample, grid_sample_patched
from impersonator_tpu.tasks import imitator as imitator_mod


def load_prior_poses(path: str) -> jax.Array:
    """Load prior pose thetas from a pickle — the reference's
    assets/samples/A_priors format (run_imitator.py:69-95): either a
    plain (N, 85) array or a dict with cams/pose/shape arrays."""
    import pickle
    with open(path, "rb") as f:
        d = pickle.load(f)
    if isinstance(d, dict):
        arr = np.concatenate([
            np.asarray(d["cams"], np.float32),
            np.asarray(d["pose"], np.float32),
            np.asarray(d["shape"], np.float32)], axis=1)
    else:
        arr = np.asarray(d, np.float32)
    return jnp.asarray(arr.reshape(-1, 85))


def default_prior_poses(src_theta: jax.Array, n: int = 8,
                        scale: float = 0.15, seed: int = 0) -> jax.Array:
    """Stand-in for assets/samples/A_priors (run_imitator.py:69-95):
    jittered copies of the source pose. Callers with the real prior-pose
    pkl pass their own (N, 85) array instead."""
    rng = np.random.default_rng(seed)
    base = np.asarray(src_theta).reshape(1, 85)
    priors = np.repeat(base, n, axis=0)
    priors[:, 3:75] += rng.normal(0, scale, (n, 72)).astype(np.float32)
    return jnp.asarray(priors)


def build_meta_pairs(imit, prior_smpls: jax.Array):
    """Render prior poses with the CURRENT generator and assemble the
    pair batch (meta_imitate + write_pair_info, run_imitator.py:21-95).

    Returns a dict batch with everything the tune step consumes.
    """
    src = imit.src_info
    nets, renderer = imit.nets, imit.renderer
    smpl_params, parents = imit.smpl_params, imit.parents
    n = prior_smpls.shape[0]

    tsf = imitator_mod.swap_smpl(src["cam"], src["shape"], prior_smpls,
                                 prior_smpls[0:1, 0:3], "smooth")
    info = smpl_ops.get_details(smpl_params, tsf, parents)
    tsf_f2verts, tsf_fim, tsf_wim = renderer.render_fim_wim(
        info["cam"], info["verts"])
    tsf_p2verts = renderer.f2pts_from_f2verts(tsf_f2verts)
    tsf_cond = renderer.encode_fim(tsf_fim)

    src_p2verts = jnp.broadcast_to(src["p2verts"], (n,) + src["p2verts"].shape[1:])
    t = renderer.cal_bc_transform(src_p2verts, tsf_fim, tsf_wim)
    # T_cycle: pose -> source (write_pair_info, run_imitator.py:40-45)
    src_fim = jnp.broadcast_to(src["fim"], (n,) + src["fim"].shape[1:])
    src_wim = jnp.broadcast_to(src["wim"], (n,) + src["wim"].shape[1:])
    t_cycle = renderer.cal_bc_transform(tsf_p2verts, src_fim, src_wim)

    src_img = jnp.broadcast_to(src["img"], (n,) + src["img"].shape[1:])
    warped = grid_sample_patched(src_img, t)
    tsf_inputs = jnp.concatenate([warped, tsf_cond], axis=-1)

    src_cond = jnp.broadcast_to(src["cond"], (n,) + src["cond"].shape[1:])
    src_crop_mask = morphology.morph(src_cond[..., -1:], ks=3, mode="erode")
    src_inputs = jnp.concatenate([src_img * (1 - src_crop_mask), src_cond], -1)
    tsf_crop_mask = morphology.morph(tsf_cond[..., -1:], ks=3, mode="erode")

    # init_preds: the untuned generator's outputs (struct-loss anchor)
    init_preds = imitator_mod.imitate_core(
        nets, renderer, smpl_params, parents, src, tsf)

    j2d_src = jnp.broadcast_to(src["j2d"], (n,) + src["j2d"].shape[1:])
    return {
        "src_inputs": src_inputs,
        "tsf_inputs": tsf_inputs,
        "T": t,
        "T_cycle": t_cycle,
        "src_fim": src_fim,
        "tsf_fim": tsf_fim,
        "init_preds": jax.lax.stop_gradient(init_preds),
        "pseudo_masks": jnp.concatenate([src_crop_mask, tsf_crop_mask], 0),
        "images_src": src_img,
        "j2d_src": j2d_src,
        "j2d_tsf": info["j2d"],
    }


def make_tune_step(imit, tx, face=None, face_params=None,
                   front_warp: bool = False, use_face: bool = True):
    """Jitted inner-loop step over generator params
    (imitator.post_personalize :384-455)."""
    nets, renderer = imit.nets, imit.renderer
    gen = nets.generator

    def loss_fn(gen_params, batch, bg):
        src_in, tsf_in = batch["src_inputs"], batch["tsf_inputs"]
        t, t_cycle = batch["T"], batch["T_cycle"]

        def infer(si, ti, flow):
            s_color, s_mask, t_color, t_mask = gen.apply(
                gen_params, si, ti, flow, method="infer_front")
            fake_s = s_mask * bg + (1 - s_mask) * s_color
            fake_t = t_mask * bg + (1 - t_mask) * t_color
            return fake_s, fake_t, s_mask, t_mask

        fake_src, fake_tsf, fs_mask, ft_mask = infer(src_in, tsf_in, t)
        if front_warp:
            front = renderer.encode_front_fim(batch["tsf_fim"], front_fn=True)
            fake_tsf = (1 - front) * fake_tsf + tsf_in[..., 0:3] * front * (1 - ft_mask)

        # cycle pass (set_cycle_inputs, imitator.py:368-376)
        cyc_src_in = jnp.concatenate(
            [fake_tsf * tsf_in[..., -1:], tsf_in[..., 3:]], axis=-1)
        cyc_warp = grid_sample(fake_tsf, t_cycle)
        cyc_tsf_in = jnp.concatenate([cyc_warp, src_in[..., 3:]], axis=-1)
        _, cycle_tsf, _, _ = infer(cyc_src_in, cyc_tsf_in, t_cycle)

        src_imgs = batch["images_src"]
        cycle_loss = L.l1(src_imgs, fake_src) + L.l1(src_imgs, cycle_tsf)

        bg_mask = src_in[..., -1:]
        body_mask = 1 - bg_mask
        back_head = 1 - renderer.encode_front_fim(batch["tsf_fim"],
                                                  front_fn=False)
        struct_loss = (L.l1(batch["init_preds"], fake_tsf)
                       + 2 * L.l1(src_imgs * body_mask * back_head,
                                  cyc_warp * back_head))

        fid_loss = 0.0
        if use_face and face is not None:
            fid_loss = (L.face_loss(face, face_params, src_imgs, cycle_tsf,
                                    kps1=batch["j2d_src"], kps2=batch["j2d_src"])
                        + L.face_loss(face, face_params, batch["init_preds"],
                                      fake_tsf, kps1=batch["j2d_tsf"],
                                      kps2=batch["j2d_tsf"]))

        mask_loss = L.bce(jnp.concatenate([fs_mask, ft_mask], 0),
                          batch["pseudo_masks"])
        total = 10 * cycle_loss + 10 * struct_loss + fid_loss + 5 * mask_loss
        return total, {"cyc": cycle_loss, "str": struct_loss,
                       "fid": fid_loss, "msk": mask_loss, "total": total}

    @jax.jit
    def step(gen_params, opt_state, batch, bg):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            gen_params, batch, bg)
        updates, opt_state = tx.update(grads, opt_state, gen_params)
        gen_params = optax.apply_updates(gen_params, updates)
        return gen_params, opt_state, metrics

    return step


def post_tune_steps(n_pairs: int, epochs: int, batch_size: int) -> int:
    """Reference step budget: epochs × ceil(n_pairs / batch)
    (imitator.post_personalize iterates the MetaCycleDataSet loader every
    epoch, imitator.py:419-433)."""
    return epochs * -(-n_pairs // max(batch_size, 1))


def adaptive_personalize(imit, prior_smpls=None, prior_poses_path=None,
                         epochs: int = 5, lr: float = 2e-4,
                         batch_size: int = 4,
                         use_face: bool | None = None,
                         face=None, face_params=None, verbose: bool = False,
                         seed: int = 0):
    """Full post-tune: meta pairs + Adam loop, updating imit.nets.gen_params
    in place (run_imitator.adaptive_personalize :199-211; budget 5 epochs
    × ceil(n_pairs/batch) Adam(2e-4, β .5/.999) minibatch steps over the
    shuffled pair set, matching the reference's MetaCycleDataSet loader
    epochs, imitator.py:415-433).

    Prior poses come from (in priority order) ``prior_smpls`` (N,85),
    ``prior_poses_path`` (the reference's assets/samples/A_priors pkl,
    run_imitator.py:69-95), else jittered source poses. ``use_face=None``
    auto-enables FaceLoss whenever a face net is supplied — the reference
    post-tune loss always includes it (imitator.py:434-452).

    Returns the last step's metrics plus ``cyc_history`` (one mean cycle
    loss per epoch) and ``n_steps``."""
    assert imit.src_info is not None, "personalize() first"
    if use_face is None:
        use_face = face is not None and face_params is not None
    if prior_smpls is None and prior_poses_path:
        prior_smpls = load_prior_poses(prior_poses_path)
    if prior_smpls is None:
        prior_smpls = default_prior_poses(imit.src_info["theta"])
    batch = build_meta_pairs(imit, prior_smpls)
    n = int(prior_smpls.shape[0])
    bg = jnp.broadcast_to(
        imit.src_info["bg"], (n,) + imit.src_info["bg"].shape[1:])

    tx = optax.adam(lr, b1=0.5, b2=0.999)
    opt_state = tx.init(imit.nets.gen_params)
    step = make_tune_step(imit, tx, face, face_params,
                          front_warp=imit.cfg.front_warp, use_face=use_face)

    bs = min(batch_size, n)
    steps_per_epoch = -(-n // bs)
    rng = np.random.default_rng(seed)
    gen_params = imit.nets.gen_params
    cyc_history = []
    n_steps = 0
    for epoch in range(epochs):
        perm = rng.permutation(n)
        epoch_cyc = []
        for k in range(steps_per_epoch):
            idx = perm[k * bs:(k + 1) * bs]
            if len(idx) < bs:   # wrap-pad: keep ONE compiled step shape
                idx = np.concatenate([idx, perm[:bs - len(idx)]])
            idx = jnp.asarray(idx)
            # pseudo_masks stacks src+tsf rows along axis 0 (2n rows)
            mb = {k: (v[jnp.concatenate([idx, idx + n])]
                      if k == "pseudo_masks" else v[idx])
                  for k, v in batch.items()}
            gen_params, opt_state, metrics = step(
                gen_params, opt_state, mb, bg[idx])
            epoch_cyc.append(float(metrics["cyc"]))
            n_steps += 1
        cyc_history.append(float(np.mean(epoch_cyc)))
        if verbose:
            print(f"post_tune epoch {epoch}: "
                  + " ".join(f"{k}={float(v):.4f}" for k, v in metrics.items()))
    imit.nets.gen_params = gen_params
    # refresh cached source features under the tuned generator, reusing
    # the detector body mask from the original personalize when one was
    # used (otherwise the refreshed BG would silently switch to the
    # cruder cond-morph silhouette)
    imit.src_info = imit._personalize_jit(
        imit.src_info["img"], imit.src_info["theta"],
        ext_body_mask=getattr(imit, "_src_body_mask", None))
    metrics = dict(metrics)
    metrics["cyc_history"] = cyc_history
    metrics["n_steps"] = n_steps
    return metrics


def swapper_tune_lr(i: int, init_lr: float = 2e-4,
                    final_lr: float = 1e-5, fix_iters: int = 25,
                    total_iters: int = 50) -> float:
    """The reference swapper post-tune LR schedule (swapper.py:391-397):
    constant for ``fix_iters``, then a per-iteration linear decay of
    (init-final)/(total-fix) reaching ``final_lr`` at ``total_iters``."""
    if i < fix_iters:
        return init_lr
    decay = (init_lr - final_lr) / max(total_iters - fix_iters, 1)
    return max(init_lr - decay * (i - fix_iters + 1), final_lr)


def merge_pair_batches(batch_a: dict, batch_b: dict) -> dict:
    """Concatenate two build_meta_pairs batches along the batch axis.

    ``pseudo_masks`` stacks [src rows..., tsf rows...] WITHIN each
    batch, and make_tune_step's mask BCE compares against
    concat([fs_mask(A,B), ft_mask(A,B)]) — so the merge must keep the
    kinds grouped ([srcA, srcB, tsfA, tsfB]); a naive per-key concat
    would interleave per batch and supervise half the masks against
    the wrong targets."""
    out = {}
    for k in batch_a:
        a, b = batch_a[k], batch_b[k]
        if k == "pseudo_masks":
            na, nb = a.shape[0] // 2, b.shape[0] // 2
            out[k] = jnp.concatenate([a[:na], b[:nb], a[na:], b[nb:]], 0)
        else:
            out[k] = jnp.concatenate([a, b], axis=0)
    return out


def post_tune_swapper(swapper, iters: int = 50, lr: float = 2e-4,
                      verbose: bool = False):
    """Two-image bidirectional cycle tune (Swapper.post_personalize,
    swapper.py:273-476): treat each personalized image as the source for
    imitating the other's pose, with the same loss family and the
    reference's 25-iter-fixed → linear-decay-to-1e-5 LR schedule."""
    assert swapper.src_info is not None and swapper.tsf_info is not None

    # Build a 2-pair batch: src->tgt pose and tgt->src pose.
    import types
    shim = types.SimpleNamespace(
        nets=swapper.nets, renderer=swapper.renderer,
        smpl_params=swapper.smpl_params, parents=swapper.parents,
        cfg=swapper.cfg, src_info=swapper.src_info,
        _personalize_jit=swapper._personalize_jit)
    batch_a = build_meta_pairs(shim, swapper.tsf_info["theta"])
    shim.src_info = swapper.tsf_info
    batch_b = build_meta_pairs(shim, swapper.src_info["theta"])
    batch = merge_pair_batches(batch_a, batch_b)
    bg = jnp.concatenate([swapper.src_info["bg"], swapper.tsf_info["bg"]], 0)

    tx = optax.inject_hyperparams(optax.adam)(
        learning_rate=lr, b1=0.5, b2=0.999)
    opt_state = tx.init(swapper.nets.gen_params)
    step = make_tune_step(shim, tx, use_face=False,
                          front_warp=swapper.cfg.front_warp)
    gen_params = swapper.nets.gen_params
    for i in range(iters):
        opt_state.hyperparams["learning_rate"] = jnp.asarray(
            swapper_tune_lr(i, init_lr=lr, total_iters=iters), jnp.float32)
        gen_params, opt_state, metrics = step(gen_params, opt_state, batch, bg)
        if verbose and i % 10 == 0:
            print(f"swap post_tune {i}: total={float(metrics['total']):.4f}")
    swapper.nets.gen_params = gen_params
    # refresh both cached feature sets
    swapper.src_info = swapper.personalize(
        np.asarray(swapper.src_info["img"][0]),
        np.asarray(swapper.src_info["theta"][0]))
    swapper.tsf_info = swapper.personalize(
        np.asarray(swapper.tsf_info["img"][0]),
        np.asarray(swapper.tsf_info["theta"][0]))
    return metrics
