"""Appearance transfer ("swapper").

Re-design of ``models/swapper.py:15-271``: personalize both source and
target, build the dual flows — T11 (identity grid restricted to the kept
source parts) and T21 (target→source correspondence restricted to the
swapped parts) — and decode through the generator's dual-source LWB
(``generator.swap``). The part machinery runs on the 11-channel 'par'
face encoding (utils/mesh.py:288-318).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from impersonator_tpu.assets import SMPLAssets
from impersonator_tpu.config import TestConfig
from impersonator_tpu.ops import flow as flow_ops
from impersonator_tpu.ops import smpl as smpl_ops
from impersonator_tpu.ops.sampler import grid_sample_patched
from impersonator_tpu.tasks import imitator as imitator_mod
from impersonator_tpu.tasks.renderer import SMPLRenderer

# part-channel groups over the sorted 'par' encoding (swapper.py:17-20)
PART_IDS = {
    "body": [1, 2, 3, 4, 5, 6, 7, 8, 9],
    "all": [0, 1, 2, 3, 4, 5, 6, 7, 8, 9],
}


def swap_smpl_preserve_scale(src_cam, src_shape, tgt_smpl):
    """Take target pose, keep source scale/shape; re-center translation by
    the scale ratio (Swapper.swap_smpl, swapper.py:242-256)."""
    tgt_cam = tgt_smpl[:, 0:3]
    pose = tgt_smpl[:, 3:75]
    scale = src_cam[:, 0:1]
    trans = (src_cam[:, 0:1] / tgt_cam[:, 0:1]) * tgt_cam[:, 1:] + src_cam[:, 1:]
    cam = jnp.concatenate([scale, trans], axis=1)
    return jnp.concatenate([cam, pose, src_shape], axis=1)


def swap_core(nets, renderer: SMPLRenderer, src_state, tgt_state,
              left_faces: np.ndarray, selected_ids, left_ids,
              front_warp: bool = False, compute_dtype=None):
    """Jittable swap step (Swapper.swap + calculate_trans + forward,
    swapper.py:199-271). left_faces is a static index array."""
    s = renderer.image_size
    part_src = src_state["part"]  # (1, S, S, 11)

    sel_idx = np.asarray(selected_ids, np.int32)
    left_idx = np.asarray(left_ids, np.int32)
    src_part_mask = (jnp.sum(part_src[..., sel_idx], -1) != 0)
    if left_idx.size:
        src_left_mask = (jnp.sum(part_src[..., left_idx], -1) != 0)
    else:
        src_left_mask = jnp.zeros_like(src_part_mask)

    # T11: identity grid on kept parts (calculate_trans, :242-253)
    grid = flow_ops.identity_flow(1, s)
    t11 = jnp.where(src_left_mask[..., None], grid, flow_ops.BG_FLOW)

    # T21: target p2verts with kept-part faces nulled, mapped through the
    # SOURCE's fim/wim
    tsf_f2p = tgt_state["p2verts"]
    if left_faces.size:
        tsf_f2p = tsf_f2p.at[:, jnp.asarray(left_faces)].set(flow_ops.BG_FLOW)
    t21 = renderer.cal_bc_transform(tsf_f2p, src_state["fim"], src_state["wim"])
    t21 = jnp.clip(t21, -2.0, 2.0)

    # bf16 warp under a bf16 compute dtype (see imitate_from_flow)
    tgt_img, src_img, cond = (tgt_state["img"], src_state["img"],
                              src_state["cond"])
    if compute_dtype is not None:
        tgt_img = tgt_img.astype(compute_dtype)
        src_img = src_img.astype(compute_dtype)
        cond = cond.astype(compute_dtype)
    tsf21 = grid_sample_patched(tgt_img, t21)
    tsf11 = grid_sample_patched(src_img, t11)
    tsf_img = (tsf21 * src_part_mask[..., None].astype(tsf21.dtype)
               + tsf11 * src_left_mask[..., None].astype(tsf11.dtype))
    tsf_inputs = jnp.concatenate([tsf_img, cond], axis=-1)

    enc21, res21 = tgt_state["feats"]
    enc11, res11 = src_state["feats"]
    tsf_color, tsf_mask = imitator_mod.gen_apply(
        nets, compute_dtype, tsf_inputs, enc21, enc11, res21, res11, t21,
        t11, method="swap")
    preds = tsf_mask * src_state["bg"] + (1 - tsf_mask) * tsf_color

    if front_warp:
        front_mask = renderer.encode_front_fim(src_state["fim"], front_fn=True)
        preds = (1 - front_mask) * preds + src_state["img"] * front_mask * (1 - tsf_mask)
    return preds


class Swapper:
    """Reference-parity driver (models/swapper.py)."""

    def __init__(self, cfg: TestConfig, assets: SMPLAssets | None = None,
                 nets=None):
        self.cfg = cfg
        self.assets = assets if assets is not None else cfg.assets()
        self.renderer = SMPLRenderer.create(
            self.assets, image_size=cfg.image_size, map_name="uv_seg",
            tex_size=cfg.tex_size, has_front=cfg.front_warp)
        self.part_fn = jnp.asarray(self.assets.map_fn("par"))
        part_faces = self.assets.part_face_ids("par")
        self.part_faces = [part_faces[k] for k in sorted(part_faces.keys())]
        self.smpl_params = smpl_ops.SMPLParams.from_assets(self.assets)
        self.parents = self.assets.parents
        self.nets = (nets if nets is not None
                     else imitator_mod.build_nets(cfg, self.assets))
        self.src_info = None
        self.tsf_info = None

        # nets/smpl_params as jit arguments, not closure constants
        # (see ImitatorNets docstring)
        _pers = jax.jit(partial(
            imitator_mod.personalize_core, renderer=self.renderer,
            parents=self.parents, bg_ks=cfg.bg_ks, ft_ks=cfg.ft_ks,
            only_vis=cfg.only_vis))
        self._personalize_jit = \
            lambda img, theta, ext_body_mask=None: _pers(
                self.nets, smpl_params=self.smpl_params, img=img,
                src_theta=theta, ext_body_mask=ext_body_mask)
        # --has_detector: MaskRCNN body masks when available
        # (reference imitator.py:116-122; swapper personalize reuses it)
        from impersonator_tpu.utils.detectors import (MaskRCNNDetector,
                                                      build_detector)
        det = build_detector(cfg.has_detector, cfg.bg_ks)
        self.detector = det if isinstance(det, MaskRCNNDetector) else None
        _hmr = jax.jit(self.nets.hmr.apply)
        self._hmr_jit = lambda img: _hmr(self.nets.hmr_params, img)
        compute_dtype = (jnp.bfloat16
                         if cfg.compute_dtype == "bfloat16" else None)
        self._swap_jit = jax.jit(
            partial(swap_core, renderer=self.renderer,
                    front_warp=cfg.front_warp, compute_dtype=compute_dtype),
            static_argnames=("selected_ids", "left_ids"))
        # motion drive for appearance-transfer evaluation: after a swap,
        # the composite re-personalizes and imitates the drive clip
        # (evaluators/appearance_transfer.py:29-63 contracts
        # swap(src, app, motion) -> one pred per motion frame)
        _imit_swap = jax.jit(
            partial(imitator_mod.imitate_with_swap_core,
                    renderer=self.renderer, parents=self.parents,
                    front_warp=cfg.front_warp, compute_dtype=compute_dtype),
            static_argnames=("cam_strategy",))
        self._imitate_swap_jit = \
            lambda src_state, tgt, first_cam, cam_strategy: _imit_swap(
                self.nets, smpl_params=self.smpl_params,
                src_state=src_state, tgt_smpls=tgt, first_cam=first_cam,
                cam_strategy=cam_strategy)

    def personalize(self, img: np.ndarray, smpl=None):
        """img: (S, S, 3) in [-1, 1]. Adds the 'par' part encoding on top
        of the imitator personalization (swapper.py:120-129)."""
        arr = jnp.asarray(img, jnp.float32)[None]
        if smpl is None:
            from impersonator_tpu.utils.cv_utils import resize_img_hwc
            theta = self._hmr_jit(jnp.asarray(
                resize_img_hwc(np.asarray(img), 224))[None])
        else:
            theta = jnp.asarray(smpl, jnp.float32).reshape(1, 85)
        body_mask = None
        if self.detector is not None:
            _, body_mask = self.detector.inference(np.asarray(img))
            body_mask = jnp.asarray(body_mask, jnp.float32)
        state = self._personalize_jit(arr, theta, ext_body_mask=body_mask)
        state["part"] = self.renderer.encode_fim(state["fim"], self.part_fn)
        return state

    def swap_setup(self, src_img, tgt_img, src_smpl=None, tgt_smpl=None):
        self.src_info = self.personalize(src_img, src_smpl)
        self.tsf_info = self.personalize(tgt_img, tgt_smpl)

    def swap(self, src_info=None, tgt_info=None, target_part: str = "body"):
        assert target_part in PART_IDS
        src_info = src_info if src_info is not None else self.src_info
        tgt_info = tgt_info if tgt_info is not None else self.tsf_info
        selected = PART_IDS[target_part]
        left = [i for i in PART_IDS["all"] if i not in selected]
        left_faces = (np.unique(np.concatenate(
            [self.part_faces[i] for i in left])) if left
            else np.zeros((0,), np.int64))
        return self._swap_jit(self.nets, src_state=src_info,
                              tgt_state=tgt_info, left_faces=left_faces,
                              selected_ids=tuple(selected),
                              left_ids=tuple(left))

    def imitate_by_smpls(self, src_state, tgt_smpls,
                         cam_strategy: str = "copy", batch: int = 8):
        """Drive a (re-)personalized state through a motion clip.

        The appearance-transfer evaluation chain (see
        :mod:`impersonator_tpu.cli.evaluate` ``--task swap``): swap the
        appearance onto the source at the source pose, re-personalize on
        the composite via :meth:`personalize`, then imitate the drive
        smpls. Fixed-size padded batches through one compiled program,
        same staging discipline as ``Imitator.inference_by_smpls``.
        """
        smpls = np.asarray(tgt_smpls, np.float32)
        n = smpls.shape[0]
        pad = (-n) % batch
        if pad:
            smpls = np.concatenate([smpls, np.repeat(smpls[-1:], pad, 0)])
        chunks = [jnp.asarray(smpls[i:i + batch])
                  for i in range(0, n + pad, batch)]
        first_cam = chunks[0][0:1, 0:3]
        outs = [self._imitate_swap_jit(src_state, c, first_cam,
                                       cam_strategy=cam_strategy)
                for c in chunks]
        out = jnp.concatenate(outs, 0) if len(outs) > 1 else outs[0]
        return out[:n]
