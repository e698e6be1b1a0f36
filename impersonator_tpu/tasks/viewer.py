"""Novel view synthesis.

Re-design of ``models/viewer.py:13-314``: personalize a source image,
then for each requested (R, t) rotate the SMPL vertices, re-rasterize
fim/wim under the SOURCE camera, rebuild the flow and decode against the
cached source features. A yaw sweep batches all angles through one
compiled call — each view is independent, so views shard across the data
mesh like frames do.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from impersonator_tpu.assets import SMPLAssets
from impersonator_tpu.config import TestConfig
from impersonator_tpu.ops import smpl as smpl_ops
from impersonator_tpu.ops.projection import euler_to_matrix
from impersonator_tpu.ops.sampler import grid_sample_patched
from impersonator_tpu.tasks import imitator as imitator_mod
from impersonator_tpu.tasks.renderer import SMPLRenderer


def view_core(nets, renderer: SMPLRenderer, src_state, rot_mats, trans,
              bg_replace: bool = False, front_warp: bool = False,
              compute_dtype=None):
    """Batched novel-view step (Viewer.view, viewer.py:273-305).

    rot_mats: (N, 3, 3); trans: (N, 3). Uses verts @ R + t — the
    reference's bmm(X, R) convention (rotate_trans, :264-271).
    """
    n = rot_mats.shape[0]
    verts = jnp.broadcast_to(
        src_state["verts"], (n,) + src_state["verts"].shape[1:])
    tsf_mesh = jnp.einsum("nvc,ncd->nvd", verts, rot_mats) + trans[:, None, :]

    cam = jnp.broadcast_to(src_state["cam"], (n, 3))
    # fused raster+flow; source-side arrays stay batch-1 — the samplers
    # broadcast the gathers over the view axis (materialized broadcasts
    # are a TPU layout trap, see imitate_from_flow)
    fim, t = renderer.render_flow(cam, tsf_mesh, src_state["p2verts"])
    cond = renderer.encode_fim(fim)

    # bf16 warp under a bf16 compute dtype (see imitate_from_flow)
    src_img = (src_state["img"].astype(compute_dtype)
               if compute_dtype is not None else src_state["img"])
    tsf_img = grid_sample_patched(src_img, t)
    if compute_dtype is not None:
        cond = cond.astype(compute_dtype)
    tsf_inputs = jnp.concatenate([tsf_img, cond], axis=-1)

    enc, res = src_state["feats"]
    tsf_color, tsf_mask = imitator_mod.gen_apply(
        nets, compute_dtype, enc, res, tsf_inputs, t, method="inference")

    bg = (src_state["bg"] if bg_replace
          else jnp.zeros_like(src_state["bg"]))
    preds = tsf_mask * bg + (1 - tsf_mask) * tsf_color

    if front_warp:
        front_mask = renderer.encode_front_fim(fim, front_fn=True)
        preds = (1 - front_mask) * preds + tsf_img * front_mask * (1 - tsf_mask)
    return preds


class Viewer:
    """Reference-parity driver (models/viewer.py). The verts needed for
    rotation are recomputed at personalize time and cached."""

    def __init__(self, cfg: TestConfig, assets: SMPLAssets | None = None,
                 nets=None):
        self.cfg = cfg
        self.assets = assets if assets is not None else cfg.assets()
        self.renderer = SMPLRenderer.create(
            self.assets, image_size=cfg.image_size, map_name="uv_seg",
            tex_size=cfg.tex_size, has_front=cfg.front_warp)
        self.smpl_params = smpl_ops.SMPLParams.from_assets(self.assets)
        self.parents = self.assets.parents
        self.nets = (nets if nets is not None
                     else imitator_mod.build_nets(cfg, self.assets))
        self.src_info = None

        # nets/smpl_params as jit arguments, not closure constants
        # (see ImitatorNets docstring)
        _pers = jax.jit(partial(
            imitator_mod.personalize_core, renderer=self.renderer,
            parents=self.parents, bg_ks=cfg.bg_ks, ft_ks=cfg.ft_ks,
            only_vis=cfg.only_vis))
        # ext_body_mask kwarg for signature parity with Imitator's
        # personalize (post_tune's src_info refresh passes it; the
        # viewer has no detector so it is None there)
        self._personalize_jit = lambda img, theta, ext_body_mask=None: \
            _pers(self.nets, smpl_params=self.smpl_params, img=img,
                  src_theta=theta, ext_body_mask=ext_body_mask)
        compute_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                         else None)
        _view = jax.jit(partial(
            view_core, renderer=self.renderer, bg_replace=cfg.bg_replace,
            front_warp=cfg.front_warp, compute_dtype=compute_dtype))
        self._view_jit = lambda src_state, r, t: _view(
            self.nets, src_state=src_state, rot_mats=r, trans=t)
        _hmr = jax.jit(self.nets.hmr.apply)
        self._hmr_jit = lambda img: _hmr(self.nets.hmr_params, img)

    def personalize(self, img: np.ndarray, smpl=None):
        arr = jnp.asarray(img, jnp.float32)[None]
        if smpl is None:
            from impersonator_tpu.utils.cv_utils import resize_img_hwc
            theta = self._hmr_jit(jnp.asarray(
                resize_img_hwc(np.asarray(img), 224))[None])
        else:
            theta = jnp.asarray(smpl, jnp.float32).reshape(1, 85)
        state = self._personalize_jit(arr, theta)
        det = smpl_ops.get_details(self.smpl_params, state["theta"], self.parents)
        state["verts"] = det["verts"]
        self.src_info = state
        return state

    def view(self, rt, t):
        """Single view: rt/t like the reference's --view_params."""
        r = euler_to_matrix(jnp.asarray(rt))[None]
        tr = jnp.asarray(t, jnp.float32)[None]
        return self._view_jit(self.src_info, r, tr)

    def post_personalize(self, prior_smpls=None, epochs: int = 5,
                         lr: float = 2e-4):
        """Viewer post-tune: identical recipe to the imitator's
        (Viewer.post_personalize, viewer.py:316-444 = imitator.py:344-472
        with the same losses/budget)."""
        from impersonator_tpu.tasks.post_tune import adaptive_personalize
        metrics = adaptive_personalize(self, prior_smpls, epochs=epochs, lr=lr)
        # adaptive_personalize refreshes src_info through the imitator
        # personalize path, which doesn't cache verts — restore them
        det = smpl_ops.get_details(self.smpl_params, self.src_info["theta"],
                                   self.parents)
        self.src_info["verts"] = det["verts"]
        return metrics

    def view_by_smpls(self, tgt_smpls, batch: int = 8):
        """Protocol-driven novel views (``--task view`` in
        :mod:`impersonator_tpu.cli.evaluate`).

        Each gt view smpl in the novel-view protocols shares the
        source's body pose/shape and differs in global orientation (the
        camera orbit, MS_novel_view_protocol.json "view angle"). SMPL's
        root transform rotates about the shaped root joint j0
        (ops/smpl.py:118), so the view is the cached source verts under
        ``v' = M (v - j0) + j0`` with ``M = R_tgt @ R_src^T``; in
        view_core's row-vector convention (``verts @ R + t``,
        viewer.py:264-271 bmm(X, R)) that is ``R = M^T`` and
        ``t = j0 - j0 @ R``. Projection keeps the SOURCE camera — the
        reference viewer never re-fits cams per view, so a protocol
        whose gt cams drift from the source scores that drift.

        tgt_smpls: (N, 85). Returns preds (N, S, S, 3) in [-1, 1].
        """
        assert self.src_info is not None, "call personalize() first"
        smpls = np.asarray(tgt_smpls, np.float32)
        n = smpls.shape[0]

        r_src = smpl_ops.batch_rodrigues(
            jnp.asarray(self.src_info["theta"])[0, 3:6])        # (3, 3)
        r_tgt = smpl_ops.batch_rodrigues(
            jnp.asarray(smpls[:, 3:6]))                         # (N, 3, 3)
        m = jnp.einsum("nab,cb->nac", r_tgt, r_src)             # R_t R_s^T
        rots = jnp.swapaxes(m, 1, 2)                            # row conv.
        p = self.smpl_params
        v_shaped = (jnp.matmul(self.src_info["shape"], p.shapedirs)
                    .reshape(1, -1, 3) + p.v_template)
        j0 = jnp.einsum("nvc,v->nc", v_shaped, p.j_regressor[:, 0])[0]
        trans = j0 - jnp.einsum("c,ncd->nd", j0, rots)

        pad = (-n) % batch
        if pad:
            rots = jnp.concatenate([rots, jnp.repeat(rots[-1:], pad, 0)])
            trans = jnp.concatenate([trans, jnp.repeat(trans[-1:], pad, 0)])
        outs = [self._view_jit(self.src_info, rots[i:i + batch],
                               trans[i:i + batch])
                for i in range(0, n + pad, batch)]
        out = jnp.concatenate(outs, 0) if len(outs) > 1 else outs[0]
        return out[:n]

    def view_sweep(self, yaws, t=(0.0, 0.0, 0.0)):
        """Batched yaw sweep (run_view.py:58-74): all angles in one call."""
        rots = jnp.stack([euler_to_matrix(jnp.asarray([0.0, y, 0.0]))
                          for y in yaws])
        trans = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (len(yaws), 3))
        return self._view_jit(self.src_info, rots, trans)
