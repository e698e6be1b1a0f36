"""Swapper + viewer end-to-end smoke tests and checkpoint round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from impersonator_tpu import assets as A
from impersonator_tpu.config import TestConfig
from impersonator_tpu.tasks.swapper import Swapper, swap_smpl_preserve_scale
from impersonator_tpu.tasks.viewer import Viewer
from impersonator_tpu.utils import checkpoint as ckpt

S = 32


def _theta(pose_noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.zeros((85,), np.float32)
    t[0] = 0.9
    if pose_noise:
        t[3:75] = rng.normal(0, pose_noise, 72)
    return t


def test_swapper_end_to_end():
    cfg = TestConfig(image_size=S, repeat_num=2)
    swapper = Swapper(cfg, assets=A.synthetic_assets())
    rng = np.random.default_rng(0)
    src = rng.uniform(-1, 1, (S, S, 3)).astype(np.float32)
    tgt = rng.uniform(-1, 1, (S, S, 3)).astype(np.float32)
    swapper.swap_setup(src, tgt, src_smpl=_theta(), tgt_smpl=_theta(0.02, 1))
    assert swapper.src_info["part"].shape == (1, S, S, 11)
    preds = swapper.swap(target_part="body")
    assert preds.shape == (1, S, S, 3)
    assert np.isfinite(np.asarray(preds)).all()

    preds_all = swapper.swap(target_part="all")
    assert np.isfinite(np.asarray(preds_all)).all()


def test_swap_smpl_preserve_scale():
    src_cam = jnp.asarray([[0.9, 0.1, -0.1]])
    src_shape = jnp.zeros((1, 10))
    tgt = jnp.zeros((1, 85)).at[:, 0].set(1.2).at[:, 1].set(0.5)
    out = swap_smpl_preserve_scale(src_cam, src_shape, tgt)
    assert out.shape == (1, 85)
    np.testing.assert_allclose(float(out[0, 0]), 0.9)
    np.testing.assert_allclose(float(out[0, 1]), 0.9 / 1.2 * 0.5 + 0.1,
                               rtol=1e-5)


def test_viewer_yaw_sweep():
    cfg = TestConfig(image_size=S, repeat_num=2)
    viewer = Viewer(cfg, assets=A.synthetic_assets())
    rng = np.random.default_rng(0)
    src = rng.uniform(-1, 1, (S, S, 3)).astype(np.float32)
    viewer.personalize(src, smpl=_theta())
    preds = viewer.view_sweep([0.0, 90.0, 180.0, 270.0])
    assert preds.shape == (4, S, S, 3)
    assert np.isfinite(np.asarray(preds)).all()
    # yaw 0 and 180 must differ (the body isn't rotation-invariant)
    assert np.abs(np.asarray(preds[0]) - np.asarray(preds[2])).mean() > 1e-4


def test_checkpoint_roundtrip(tmp_path):
    from impersonator_tpu.config import TrainConfig
    from impersonator_tpu.tasks import trainer as T
    cfg = TrainConfig(image_size=S, repeat_num=1, batch_size=1,
                      use_vgg=False, use_style=False, use_face=False, d_layers=2)
    trainer = T.build_trainer(cfg, A.synthetic_assets())
    state = trainer.init_state()
    expr = str(tmp_path)
    ckpt.save_train_state(state, expr, 3)
    assert ckpt.latest_epoch(expr) == 3
    restored = ckpt.load_train_state(state, expr, 3)
    a = jax.tree_util.tree_leaves(state.g_params)
    b = jax.tree_util.tree_leaves(restored.g_params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_front_warp_imitation():
    """front_warp pastes the warped source face over the head region
    (imitator.warp_front, imitator.py:338-342)."""
    from impersonator_tpu.config import TestConfig
    from impersonator_tpu.tasks.imitator import Imitator
    cfg = TestConfig(image_size=S, repeat_num=1, front_warp=True)
    imit = Imitator(cfg, assets=A.synthetic_assets())
    rng = np.random.default_rng(0)
    imit.personalize(rng.uniform(-1, 1, (S, S, 3)).astype(np.float32),
                     src_smpl=_theta())
    preds = imit.inference_by_smpls(np.stack([_theta(0.02, 1)]), batch=1)
    assert preds.shape == (1, S, S, 3)
    assert np.isfinite(np.asarray(preds)).all()


def test_viewer_post_personalize():
    cfg = TestConfig(image_size=S, repeat_num=1)
    viewer = Viewer(cfg, assets=A.synthetic_assets())
    rng = np.random.default_rng(0)
    viewer.personalize(rng.uniform(-1, 1, (S, S, 3)).astype(np.float32),
                       smpl=_theta())
    metrics = viewer.post_personalize(epochs=1)
    assert np.isfinite(float(metrics["total"]))
    preds = viewer.view_sweep([0.0, 120.0])
    assert preds.shape == (2, S, S, 3)
