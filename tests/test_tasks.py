"""End-to-end task tests: imitator pipeline, trainer step, mesh sharding.

All run at tiny resolution on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from impersonator_tpu import assets as A
from impersonator_tpu.config import TestConfig, TrainConfig
from impersonator_tpu.parallel import make_mesh, shard_batch
from impersonator_tpu.parallel.mesh import replicate_tree
from impersonator_tpu.tasks import imitator as I
from impersonator_tpu.tasks import trainer as T

S = 32


@pytest.fixture(scope="module")
def tiny_imitator():
    cfg = TestConfig(image_size=S, repeat_num=2)
    return I.Imitator(cfg, assets=A.synthetic_assets())


def _theta(pose_noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.zeros((85,), np.float32)
    t[0] = 0.9
    if pose_noise:
        t[3:75] = rng.normal(0, pose_noise, 72)
    return t


def test_imitator_end_to_end(tiny_imitator):
    rng = np.random.default_rng(0)
    src_img = rng.uniform(-1, 1, (S, S, 3)).astype(np.float32)
    info = tiny_imitator.personalize(src_img, src_smpl=_theta())
    assert info["fim"].shape == (1, S, S)
    assert (np.asarray(info["fim"]) >= 0).any(), "body must cover pixels"

    smpls = np.stack([_theta(0.03, i) for i in range(5)])
    preds = tiny_imitator.inference_by_smpls(smpls, batch=4)
    assert preds.shape == (5, S, S, 3)
    assert np.isfinite(np.asarray(preds)).all()
    assert np.abs(np.asarray(preds)).max() <= 1.0 + 1e-5


def test_imitator_device_input_and_async_readback(tiny_imitator, tmp_path):
    """Round-4 throughput-path semantics: (a) inference_by_smpls accepts
    a pre-uploaded device array (single H2D, on-device slicing) and
    matches the numpy-input result; (b) inference_from_paths with
    as_uint8 returns a host uint8 array via per-batch overlapped D2H
    that matches the quantized fp32 path."""
    import cv2

    if tiny_imitator.src_info is None:
        rng0 = np.random.default_rng(0)
        tiny_imitator.personalize(
            rng0.uniform(-1, 1, (S, S, 3)).astype(np.float32),
            src_smpl=_theta())

    smpls = np.stack([_theta(0.03, i) for i in range(5)])
    p_np = np.asarray(tiny_imitator.inference_by_smpls(smpls, batch=4))
    p_dev = np.asarray(tiny_imitator.inference_by_smpls(
        jnp.asarray(smpls), batch=4))
    np.testing.assert_array_equal(p_np, p_dev)

    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"{i}.png")
        cv2.imwrite(p, rng.integers(0, 255, (224, 224, 3), dtype=np.uint8))
        paths.append(p)
    u8 = tiny_imitator.inference_from_paths(paths, batch=2, as_uint8=True)
    assert isinstance(u8, np.ndarray) and u8.dtype == np.uint8
    assert u8.shape == (3, S, S, 3)
    f32 = np.asarray(tiny_imitator.inference_from_paths(paths, batch=2))
    np.testing.assert_array_equal(
        u8, np.clip(np.round((f32 + 1.0) * 127.5), 0, 255).astype(np.uint8))

    # video-native readback: device-packed yuv420p, half the bytes of u8
    # RGB; Y plane must agree with the fp32 predictions' luma
    i420 = tiny_imitator.inference_from_paths(paths, batch=2, as_i420=True)
    assert isinstance(i420, np.ndarray) and i420.dtype == np.uint8
    assert i420.shape == (3, S * 3 // 2, S)
    rgb01 = np.clip((f32 + 1.0) * 0.5, 0, 1)
    want_y = (16.0 + rgb01 @ np.array([65.481, 128.553, 24.966]))
    got_y = i420[:, :S, :].astype(np.float64)
    assert np.abs(got_y - want_y).max() <= 1.0


def test_imitator_mesh_data_parallel():
    """The product multi-chip mode (SURVEY §2.3): Imitator(mesh=...)
    replicates params, shards the frame axis over the 8-device mesh, and
    must match the single-device run bit-for-nearly-bit. Also checks
    batch rounding to a multiple of the mesh size."""
    cfg = TestConfig(image_size=S, repeat_num=2)
    a = A.synthetic_assets()
    solo = I.Imitator(cfg, assets=a)
    dp = I.Imitator(cfg, assets=a, mesh=make_mesh())

    rng = np.random.default_rng(0)
    src_img = rng.uniform(-1, 1, (S, S, 3)).astype(np.float32)
    solo.personalize(src_img, src_smpl=_theta())
    dp.personalize(src_img, src_smpl=_theta())

    smpls = np.stack([_theta(0.03, i) for i in range(8)])
    chunk = dp._put_batch(smpls)
    assert len(chunk.sharding.device_set) == jax.device_count()

    p0 = np.asarray(solo.inference_by_smpls(smpls, batch=8))
    p1 = np.asarray(dp.inference_by_smpls(smpls, batch=8))
    assert p1.shape == p0.shape == (8, S, S, 3)
    np.testing.assert_allclose(p1, p0, atol=2e-4)

    # ragged frame count + batch not divisible by the mesh: rounds up
    p2 = np.asarray(dp.inference_by_smpls(smpls[:5], batch=3))
    assert p2.shape == (5, S, S, 3)
    np.testing.assert_allclose(p2, p0[:5], atol=2e-4)


def test_imitator_cam_strategies(tiny_imitator):
    smpls = np.stack([_theta(0.02, i) for i in range(2)])
    smpls[:, 1] += 0.3  # cam tx offset
    for strategy in ("smooth", "source", "copy"):
        preds = tiny_imitator.inference_by_smpls(smpls, cam_strategy=strategy,
                                                 batch=2)
        assert preds.shape == (2, S, S, 3)


def _tiny_batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    thetas = np.zeros((cfg.batch_size, 2, 85), np.float32)
    thetas[..., 0] = 0.9
    thetas[..., 3:75] = rng.normal(0, 0.03, (cfg.batch_size, 2, 72))
    return {
        "images": jnp.asarray(
            rng.uniform(-1, 1, (cfg.batch_size, 2, S, S, 3)), jnp.float32),
        "smpls": jnp.asarray(thetas),
    }


def test_trainer_single_step():
    cfg = TrainConfig(image_size=S, repeat_num=2, batch_size=2,
                      use_vgg=False, use_style=False, use_face=False,
                      d_layers=2)
    trainer = T.build_trainer(cfg, A.synthetic_assets())
    state = trainer.init_state()
    step = jax.jit(T.make_train_step(trainer, train_d=True))
    state, metrics = step(state, _tiny_batch(cfg))
    for key in ("g_total", "g_rec", "g_adv", "g_mask", "d_loss"):
        assert np.isfinite(float(metrics[key])), key
    assert int(state.step) == 1
    # params actually moved
    leaf0 = jax.tree_util.tree_leaves(state.g_params)[0]
    assert np.isfinite(np.asarray(leaf0)).all()


def test_trainer_remat_step_matches():
    """--remat must change memory behavior only: one step with and
    without rematerialization produces identical losses."""
    import numpy as np
    from impersonator_tpu import assets as A
    from impersonator_tpu.config import TrainConfig
    from impersonator_tpu.tasks import trainer as T

    rng_np = np.random.default_rng(11)
    batch = {
        "images": jnp.asarray(rng_np.uniform(-1, 1, (2, 2, S, S, 3)),
                              jnp.float32),
        "smpls": jnp.asarray(np.concatenate([
            np.full((2, 2, 1), 0.9, np.float32),
            rng_np.normal(0, 0.05, (2, 2, 84)).astype(np.float32)],
            axis=-1)),
    }
    losses = []
    for remat in (False, True):
        cfg = TrainConfig(image_size=S, repeat_num=1, batch_size=2,
                          d_layers=2, use_vgg=False, use_style=False,
                          use_face=False, remat=remat)
        tr = T.build_trainer(cfg, A.synthetic_assets())
        state = tr.init_state()
        step = jax.jit(T.make_train_step(tr, train_d=True))
        _, metrics = step(state, batch)
        losses.append(float(metrics["g_total"]))
    assert losses[0] == pytest.approx(losses[1], rel=1e-5), losses


def test_trainer_bf16_step_matches_fp32():
    """--train_dtype bfloat16 is a precision policy, not a semantics
    change: one mixed-precision step agrees with the fp32 step to within
    bf16 rounding on every loss term (VERDICT r2 next-step #3 guard)."""
    import numpy as np
    from impersonator_tpu import assets as A
    from impersonator_tpu.config import TrainConfig
    from impersonator_tpu.tasks import trainer as T

    rng_np = np.random.default_rng(13)
    batch = {
        "images": jnp.asarray(rng_np.uniform(-1, 1, (2, 2, S, S, 3)),
                              jnp.float32),
        "smpls": jnp.asarray(np.concatenate([
            np.full((2, 2, 1), 0.9, np.float32),
            rng_np.normal(0, 0.05, (2, 2, 84)).astype(np.float32)],
            axis=-1)),
    }
    metrics_by_dtype = {}
    for dtype in ("float32", "bfloat16"):
        cfg = TrainConfig(image_size=S, repeat_num=1, batch_size=2,
                          d_layers=2, use_vgg=False, use_style=False,
                          use_face=False, train_dtype=dtype)
        tr = T.build_trainer(cfg, A.synthetic_assets())
        state = tr.init_state()
        step = jax.jit(T.make_train_step(tr, train_d=True))
        _, metrics = step(state, batch)
        metrics_by_dtype[dtype] = {k: float(v) for k, v in metrics.items()}
    for key in ("g_total", "g_rec", "g_adv", "g_mask", "d_loss"):
        a = metrics_by_dtype["float32"][key]
        b = metrics_by_dtype["bfloat16"][key]
        assert abs(a - b) / max(abs(a), 1.0) < 5e-2, (key, a, b)


def test_trainer_loss_decreases_on_repeated_batch():
    cfg = TrainConfig(image_size=S, repeat_num=1, batch_size=2,
                      use_vgg=False, use_style=False, use_face=False,
                      d_layers=2, lambda_D_prob=0.0)  # pure reconstruction objective
    trainer = T.build_trainer(cfg, A.synthetic_assets())
    state = trainer.init_state()
    step = jax.jit(T.make_train_step(trainer, train_d=False))
    batch = _tiny_batch(cfg)
    _, m0 = step(state, batch)
    for _ in range(8):
        state, m = step(state, batch)
    assert float(m["g_rec"]) < float(m0["g_rec"])


def test_train_step_on_8_device_mesh():
    """Full training step sharded over the virtual 8-CPU mesh: batch on
    the data axis, params replicated, grads all-reduced by XLA."""
    n = jax.device_count()
    assert n == 8, f"conftest must provide 8 virtual devices, got {n}"
    cfg = TrainConfig(image_size=S, repeat_num=1, batch_size=n,
                      use_vgg=False, use_style=False, use_face=False,
                      d_layers=2)
    trainer = T.build_trainer(cfg, A.synthetic_assets())
    mesh = make_mesh((n,), ("data",))
    state = replicate_tree(trainer.init_state(), mesh)
    batch = shard_batch(_tiny_batch(cfg), mesh)
    step = jax.jit(T.make_train_step(trainer, train_d=True))
    with mesh:
        state, metrics = step(state, batch)
    vals = {k: float(v) for k, v in metrics.items()}
    assert np.isfinite(vals["g_total"]), vals

    # the sharded result must match the single-device result up to
    # cross-device reduction-order noise
    trainer2 = T.build_trainer(cfg, A.synthetic_assets())
    state2 = trainer2.init_state()
    step2 = jax.jit(T.make_train_step(trainer2, train_d=True))
    _, metrics2 = step2(state2, _tiny_batch(cfg))
    np.testing.assert_allclose(vals["g_total"],
                               float(metrics2["g_total"]), rtol=5e-2)


def test_graft_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[2].shape[0]
    assert np.isfinite(np.asarray(out)).all()


def test_epoch_lr_matches_reference_schedule():
    """Reference decay: lr -= (lr_G-final)/nepochs_decay at the END of
    each 1-indexed epoch > nepochs_no_decay (train.py:51-53,
    update_learning_rate :492-507) — epochs 0..no_decay run at lr_G."""
    from impersonator_tpu import assets as A
    from impersonator_tpu.config import TrainConfig
    from impersonator_tpu.tasks import trainer as T

    cfg = TrainConfig(image_size=S, repeat_num=1, batch_size=2, d_layers=2,
                      use_vgg=False, use_style=False, use_face=False,
                      nepochs_no_decay=5, nepochs_decay=25,
                      lr_G=2e-4, final_lr=2e-6)
    tr = T.build_trainer(cfg, A.synthetic_assets())
    # reference simulation over 1-indexed epochs
    lr, ref = 2e-4, {}
    for i_epoch in range(1, 31):
        ref[i_epoch - 1] = lr            # LR used DURING this epoch
        if i_epoch > 5:
            lr -= (2e-4 - 2e-6) / 25
    for e in range(30):
        assert np.isclose(tr.epoch_lr(e), ref[e], rtol=1e-9), (
            e, tr.epoch_lr(e), ref[e])
    assert tr.epoch_lr(5) == 2e-4        # first decay epoch still at lr_G
    assert np.isclose(tr.epoch_lr(30), 2e-6)   # post-schedule floor

    # D's schedule is independent (update_learning_rate decays G and D
    # separately): a non-default lr_D must drive BOTH its plateau and
    # its own (lr_D - final)/nepochs_decay slope, and set_lr must write
    # the two optimizers' hyperparams independently
    assert np.isclose(tr.epoch_lr(0, base=1e-4), 1e-4)
    assert np.isclose(tr.epoch_lr(6, base=1e-4),
                      1e-4 - (1e-4 - 2e-6) / 25)
    state = tr.init_state()
    state = tr.set_lr(state, tr.epoch_lr(6), tr.epoch_lr(6, base=1e-4))
    g_lr = float(state.g_opt.hyperparams["learning_rate"])
    d_lr = float(state.d_opt.hyperparams["learning_rate"])
    assert np.isclose(g_lr, 2e-4 - (2e-4 - 2e-6) / 25, rtol=1e-6)
    assert np.isclose(d_lr, 1e-4 - (1e-4 - 2e-6) / 25, rtol=1e-6)


def test_detector_mask_substitution(assets, capsys):
    """--has_detector wiring (reference imitator.py:116-122): a detector
    body mask replaces the cond-morph mask for the BG stream, the
    fallback is loud when MaskRCNN is unavailable, and personalize
    actually calls the detector."""
    import numpy as np
    from impersonator_tpu.config import TestConfig
    from impersonator_tpu.tasks.imitator import Imitator

    cfg = TestConfig(image_size=32, repeat_num=1, has_detector=True)
    imit = Imitator(cfg, assets=assets)
    # no torchvision MaskRCNN weights here -> loud fallback, detector None
    out = capsys.readouterr().out
    assert imit.detector is None and "falling back" in out

    rng = np.random.default_rng(2)
    src = rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    theta = np.zeros((85,), np.float32)
    theta[0] = 0.9
    base = imit.personalize(src, src_smpl=theta)

    calls = []

    class FakeDetector:
        def inference(self, img_hwc):
            calls.append(img_hwc.shape)
            m = np.zeros((1, 32, 32, 1), np.float32)
            m[:, 8:24, 8:24] = 1.0
            return np.array([8, 24, 8, 24]), m

    imit.detector = FakeDetector()
    with_det = imit.personalize(src, src_smpl=theta)
    assert calls == [(32, 32, 3)]
    # the substituted mask changes the BG-inpainting input/output
    assert np.abs(np.asarray(with_det["bg"])
                  - np.asarray(base["bg"])).max() > 1e-6
    # the mask is retained so post-tune's src_info refresh reuses it
    # instead of silently reverting to the cond-morph silhouette
    assert imit._src_body_mask is not None
    refreshed = imit._personalize_jit(
        with_det["img"], with_det["theta"],
        ext_body_mask=imit._src_body_mask)
    assert np.allclose(np.asarray(refreshed["bg"]),
                       np.asarray(with_det["bg"]))


def test_swapper_tune_lr_schedule():
    """Reference swapper post-tune LR: 2e-4 for 25 iters, then per-iter
    linear decay reaching 1e-5 at iter 50 (swapper.py:391-397)."""
    from impersonator_tpu.tasks.post_tune import swapper_tune_lr
    lrs = [swapper_tune_lr(i) for i in range(50)]
    assert all(lr == 2e-4 for lr in lrs[:25])
    assert all(lrs[i + 1] < lrs[i] for i in range(25, 49))
    assert np.isclose(lrs[49], 1e-5, atol=1e-9)


def test_post_tune_improves_cycle_and_affects_inference(assets):
    """adaptive_personalize must (a) reduce the cycle loss over epochs and
    (b) CHANGE subsequent inference outputs — regression for the round-1
    stale-constant bug where jitted cores baked pre-tune weights and
    post-tune silently had no effect on later frames."""
    import numpy as np
    from impersonator_tpu.config import TestConfig
    from impersonator_tpu.tasks.imitator import Imitator
    from impersonator_tpu.tasks.post_tune import (adaptive_personalize,
                                                  default_prior_poses)

    rng = np.random.default_rng(5)
    cfg = TestConfig(image_size=32, repeat_num=1)
    imit = Imitator(cfg, assets=assets)
    src = rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    theta = np.zeros((85,), np.float32)
    theta[0] = 0.9
    imit.personalize(src, src_smpl=theta)

    tgt = np.tile(theta, (2, 1)).astype(np.float32)
    tgt[:, 3:75] += rng.normal(0, 0.1, (2, 72)).astype(np.float32)
    before = np.asarray(imit.inference_by_smpls(tgt, batch=2))

    priors = default_prior_poses(imit.src_info["theta"], n=4)
    m_first = adaptive_personalize(imit, prior_smpls=priors, epochs=1,
                                   batch_size=2)
    m_last = adaptive_personalize(imit, prior_smpls=priors, epochs=4,
                                  batch_size=2)
    assert float(m_last["cyc"]) < float(m_first["cyc"]), (
        m_first, m_last)
    # reference budget: epochs x ceil(n_pairs/batch) minibatch steps
    # (imitator.py:415-433), and the cycle loss improves across >=3
    # logged epoch points
    from impersonator_tpu.tasks.post_tune import post_tune_steps
    assert m_last["n_steps"] == post_tune_steps(4, 4, 2) == 8
    hist = m_last["cyc_history"]
    assert len(hist) == 4
    assert hist[-1] < hist[0] and hist[-1] < hist[1], hist

    after = np.asarray(imit.inference_by_smpls(tgt, batch=2))
    assert np.isfinite(after).all()
    assert np.abs(after - before).max() > 1e-4, (
        "post-tune had no effect on subsequent inference")


def test_merge_pair_batches_mask_layout():
    """pseudo_masks must stay grouped [srcA, srcB, tsfA, tsfB] after the
    two-batch merge — the mask BCE compares against
    concat([fs_mask(A,B), ft_mask(A,B)])."""
    import jax.numpy as jnp
    from impersonator_tpu.tasks.post_tune import merge_pair_batches

    def mk(src_v, tsf_v, other_v):
        return {
            "pseudo_masks": jnp.concatenate(
                [jnp.full((2, 1, 1, 1), float(src_v)),
                 jnp.full((2, 1, 1, 1), float(tsf_v))], 0),
            "T": jnp.full((2, 1, 1, 2), float(other_v)),
        }

    merged = merge_pair_batches(mk(1, 2, 5), mk(3, 4, 6))
    pm = np.asarray(merged["pseudo_masks"]).reshape(-1)
    assert pm.tolist() == [1, 1, 3, 3, 2, 2, 4, 4]   # srcA srcB tsfA tsfB
    t = np.asarray(merged["T"]).reshape(merged["T"].shape[0], -1)[:, 0]
    assert t.tolist() == [5, 5, 6, 6]                # plain concat


def test_post_tune_swapper_runs(assets):
    """Two iterations of the bidirectional swap tune: finite losses and
    refreshed src/tsf feature caches."""
    from impersonator_tpu.config import TestConfig
    from impersonator_tpu.tasks.post_tune import post_tune_swapper
    from impersonator_tpu.tasks.swapper import Swapper

    rng = np.random.default_rng(4)
    cfg = TestConfig(image_size=32, repeat_num=1)
    sw = Swapper(cfg, assets=assets)
    theta = np.zeros((85,), np.float32)
    theta[0] = 0.9
    img_a = rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    img_b = rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    sw.swap_setup(img_a, img_b, src_smpl=theta, tgt_smpl=theta)
    metrics = post_tune_swapper(sw, iters=2)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)


def test_imitate_bf16_warp_close_to_fp32():
    """The bf16 compute path now runs the WHOLE warp (source-image
    gather + bilinear lerp) in bf16, not just the generator (r5 roofline:
    the f32 gather + layout copy were ~8% of the step as pure HBM
    traffic). Drift vs the f32 path must stay at bf16 noise level."""
    import dataclasses
    cfg32 = TestConfig(image_size=S, repeat_num=2,
                       compute_dtype="float32")
    assets = A.synthetic_assets()
    imit32 = I.Imitator(cfg32, assets=assets)
    imitbf = I.Imitator(dataclasses.replace(cfg32,
                                            compute_dtype="bfloat16"),
                        assets=assets, nets=imit32.nets)

    rng = np.random.default_rng(0)
    src_img = rng.uniform(-1, 1, (S, S, 3)).astype(np.float32)
    imit32.personalize(src_img, src_smpl=_theta())
    imitbf.personalize(src_img, src_smpl=_theta())
    smpls = np.stack([_theta(0.03, i) for i in range(2)])
    p32 = np.asarray(imit32.inference_by_smpls(smpls, batch=2))
    pbf = np.asarray(imitbf.inference_by_smpls(smpls, batch=2))
    diff = np.abs(p32 - pbf)
    assert np.mean(diff) < 0.03, np.mean(diff)
    assert np.isfinite(pbf).all()
