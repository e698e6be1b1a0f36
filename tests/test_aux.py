"""Auxiliary subsystem tests: metrics, data loader, aug trainer,
post-tune, animator, config CLI parity."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from impersonator_tpu import assets as A
from impersonator_tpu.config import TestConfig, TrainConfig, from_args
from impersonator_tpu.data import DataLoader, SyntheticPairDataset
from impersonator_tpu.metrics import psnr, ssim

S = 32


def test_ssim_psnr_identity(rng):
    img = jnp.asarray(rng.uniform(-1, 1, (2, 48, 48, 3)), jnp.float32)
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
    assert float(psnr(img, img)) > 100.0
    noisy = img + 0.2
    assert float(ssim(img, noisy)) < 1.0
    assert float(psnr(img, noisy)) < 25.0


def test_ssim_matches_skimage(rng):
    skimage = pytest.importorskip("skimage")
    from skimage.metrics import structural_similarity
    a = rng.uniform(-1, 1, (40, 40)).astype(np.float32)
    b = (a + rng.normal(0, 0.1, a.shape)).astype(np.float32).clip(-1, 1)
    ours = float(ssim(jnp.asarray(a)[None, :, :, None],
                      jnp.asarray(b)[None, :, :, None]))
    theirs = structural_similarity(a, b, data_range=2.0, gaussian_weights=True,
                                   sigma=1.5, use_sample_covariance=False)
    assert ours == pytest.approx(theirs, abs=2e-3)


def test_data_loader_batches_and_order():
    ds = SyntheticPairDataset(image_size=16, length=12)
    loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b["images"].shape == (4, 2, 16, 16, 3)
        assert b["smpls"].shape == (4, 2, 85)
    # deterministic across epochs? shuffle reseeds per epoch; just re-iterate
    batches2 = list(loader)
    assert len(batches2) == 3


def test_aug_trainer_single_step():
    from impersonator_tpu.tasks import trainer_aug as TA
    cfg = TrainConfig(image_size=S, repeat_num=1, batch_size=2,
                      use_vgg=False, use_style=False, use_face=False,
                      d_layers=2)
    trainer = TA.build_aug_trainer(cfg, A.synthetic_assets())
    state = TA.init_aug_state(trainer)
    step = jax.jit(TA.make_aug_train_step(trainer, train_d=True))

    rng = np.random.default_rng(0)
    thetas = np.zeros((2, 2, 85), np.float32)
    thetas[..., 0] = 0.9
    thetas[..., 3:75] = rng.normal(0, 0.03, (2, 2, 72))
    batch = {
        "images": jnp.asarray(rng.uniform(-1, 1, (2, 2, S, S, 3)), jnp.float32),
        "smpls": jnp.asarray(thetas),
        "bg": jnp.asarray(rng.uniform(-1, 1, (2, S, S, 3)), jnp.float32),
    }
    state, metrics = step(state, batch)
    for key in ("g_total", "g_rec", "g_adv", "d_loss"):
        assert np.isfinite(float(metrics[key])), (key, float(metrics[key]))


def test_post_tune_improves_cycle_loss():
    from impersonator_tpu.tasks import post_tune as PT
    from impersonator_tpu.tasks.imitator import Imitator
    cfg = TestConfig(image_size=S, repeat_num=1)
    imit = Imitator(cfg, assets=A.synthetic_assets())
    rng = np.random.default_rng(0)
    theta = np.zeros(85, np.float32)
    theta[0] = 0.9
    imit.personalize(rng.uniform(-1, 1, (S, S, 3)).astype(np.float32),
                     src_smpl=theta)
    priors = PT.default_prior_poses(imit.src_info["theta"], n=2, scale=0.05)
    m1 = PT.adaptive_personalize(imit, priors, epochs=1, use_face=False)
    m5 = PT.adaptive_personalize(imit, priors, epochs=4, use_face=False)
    assert np.isfinite(float(m5["total"]))
    assert float(m5["total"]) < float(m1["total"]) * 1.5  # sane, not diverging


def test_animator_freeze_parts():
    from impersonator_tpu.tasks.animator import Animator
    cfg = TestConfig(image_size=S, repeat_num=1)
    anim = Animator(cfg, assets=A.synthetic_assets())
    rng = np.random.default_rng(0)
    theta = np.zeros(85, np.float32)
    theta[0] = 0.9
    anim.personalize(rng.uniform(-1, 1, (S, S, 3)).astype(np.float32),
                     src_smpl=theta)
    seq = np.tile(theta, (3, 1))
    seq[:, 3:75] += rng.normal(0, 0.05, (3, 72)).astype(np.float32)
    out = anim.animate(seq, batch=3, freeze_parts=("01_head",))
    assert out.shape == (3, S, S, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_config_cli_roundtrip():
    cfg = from_args(TestConfig, ["--image_size", "128", "--front_warp",
                                 "--cam_strategy", "copy"])
    assert cfg.image_size == 128
    assert cfg.front_warp is True
    assert cfg.cam_strategy == "copy"
    vp = TestConfig(view_params="R=10,20,30/t=0,0,0.5").parse_view_params()
    assert vp["R"] == [10.0, 20.0, 30.0]
    assert vp["t"] == [0.0, 0.0, 0.5]


def _fake_video(root, vid, n, images_folder="images_HD"):
    d = root / images_folder / vid
    d.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        (d / f"{i:03d}.jpg").write_bytes(b"x")


def test_protocol_loader(tmp_path):
    """Both protocol schemas resolve to fully-pathed EvalUnits
    (reference schema: thirdparty/his_evaluators/protocols/iPER.py)."""
    import json
    from impersonator_tpu.metrics.protocols import build_protocol

    _fake_video(tmp_path, "001/1/1", 20)
    _fake_video(tmp_path, "002/1/2", 20)

    # legacy list form (end-exclusive self range)
    proto = [{
        "videoID": "001/1/1",
        "source": {"1": [0]},
        "self_imitation": {"begin": 0, "end": 10},
        "cross_imitation": {"videoID": "002/1/2", "begin": 5, "end": 15},
    }]
    p = tmp_path / "proto.json"
    p.write_text(json.dumps(proto))
    protocol = build_protocol("iPER", str(tmp_path), str(p))
    assert len(protocol) == 1
    v = protocol.videos[0]
    assert len(v.src_paths) == 1 and v.src_paths[0].endswith("000.jpg")
    assert len(v.si_paths) == 10
    assert v.ci_video == "002/1/2"
    assert len(v.ci_paths) == 11      # end-inclusive take

    # reference dict schema: multi-view s_n, range, flag
    ref = {"val": {"001/1/1": {
        "s_n": {"1": ["000.jpg"], "2": ["000.jpg", "008.jpg"]},
        "self_imitation": {"target": "001/1/1", "range": [0, 9]},
        "cross_imitation": {"target": "002/1/2", "range": [5, 15]},
        "flag": [0, 19],
    }}}
    p2 = tmp_path / "ref.json"
    p2.write_text(json.dumps(ref))
    protocol = build_protocol("iPER", str(tmp_path), str(p2))
    protocol.setup(num_sources=2)
    v = protocol.videos[0]
    assert [os.path.basename(s) for s in v.src_paths] == ["000.jpg",
                                                          "008.jpg"]
    assert len(v.si_paths) == 10
    assert len(v.ci_paths) == 11
    assert len(v.flag_paths) == 20


def test_native_loader_matches_cv2(tmp_path, rng):
    cv2 = pytest.importorskip("cv2")
    from impersonator_tpu.data import native
    if not native.available():
        pytest.skip("native loader not built")
    img = (rng.uniform(0, 255, (100, 80, 3))).astype(np.uint8)
    p = str(tmp_path / "img.png")
    cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))

    ours = native.decode_resize(p, 48)
    ref = cv2.resize(img.astype(np.float32) / 255.0, (48, 48)) * 2 - 1
    np.testing.assert_allclose(ours, ref, atol=3e-5)

    loader = native.NativeImageLoader(48, threads=2)
    for i in range(5):
        loader.submit(p, i)
    tags = [loader.next()[1] for _ in range(5)]
    assert tags == list(range(5))
    loader.close()

    # u8 mode: same bilinear result rounded to uint8 (H2D ships 4x
    # fewer bytes; normalize-on-device is x/127.5 - 1)
    ours8 = native.decode_resize_u8(p, 48)
    assert ours8.dtype == np.uint8
    np.testing.assert_allclose(ours8.astype(np.float32) / 127.5 - 1.0,
                               ref, atol=1.01 / 127.5)
    loader8 = native.NativeImageLoader(48, threads=2, u8=True)
    loader8.submit(p, 7)
    frame8, tag8 = loader8.next()
    assert frame8.dtype == np.uint8 and tag8 == 7
    np.testing.assert_array_equal(frame8, ours8)
    loader8.close()


def test_fuse_grid_montage(rng, tmp_path):
    """Grid fusion layout parity with the reference demo-video composer
    (utils/video.py:53-96): row-major tiles, shorter streams freeze
    their last frame, float streams quantize like save paths do."""
    from impersonator_tpu.utils import video as V

    h, w, n = 8, 6, 5
    streams = [rng.integers(0, 255, (n, h, w, 3)).astype(np.uint8)
               for _ in range(3)]
    streams.append(rng.uniform(-1, 1, (2, h, w, 3)).astype(np.float32))
    grid = V.fuse_grid(streams, rows=2, cols=2)
    assert grid.shape == (n, 2 * h, 2 * w, 3) and grid.dtype == np.uint8
    # row-major placement
    np.testing.assert_array_equal(grid[:, :h, :w], streams[0])
    np.testing.assert_array_equal(grid[:, :h, w:], streams[1])
    np.testing.assert_array_equal(grid[:, h:, :w], streams[2])
    # short stream froze its last frame from t=2 on
    np.testing.assert_array_equal(grid[3, h:, w:], grid[2, h:, w:])
    np.testing.assert_array_equal(
        grid[1, h:, w:], V._to_u8(streams[3][1]))
    with pytest.raises(AssertionError):
        V.fuse_grid(streams[:3], rows=2, cols=2)


def test_fuse_montage_mp4(rng, tmp_path):
    """[src | ref | pred] montage encodes an mp4 (needs ffmpeg)."""
    from impersonator_tpu.utils import video as V

    h, w, n = 8, 6, 5
    ref = rng.integers(0, 255, (n, h, w, 3)).astype(np.uint8)
    pred = rng.uniform(-1, 1, (n, h, w, 3)).astype(np.float32)
    src = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    try:
        out = V.fuse_source_reference_output(
            src, ref, pred, str(tmp_path / "m.mp4"))
    except RuntimeError:
        pytest.skip("ffmpeg not available on host")
    assert os.path.getsize(out) > 0


def test_frechet_distance_properties(rng):
    from impersonator_tpu.metrics import frechet_distance, gaussian_stats
    a = rng.normal(0, 1, (500, 8))
    mu, sigma = gaussian_stats(a)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-4)
    b = rng.normal(3, 1, (500, 8))
    mu2, sigma2 = gaussian_stats(b)
    d = frechet_distance(mu, sigma, mu2, sigma2)
    assert d > 50  # 8 dims * 9 mean-shift

def test_inception_score_bounds(rng):
    from impersonator_tpu.metrics import inception_score
    # one-hot diverse predictions -> high IS; uniform -> IS == 1
    onehot = np.eye(10)[rng.integers(0, 10, 200)]
    assert inception_score(onehot, splits=4) > 5.0
    uniform = np.ones((200, 10)) / 10
    assert inception_score(uniform, splits=4) == pytest.approx(1.0, abs=1e-5)


def test_paired_runner_frame_weighted_mean():
    """Batches of unequal size must combine frame-weighted, not
    batch-weighted (VERDICT r1 weak #4)."""
    import numpy as np
    from impersonator_tpu.metrics import PairedMetricRunner, psnr

    r = np.random.default_rng(0)
    a1 = r.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32)
    a2 = r.uniform(-1, 1, (3, 16, 16, 3)).astype(np.float32)
    b1 = np.clip(a1 + 0.1, -1, 1).astype(np.float32)
    b2 = np.clip(a2 + 0.3, -1, 1).astype(np.float32)

    runner = PairedMetricRunner(metric_types=("psnr",))
    runner.update(a1, b1)
    runner.update(a2, b2)
    got = runner.evaluate()["psnr"]
    want = (float(psnr(a1, b1)) * 1 + float(psnr(a2, b2)) * 3) / 4
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("mode", ["concat", "texture_warping",
                                  "feature_warping"])
def test_baseline_trainer_single_step(mode, assets):
    """The three paper ablations (reference models/baseline.py) must run
    a full jitted G+D step with finite losses (VERDICT r1 weak #8)."""
    from impersonator_tpu.tasks import trainer_baseline as TB

    cfg = TrainConfig(model=mode, image_size=S, repeat_num=1, batch_size=2,
                      use_vgg=False, use_face=False, d_layers=2)
    trainer = TB.build_baseline_trainer(cfg, assets)
    state = trainer.init_state()
    step = jax.jit(TB.make_train_step(trainer, train_d=True))

    rng = np.random.default_rng(3)
    thetas = np.zeros((2, 2, 85), np.float32)
    thetas[..., 0] = 0.9
    thetas[..., 3:75] = rng.normal(0, 0.03, (2, 2, 72))
    batch = {
        "images": jnp.asarray(rng.uniform(-1, 1, (2, 2, S, S, 3)),
                              jnp.float32),
        "smpls": jnp.asarray(thetas),
    }
    state, metrics = step(state, batch)
    for key in ("g_total", "g_rec", "g_adv", "g_mask", "d_total"):
        assert np.isfinite(float(metrics[key])), (key, metrics)


def test_render_textured_roundtrip(assets):
    """extract_texture -> render_textured in the SAME pose must
    approximately reproduce the source inside the silhouette (the
    texture-warping baseline's identity case)."""
    from impersonator_tpu.ops import smpl as smpl_ops
    from impersonator_tpu.tasks.renderer import SMPLRenderer

    r = SMPLRenderer.create(assets, image_size=64, tex_size=3)
    params = smpl_ops.SMPLParams.from_assets(assets)
    rng = np.random.default_rng(7)
    theta = np.zeros((1, 85), np.float32)
    theta[:, 0] = 0.9
    info = smpl_ops.get_details(params, jnp.asarray(theta),
                                assets.parents)
    # smooth source image so per-face texel sampling is well-resolved
    yy, xx = np.mgrid[0:64, 0:64] / 63.0
    src = np.stack([xx, yy, 0.5 * (xx + yy)], -1).astype(np.float32) * 2 - 1
    src = jnp.asarray(src)[None]

    _, fim, wim = r.render_fim_wim(info["cam"], info["verts"])
    tex = r.extract_texture(src, info["cam"], info["verts"])
    out = np.asarray(r.render_textured(fim, wim, tex))

    mask = np.asarray(fim[0]) >= 0
    assert mask.sum() > 100
    err = np.abs(out[0][mask] - np.asarray(src[0])[mask])
    assert np.median(err) < 0.08, float(np.median(err))
    # background stays zero
    assert np.abs(out[0][~mask]).max() == 0.0


def test_lighting_and_render_rgb(assets):
    """Ambient+directional lighting semantics (neural_renderer/
    lighting.py:6-58): pure ambient scales texels uniformly; adding a
    directional term only ever brightens (ReLU Lambert); render_rgb
    composes extract->light->rasterize and masks the background."""
    from impersonator_tpu.ops import smpl as smpl_ops
    from impersonator_tpu.tasks import renderer as R

    r = R.SMPLRenderer.create(assets, image_size=64, tex_size=3)
    params = smpl_ops.SMPLParams.from_assets(assets)
    theta = np.zeros((1, 85), np.float32)
    theta[:, 0] = 0.9
    info = smpl_ops.get_details(params, jnp.asarray(theta), assets.parents)
    img = jnp.ones((1, 64, 64, 3)) * 0.5

    f2verts, fim, wim = r.render_fim_wim(info["cam"], info["verts"])
    tex = r.extract_texture(img, info["cam"], info["verts"])

    amb = R.lighting(f2verts, tex, intensity_ambient=0.5,
                     intensity_directional=0.0)
    np.testing.assert_allclose(np.asarray(amb), np.asarray(tex) * 0.5,
                               atol=1e-6)
    lit = R.lighting(f2verts, tex, intensity_ambient=0.5,
                     intensity_directional=0.5)
    d = np.asarray(lit) - np.asarray(amb)
    assert d.min() >= -1e-6            # ReLU Lambert never darkens
    assert d.max() > 0.01              # some faces face the light

    rgb, sil = r.render_rgb(info["cam"], info["verts"], img,
                            intensity_ambient=0.5,
                            intensity_directional=0.5)
    rgb, sil = np.asarray(rgb), np.asarray(sil)
    mask = np.asarray(fim[0]) >= 0
    assert sil.shape == (1, 64, 64)
    np.testing.assert_array_equal(sil[0] > 0.5, mask)
    assert np.abs(rgb[0][~mask]).max() == 0.0
    assert rgb[0][mask].mean() > 0.1   # lit texels are visible


def test_render_depth(assets):
    """Depth map semantics (CUDA kernel's 1/zp = sum w_k/z_k,
    rasterize_cuda_kernel.cu:154-157; the reference facade stubs
    render_depth out, nmr.py:280-293): background == far, covered pixels
    lie within the face-vertex z range, and the covered set matches fim."""
    from impersonator_tpu.ops import smpl as smpl_ops
    from impersonator_tpu.tasks import renderer as R

    r = R.SMPLRenderer.create(assets, image_size=64)
    params = smpl_ops.SMPLParams.from_assets(assets)
    theta = np.zeros((1, 85), np.float32)
    theta[:, 0] = 0.9
    info = smpl_ops.get_details(params, jnp.asarray(theta), assets.parents)
    f2verts, fim, wim = r.render_fim_wim(info["cam"], info["verts"])

    depth = np.asarray(r.render_depth(info["cam"], info["verts"]))
    mask = np.asarray(fim[0]) >= 0
    assert depth.shape == (1, 64, 64)
    assert np.all(depth[0][~mask] == r.far)
    zv = np.asarray(f2verts[..., 2])
    assert depth[0][mask].min() >= zv.min() - 1e-4
    assert depth[0][mask].max() <= zv.max() + 1e-4
    # the person is in front of the far plane
    assert depth[0][mask].max() < r.far


def test_projection_helpers(rng):
    """look / perspective / get_points_from_angles parity with the
    neural_renderer formulas (look.py:6-57, perspective.py:6-22,
    get_points_from_angles.py:6-26)."""
    from impersonator_tpu.ops import projection as P

    v = jnp.asarray(rng.uniform(-1, 1, (2, 5, 3)), jnp.float32)

    # look with direction == (at - eye) equals look_at for any target
    eye = (0.3, -0.2, -2.0)
    at = (0.1, 0.4, 0.5)
    direction = tuple(a - e for a, e in zip(at, eye))
    np.testing.assert_allclose(
        np.asarray(P.look(v, eye, direction)),
        np.asarray(P.look_at(v, eye, at)), atol=1e-5)

    # perspective divide: x,y scaled by 1/(z tan(angle)); z preserved
    vp = jnp.asarray(rng.uniform(0.5, 2.0, (1, 4, 3)), jnp.float32)
    out = np.asarray(P.perspective(vp, angle=30.0))
    w = np.tan(np.radians(30.0))
    np.testing.assert_allclose(out[..., 0],
                               np.asarray(vp[..., 0] / vp[..., 2]) / w,
                               atol=1e-5)
    np.testing.assert_allclose(out[..., 2], np.asarray(vp[..., 2]))

    # spherical eye: elevation 0, azimuth 0 -> (0, 0, -d); elevation 90
    # -> (0, d, 0)
    np.testing.assert_allclose(
        np.asarray(P.get_points_from_angles(2.0, 0.0, 0.0)),
        [0.0, 0.0, -2.0], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(P.get_points_from_angles(2.0, 90.0, 0.0)),
        [0.0, 2.0, 0.0], atol=1e-6)
    # batched arrays broadcast to (N, 3)
    pts = P.get_points_from_angles(jnp.ones(3) * 2.0, jnp.zeros(3),
                                   jnp.asarray([0.0, 90.0, 180.0]))
    assert pts.shape == (3, 3)
    np.testing.assert_allclose(np.asarray(pts[1]), [2.0, 0.0, 0.0],
                               atol=1e-6)


def test_save_obj_with_texture_atlas(tmp_path, assets):
    """OBJ/MTL/PNG export of an extracted texture (reference
    neural_renderer/save_obj.py create_texture_image path)."""
    import jax.numpy as jnp
    from impersonator_tpu.ops import smpl as smpl_ops
    from impersonator_tpu.tasks.renderer import SMPLRenderer
    from impersonator_tpu.utils import mesh_io

    r = SMPLRenderer.create(assets, image_size=32, tex_size=3)
    params = smpl_ops.SMPLParams.from_assets(assets)
    theta = np.zeros((1, 85), np.float32)
    theta[:, 0] = 0.9
    info = smpl_ops.get_details(params, jnp.asarray(theta), assets.parents)
    img = jnp.ones((1, 32, 32, 3)) * 0.25
    tex = np.asarray(r.extract_texture(img, info["cam"], info["verts"]))[0]

    out = str(tmp_path / "body.obj")
    mesh_io.save_obj(out, np.asarray(info["verts"][0]),
                     np.asarray(params.faces), textures=tex,
                     texture_size_out=4)
    assert os.path.exists(out)
    assert os.path.exists(str(tmp_path / "body.mtl"))
    assert os.path.exists(str(tmp_path / "body.png"))
    txt = open(out).read()
    assert "vt " in txt and "usemtl" in txt and txt.count("\nf ") == \
        params.faces.shape[0]

    atlas, uv = mesh_io.create_texture_atlas(tex, texture_size_out=4)
    # constant-color source -> constant atlas tiles where faces exist
    filled = np.abs(atlas - 0.25) < 1e-4
    assert filled.mean() > 0.5
    assert uv.shape == (params.faces.shape[0], 3, 2)
    assert uv.min() >= 0 and uv.max() <= 1


def test_draw_skeleton_and_prior_pose_tool(tmp_path, rng):
    """Skeleton overlay (reference visdom plot parity) + the prior-pose
    bank tool round-trips through load_prior_poses."""
    import cv2
    from impersonator_tpu.utils.visualizer import draw_skeleton

    img = rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32)
    kps = rng.uniform(-0.8, 0.8, (19, 2)).astype(np.float32)
    out = draw_skeleton(img, kps)
    assert out.shape == img.shape
    assert np.abs(out - img).max() > 0.1          # something was drawn
    assert out.min() >= -1.0 and out.max() <= 1.0

    # prior-pose tool: images -> HMR thetas pkl -> load_prior_poses
    img_dir = tmp_path / "priors"
    img_dir.mkdir()
    for i in range(3):
        cv2.imwrite(str(img_dir / f"{i}.jpg"),
                    rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8))
    import sys
    sys.path.insert(0, "tools")
    from tools import make_prior_poses
    out_pkl = str(tmp_path / "pri.pkl")
    make_prior_poses.main(["--img_dir", str(img_dir), "--out", out_pkl,
                           "--itv", "1", "--batch", "2"])
    from impersonator_tpu.tasks.post_tune import load_prior_poses
    poses = load_prior_poses(out_pkl)
    assert poses.shape == (3, 85)
    assert np.isfinite(np.asarray(poses)).all()


def test_place_fashion_composite_datasets(tmp_path, rng):
    """Places2 backgrounds + DeepFashion pairs + the composite streams
    (reference data/place_dataset.py, fashion_dataset.py,
    imper_fashion_place_dataset.py) on fabricated trees."""
    import cv2
    import pickle
    from impersonator_tpu.data import (DataLoader, FashionPairDataset,
                                       ImPerDataset, ImPerFashionPlaceDataset,
                                       ImPerPlaceDataset, PlaceDataset)

    # places tree (nested dirs)
    place_dir = tmp_path / "places" / "a"
    place_dir.mkdir(parents=True)
    for i in range(3):
        cv2.imwrite(str(place_dir / f"{i}.jpg"),
                    rng.uniform(0, 255, (80, 90, 3)).astype(np.uint8))
    place = PlaceDataset(str(tmp_path / "places"), image_size=S)
    assert len(place) == 3
    bg = place[0]["bg"]
    assert bg.shape == (S, S, 3) and np.abs(bg).max() <= 1.0

    # fashion pairs: two images + per-image smpl pkls + pairs.txt
    fdir = tmp_path / "fashion"
    fdir.mkdir()
    for name in ("x", "y"):
        cv2.imwrite(str(fdir / f"{name}.jpg"),
                    rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8))
        with open(fdir / f"{name}_smpl.pkl", "wb") as f:
            pickle.dump({"cams": np.array([0.9, 0, 0], np.float32),
                         "pose": rng.normal(0, 0.03, 72).astype(np.float32),
                         "shape": np.zeros(10, np.float32)}, f)
    (fdir / "pairs.txt").write_text("x.jpg y.jpg\n")
    fashion = FashionPairDataset(str(fdir), image_size=S)
    assert len(fashion) == 1
    s0 = fashion[0]
    assert s0["images"].shape == (2, S, S, 3)
    assert s0["smpls"].shape == (2, 85)

    # composites: fashion+place pooled stream through the DataLoader
    # empty first source (duck-typed; ImPerDataset requires a real tree)
    imper = FashionPairDataset(str(tmp_path), "absent_pairs.txt",
                               image_size=S)
    pooled = ImPerFashionPlaceDataset(imper, fashion, place)
    assert len(pooled) == 1
    sample = pooled[0]
    assert set(sample) == {"images", "smpls", "bg"}

    loader = DataLoader(pooled, batch_size=1, num_workers=1)
    batch = next(iter(loader))
    assert batch["images"].shape == (1, 2, S, S, 3)
    assert batch["bg"].shape == (1, S, S, 3)

    paired = ImPerPlaceDataset(fashion, place)  # any pair-source works
    assert len(paired) == 1 and "bg" in paired[0]


def test_visual_iper_tool(tmp_path, rng):
    """Dataset-QA debug renders (reference tools/visual_iPER.py): frames
    + pose_shape.pkl -> triptych PNGs with the body painted white."""
    import cv2
    import pickle
    import sys

    fdir = tmp_path / "frames"
    fdir.mkdir()
    n = 3
    for i in range(n):
        cv2.imwrite(str(fdir / f"frame_{i:08d}.png"),
                    rng.uniform(0, 255, (48, 48, 3)).astype(np.uint8))
    pkl = tmp_path / "pose_shape.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({
            "cams": np.tile(np.array([[0.9, 0, 0]], np.float32), (n, 1)),
            "pose": rng.normal(0, 0.05, (n, 72)).astype(np.float32),
            "shape": np.zeros((n, 10), np.float32)}, f)

    sys.path.insert(0, "tools")
    from tools import visual_iper
    out = tmp_path / "qa"
    visual_iper.main(["--frames_dir", str(fdir), "--smpl_pkl", str(pkl),
                      "--out_dir", str(out), "--image_size", str(S),
                      "--batch", "2"])
    pngs = sorted(out.glob("qa_*.png"))
    assert len(pngs) == n
    trip = cv2.imread(str(pngs[0]))
    assert trip.shape == (S, 3 * S, 3)       # original | render | masked
    mid = trip[:, S:2 * S]
    # debug texture paints covered pixels white on a black background
    assert (mid.max(axis=-1) > 200).any() and (mid.min(axis=-1) < 30).any()


def test_async_checkpointer(tmp_path, rng):
    """Background saves land atomically, supersede same-key queued
    snapshots, round-trip through load_train_state, and surface writer
    errors on wait()."""
    import collections
    import jax.numpy as jnp
    import pytest
    from impersonator_tpu.utils import checkpoint as ckpt

    TS = collections.namedtuple("TS", "g_params d_params g_opt d_opt")

    def mk(v):
        a = jnp.full((4, 4), float(v), jnp.float32)
        return TS({"w": a}, {"w": a + 1}, {"m": a * 2}, {"m": a * 3})

    saver = ckpt.AsyncCheckpointer()
    saver.submit(mk(1), str(tmp_path), 1)
    saver.submit(mk(2), str(tmp_path), "latest")
    saver.submit(mk(3), str(tmp_path), "latest")   # supersedes v=2
    saver.wait()

    tpl = mk(0)
    got1 = ckpt.load_train_state(tpl, str(tmp_path), 1)
    assert float(got1.g_params["w"][0, 0]) == 1.0
    gotl = ckpt.load_train_state(tpl, str(tmp_path), "latest")
    assert float(gotl.g_params["w"][0, 0]) == 3.0
    assert float(gotl.d_opt["m"][0, 0]) == 9.0
    # no stray .tmp files (atomic rename)
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]

    # writer errors surface on the NEXT wait, not silently
    saver.submit(mk(4), str(tmp_path / "nodir" / "x\0bad"), 1)
    with pytest.raises(Exception):
        saver.wait()
    saver.close()


def test_aug_trainer_bf16_and_remat_match_fp32():
    """The aug step honors --train_dtype and --remat like the base
    trainer: bf16 agrees within rounding, remat agrees exactly."""
    import jax
    from impersonator_tpu.tasks import trainer_aug as TA

    rng = np.random.default_rng(5)
    thetas = np.zeros((2, 2, 85), np.float32)
    thetas[..., 0] = 0.9
    thetas[..., 3:75] = rng.normal(0, 0.03, (2, 2, 72))
    batch = {
        "images": jnp.asarray(rng.uniform(-1, 1, (2, 2, S, S, 3)),
                              jnp.float32),
        "smpls": jnp.asarray(thetas),
        "bg": jnp.asarray(rng.uniform(-1, 1, (2, S, S, 3)), jnp.float32),
    }
    totals = {}
    for name, kw in [("fp32", {}), ("bf16", {"train_dtype": "bfloat16"}),
                     ("remat", {"remat": True})]:
        cfg = TrainConfig(image_size=S, repeat_num=1, batch_size=2,
                          use_vgg=False, use_style=False, use_face=False,
                          d_layers=2, **kw)
        tr = TA.build_aug_trainer(cfg, A.synthetic_assets())
        state = TA.init_aug_state(tr)
        step = jax.jit(TA.make_aug_train_step(tr, train_d=True))
        _, m = step(state, batch)
        totals[name] = float(m["g_total"])
        assert "g_style" in m          # style term is logged now
    assert totals["remat"] == pytest.approx(totals["fp32"], rel=1e-5)
    assert abs(totals["bf16"] - totals["fp32"]) \
        / max(abs(totals["fp32"]), 1.0) < 5e-2, totals


def test_reid_body_crop_threading():
    """Person boxes given to the runners must route reid embeddings
    through crop_resize_fractional at the net's native patch size
    (reference YOLOv3-cropped reid, metrics.py:784-832) — and full
    frames when absent."""
    import numpy as np
    import jax.numpy as jnp
    from impersonator_tpu.metrics import PairedMetricRunner
    from impersonator_tpu.metrics.unpaired import UnpairedMetricRunner
    from impersonator_tpu.models.losses import crop_resize_fractional

    def reid_fn(imgs):                      # embedding = per-channel mean
        return jnp.mean(imgs, axis=(1, 2))

    r = np.random.default_rng(1)
    preds = r.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    refs = r.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    boxes = np.asarray([[0.1, 0.6, 0.2, 0.9],
                        [0.0, 1.0, 0.0, 1.0]], np.float32)

    runner = UnpairedMetricRunner(reid_fn=reid_fn)
    runner.update(preds, refs, pred_body_bboxes=boxes,
                  ref_body_bboxes=boxes)
    got = runner._acc["reid"]["pred"][0]
    want = np.asarray(reid_fn(crop_resize_fractional(
        jnp.asarray(preds), jnp.asarray(boxes), 256, 128)))
    np.testing.assert_allclose(got, want, atol=1e-6)

    # absent boxes -> full-frame embedding (unchanged default)
    runner2 = UnpairedMetricRunner(reid_fn=reid_fn)
    runner2.update(preds, refs)
    np.testing.assert_allclose(runner2._acc["reid"]["pred"][0],
                               np.asarray(reid_fn(jnp.asarray(preds))),
                               atol=1e-6)

    # paired OS-CS-reid accepts the same boxes without error and the
    # score moves when crops differ from full frames
    p1 = PairedMetricRunner(metric_types=("OS-CS-reid",), reid_fn=reid_fn)
    p1.update(preds, refs, pred_body_bboxes=boxes, ref_body_bboxes=boxes)
    p2 = PairedMetricRunner(metric_types=("OS-CS-reid",), reid_fn=reid_fn)
    p2.update(preds, refs)
    assert np.isfinite(p1.evaluate()["OS-CS-reid"])
    assert p1.evaluate()["OS-CS-reid"] != p2.evaluate()["OS-CS-reid"]


def test_trainconv_tool_losses_fall_and_d_stays_alive():
    """The training-convergence artifact tool (tools/trainconv_artifact)
    at miniature scale: over several epochs of the real fused G/D step
    on a learnable pose->image set, the reconstruction loss must FALL,
    the LR decay must kick in (reference 5+25 schedule semantics,
    impersonator_trainer.py:492-507), and the LSGAN discriminator must
    neither collapse (d_real == d_fake) nor explode."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.trainconv_artifact import run

    art = run(image_size=64, batch_size=2, n_items=4, nepochs_no_decay=1,
              nepochs_decay=2, repeat_num=1, d_layers=2, use_vgg=False,
              out_path=None)
    t = art["trend"]
    assert t["g_rec_last_quarter"] < t["g_rec_first_quarter"], t
    assert t["lr_decay_kicked_in"], t
    # D alive: real/fake scores separated and finite
    assert np.isfinite(t["d_real_last"]) and np.isfinite(t["d_fake_last"])
    assert t["d_real_last"] > t["d_fake_last"], t
    for row in art["per_epoch"]:
        assert np.isfinite(row["g_total"]) and np.isfinite(row["d_loss"])
