"""CLI end-to-end smoke tests: every entry point runs to completion on
synthetic data at tiny sizes (the reference's 'demo scripts as
integration tests' strategy, SURVEY §4)."""

import json
import os

import numpy as np
import pytest

S = 32


@pytest.fixture()
def img_files(tmp_path, rng):
    import cv2
    src = tmp_path / "src.jpg"
    tgt_dir = tmp_path / "tgt"
    tgt_dir.mkdir()
    for path in [src] + [tgt_dir / f"{i:03d}.jpg" for i in range(2)]:
        img = (rng.uniform(0, 255, (64, 64, 3))).astype(np.uint8)
        cv2.imwrite(str(path), img)
    return str(src), str(tgt_dir)


def _common(tmp_path):
    return ["--image_size", str(S), "--repeat_num", "1",
            "--checkpoints_dir", str(tmp_path / "ckpt"),
            "--output_dir", str(tmp_path / "out"), "--name", "smoke"]


def test_run_imitator_cli(img_files, tmp_path):
    from impersonator_tpu.cli import run_imitator
    src, tgt = img_files
    preds = run_imitator.main(
        ["--src_path", src, "--tgt_path", tgt] + _common(tmp_path))
    assert preds.shape[0] == 2
    outs = os.listdir(tmp_path / "out")
    assert any(o.startswith("pred_") for o in outs)


def test_run_imitator_cli_data_parallel_i420(img_files, tmp_path):
    """--data_parallel shards the frame axis over the 8-device CPU mesh;
    --i420 returns device-packed yuv420p. Both through the real CLI."""
    from impersonator_tpu.cli import run_imitator
    src, tgt = img_files
    preds = run_imitator.main(
        ["--src_path", src, "--tgt_path", tgt, "--data_parallel",
         "--i420"] + _common(tmp_path))
    assert preds.shape[0] == 2
    assert preds.dtype == np.uint8
    assert np.isfinite(preds.astype(np.float32)).all()


def test_run_view_cli(img_files, tmp_path):
    from impersonator_tpu.cli import run_view
    src, _ = img_files
    preds = run_view.main(["--src_path", src] + _common(tmp_path),
                          sweep=True, n_views=2)
    assert preds.shape[0] == 2


def test_run_swap_cli(img_files, tmp_path):
    from impersonator_tpu.cli import run_swap
    src, tgt_dir = img_files
    tgt = os.path.join(tgt_dir, "000.jpg")
    pred = run_swap.main(
        ["--src_path", src, "--tgt_path", tgt] + _common(tmp_path))
    assert pred.shape == (S, S, 3)


def test_train_cli_synthetic(tmp_path):
    """Two optimization steps of the full trainer through the CLI path."""
    from impersonator_tpu.cli import train
    state = train.main([
        "--image_size", str(S), "--repeat_num", "1", "--batch_size", "2",
        "--d_layers", "2", "--nepochs_no_decay", "1", "--nepochs_decay", "0",
        "--checkpoints_dir", str(tmp_path / "ckpt"), "--name", "smoke",
        "--n_threads", "1",
        # fire the display/val cadence on the very first step
        "--display_freq_s", "0", "--num_iters_validate", "1",
        # heavy loss nets off for CPU speed
        "--no-use_vgg", "--no-use_face", "--no-use_style",
    ])
    assert int(state.step) > 0
    # per-epoch checkpoint written with the reference naming contract
    expr = tmp_path / "ckpt" / "smoke"
    assert any(f.startswith("net_epoch_1_id_G") for f in os.listdir(expr))
    # the held-out validation pass logged eval-mode scalars
    # (reference _display_visualizer_val, train.py:91-137)
    log = (expr / "loss_log.jsonl").read_text().splitlines()
    val_recs = [json.loads(ln) for ln in log
                if json.loads(ln).get("phase") == "val"]
    assert val_recs and np.isfinite(val_recs[0]["g_total"])


def test_train_cli_ablation(tmp_path):
    """The ablation baselines must train through the same CLI
    (--model concat; reference models/baseline.py drivers)."""
    from impersonator_tpu.cli import train
    state = train.main([
        "--model", "concat",
        "--image_size", str(S), "--repeat_num", "1", "--batch_size", "2",
        "--d_layers", "2", "--nepochs_no_decay", "1", "--nepochs_decay", "0",
        "--checkpoints_dir", str(tmp_path / "ckpt"), "--name", "abl",
        "--n_threads", "1",
        "--no-use_vgg", "--no-use_face", "--no-use_style",
    ])
    assert int(state.step) > 0


def test_train_cli_dataset_mode_override(tmp_path):
    """--dataset_mode passes the reference registry name straight
    through (base_options.py:16); the explicit synthetic name must
    behave exactly like the auto-inferred smoke default."""
    from impersonator_tpu.cli import train
    state = train.main([
        "--dataset_mode", "synthetic",
        "--image_size", str(S), "--repeat_num", "1", "--batch_size", "2",
        "--d_layers", "2", "--nepochs_no_decay", "1", "--nepochs_decay", "0",
        "--checkpoints_dir", str(tmp_path / "ckpt"), "--name", "dsmode",
        "--n_threads", "1",
        "--no-use_vgg", "--no-use_face", "--no-use_style",
    ])
    assert int(state.step) > 0
    import pytest
    with pytest.raises(ValueError, match="unknown dataset"):
        train.main([
            "--dataset_mode", "bogus",
            "--image_size", str(S), "--repeat_num", "1",
            "--batch_size", "2", "--d_layers", "2",
            "--nepochs_no_decay", "1", "--nepochs_decay", "0",
            "--checkpoints_dir", str(tmp_path / "ckpt"), "--name", "bad",
            "--n_threads", "1",
            "--no-use_vgg", "--no-use_face", "--no-use_style",
        ])


def _fake_iper_tree(tmp_path, rng, n_videos=2, n_frames=6, size=64):
    """Fabricate the iPER on-disk layout (images + smpl pkls) plus a
    protocol JSON in the REAL reference schema
    (thirdparty/his_evaluators/data/iPER_protocol.json: {"val": {vid:
    {"s_n", "self_imitation": {"target","range"}, "cross_imitation",
    "flag"}}})."""
    import cv2
    import pickle
    data_dir = tmp_path / "iper"
    vids = []
    for v in range(n_videos):
        vid = f"{v:03d}/1/1"
        vids.append(vid)
        img_dir = data_dir / "images_HD" / vid
        img_dir.mkdir(parents=True)
        for i in range(n_frames):
            img = rng.uniform(0, 255, (size, size, 3)).astype(np.uint8)
            cv2.imwrite(str(img_dir / f"{i:08d}.jpg"), img)
        smpl_dir = data_dir / "smpls" / vid
        smpl_dir.mkdir(parents=True)
        with open(smpl_dir / "pose_shape.pkl", "wb") as f:
            pickle.dump({
                "cams": np.tile([0.9, 0, 0], (n_frames, 1)).astype(np.float32),
                "pose": rng.normal(0, 0.03, (n_frames, 72)).astype(np.float32),
                "shape": np.zeros((n_frames, 10), np.float32),
            }, f)
    (data_dir / "train.txt").write_text("\n".join(vids))
    proto = {"val": {}}
    for i, vid in enumerate(vids):
        other = vids[(i + 1) % len(vids)]
        proto["val"][vid] = {
            "source": ["00000000.jpg", "00000002.jpg"],
            "view angle": [0, 90],
            "s_n": {"1": ["00000000.jpg"],
                    "2": ["00000000.jpg", "00000002.jpg"]},
            "mask": [], "novel view": False,
            "self_imitation": {"target": vid, "range": [1, 4]},
            "cross_imitation": {"target": other, "range": [2, 4]},
            "flag": [2, 4],
        }
    proto_path = data_dir / "protocol.json"
    proto_path.write_text(json.dumps(proto))
    return str(data_dir), str(proto_path)


def test_protocol_parses_reference_schema(tmp_path, rng):
    from impersonator_tpu.metrics.protocols import build_protocol
    data_dir, proto = _fake_iper_tree(tmp_path, rng)
    p = build_protocol("iPER", data_dir, proto)
    p.setup(num_sources=2, load_smpls=True)
    assert len(p) == 2
    unit = p[0]
    assert len(unit.src_paths) == 2                       # multi-view s_n
    assert len(unit.si_paths) == 4                        # end-inclusive [1,4]
    assert unit.ci_video and len(unit.ci_paths) == 3      # [2,4]
    assert len(unit.flag_paths) == 3
    assert unit.src_smpls.shape == (2, 85)
    assert unit.si_smpls.shape == (4, 85)
    assert unit.ci_smpls.shape == (3, 85)


@pytest.mark.parametrize("name,sub,shape_once", [
    ("fashionvideo", os.path.join("processed", "val"), False),
    ("MotionSynthetic", "processed", True),
    ("YoutubeDancer18", "processed", False),
])
def test_non_iper_protocols_parse(tmp_path, rng, name, sub, shape_once):
    """The non-iPER protocol layouts (his_evaluators protocols/
    {fashionvideo,MotionSynthetic,YoutubeDancer18}.py): frames under
    {processed_sub}/{vid}/images, pose_shape.pkl beside them,
    MotionSynthetic with a single shape row per video."""
    import cv2
    import pickle
    from impersonator_tpu.metrics.protocols import build_protocol

    data_dir = tmp_path / "data"
    n_frames = 6
    vids = ["001/9/1", "007/1/2"]
    for vid in vids:
        img_dir = data_dir / sub / vid / "images"
        img_dir.mkdir(parents=True)
        for i in range(n_frames):
            cv2.imwrite(str(img_dir / f"frame_{i:08d}.png"),
                        rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8))
        n_shape = 1 if shape_once else n_frames
        with open(data_dir / sub / vid / "pose_shape.pkl", "wb") as f:
            pickle.dump({
                "cams": np.tile([0.9, 0, 0], (n_frames, 1)).astype(np.float32),
                "pose": rng.normal(0, 0.03, (n_frames, 72)).astype(np.float32),
                "shape": np.zeros((n_shape, 10), np.float32),
            }, f)
    proto = {"val": {vids[0]: {
        "s_n": {"1": ["frame_00000000.png"]},
        "self_imitation": {"target": vids[0], "range": [1, 4]},
        "cross_imitation": {"target": vids[1], "range": [2, 4]},
        "flag": [2, 4],
    }}}
    proto_path = data_dir / "protocol.json"
    proto_path.write_text(json.dumps(proto))

    p = build_protocol(name, str(data_dir), str(proto_path))
    p.setup(num_sources=1, load_smpls=True)
    unit = p[0]
    assert len(unit.src_paths) == 1 and len(unit.si_paths) == 4
    assert len(unit.ci_paths) == 3 and len(unit.flag_paths) == 3
    assert unit.si_smpls.shape == (4, 85)       # shape broadcast for MS
    assert unit.ci_smpls.shape == (3, 85)
    assert unit.flag_smpls.shape == (3, 85)


def test_sspe_score_math():
    """sspe matches ssp_abs_err_score_func (metrics.py:398-418)."""
    from impersonator_tpu.metrics.metrics import sspe_score
    rng = np.random.default_rng(3)
    a = rng.normal(0, 1, (5, 85)).astype(np.float32)
    assert sspe_score(a, a) == 0.0
    b = a.copy()
    b[:, 0] += 0.5        # scale
    b[:, 80] += 1.0       # shape (last 10)
    b[:, 10] -= 2.0       # pose block (0:-10)
    # scale_err 0.5 + shape_err 1.0 + pose_err (0.5 from cam + 2.0)
    assert np.isclose(sspe_score(b, a), 0.5 + 1.0 + 2.5, atol=1e-6)


def test_evaluate_cli_on_fake_iper(tmp_path, rng, capsys):
    """Full protocol runner: self-imitation (paired) + cross-imitation
    (unpaired via a face embedder), truncation logged, preds written in
    the reference's file layout."""
    import jax
    import jax.numpy as jnp
    from impersonator_tpu.cli.evaluate import evaluate_protocol
    from impersonator_tpu.config import TestConfig
    from impersonator_tpu.models.facenet import Sphere20a

    face = Sphere20a()
    fparams = face.init(jax.random.PRNGKey(0), jnp.zeros((1, 112, 96, 3)))

    crop_calls = []

    @jax.jit
    def _face_embed(imgs, bboxes=None):
        from impersonator_tpu.models.losses import crop_resize_fractional
        from impersonator_tpu.ops.sampler import resize_bilinear_torch
        if bboxes is not None:
            x = crop_resize_fractional(imgs, bboxes, 112, 96)
        else:
            x = resize_bilinear_torch(imgs, 112, 96)
        return face.apply(fparams, x)[-1]

    def face_fn(imgs, bboxes=None):
        crop_calls.append(bboxes is not None)
        return _face_embed(imgs, bboxes) if bboxes is not None \
            else _face_embed(imgs)

    data_dir, proto = _fake_iper_tree(tmp_path, rng)
    cfg = TestConfig(image_size=S, repeat_num=1, data_dir=data_dir,
                     checkpoints_dir=str(tmp_path / "ckpt"), name="eval",
                     output_dir=str(tmp_path / "out"))
    results = evaluate_protocol(cfg, proto, max_videos=1, max_frames=3,
                                face_fn=face_fn, save_preds=True, sspe=True)
    si = results["self_imitation"]
    assert np.isfinite(si["ssim"]) and np.isfinite(si["psnr"])
    # SSPE (HMR preds-vs-refs) + paired face-CS ride the paired suite
    assert np.isfinite(si["SSPE"]) and si["SSPE"] >= 0
    assert np.isfinite(si["face-CS"])
    assert "face-FD" in results["cross_imitation"]
    assert np.isfinite(results["cross_imitation"]["face-CS"])
    # the smpl-derived head bboxes actually reached the face embedder
    assert any(crop_calls), "face metrics never used head crops"
    assert results["per_video"]
    # truncation must be loud, not silent
    assert "capping" in capsys.readouterr().out
    # reference file layout
    si_preds = os.listdir(tmp_path / "out" / "self_imitation")
    assert "pred_00000000.jpg" in si_preds


def test_imper_dataset_on_fake_tree(tmp_path, rng):
    from impersonator_tpu.data import ImPerDataset
    data_dir, _ = _fake_iper_tree(tmp_path, rng)
    ds = ImPerDataset(data_dir, "train.txt", image_size=S)
    assert len(ds) == 2   # one entry per fabricated video
    sample = ds[0]
    assert sample["images"].shape == (2, S, S, 3)
    assert sample["smpls"].shape == (2, 85)
    assert np.abs(sample["images"]).max() <= 1.0


def test_run_view_t_pose(img_files, tmp_path):
    from impersonator_tpu.cli import run_view
    src, _ = img_files
    preds = run_view.main(["--src_path", src, "--T_pose"] + _common(tmp_path),
                          sweep=True, n_views=2)
    assert preds.shape[0] == 2


@pytest.mark.parametrize("which", ["imitator", "view", "swap"])
def test_demos_cli(which, tmp_path):
    from impersonator_tpu.cli import demos
    demos.main([which, "--frames", "2", "--image_size", str(S),
                "--repeat_num", "1",
                "--checkpoints_dir", str(tmp_path / "ckpt"),
                "--output_dir", str(tmp_path / "out"), "--name", "demo"])
    outs = os.listdir(tmp_path / "out")
    assert any(o.endswith(".png") for o in outs)


def test_run_imitator_post_tune_with_face(img_files, tmp_path):
    """--post_tune --face_path: the FaceLoss term joins the post-tune
    objective (reference imitator.py:434-452)."""
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from impersonator_tpu.cli import run_imitator
    from impersonator_tpu.models.facenet import Sphere20a

    face = Sphere20a()
    tree = jax.jit(face.init)(jax.random.PRNGKey(0),
                              jnp.zeros((1, 112, 96, 3)))
    fpath = str(tmp_path / "sphere.msgpack")
    with open(fpath, "wb") as f:
        f.write(serialization.to_bytes(tree))

    src, tgt = img_files
    preds = run_imitator.main(
        ["--src_path", src, "--tgt_path", tgt, "--post_tune",
         "--face_path", fpath] + _common(tmp_path))
    assert preds.shape[0] == 2
    assert np.isfinite(preds).all()


def test_serve_http_roundtrip(tmp_path):
    """The serving surface end to end over real HTTP: healthz ->
    personalize (JPEG upload + X-Smpl header) -> imitate (smpls JSON ->
    base64 JPEG frames) -> imitate_frames (b64 uploads), plus 400s on
    malformed payloads."""
    import base64
    import http.client
    import threading

    import cv2

    from impersonator_tpu.cli.serve import ImitatorService, make_server
    from impersonator_tpu.config import TestConfig

    cfg = TestConfig(image_size=S, repeat_num=1)
    service = ImitatorService(cfg, batch=2)
    server = make_server(service, "127.0.0.1", 0)   # ephemeral port
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        port = server.server_port
        conn = lambda: http.client.HTTPConnection("127.0.0.1", port,  # noqa
                                                  timeout=600)

        c = conn()
        c.request("GET", "/healthz")
        health = json.loads(c.getresponse().read())
        assert health["ok"] and health["personalized"] is False

        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (S, S, 3)).astype(np.uint8)
        ok, jpg = cv2.imencode(".jpg", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        assert ok
        theta = np.zeros(85, np.float32)
        theta[0] = 0.9
        c = conn()
        c.request("POST", "/personalize", body=jpg.tobytes(),
                  headers={"X-Smpl": ",".join(str(v) for v in theta)})
        r = json.loads(c.getresponse().read())
        assert r["ok"]

        smpls = np.tile(theta, (3, 1))
        smpls[:, 3:75] += rng.normal(0, 0.03, (3, 72)).astype(np.float32)
        c = conn()
        c.request("POST", "/imitate",
                  body=json.dumps({"smpls": smpls.tolist()}))
        r = json.loads(c.getresponse().read())
        assert r["ok"] and len(r["frames"]) == 3
        frame = cv2.imdecode(np.frombuffer(
            base64.b64decode(r["frames"][0]), np.uint8), cv2.IMREAD_COLOR)
        assert frame.shape == (S, S, 3)

        # frame-driven path: poses recovered by HMR per uploaded frame
        b64 = base64.b64encode(jpg.tobytes()).decode("ascii")
        c = conn()
        c.request("POST", "/imitate_frames",
                  body=json.dumps({"frames": [b64, b64]}))
        r = json.loads(c.getresponse().read())
        assert r["ok"] and len(r["frames"]) == 2

        # video endpoint: mp4 bytes straight from device-packed yuv420p
        # (400 with a clear error when the host lacks ffmpeg)
        import shutil
        c = conn()
        c.request("POST", "/imitate_video",
                  body=json.dumps({"smpls": smpls.tolist(), "fps": 5}))
        resp = c.getresponse()
        if shutil.which("ffmpeg") is None:
            assert resp.status == 400
            assert "ffmpeg" in json.loads(resp.read())["error"]
        else:
            assert resp.status == 200
            assert resp.getheader("Content-Type") == "video/mp4"
            assert len(resp.read()) > 0

        # malformed payloads answer 400, not a dead worker
        c = conn()
        c.request("POST", "/imitate", body=b"{not json")
        resp = c.getresponse()
        assert resp.status == 400
        c = conn()
        c.request("POST", "/imitate",
                  body=json.dumps({"smpls": [[1.0, 2.0]]}))
        assert c.getresponse().status == 400
    finally:
        server.shutdown()
        thread.join(timeout=10)


def test_evaluate_protocol_reid_person_crops(tmp_path, rng):
    """--yolo_cfg/--yolo_weights wiring: person boxes from the detector
    thread into paired OS-CS-reid and the unpaired reid stream as crops
    (reference FreIDMetric convention, metrics.py:784-832). The detector
    net itself is parity-tested in test_yolo.py; here a stub proves the
    protocol runner computes boxes per embedded batch and the scores
    stay finite."""
    import jax.numpy as jnp
    from impersonator_tpu.cli.evaluate import evaluate_protocol
    from impersonator_tpu.config import TestConfig

    calls = []

    class StubYolo:
        def body_bboxes(self, imgs):
            b = np.asarray(imgs).shape[0]
            calls.append(b)
            return np.tile(np.asarray([0.2, 0.8, 0.1, 0.9], np.float32),
                           (b, 1))

    def reid_fn(imgs):
        return jnp.mean(imgs, axis=(1, 2))

    data_dir, proto = _fake_iper_tree(tmp_path, rng)
    cfg = TestConfig(image_size=S, repeat_num=1, data_dir=data_dir,
                     checkpoints_dir=str(tmp_path / "ckpt"), name="eval",
                     output_dir=str(tmp_path / "out"))
    results = evaluate_protocol(cfg, proto, max_videos=1, max_frames=3,
                                reid_fn=reid_fn, yolo=StubYolo())
    # paired + unpaired reid batches each computed their own boxes
    assert len(calls) >= 2
    assert np.isfinite(results["self_imitation"]["OS-CS-reid"])
    assert np.isfinite(results["cross_imitation"]["OS-freid"])
