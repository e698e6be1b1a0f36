"""MTCNN face detector: stage-net converter parity against functional-
torch oracles (reference facenet_pytorch/models/mtcnn.py:9-154 key
naming), area-resize parity against torch interpolate, and a real-weight
cascade run on the reference's own test image — the pnet/rnet/onet
checkpoints ship inside the reference tree, so this is end-to-end
evidence on RELEASED weights, not just converter naming."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo")
from tools import convert_weights as cw  # noqa: E402
from impersonator_tpu.metrics import mtcnn as M  # noqa: E402
import torch_ref  # noqa: E402


def test_pnet_converted_weights_match_torch(rng):
    sd = torch_ref.make_pnet_sd(rng)
    tree = cw.convert_mtcnn_net(sd)
    # non-square input exercises the fully-convolutional path
    x = rng.uniform(-1, 1, (2, 34, 26, 3)).astype(np.float32)
    reg_j, prob_j = M.PNet().apply(tree, jnp.asarray(x))
    reg_t, prob_t = torch_ref.pnet_forward(
        sd, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(reg_j), reg_t.numpy().transpose(0, 2, 3, 1), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(prob_j), prob_t.numpy().transpose(0, 2, 3, 1), atol=1e-6)


def test_rnet_converted_weights_match_torch(rng):
    sd = torch_ref.make_rnet_sd(rng)
    tree = cw.convert_mtcnn_net(sd)
    x = rng.uniform(-1, 1, (3, 24, 24, 3)).astype(np.float32)
    reg_j, prob_j = M.RNet().apply(tree, jnp.asarray(x))
    reg_t, prob_t = torch_ref.rnet_forward(
        sd, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    # the permute-flatten quirk: any feature-order mismatch would scramble
    # the dense layer and blow far past this tolerance
    np.testing.assert_allclose(np.asarray(reg_j), reg_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(prob_j), prob_t.numpy(), atol=1e-6)


def test_onet_converted_weights_match_torch(rng):
    sd = torch_ref.make_onet_sd(rng)
    tree = cw.convert_mtcnn_net(sd)
    x = rng.uniform(-1, 1, (3, 48, 48, 3)).astype(np.float32)
    reg_j, pts_j, prob_j = M.ONet().apply(tree, jnp.asarray(x))
    reg_t, pts_t, prob_t = torch_ref.onet_forward(
        sd, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(reg_j), reg_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pts_j), pts_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(prob_j), prob_t.numpy(), atol=1e-6)


def test_area_resize_matches_torch_interpolate(rng):
    """The cascade's pyramid resample must be torch's mode='area'
    (detect_face.py:271-273) or the pnet scores drift off the released
    weights' operating point."""
    x = rng.uniform(0, 255, (2, 63, 120, 3)).astype(np.float32)
    for oh, ow in [(38, 73), (12, 12), (63, 120), (7, 5)]:
        ours = M.area_resize(x, oh, ow)
        theirs = torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(oh, ow),
            mode="area").numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, theirs, atol=1e-3)


def test_nms_union_and_min(rng):
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30],
                      [21, 19, 31, 29]], np.float32)
    scores = np.array([0.9, 0.8, 0.7, 0.95], np.float32)
    keep = M._nms(boxes, scores, 0.5)
    assert sorted(keep.tolist()) == [0, 3]
    # min-mode divides by the smaller area -> stricter, same result here
    keep = M._nms(boxes, scores, 0.5, method="min")
    assert sorted(keep.tolist()) == [0, 3]
    # batched: same boxes in different images never suppress each other
    keep = M._batched_nms(boxes, scores, np.array([0, 1, 0, 1]), 0.5)
    assert sorted(keep.tolist()) == [0, 1, 2, 3]


MTCNN_DATA = ("/root/reference/thirdparty/his_evaluators/his_evaluators/"
              "metrics/facenet_pytorch/data")


@pytest.mark.skipif(not os.path.exists(MTCNN_DATA + "/pnet.pt"),
                    reason="reference tree (released mtcnn .pt) not mounted")
def test_real_weights_detect_multiface(tmp_path):
    """Released pnet/rnet/onet weights on the reference's own 6-face test
    image (data/multiface.jpg; the annotated expectation is the adjacent
    multiface_detected.png). Face centers pinned to the annotated boxes
    with a generous +-15 px slack. Constructs through the msgpack file +
    load_mtcnn — the exact path cli/evaluate.py --mtcnn_path takes."""
    cv2 = pytest.importorskip("cv2")
    from flax import serialization
    tree = cw.convert_mtcnn(
        {n: torch.load(f"{MTCNN_DATA}/{n}.pt", map_location="cpu")
         for n in ("pnet", "rnet", "onet")})
    path = tmp_path / "mtcnn.msgpack"
    path.write_bytes(serialization.to_bytes(tree))
    det = M.load_mtcnn(str(path))
    img = cv2.cvtColor(cv2.imread(f"{MTCNN_DATA}/multiface.jpg"),
                       cv2.COLOR_BGR2RGB)

    boxes, points = det.detect(img)
    b = boxes[0]
    assert len(b) == 6
    assert (b[:, 4] > 0.99).all()
    assert points[0].shape == (6, 5, 2)
    centers = np.stack([(b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2], 1)
    expected = np.array([[461, 187], [906, 498], [265, 303],
                         [658, 247], [592, 102], [760, 521]], np.float32)
    for e in expected:
        assert (np.abs(centers - e).sum(1) < 30).any(), e
    # landmarks fall inside their face boxes
    for i in range(6):
        x1, y1, x2, y2 = b[i, :4]
        assert (points[0][i, :, 0] >= x1).all()
        assert (points[0][i, :, 0] <= x2).all()
        assert (points[0][i, :, 1] >= y1).all()
        assert (points[0][i, :, 1] <= y2).all()

    # the metric-facing head_bboxes contract: fractional [x0,x1,y0,y1]
    hb = det.head_bboxes(img[None])
    assert hb.shape == (1, 4)
    assert (hb >= 0).all() and (hb <= 1).all()
    assert hb[0, 0] < hb[0, 1] and hb[0, 2] < hb[0, 3]


SHIPPED = os.path.join(os.path.dirname(__file__), "..", "impersonator_tpu",
                       "weights", "mtcnn_pro.msgpack")


def test_shipped_mtcnn_weights_load():
    """The in-tree converted P/R/O-net msgpack (the reference's released
    detector, shipped like the LPIPS lin heads) must load and run."""
    det = M.load_mtcnn(SHIPPED)
    x = np.full((1, 16, 16, 3), 100.0, np.float32)
    reg, prob = det._pnet((x - 127.5) * 0.0078125)
    assert reg.shape == (1, 3, 3, 4) and prob.shape == (1, 3, 3, 2)
    np.testing.assert_allclose(np.asarray(prob).sum(-1), 1.0, atol=1e-5)
