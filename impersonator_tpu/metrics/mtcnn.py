"""MTCNN face detector (P/R/O-net cascade) with the reference's RELEASED
weights.

The reference evaluation suite localizes faces for its face-CS/face-FD
metrics with facenet_pytorch's MTCNN
(`/root/reference/thirdparty/his_evaluators/his_evaluators/metrics/
facenet_pytorch/models/mtcnn.py:9-154` nets,
`models/utils/detect_face.py:11-152` cascade), whose pnet/rnet/onet
weights ship IN the reference tree (`metrics/facenet_pytorch/data/*.pt`).
This framework's default face localizer stays the SMPL-derived head bbox
(the pose pipeline already knows where the head is — no detector net
needed on the TPU hot path), but the real-weight MTCNN is available for
(a) parity with the reference's exact crops and (b) images where no SMPL
fit exists. Weights convert via ``tools/convert_weights.py mtcnn``.

Design split, TPU-style: the three convnets are flax modules (jitted,
NHWC); the cascade driver (pyramid, NMS, box algebra) is host-side
numpy — face detection happens OFFLINE at metric time on a handful of
frames, exactly like the reference (whose own final NMS is numpy,
detect_face.py:188-241), so there is nothing to win by forcing the
dynamic-shape box bookkeeping through XLA.

Network quirks preserved so the released weights load exactly:

* all convs are VALID (no padding); pools are ceil-mode (mtcnn.py:21,63);
* per-channel PReLU everywhere, including after the dense layers;
* RNet/ONet flatten their conv features in torch's
  ``permute(0, 3, 2, 1)`` order — (B,C,H,W) -> (B,W,H,C) -> flat
  (mtcnn.py:91,147) — replicated here as (B,H,W,C) -> (B,W,H,C);
* PNet's prob head softmaxes over the channel axis (mtcnn.py:27,46).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from impersonator_tpu.models.facenet import PReLU
from impersonator_tpu.models.layers import Conv, max_pool_ceil


class PNet(nn.Module):
    """Proposal net (mtcnn.py:9-48): fully-convolutional 12x12 scanner.
    Input (B, H, W, 3) normalized; returns (reg (B,h,w,4), prob (B,h,w,2))
    with prob softmaxed over the last axis."""

    @nn.compact
    def __call__(self, x):
        x = PReLU(name="prelu1")(Conv(10, 3, name="conv1")(x))
        x = max_pool_ceil(x, 2, 2)
        x = PReLU(name="prelu2")(Conv(16, 3, name="conv2")(x))
        x = PReLU(name="prelu3")(Conv(32, 3, name="conv3")(x))
        prob = jax.nn.softmax(Conv(2, 1, name="conv4_1")(x), axis=-1)
        reg = Conv(4, 1, name="conv4_2")(x)
        return reg, prob


class RNet(nn.Module):
    """Refine net (mtcnn.py:51-97). Input (B, 24, 24, 3); returns
    (reg (B,4), prob (B,2))."""

    @nn.compact
    def __call__(self, x):
        x = PReLU(name="prelu1")(Conv(28, 3, name="conv1")(x))
        x = max_pool_ceil(x, 3, 2)
        x = PReLU(name="prelu2")(Conv(48, 3, name="conv2")(x))
        x = max_pool_ceil(x, 3, 2)
        x = PReLU(name="prelu3")(Conv(64, 2, name="conv3")(x))
        # torch flatten order: (B,C,H,W).permute(0,3,2,1) == NHWC (B,W,H,C)
        x = x.transpose(0, 2, 1, 3).reshape(x.shape[0], -1)
        x = PReLU(name="prelu4")(nn.Dense(128, name="dense4")(x))
        prob = jax.nn.softmax(nn.Dense(2, name="dense5_1")(x), axis=-1)
        reg = nn.Dense(4, name="dense5_2")(x)
        return reg, prob


class ONet(nn.Module):
    """Output net (mtcnn.py:100-154). Input (B, 48, 48, 3); returns
    (reg (B,4), landmarks (B,10), prob (B,2))."""

    @nn.compact
    def __call__(self, x):
        x = PReLU(name="prelu1")(Conv(32, 3, name="conv1")(x))
        x = max_pool_ceil(x, 3, 2)
        x = PReLU(name="prelu2")(Conv(64, 3, name="conv2")(x))
        x = max_pool_ceil(x, 3, 2)
        x = PReLU(name="prelu3")(Conv(64, 3, name="conv3")(x))
        x = max_pool_ceil(x, 2, 2)
        x = PReLU(name="prelu4")(Conv(128, 2, name="conv4")(x))
        x = x.transpose(0, 2, 1, 3).reshape(x.shape[0], -1)
        x = PReLU(name="prelu5")(nn.Dense(256, name="dense5")(x))
        prob = jax.nn.softmax(nn.Dense(2, name="dense6_1")(x), axis=-1)
        reg = nn.Dense(4, name="dense6_2")(x)
        pts = nn.Dense(10, name="dense6_3")(x)
        return reg, pts, prob


# ---------------------------------------------------------------------------
# Host-side cascade helpers (numpy; detect_face.py formulas)
# ---------------------------------------------------------------------------


def area_resize(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """torch ``F.interpolate(mode='area')`` == adaptive average pooling
    (detect_face.py:271-273 imresample). img: (B, H, W, C) float.
    Output pixel (i, j) averages input rows [floor(i*H/oh),
    ceil((i+1)*H/oh)) x the matching column span."""
    b, h, w, c = img.shape
    if (h, w) == (oh, ow):
        return img
    # row/col integral images -> O(1) span sums per output pixel.
    # f64 accumulation: an f32 cumsum over a 255-scale image reaches ~1e6
    # where f32 quantizes at ~0.06 -- enough to nudge pnet scores at the
    # threshold; f64 keeps the resample exact to torch's mode='area'.
    csum = np.zeros((b, h + 1, w + 1, c), np.float64)
    csum[:, 1:, 1:] = img.astype(np.float64).cumsum(1).cumsum(2)
    y0 = (np.arange(oh) * h) // oh
    y1 = -((-(np.arange(oh) + 1) * h) // oh)   # ceil((i+1)*h/oh)
    x0 = (np.arange(ow) * w) // ow
    x1 = -((-(np.arange(ow) + 1) * w) // ow)
    area = ((y1 - y0)[:, None] * (x1 - x0)[None, :]).astype(np.float64)
    out = (csum[:, y1[:, None], x1[None, :]] - csum[:, y1[:, None], x0[None, :]]
           - csum[:, y0[:, None], x1[None, :]] + csum[:, y0[:, None], x0[None, :]])
    return (out / area[None, ..., None]).astype(img.dtype)


def _nms(boxes: np.ndarray, scores: np.ndarray, thr: float,
         method: str = "union") -> np.ndarray:
    """Greedy NMS (detect_face.py:188-224 nms_numpy; +1 box widths)."""
    if boxes.size == 0:
        return np.zeros((0,), np.int64)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = np.argsort(scores)
    keep = []
    while order.size > 0:
        i = order[-1]
        keep.append(i)
        rest = order[:-1]
        iw = np.maximum(
            0.0, np.minimum(x2[i], x2[rest]) - np.maximum(x1[i], x1[rest]) + 1)
        ih = np.maximum(
            0.0, np.minimum(y2[i], y2[rest]) - np.maximum(y1[i], y1[rest]) + 1)
        inter = iw * ih
        if method == "min":
            o = inter / np.minimum(area[i], area[rest])
        else:
            o = inter / (area[i] + area[rest] - inter)
        order = rest[o <= thr]
    return np.asarray(keep, np.int64)


def _batched_nms(boxes, scores, idxs, thr, method="union"):
    """Per-image NMS via the coordinate-offset trick
    (detect_face.py:227-241)."""
    if boxes.size == 0:
        return np.zeros((0,), np.int64)
    off = idxs.astype(boxes.dtype) * (boxes.max() + 1)
    return _nms(boxes + off[:, None], scores, thr, method)


def _bbreg(boxes, reg):
    """Apply net box regression (detect_face.py:155-167)."""
    w = boxes[:, 2] - boxes[:, 0] + 1
    h = boxes[:, 3] - boxes[:, 1] + 1
    out = boxes.copy()
    out[:, 0] = boxes[:, 0] + reg[:, 0] * w
    out[:, 1] = boxes[:, 1] + reg[:, 1] * h
    out[:, 2] = boxes[:, 2] + reg[:, 2] * w
    out[:, 3] = boxes[:, 3] + reg[:, 3] * h
    return out


def _rerec(boxes):
    """Expand to squares around the center (detect_face.py:259-268)."""
    h = boxes[:, 3] - boxes[:, 1]
    w = boxes[:, 2] - boxes[:, 0]
    side = np.maximum(w, h)
    out = boxes.copy()
    out[:, 0] = boxes[:, 0] + w * 0.5 - side * 0.5
    out[:, 1] = boxes[:, 1] + h * 0.5 - side * 0.5
    out[:, 2] = out[:, 0] + side
    out[:, 3] = out[:, 1] + side
    return out


def _pad(boxes, w, h):
    """Truncate + clamp crop coords, 1-based (detect_face.py:244-256)."""
    b = np.trunc(boxes[:, :4]).astype(np.int64)
    x, y, ex, ey = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    return (np.clip(y, 1, None), np.clip(ey, None, h),
            np.clip(x, 1, None), np.clip(ex, None, w))


def _normalize(x):
    return (x - 127.5) * 0.0078125     # detect_face.py:48,87,114


class MTCNNDetector:
    """Cascade driver over the three jitted nets (detect_face.py:11-152).

    Per-shape jit caches keep pyramid levels compiled once; stage-2/3
    batches pad to multiples of 16 so box-count jitter doesn't recompile.
    Deviation from the reference (documented): boxes whose padded crop
    collapses to zero pixels are FILTERED (the torch loop skips the crop
    but keeps the box row, silently misaligning crops and scores,
    detect_face.py:82-86 — a latent bug, unreachable for normal inputs).
    """

    def __init__(self, params: dict, min_face_size: int = 20,
                 thresholds=(0.6, 0.7, 0.7), factor: float = 0.709):
        self.params = {k: {"params": v["params"] if "params" in v else v}
                       for k, v in params.items()}
        self.min_face_size = min_face_size
        self.thresholds = tuple(thresholds)
        self.factor = factor
        self._pnet = jax.jit(partial(PNet().apply, self.params["pnet"]))
        self._rnet = jax.jit(partial(RNet().apply, self.params["rnet"]))
        self._onet = jax.jit(partial(ONet().apply, self.params["onet"]))

    # -- stages ----------------------------------------------------------

    def _scales(self, h, w):
        m = 12.0 / self.min_face_size
        minl = min(h, w) * m
        scales, s = [], m
        while minl >= 12:
            scales.append(s)
            s *= self.factor
            minl *= self.factor
        return scales

    def _stage1(self, imgs):
        b, h, w, _ = imgs.shape
        boxes, image_inds, group = [], [], []
        for gi, scale in enumerate(self._scales(h, w)):
            sh, sw = int(h * scale + 1), int(w * scale + 1)
            data = _normalize(area_resize(imgs, sh, sw))
            reg, prob = self._pnet(jnp.asarray(data))
            reg = np.asarray(reg)
            prob = np.asarray(prob)[..., 1]
            # generateBoundingBox (detect_face.py:170-185): stride 2,
            # cell 12, 1-based corner algebra
            bi, yi, xi = np.nonzero(prob >= self.thresholds[0])
            if bi.size == 0:
                continue
            score = prob[bi, yi, xi]
            r = reg[bi, yi, xi]                      # (n, 4)
            cell = np.stack([xi, yi], axis=1).astype(np.float64)
            q1 = np.floor((2.0 * cell + 1.0) / scale)
            q2 = np.floor((2.0 * cell + 12.0) / scale)
            boxes.append(np.concatenate(
                [q1, q2, score[:, None], r], axis=1).astype(np.float32))
            image_inds.append(bi)
            group.append(bi + gi * b)     # (scale, image) NMS groups
        if not boxes:
            return (np.zeros((0, 5), np.float32),
                    np.zeros((0,), np.int64))
        boxes = np.concatenate(boxes)
        image_inds = np.concatenate(image_inds).astype(np.int64)
        group = np.concatenate(group).astype(np.int64)

        pick = _batched_nms(boxes[:, :4], boxes[:, 4], group, 0.5)
        boxes, image_inds = boxes[pick], image_inds[pick]
        pick = _batched_nms(boxes[:, :4], boxes[:, 4], image_inds, 0.7)
        boxes, image_inds = boxes[pick], image_inds[pick]

        # fold the pnet regression in (detect_face.py:69-76)
        regw = boxes[:, 2] - boxes[:, 0]
        regh = boxes[:, 3] - boxes[:, 1]
        out = np.stack([boxes[:, 0] + boxes[:, 5] * regw,
                        boxes[:, 1] + boxes[:, 6] * regh,
                        boxes[:, 2] + boxes[:, 7] * regw,
                        boxes[:, 3] + boxes[:, 8] * regh,
                        boxes[:, 4]], axis=1)
        return _rerec(out), image_inds

    def _crops(self, imgs, boxes, image_inds, size):
        """Crop + area-resize each padded box; returns (data, keep_mask)."""
        _, h, w, _ = imgs.shape
        y, ey, x, ex = _pad(boxes, w, h)
        keep = (ey > y - 1) & (ex > x - 1)
        data = np.zeros((int(keep.sum()), size, size, 3), np.float32)
        j = 0
        for k in np.nonzero(keep)[0]:
            crop = imgs[image_inds[k], y[k] - 1:ey[k], x[k] - 1:ex[k]]
            data[j] = area_resize(crop[None].astype(np.float32),
                                  size, size)[0]
            j += 1
        return data, keep

    def _run_padded(self, net, data):
        """Pad the box batch to a multiple of 16 (bounded jit cache)."""
        n = data.shape[0]
        npad = -n % 16
        if npad:
            data = np.concatenate(
                [data, np.zeros((npad,) + data.shape[1:], data.dtype)])
        outs = net(jnp.asarray(_normalize(data)))
        return tuple(np.asarray(o)[:n] for o in outs)

    # -- public API --------------------------------------------------------

    def detect(self, imgs: np.ndarray):
        """imgs: (B, H, W, 3) RGB uint8 (or float in [0,255]).

        Returns (batch_boxes, batch_points): per image, an (n, 5) float32
        array of [x1, y1, x2, y2, score] and an (n, 5, 2) landmark array
        — the reference's detect_face return contract
        (detect_face.py:140-152)."""
        imgs = np.asarray(imgs)
        if imgs.ndim == 3:
            imgs = imgs[None]
        b, h, w, _ = imgs.shape
        imgs_f = imgs.astype(np.float32)

        boxes, image_inds = self._stage1(imgs_f)
        points = np.zeros((0, 5, 2), np.float32)

        if len(boxes) > 0:                         # stage 2 (rnet)
            data, keep = self._crops(imgs_f, boxes, image_inds, 24)
            boxes, image_inds = boxes[keep], image_inds[keep]
            reg, prob = self._run_padded(self._rnet, data)
            score = prob[:, 1]
            ipass = score > self.thresholds[1]
            boxes = np.concatenate(
                [boxes[ipass, :4], score[ipass, None]], axis=1)
            image_inds, reg = image_inds[ipass], reg[ipass]
            pick = _batched_nms(boxes[:, :4], boxes[:, 4], image_inds, 0.7)
            boxes, image_inds, reg = boxes[pick], image_inds[pick], reg[pick]
            boxes = _rerec(_bbreg(boxes, reg))

        if len(boxes) > 0:                         # stage 3 (onet)
            data, keep = self._crops(imgs_f, boxes, image_inds, 48)
            boxes, image_inds = boxes[keep], image_inds[keep]
            reg, pts, prob = self._run_padded(self._onet, data)
            score = prob[:, 1]
            ipass = score > self.thresholds[2]
            pts = pts[ipass]
            boxes = np.concatenate(
                [boxes[ipass, :4], score[ipass, None]], axis=1)
            image_inds, reg = image_inds[ipass], reg[ipass]
            # landmarks in image coords (detect_face.py:128-132)
            w_i = boxes[:, 2] - boxes[:, 0] + 1
            h_i = boxes[:, 3] - boxes[:, 1] + 1
            px = w_i[:, None] * pts[:, :5] + boxes[:, 0:1] - 1
            py = h_i[:, None] * pts[:, 5:10] + boxes[:, 1:2] - 1
            points = np.stack([px, py], axis=2)
            boxes = _bbreg(boxes, reg)
            pick = _batched_nms(boxes[:, :4], boxes[:, 4], image_inds,
                                0.7, method="min")
            boxes, image_inds, points = (boxes[pick], image_inds[pick],
                                         points[pick])

        return ([boxes[image_inds == i].copy() for i in range(b)],
                [points[image_inds == i].copy() for i in range(b)])

    def head_bboxes(self, imgs: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) uint8 -> (B, 4) FRACTIONAL [x0, x1, y0, y1] head
        boxes in the same layout metrics/metrics.py's crop helpers take
        (the SMPL-derived head_bbox_from_kps contract) — the drop-in
        alternative face localizer for face-CS/face-FD. Images with no
        detection get the full frame (loud: the metric then measures the
        whole image, matching the reference runner's fallback)."""
        imgs = np.asarray(imgs)
        b, h, w, _ = imgs.shape
        boxes, _ = self.detect(imgs)
        out = np.tile(np.asarray([0.0, 1.0, 0.0, 1.0], np.float32), (b, 1))
        for i, bx in enumerate(boxes):
            if len(bx):
                best = bx[np.argmax(bx[:, 4])]
                out[i] = [max(best[0] / w, 0.0), min(best[2] / w, 1.0),
                          max(best[1] / h, 0.0), min(best[3] / h, 1.0)]
        return out


def load_mtcnn(path: str, **kw) -> MTCNNDetector:
    """Restore a converted mtcnn msgpack (tools/convert_weights.py mtcnn)."""
    from flax import serialization
    with open(path, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    return MTCNNDetector(tree, **kw)
