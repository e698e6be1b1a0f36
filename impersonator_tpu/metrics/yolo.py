"""YOLOv3-SPP person detector — the reference evaluator's body localizer.

The reference crops the person region for its reid metrics with a
darknet YOLOv3-SPP (`/root/reference/thirdparty/his_evaluators/
his_evaluators/metrics/yolov3/models.py:12-260` cfg-driven graph,
`human_detector.py:9-124` largest-person selection, `utils/utils.py:
226-264` weighted-merge NMS). Like MTCNN (metrics/mtcnn.py), this
framework's DEFAULT person localizer stays the SMPL-derived body bbox —
the pose pipeline already knows where the body is — but the real
detector is available for parity with the reference's exact crops and
for frames with no SMPL fit.

TPU-first redesign, not a translation:

* the cfg-driven ``nn.ModuleList`` interpreter becomes a STATIC layer
  spec traced once under ``jit`` — the whole 113-layer graph compiles
  to a single XLA program (NHWC, conv+bias+leaky fused by XLA);
* BatchNorm is FOLDED into the conv kernels at load time (this is an
  eval-only net; ``w' = w * g/sqrt(var+eps)``, ``b' = beta - mean *
  g/sqrt(var+eps)`` is exact up to rounding), so inference carries no
  BN ops at all;
* the darknet ``.weights`` binary (5 int32 header + flat f32 in
  [bn_bias, bn_gamma, bn_mean, bn_var, conv_OIHW] per layer,
  models.py:262-314) is read DIRECTLY into the flax param tree —
  no torch round-trip needed to deploy the released checkpoint;
* box decode (sigmoid-xy + grid, exp-wh x anchors, models.py:131-176)
  is pure jnp inside the jitted graph; threshold/NMS/box algebra stay
  host-side numpy — detection happens offline at metric time, and the
  dynamic-shape box bookkeeping has nothing to win from XLA.

The cfg PARSER accepts the public darknet config format
(utils/parse_config.py:1-15 semantics); point it at the reference's
``config/yolov3-spp.cfg`` (608x608 hyperparams; the detector runs at
any multiple-of-32 input size — strides come from the runtime shape,
models.py:252 ``img_dim = x.shape[2]``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# cfg parsing -> static layer spec
# ---------------------------------------------------------------------------


def parse_darknet_cfg(path: str) -> list[dict]:
    """Darknet cfg -> list of {type, **options} dicts; the leading [net]
    block is layers[0] (parse_config.py:1-15 contract)."""
    blocks: list[dict] = []
    with open(path) as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            if line.startswith("["):
                blocks.append({"type": line.strip("[]").strip()})
                if blocks[-1]["type"] == "convolutional":
                    blocks[-1]["batch_normalize"] = "0"
            else:
                k, v = line.split("=", 1)
                blocks[-1][k.strip()] = v.strip()
    return blocks


def build_layers(defs: list[dict]) -> list[dict]:
    """Normalize parsed blocks into a typed static spec with resolved
    channel counts (create_modules, models.py:12-81). defs[0] must be
    the [net] block."""
    net, body = defs[0], defs[1:]
    channels = [int(net.get("channels", 3))]
    layers = []
    for i, d in enumerate(body):
        t = d["type"]
        ld = {"type": t, "index": i}
        if t == "convolutional":
            ld.update(bn=int(d["batch_normalize"]),
                      filters=int(d["filters"]), size=int(d["size"]),
                      stride=int(d["stride"]),
                      pad=(int(d["size"]) - 1) // 2,
                      leaky=d["activation"] == "leaky",
                      in_ch=channels[-1])
            channels.append(ld["filters"])
        elif t == "maxpool":
            ld.update(size=int(d["size"]), stride=int(d["stride"]))
            channels.append(channels[-1])
        elif t == "upsample":
            ld.update(stride=int(d["stride"]))
            channels.append(channels[-1])
        elif t == "route":
            idx = [int(x) for x in d["layers"].split(",")]
            ld.update(layers=idx)
            channels.append(sum(channels[1:][j] for j in idx))
        elif t == "shortcut":
            ld.update(frm=int(d["from"]))
            channels.append(channels[1:][int(d["from"])])
        elif t == "yolo":
            mask = [int(x) for x in d["mask"].split(",")]
            a = [int(x) for x in d["anchors"].split(",")]
            anchors = [(a[j], a[j + 1]) for j in range(0, len(a), 2)]
            ld.update(anchors=tuple(anchors[j] for j in mask),
                      classes=int(d["classes"]))
            channels.append(channels[-1])
        else:
            raise ValueError(f"unknown darknet layer type {t!r}")
        layers.append(ld)
    return layers


# ---------------------------------------------------------------------------
# darknet binary -> folded flax params
# ---------------------------------------------------------------------------


def load_darknet_weights(layers: list[dict], path: str,
                         eps: float = 1e-5) -> dict:
    """Read a darknet ``.weights`` file into {conv{i}: {kernel HWIO,
    bias}} with BatchNorm folded in (models.py:262-314 byte order;
    torch BN eps 1e-5, models.py:39)."""
    with open(path, "rb") as f:
        np.fromfile(f, dtype=np.int32, count=5)         # header
        w = np.fromfile(f, dtype=np.float32)
    params, ptr = {}, 0

    def take(n):
        nonlocal ptr
        out = w[ptr:ptr + n]
        if out.size != n:
            raise ValueError(f"darknet weights file truncated at {ptr}")
        ptr += n
        return out

    for ld in layers:
        if ld["type"] != "convolutional":
            continue
        c_out, c_in, k = ld["filters"], ld["in_ch"], ld["size"]
        if ld["bn"]:
            beta = take(c_out)
            gamma = take(c_out)
            mean = take(c_out)
            var = take(c_out)
            scale = gamma / np.sqrt(var + eps)
            bias = beta - mean * scale
        else:
            bias = take(c_out)
            scale = np.ones(c_out, np.float32)
        kern = take(c_out * c_in * k * k).reshape(c_out, c_in, k, k)
        kern = kern * scale[:, None, None, None]
        params[f"conv{ld['index']}"] = {
            "kernel": np.ascontiguousarray(kern.transpose(2, 3, 1, 0)),
            "bias": bias.astype(np.float32)}
    if ptr != w.size:
        raise ValueError(f"darknet weights file has {w.size - ptr} "
                         "unread floats — cfg/weights mismatch")
    return params


def expected_weight_count(layers: list[dict]) -> int:
    """Float count a matching ``.weights`` payload must have."""
    n = 0
    for ld in layers:
        if ld["type"] != "convolutional":
            continue
        n += ld["filters"] * (4 if ld["bn"] else 1)
        n += ld["filters"] * ld["in_ch"] * ld["size"] ** 2
    return n


# ---------------------------------------------------------------------------
# the jitted graph
# ---------------------------------------------------------------------------


def _decode_yolo(x, anchors, num_classes, img_dim):
    """models.py:131-176: (B, g, g, A*(5+C)) NHWC head -> (B, A*g*g,
    5+C) with boxes in input-pixel (cx, cy, w, h)."""
    b, g = x.shape[0], x.shape[1]
    na = len(anchors)
    stride = img_dim / g
    # torch views NCHW as (B, A, 5+C, g, g) then permutes to
    # (B, A, g, g, 5+C); NHWC channel c = a*(5+C)+f reproduces it by
    # reshape + transpose
    p = x.reshape(b, g, g, na, 5 + num_classes).transpose(0, 3, 1, 2, 4)
    gy, gx = jnp.mgrid[0:g, 0:g].astype(x.dtype)
    aw = jnp.asarray([a[0] for a in anchors], x.dtype)[None, :, None, None]
    ah = jnp.asarray([a[1] for a in anchors], x.dtype)[None, :, None, None]
    cx = (jax.nn.sigmoid(p[..., 0]) + gx) * stride
    cy = (jax.nn.sigmoid(p[..., 1]) + gy) * stride
    # anchors are in cfg-native pixels; torch scales them by /stride
    # then multiplies the output by stride — identical to using them raw
    w = jnp.exp(p[..., 2]) * aw
    h = jnp.exp(p[..., 3]) * ah
    rest = jax.nn.sigmoid(p[..., 4:])
    out = jnp.concatenate(
        [jnp.stack([cx, cy, w, h], axis=-1), rest], axis=-1)
    return out.reshape(b, na * g * g, 5 + num_classes)


def darknet_apply(layers: list[dict], params: dict, x: jnp.ndarray):
    """Run the static spec (Darknet.forward, models.py:251-260). x is
    (B, H, W, 3) in [0, 1]; returns (B, N, 5+C) decoded detections."""
    img_dim = x.shape[1]
    outs, dets = [], []
    for ld in layers:
        t = ld["type"]
        if t == "convolutional":
            p = params[f"conv{ld['index']}"]
            pad = ld["pad"]
            x = jax.lax.conv_general_dilated(
                x, jnp.asarray(p["kernel"]),
                window_strides=(ld["stride"], ld["stride"]),
                padding=((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = x + jnp.asarray(p["bias"])
            if ld["leaky"]:
                x = jnp.where(x > 0, x, 0.1 * x)
        elif t == "maxpool":
            k, s = ld["size"], ld["stride"]
            if k == 2 and s == 1:
                # models.py:46-48 quirk: ZeroPad2d((0,1,0,1)) — the pad
                # value is ZERO, not -inf, so negative edge activations
                # get clamped exactly like the reference
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                pads = ((0, 0), (0, 0), (0, 0), (0, 0))
            else:
                p = (k - 1) // 2
                pads = ((0, 0), (p, p), (p, p), (0, 0))
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
                pads)
        elif t == "upsample":
            s = ld["stride"]
            x = jnp.repeat(jnp.repeat(x, s, axis=1), s, axis=2)
        elif t == "route":
            x = jnp.concatenate([outs[j] for j in ld["layers"]], axis=-1)
        elif t == "shortcut":
            x = outs[-1] + outs[ld["frm"]]
        elif t == "yolo":
            x = _decode_yolo(x, ld["anchors"], ld["classes"], img_dim)
            dets.append(x)
        outs.append(x)
    return jnp.concatenate(dets, axis=1)


# ---------------------------------------------------------------------------
# host-side suppression + person selection
# ---------------------------------------------------------------------------


def _xywh2xyxy(b):
    out = np.empty_like(b)
    out[:, 0] = b[:, 0] - b[:, 2] / 2
    out[:, 1] = b[:, 1] - b[:, 3] / 2
    out[:, 2] = b[:, 0] + b[:, 2] / 2
    out[:, 3] = b[:, 1] + b[:, 3] / 2
    return out


def _iou_xyxy(box, boxes):
    ix1 = np.maximum(box[0], boxes[:, 0])
    iy1 = np.maximum(box[1], boxes[:, 1])
    ix2 = np.minimum(box[2], boxes[:, 2])
    iy2 = np.minimum(box[3], boxes[:, 3])
    inter = (np.clip(ix2 - ix1 + 1, 0, None)
             * np.clip(iy2 - iy1 + 1, 0, None))
    a0 = (box[2] - box[0] + 1) * (box[3] - box[1] + 1)
    a1 = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    return inter / (a0 + a1 - inter + 1e-16)


def non_max_suppression(pred: np.ndarray, conf_thres: float = 0.5,
                        nms_thres: float = 0.4) -> list:
    """Weighted-merge NMS (utils/utils.py:226-264): same-class boxes
    above the IoU threshold merge confidence-weighted instead of being
    dropped. pred: (B, N, 5+C); returns per image an (n, 7) array
    [x1, y1, x2, y2, obj, cls_conf, cls] or None."""
    output = []
    for image_pred in pred:
        image_pred = image_pred[image_pred[:, 4] >= conf_thres]
        if not image_pred.shape[0]:
            output.append(None)
            continue
        boxes = _xywh2xyxy(image_pred[:, :4])
        cls_conf = image_pred[:, 5:].max(1)
        cls_pred = image_pred[:, 5:].argmax(1).astype(np.float32)
        score = image_pred[:, 4] * cls_conf
        order = (-score).argsort(kind="stable")
        det = np.concatenate(
            [boxes, image_pred[:, 4:5], cls_conf[:, None],
             cls_pred[:, None]], axis=1)[order]
        keep = []
        while det.shape[0]:
            invalid = ((_iou_xyxy(det[0, :4], det[:, :4]) > nms_thres)
                       & (det[:, 6] == det[0, 6]))
            wts = det[invalid, 4:5]
            merged = det[0].copy()
            merged[:4] = (wts * det[invalid, :4]).sum(0) / wts.sum()
            keep.append(merged)
            det = det[~invalid]
        output.append(np.stack(keep))
    return output


class YoloHumanDetector:
    """Largest-person selection over the jitted darknet graph
    (human_detector.py:9-124). Returns per image an enlarged, clipped
    (x1, y1, x2, y2) in input pixels, or None when no person clears the
    confidence threshold."""

    PERSON = 0                                   # COCO class id

    def __init__(self, cfg_path: str, weights_path: str,
                 conf_thres: float = 0.8, nms_thres: float = 0.4):
        self.layers = build_layers(parse_darknet_cfg(cfg_path))
        self.params = load_darknet_weights(self.layers, weights_path)
        self.conf_thres = conf_thres
        self.nms_thres = nms_thres
        self._apply = jax.jit(partial(darknet_apply, self.layers,
                                      self.params))

    def detect(self, imgs: np.ndarray, factor: float = 1.05) -> list:
        """imgs (B, H, W, 3) in [0, 1], H == W multiple of 32."""
        b, h, w, _ = imgs.shape
        pred = np.asarray(self._apply(jnp.asarray(imgs, jnp.float32)))
        dets = non_max_suppression(pred, self.conf_thres, self.nms_thres)
        out = []
        for i, d in enumerate(dets):
            if d is None:
                out.append(None)
                continue
            persons = d[d[:, 6] == self.PERSON]
            if not persons.shape[0]:
                out.append(None)
                continue
            # largest area wins (human_detector.py:58-77)
            areas = ((persons[:, 2] - persons[:, 0])
                     * (persons[:, 3] - persons[:, 1]))
            x1, y1, x2, y2 = persons[areas.argmax(), :4]
            # enlarge by `factor` around the center, clip to the frame
            # (human_detector.py:79-104)
            cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
            bw, bh = (x2 - x1) * factor / 2, (y2 - y1) * factor / 2
            out.append((float(np.clip(cx - bw, 0, w - 1)),
                        float(np.clip(cy - bh, 0, h - 1)),
                        float(np.clip(cx + bw, 0, w - 1)),
                        float(np.clip(cy + bh, 0, h - 1))))
        return out

    def body_bboxes(self, imgs: np.ndarray) -> np.ndarray:
        """[-1, 1] float frames -> (B, 4) FRACTIONAL [x0, x1, y0, y1]
        body boxes (the metrics/metrics.py crop-helper contract — same
        layout as SMPL body bboxes). No-detection frames get the full
        frame, matching the reference runner's fallback."""
        imgs = np.asarray(imgs)
        b, h, w, _ = imgs.shape
        boxes = self.detect((imgs + 1.0) * 0.5)
        out = np.tile(np.asarray([0.0, 1.0, 0.0, 1.0], np.float32), (b, 1))
        for i, bx in enumerate(boxes):
            if bx is not None:
                out[i] = [max(bx[0] / w, 0.0), min(bx[2] / w, 1.0),
                          max(bx[1] / h, 0.0), min(bx[3] / h, 1.0)]
        return out
