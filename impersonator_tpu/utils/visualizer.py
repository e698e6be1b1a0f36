"""Training observability.

The reference logs via tensorboardX + an append-only text file + live
visdom windows (utils/tb_visualizer.py:9-68, visdom_visualizer.py:23-163).
Here: a dependency-free logger writing (a) ``loss_log.jsonl`` — one JSON
record per log event (tooling-friendly superset of loss_log2.txt),
(b) periodic image grids as PNGs under ``{expr_dir}/visuals/``, plus
wall-clock phase timers (the reference only had ad-hoc time.time deltas,
train.py:59-77; here timing is a first-class feature).
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from contextlib import contextmanager

import numpy as np


class Visualizer:
    def __init__(self, expr_dir: str):
        self.expr_dir = expr_dir
        os.makedirs(expr_dir, exist_ok=True)
        self.log_path = os.path.join(expr_dir, "loss_log.jsonl")
        self.visual_dir = os.path.join(expr_dir, "visuals")
        os.makedirs(self.visual_dir, exist_ok=True)
        self._timers = defaultdict(float)
        self._counts = defaultdict(int)

    # --- scalars ---------------------------------------------------------

    def log_scalars(self, step: int, epoch: int, scalars: dict, phase="train"):
        rec = {"t": time.time(), "step": int(step), "epoch": int(epoch),
               "phase": phase}
        rec.update({k: float(v) for k, v in scalars.items()})
        with open(self.log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return rec

    def print_current_errors(self, epoch, step, errors, t_per_sample):
        msg = f"(epoch {epoch}, step {step}, t/smpl {t_per_sample:.3f}s) " + \
            " ".join(f"{k}:{float(v):.4f}" for k, v in errors.items())
        print(msg, flush=True)

    # --- images ----------------------------------------------------------

    def save_images(self, step: int, visuals: dict):
        """visuals: name -> (H,W,3) or (B,H,W,3) float [-1,1]."""
        import cv2
        for name, img in visuals.items():
            arr = np.asarray(img)
            if arr.ndim == 4:
                arr = np.concatenate(list(arr), axis=1)  # horizontal strip
            if arr.shape[-1] == 1:
                arr = np.repeat(arr, 3, axis=-1)
            out = ((arr + 1.0) / 2.0 * 255).clip(0, 255).astype(np.uint8)
            path = os.path.join(self.visual_dir, f"{step:08d}_{name}.png")
            cv2.imwrite(path, cv2.cvtColor(out, cv2.COLOR_RGB2BGR))

    # --- timers ----------------------------------------------------------

    @contextmanager
    def timer(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._timers[name] += time.perf_counter() - t0
            self._counts[name] += 1

    def timer_summary(self) -> dict:
        return {k: {"total_s": v, "count": self._counts[k],
                    "mean_s": v / max(self._counts[k], 1)}
                for k, v in self._timers.items()}


def fim_enc_to_img(fim_enc: np.ndarray, map_name: str) -> np.ndarray:
    """Conditioning-map -> displayable HWC image (mesh.cvt_fim_enc,
    utils/mesh.py:476-525). fim_enc: (H, W, C) numpy."""
    enc = np.asarray(fim_enc)
    if map_name == "uv":
        img = np.ones(enc.shape[:2] + (3,), np.float32)
        img[..., :2] = enc[..., :2]
    elif map_name in ("seg", "ids"):
        img = np.repeat(enc[..., :1], 3, axis=-1)
    elif map_name == "uv_seg":
        img = enc.copy()
    elif map_name == "par":
        lab = enc.argmax(axis=-1).astype(np.float32)
        lab /= max(lab.max(), 1.0)
        img = np.repeat(lab[..., None], 3, axis=-1)
    elif map_name == "binary":
        weights = 2.0 ** np.arange(enc.shape[-1])[::-1]
        val = (np.maximum(enc, 0) * weights).sum(-1)
        val /= max(val.max(), 1.0)
        img = np.repeat(val[..., None].astype(np.float32), 3, axis=-1)
    else:
        raise ValueError(map_name)
    return img.astype(np.float32)


# LSP-plus skeleton connectivity (0-indexed), matching the reference's
# visdom skeleton plot (utils/visdom_visualizer.py:69-88). HMR's j2d is
# cocoplus: 0..13 lsp joints, 14..18 face/neck extras.
SKELETON_LIMBS = [(13, 12), (12, 9), (9, 10), (10, 11), (12, 8), (8, 7),
                  (7, 6), (12, 3), (12, 2), (3, 4), (4, 5), (2, 1), (1, 0),
                  (17, 15), (15, 14), (14, 16), (16, 18)]


def draw_skeleton(img: np.ndarray, kps: np.ndarray,
                  color=(0.0, 1.0, 0.0), radius: int = 2) -> np.ndarray:
    """Overlay 2D keypoints + limbs on an image.

    img: (S, S, 3) in [-1, 1]; kps: (K, 2) in [-1, 1] image coords
    (HMR j2d convention). Returns a copy in [-1, 1]. The reference drew
    these into live visdom windows (visdom_visualizer.plot_skeleton);
    here they rasterize into the JSONL/PNG dump stream.
    """
    import cv2
    s = img.shape[0]
    out = ((np.asarray(img) + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
    out = np.ascontiguousarray(out)
    pts = ((np.asarray(kps)[:, :2] + 1.0) * 0.5 * (s - 1)).astype(int)
    bgr = tuple(int(c * 255) for c in color[::-1])
    k = pts.shape[0]
    for a, b in SKELETON_LIMBS:
        if a < k and b < k:
            cv2.line(out, tuple(pts[a]), tuple(pts[b]), bgr, 1)
    for p in pts:
        cv2.circle(out, tuple(p), radius, bgr, -1)
    return out.astype(np.float32) / 127.5 - 1.0
