"""Host-side image IO + camera algebra.

Covers the reference's ``utils/cv_utils.py``: read/save/resize/normalize
(:10-47), the HMR crop-camera transforms (:176-245) and global-rotation
edits (:356-376). Images are HWC RGB float32; the [-1, 1] normalization
matches ``transform_img(...) * 2 - 1``.
"""

from __future__ import annotations

import math
import os

import cv2
import numpy as np


def read_img(path: str) -> np.ndarray:
    """Read RGB image (cv_utils.read_cv2_img, :10-21)."""
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def resize_img_hwc(img: np.ndarray, image_size: int) -> np.ndarray:
    """uint8/float HWC -> float32 HWC in [-1, 1] at image_size²
    (transform_img, cv_utils.py:24-37)."""
    if img.dtype != np.float32:
        img = img.astype(np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    if img.shape[0] != image_size or img.shape[1] != image_size:
        img = cv2.resize(img, (image_size, image_size))
    return img * 2.0 - 1.0


def save_img(img: np.ndarray, path: str, normalize: bool = True,
             image_size: int | None = None):
    """float HWC [-1,1] (or uint8) -> file (save_cv2_img, :40-47)."""
    out = img
    if normalize:
        out = ((img + 1.0) / 2.0 * 255).clip(0, 255).astype(np.uint8)
    elif out.dtype != np.uint8:
        out = out.clip(0, 255).astype(np.uint8)
    if image_size is not None:
        out = cv2.resize(out, (image_size, image_size))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
    return path


def load_image_batch(paths, image_size: int) -> np.ndarray:
    """Decode + resize a frame list -> (N, S, S, 3) in [-1, 1]."""
    return np.stack([resize_img_hwc(read_img(p), image_size) for p in paths])


# --------------------------------------------------------------------------
# HMR crop-camera algebra (cv_utils.py:176-245)
# --------------------------------------------------------------------------

def cam_init2orig(cam, scale, start_pt, N: int = 224):
    """HMR crop cam -> original-image cam (cv_utils.py:176-200)."""
    cam = np.asarray(cam, np.float64)
    start_pt = np.asarray(start_pt, np.float64)
    cam_crop = np.hstack([N * cam[0] * 0.5, cam[1:] + (2.0 / cam[0]) * 0.5])
    cam_orig = np.hstack([
        cam_crop[0] / scale,
        cam_crop[1:] + (start_pt - N) / cam_crop[0],
    ])
    return cam_orig.astype(np.float32)


def cam_orig2crop(cam, scale, start_pt, N: int = 256, normalize: bool = True):
    """Original-image cam -> (normalized) crop cam (cv_utils.py:203-226)."""
    cam = np.asarray(cam, np.float64)
    start_pt = np.asarray(start_pt, np.float64)
    cam_recrop = np.hstack([
        cam[0] * scale,
        cam[1:] + (N - start_pt) / (scale * cam[0]),
    ])
    if normalize:
        cam_recrop = np.hstack([
            cam_recrop[0] * (2.0 / N),
            cam_recrop[1:] - N / (2 * cam_recrop[0]),
        ])
    return cam_recrop.astype(np.float32)


def cam_process(cam_init, scale_150, start_pt_150, scale_proc, start_pt_proc,
                image_size):
    """Chain of the two transforms above (cv_utils.py:229-245)."""
    cam_orig = cam_init2orig(cam_init, scale_150, start_pt_150, N=224)
    return cam_orig2crop(cam_orig, scale_proc, start_pt_proc, N=image_size)


def euler2matrix(rt, deg: bool = True) -> np.ndarray:
    """Euler -> R (cv_utils.py:333-353): R = Rz @ Ry @ Rx."""
    rt = np.asarray(rt, np.float64)
    if deg:
        rt = np.deg2rad(rt)
    x, y, z = rt
    rx = np.array([[1, 0, 0], [0, math.cos(x), -math.sin(x)],
                   [0, math.sin(x), math.cos(x)]])
    ry = np.array([[math.cos(y), 0, math.sin(y)], [0, 1, 0],
                   [-math.sin(y), 0, math.cos(y)]])
    rz = np.array([[math.cos(z), -math.sin(z), 0],
                   [math.sin(z), math.cos(z), 0], [0, 0, 1]])
    return (rz @ ry @ rx).astype(np.float32)


def rotate_global_pose(pose72: np.ndarray, R: np.ndarray) -> np.ndarray:
    """Compose a rotation into the global axis-angle (cv_utils.py:356-376)."""
    pose = np.asarray(pose72, np.float32).copy()
    aa = pose[..., :3]
    orig_R, _ = cv2.Rodrigues(aa.reshape(3))
    new_R = R @ orig_R
    new_aa, _ = cv2.Rodrigues(new_R)
    pose[..., :3] = new_aa.reshape(3)
    return pose
