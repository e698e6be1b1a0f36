"""Person segmentation for background separation.

The reference wraps torchvision's Mask-RCNN (utils/detectors.py:7-85) to
get a body mask at personalize time; when absent it falls back to eroding
the SMPL conditioning's background channel (imitator.py:119-122). This
environment has no torchvision, so the detector protocol is:

* :class:`SilhouetteDetector` — the always-available default: the body
  mask IS the rasterized SMPL silhouette, dilated by ``ks`` (fully
  on-device, jittable; strictly better than nothing and deterministic);
* :class:`MaskRCNNDetector` — the torchvision-backed variant, gated on
  import, same interface.

Both return (bbox (4,) int, body_mask (1, H, W, 1) float) like the
reference's PersonMaskRCNNDetector.inference.
"""

from __future__ import annotations

import numpy as np

from impersonator_tpu.ops.morphology import morph


class SilhouetteDetector:
    """Body mask from the SMPL conditioning map (no external model)."""

    def __init__(self, ks: int = 13):
        self.ks = ks

    def inference_from_cond(self, cond):
        """cond: (1, H, W, C) with bg on the last channel (uv_seg)."""
        import jax.numpy as jnp
        bg_mask = morph(cond[..., -1:], ks=self.ks, mode="erode")
        body_mask = 1.0 - bg_mask
        m = np.asarray(body_mask[0, :, :, 0])
        ys, xs = np.nonzero(m > 0.5)
        if len(ys) == 0:
            bbox = np.array([0, m.shape[1], 0, m.shape[0]], np.int32)
        else:
            bbox = np.array([xs.min(), xs.max(), ys.min(), ys.max()], np.int32)
        return bbox, body_mask


class MaskRCNNDetector:
    """torchvision maskrcnn_resnet50_fpn wrapper (reference
    detectors.py:7-85): keeps the largest person instance, dilates the
    mask. Raises ImportError when torchvision is unavailable."""

    def __init__(self, ks: int = 13, threshold: float = 0.5):
        import torch
        import torchvision
        self.torch = torch
        self.model = torchvision.models.detection.maskrcnn_resnet50_fpn(
            pretrained=True).eval()
        self.ks = ks
        self.threshold = threshold

    def inference(self, img_hwc: np.ndarray):
        """img_hwc: (H, W, 3) in [-1, 1]. Returns (bbox, body_mask)."""
        torch = self.torch
        x = torch.from_numpy(((img_hwc + 1.0) / 2.0).transpose(2, 0, 1))
        with torch.no_grad():
            out = self.model([x])[0]
        person = (out["labels"] == 1) & (out["scores"] > self.threshold)
        if not person.any():
            h, w = img_hwc.shape[:2]
            return (np.array([0, w, 0, h], np.int32),
                    np.ones((1, h, w, 1), np.float32))
        areas = (out["boxes"][:, 2] - out["boxes"][:, 0]) * \
                (out["boxes"][:, 3] - out["boxes"][:, 1])
        areas = torch.where(person, areas, torch.zeros_like(areas))
        i = int(torch.argmax(areas))
        mask = out["masks"][i, 0].numpy() > 0.5
        import jax.numpy as jnp
        m = jnp.asarray(mask[None, :, :, None], jnp.float32)
        body = morph(m, ks=self.ks, mode="dilate")
        box = out["boxes"][i].numpy().astype(np.int32)
        bbox = np.array([box[0], box[2], box[1], box[3]], np.int32)
        return bbox, body


def build_detector(has_detector: bool, ks: int = 13):
    """--has_detector selects MaskRCNN body masks when torchvision can
    provide them (reference imitator.py:116-122); otherwise the fallback
    is LOUD, not silent — the SMPL-silhouette mask changes BG-inpainting
    quality on real photos."""
    if not has_detector:
        return SilhouetteDetector(ks)
    try:
        return MaskRCNNDetector(ks)
    except Exception as e:  # torchvision absent or weights unavailable
        print(f"detectors: --has_detector requested but MaskRCNN is "
              f"unavailable ({type(e).__name__}: {e}); falling back to "
              f"the SMPL-silhouette mask")
        return SilhouetteDetector(ks)
