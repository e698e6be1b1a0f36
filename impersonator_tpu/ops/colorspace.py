"""Device-side RGB -> planar YUV 4:2:0 (I420) packing for video readback.

The production output of motion imitation is an H.264 video in yuv420p
(the reference pipes RGB frames through cv2-avi then ffmpeg,
``/root/reference/utils/video.py:25-50``, and the encoder converts to
4:2:0 anyway). Doing the colorspace conversion + 2x2 chroma subsampling
ON DEVICE halves the device->host readback to 1.5 bytes/pixel (vs 3 for
RGB u8, 12 for fp32) with zero quality loss relative to what the video
encoder would produce — the D2H link (PCIe, or the relay tunnel under
axon) is the binding constraint of the end-to-end video job, so bytes
saved here are throughput gained 1:1.

Uses BT.601 limited-range ("studio swing") coefficients — what ffmpeg
assumes for rawvideo ``-pix_fmt yuv420p`` input by default — so the
packed planes feed the encoder verbatim.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# BT.601 limited range, R/G/B in [0,1]:
#   Y  = 16  +  65.481 R + 128.553 G +  24.966 B
#   Cb = 128 -  37.797 R -  74.203 G + 112.000 B
#   Cr = 128 + 112.000 R -  93.786 G -  18.214 B
_FWD = np.array([[65.481, 128.553, 24.966],
                 [-37.797, -74.203, 112.0],
                 [112.0, -93.786, -18.214]], np.float32)
_OFF = np.array([16.0, 128.0, 128.0], np.float32)


def rgb_to_i420(preds: jax.Array) -> jax.Array:
    """(N, H, W, 3) float in [-1, 1] -> packed I420 (N, H*3//2, W) uint8.

    Layout matches raw yuv420p memory order when flattened row-major:
    full-res Y plane (H rows), then the (H/2, W/2) U plane occupying
    H/4 rows of width W, then V likewise — ``arr.tobytes()`` is a valid
    rawvideo frame. Chroma is the mean of each 2x2 pixel block (the
    standard siting swscale uses for RGB->420 conversion).
    """
    n, h, w = preds.shape[0], preds.shape[1], preds.shape[2]
    assert h % 4 == 0 and w % 2 == 0, (h, w)
    rgb01 = jnp.clip((preds + 1.0) * 0.5, 0.0, 1.0)
    ycc = rgb01 @ jnp.asarray(_FWD.T) + jnp.asarray(_OFF)  # (N,H,W,3)
    y = ycc[..., 0]
    # subsample chroma: 2x2 block mean of the full-res Cb/Cr fields
    cbcr = ycc[..., 1:].reshape(n, h // 2, 2, w // 2, 2, 2).mean(axis=(2, 4))
    u8 = lambda x: jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)  # noqa: E731
    return jnp.concatenate([
        u8(y),
        u8(cbcr[..., 0]).reshape(n, h // 4, w),
        u8(cbcr[..., 1]).reshape(n, h // 4, w),
    ], axis=1)


def i420_to_rgb_device(packed: jax.Array) -> jax.Array:
    """Device-side inverse for video INGEST: packed I420 (N, H*3//2, W)
    uint8 -> (N, H, W, 3) float32 in [-1, 1].

    Video decoders emit yuv420p natively — accepting it raw halves the
    host->device bytes (1.5 B/px vs u8 RGB's 3) and moves the colorspace
    conversion onto the TPU, where it fuses into the consumer's first
    conv. Same BT.601 limited-range inverse + nearest-neighbor chroma
    upsample as the host ``i420_to_rgb`` so the two paths agree to float
    rounding.
    """
    n, h32, w = packed.shape
    h = h32 * 2 // 3
    f = packed.astype(jnp.float32)
    y = f[:, :h, :]
    u = f[:, h:h + h // 4, :].reshape(n, h // 2, w // 2)
    v = f[:, h + h // 4:, :].reshape(n, h // 2, w // 2)
    up = lambda c: jnp.repeat(jnp.repeat(c, 2, axis=1), 2,  # noqa: E731
                              axis=2)
    c = 1.164383 * (y - 16.0)
    d, e = up(u) - 128.0, up(v) - 128.0
    rgb = jnp.stack([c + 1.596027 * e,
                     c - 0.391762 * d - 0.812968 * e,
                     c + 2.017232 * d], axis=-1)
    return jnp.clip(rgb / 127.5 - 1.0, -1.0, 1.0)


def i420_to_rgb(packed: np.ndarray) -> np.ndarray:
    """Host-side inverse for tests / jpg export: packed (N, H*3//2, W)
    uint8 -> (N, H, W, 3) uint8 RGB (nearest-neighbor chroma upsample)."""
    packed = np.asarray(packed)
    n, h32, w = packed.shape
    h = h32 * 2 // 3
    y = packed[:, :h, :].astype(np.float32)
    u = packed[:, h:h + h // 4, :].reshape(n, h // 2, w // 2)
    v = packed[:, h + h // 4:, :].reshape(n, h // 2, w // 2)
    up = lambda c: np.repeat(np.repeat(c, 2, axis=1), 2,  # noqa: E731
                             axis=2).astype(np.float32)
    c = 1.164383 * (y - 16.0)
    d, e = up(u) - 128.0, up(v) - 128.0
    rgb = np.stack([c + 1.596027 * e,
                    c - 0.391762 * d - 0.812968 * e,
                    c + 2.017232 * d], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
