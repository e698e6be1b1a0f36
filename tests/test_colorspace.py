"""On-device RGB -> I420 packing (ops/colorspace.py): oracle, round-trip,
and the raw-yuv420p encoder feed."""

import numpy as np
import pytest

from impersonator_tpu.ops.colorspace import i420_to_rgb, rgb_to_i420


def _oracle_i420(preds: np.ndarray) -> np.ndarray:
    """Straight-line numpy restatement of the BT.601 limited-range
    formula + 2x2 chroma mean, in I420 memory order."""
    n, h, w, _ = preds.shape
    rgb = np.clip((preds.astype(np.float64) + 1.0) * 0.5, 0.0, 1.0)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 16.0 + 65.481 * r + 128.553 * g + 24.966 * b
    cb = 128.0 - 37.797 * r - 74.203 * g + 112.0 * b
    cr = 128.0 + 112.0 * r - 93.786 * g - 18.214 * b
    sub = lambda c: c.reshape(n, h // 2, 2, w // 2, 2).mean(  # noqa: E731
        axis=(2, 4))
    u8 = lambda x: np.clip(np.round(x), 0, 255).astype(np.uint8)  # noqa
    return np.concatenate([
        u8(y), u8(sub(cb)).reshape(n, h // 4, w),
        u8(sub(cr)).reshape(n, h // 4, w)], axis=1)


def test_rgb_to_i420_matches_oracle():
    rng = np.random.default_rng(0)
    preds = rng.uniform(-1.1, 1.1, (2, 16, 12, 3)).astype(np.float32)
    packed = np.asarray(rgb_to_i420(preds))
    want = _oracle_i420(preds)
    assert packed.shape == want.shape == (2, 24, 12)
    assert packed.dtype == np.uint8
    # fp32-vs-fp64 accumulation can flip a rounding boundary by 1 code
    diff = np.abs(packed.astype(int) - want.astype(int))
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 0.02


def test_i420_roundtrip_smooth_image():
    """Smooth chroma -> the 4:2:0 subsample loses almost nothing; the
    round trip is bounded by quantization, not structure."""
    h = w = 32
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([yy / h, xx / w, (yy + xx) / (h + w)], axis=-1)
    preds = (img * 2.0 - 1.0)[None]
    rgb = i420_to_rgb(rgb_to_i420(preds)).astype(np.float32)
    want = np.clip((preds + 1.0) * 127.5, 0, 255)
    err = np.abs(rgb - want)
    assert err.max() <= 12.0, err.max()
    assert err.mean() <= 2.5, err.mean()


def test_i420_grayscale_near_exact():
    """R=G=B -> constant chroma (128); only Y quantization survives."""
    rng = np.random.default_rng(1)
    g = rng.uniform(-1, 1, (1, 16, 16, 1)).astype(np.float32)
    preds = np.repeat(g, 3, axis=-1)
    rgb = i420_to_rgb(rgb_to_i420(preds)).astype(np.float32)
    want = np.clip((preds + 1.0) * 127.5, 0, 255)
    assert np.abs(rgb - want).max() <= 2.0


def test_i420_to_mp4(tmp_path):
    import shutil
    if shutil.which("ffmpeg") is None:
        pytest.skip("ffmpeg not on host")
    from impersonator_tpu.utils.video import i420_to_mp4
    rng = np.random.default_rng(2)
    preds = rng.uniform(-1, 1, (4, 32, 32, 3)).astype(np.float32)
    packed = np.asarray(rgb_to_i420(preds))
    out = i420_to_mp4(packed, str(tmp_path / "v.mp4"), fps=5)
    import os
    assert os.path.getsize(out) > 0
