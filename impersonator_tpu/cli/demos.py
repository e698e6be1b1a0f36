"""Demo drivers (reference demo_imitator.py / demo_swap.py / demo_view.py):
iterate canned assets and write mp4/png strips. With no asset directory
given, deterministic synthetic fixtures are generated so the demos always
run (the reference demos hard-require downloaded samples).

    python -m impersonator_tpu.cli.demos imitator [--src_dir ... --ref_dir ...]
    python -m impersonator_tpu.cli.demos swap
    python -m impersonator_tpu.cli.demos view
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

from impersonator_tpu.config import TestConfig, from_args
from impersonator_tpu.utils import cv_utils


def _synthetic_image(seed: int, size: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, (size, size, 3)).astype(np.float32)
    # blocky "person": head + torso so the HMR/renderer have structure
    c = size // 2
    img[size // 6: size // 3, c - size // 10: c + size // 10] = [0.8, 0.6, 0.5]
    img[size // 3: int(size * 0.8), c - size // 7: c + size // 7] = [0.3, 0.3, 0.7]
    return img * 2 - 1


def _sources(args, cfg, n=2):
    if args.src_dir and os.path.isdir(args.src_dir):
        paths = sorted(glob.glob(os.path.join(args.src_dir, "*")))[:n]
        return [cv_utils.resize_img_hwc(cv_utils.read_img(p), cfg.image_size)
                for p in paths]
    return [_synthetic_image(i, cfg.image_size) for i in range(n)]


def demo_imitator(args, cfg):
    from impersonator_tpu.tasks.imitator import Imitator
    imit = Imitator(cfg)
    src = _sources(args, cfg, 1)[0]
    theta = np.zeros(85, np.float32)
    theta[0] = 0.9
    imit.personalize(src, src_smpl=theta)
    rng = np.random.default_rng(0)
    seq = np.tile(theta, (args.frames, 1))
    seq[:, 3:75] += np.cumsum(
        rng.normal(0, 0.02, (args.frames, 72)), axis=0).astype(np.float32)
    preds = np.asarray(imit.inference_by_smpls(seq, batch=8))
    _save_all(preds, cfg.output_dir, "imitator", src_img=src)


def demo_swap(args, cfg):
    from impersonator_tpu.tasks.swapper import Swapper
    swapper = Swapper(cfg)
    src, tgt = _sources(args, cfg, 2)
    theta = np.zeros(85, np.float32)
    theta[0] = 0.9
    swapper.swap_setup(src, tgt, src_smpl=theta, tgt_smpl=theta)
    preds = np.asarray(swapper.swap(target_part=cfg.swap_part))
    _save_all(preds, cfg.output_dir, "swap")


def demo_view(args, cfg):
    from impersonator_tpu.tasks.viewer import Viewer
    viewer = Viewer(cfg)
    src = _sources(args, cfg, 1)[0]
    theta = np.zeros(85, np.float32)
    theta[0] = 0.9
    viewer.personalize(src, smpl=theta)
    yaws = np.linspace(0, 360, args.frames, endpoint=False)
    preds = np.asarray(viewer.view_sweep(list(yaws)))
    _save_all(preds, cfg.output_dir, "view")


def _save_all(preds, out_dir, name, src_img=None):
    os.makedirs(out_dir, exist_ok=True)
    for i, p in enumerate(preds):
        cv_utils.save_img(p, os.path.join(out_dir, f"{name}_{i:04d}.png"))
    try:
        from impersonator_tpu.utils.video import (
            frames_to_mp4, fuse_source_reference_output)
        frames_to_mp4(preds, os.path.join(out_dir, f"{name}.mp4"))
        if src_img is not None and len(preds) > 1:
            # the reference demos' showcase format: side-by-side
            # [source | prediction] montage (utils/video.py:53-96)
            fuse_source_reference_output(
                src_img, None, preds,
                os.path.join(out_dir, f"{name}_montage.mp4"))
    except RuntimeError:
        pass
    print(f"{name}: wrote {len(preds)} frames -> {out_dir}")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    which = argv[0] if argv and not argv[0].startswith("-") else "imitator"
    rest = argv[1:] if argv and not argv[0].startswith("-") else argv

    ap = argparse.ArgumentParser()
    ap.add_argument("--src_dir", default="")
    ap.add_argument("--ref_dir", default="")
    ap.add_argument("--frames", type=int, default=16)
    extra, passthrough = ap.parse_known_args(rest)
    cfg = from_args(TestConfig, passthrough)

    {"imitator": demo_imitator, "swap": demo_swap,
     "view": demo_view}[which](extra, cfg)


if __name__ == "__main__":
    main()
