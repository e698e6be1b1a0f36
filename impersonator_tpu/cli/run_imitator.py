"""Motion imitation CLI (reference ``run_imitator.py:214-241``).

    python -m impersonator_tpu.cli.run_imitator \
        --src_path path/to/src.jpg --tgt_path path/to/frames_dir \
        --output_dir ./outputs/results [--post_tune] [--front_warp]
"""

from __future__ import annotations

import glob
import os

import numpy as np

from impersonator_tpu.config import TestConfig, from_args
from impersonator_tpu.tasks.imitator import Imitator
from impersonator_tpu.utils import cv_utils
from impersonator_tpu.utils.video import frames_to_mp4


VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm")


def collect_frames(tgt_path: str):
    if os.path.isdir(tgt_path):
        return sorted(
            p for p in glob.glob(os.path.join(tgt_path, "*"))
            if p.lower().endswith((".jpg", ".jpeg", ".png")))
    return [tgt_path]


def main(argv=None):
    import argparse
    cfg = from_args(TestConfig, argv)
    parser = argparse.ArgumentParser()
    parser.add_argument("--prior_poses", default=None,
                        help="pkl of prior pose thetas for post_tune "
                             "(the reference's assets/samples/A_priors, "
                             "run_imitator.py:69-95)")
    parser.add_argument("--face_path", default=None,
                        help="converted Sphere20a msgpack: enables the "
                             "post-tune FaceLoss term (reference "
                             "imitator.py:434-452 always includes it)")
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard the frame axis over all local devices "
                             "(jax.sharding data mesh; params replicate — "
                             "the TPU-native DataParallel, SURVEY §2.3)")
    parser.add_argument("--batch", type=int, default=32,
                        help="frames per device step; 32 is the measured "
                             "throughput knee on v5e (316 f/s vs 274 at "
                             "16 — the step is HBM-bound, larger batches "
                             "only amortize dispatch)")
    parser.add_argument("--i420", action="store_true",
                        help="video-optimized readback: predictions come "
                             "back as device-packed raw yuv420p (1.5 B/px "
                             "over the D2H link vs 3 for u8 RGB) and feed "
                             "the mp4 encoder verbatim; jpgs are decoded "
                             "host-side from the same planes")
    extra, _ = parser.parse_known_args(argv)
    cfg.save("test")
    mesh = None
    if extra.data_parallel:
        import jax

        from impersonator_tpu.parallel.mesh import make_mesh
        if jax.device_count() > 1:
            mesh = make_mesh()
    imitator = Imitator(cfg, mesh=mesh)

    src_img = cv_utils.resize_img_hwc(
        cv_utils.read_img(cfg.src_path), cfg.image_size)
    imitator.personalize(src_img)

    if cfg.post_tune:
        from impersonator_tpu.tasks.post_tune import adaptive_personalize
        face = face_params = None
        if extra.face_path and os.path.exists(extra.face_path):
            from flax import serialization
            from impersonator_tpu.models.facenet import Sphere20a
            face = Sphere20a()
            with open(extra.face_path, "rb") as f:
                face_params = serialization.msgpack_restore(f.read())
        adaptive_personalize(imitator, prior_poses_path=extra.prior_poses,
                             face=face, face_params=face_params)

    frames = collect_frames(cfg.tgt_path)
    # streaming feed: host decode (native C++ prefetch when built)
    # overlaps device compute; predictions come back quantized on device
    # (uint8 RGB = 4x smaller readback; --i420 = 8x, video-native)
    packed = None
    if extra.i420:
        from impersonator_tpu.ops.colorspace import i420_to_rgb
        packed = np.asarray(imitator.inference_from_paths(
            frames, cam_strategy=cfg.cam_strategy, batch=extra.batch,
            as_i420=True))
        preds = i420_to_rgb(packed)
    else:
        preds = np.asarray(imitator.inference_from_paths(
            frames, cam_strategy=cfg.cam_strategy, batch=extra.batch,
            as_uint8=True))

    if cfg.save_res and cfg.output_dir:
        os.makedirs(cfg.output_dir, exist_ok=True)
        for p, pred in zip(frames, preds):
            name = os.path.split(p)[-1]
            cv_utils.save_img(pred, os.path.join(cfg.output_dir,
                                                 "pred_" + name),
                              normalize=False)
        if len(preds) > 1:
            try:
                if packed is not None:
                    from impersonator_tpu.utils.video import i420_to_mp4
                    i420_to_mp4(packed,
                                os.path.join(cfg.output_dir, "pred.mp4"))
                else:
                    frames_to_mp4(preds,
                                  os.path.join(cfg.output_dir, "pred.mp4"))
                # the reference's showcase format: [source | reference |
                # prediction] side-by-side (utils/video.py:53-96)
                from impersonator_tpu.utils.video import (
                    fuse_source_reference_output)
                refs = np.stack([
                    cv_utils.resize_img_hwc(cv_utils.read_img(p),
                                            cfg.image_size)
                    for p in frames])
                fuse_source_reference_output(
                    src_img, refs, preds,
                    os.path.join(cfg.output_dir, "montage.mp4"))
            except RuntimeError as e:
                print(f"skipping video encode: {e}")
    print(f"imitated {len(preds)} frames -> {cfg.output_dir}")
    return preds


if __name__ == "__main__":
    main()
