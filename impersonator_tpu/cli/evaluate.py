"""Evaluation CLI.

Mirrors the reference ``evaluate.py:15-138`` + the his_evaluators
motion-imitation runner (evaluators/motion_imitation.py:202-255): for
each protocol video, personalize on the source frame(s), imitate the
self-imitation range, and score predictions against ground truth with
the paired metric suite. The reference isolates inference in a child
process to bound GPU memory; with jitted JAX fns there is nothing to
isolate — one process streams batches.

    python -m impersonator_tpu.cli.evaluate --data_dir /data/iPER \
        --protocol_file iPER_protocol.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np

from impersonator_tpu.config import TestConfig, from_args
from impersonator_tpu.metrics import PairedMetricRunner
from impersonator_tpu.metrics.protocols import build_protocol
from impersonator_tpu.tasks.imitator import Imitator
from impersonator_tpu.utils import cv_utils


def evaluate_protocol(cfg: TestConfig, protocol_file: str,
                      max_videos: int | None = None,
                      max_frames: int = 64) -> dict:
    protocol = build_protocol("iPER", cfg.data_dir, protocol_file)
    imitator = Imitator(cfg)
    runner = PairedMetricRunner(metric_types=("ssim", "psnr"))

    n = len(protocol) if max_videos is None else min(max_videos, len(protocol))
    for vid in protocol.videos[:n]:
        frames_dir = protocol.frames_dir(vid.video_id, cfg.images_folder)
        frames = sorted(glob.glob(os.path.join(frames_dir, "*")))
        if not frames:
            continue
        src_frame = frames[0]
        src_img = cv_utils.resize_img_hwc(
            cv_utils.read_img(src_frame), cfg.image_size)
        imitator.personalize(src_img)
        if cfg.post_tune:
            from impersonator_tpu.tasks.post_tune import adaptive_personalize
            adaptive_personalize(imitator)

        begin, end = vid.self_range
        tgt_paths = frames[begin:min(end, begin + max_frames)]
        tgt224 = np.stack([
            cv_utils.resize_img_hwc(cv_utils.read_img(p), 224)
            for p in tgt_paths])
        preds = np.asarray(imitator.inference(tgt224,
                                              cam_strategy="smooth"))
        refs = np.stack([
            cv_utils.resize_img_hwc(cv_utils.read_img(p), cfg.image_size)
            for p in tgt_paths])
        runner.update(preds, refs)
    return runner.evaluate()


def main(argv=None):
    cfg = from_args(TestConfig, argv)
    parser = argparse.ArgumentParser()
    parser.add_argument("--protocol_file", default="iPER_protocol.json")
    parser.add_argument("--max_videos", type=int, default=None)
    extra, _ = parser.parse_known_args(argv)

    results = evaluate_protocol(cfg, extra.protocol_file, extra.max_videos)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
