"""Appearance-transfer CLI (reference ``run_swap.py:39-69``).

    python -m impersonator_tpu.cli.run_swap \
        --src_path src.jpg --tgt_path tgt.jpg --swap_part body
"""

from __future__ import annotations

import os

import numpy as np

from impersonator_tpu.config import TestConfig, from_args
from impersonator_tpu.tasks.swapper import Swapper
from impersonator_tpu.utils import cv_utils


def main(argv=None):
    cfg = from_args(TestConfig, argv)
    cfg.save("test")
    swapper = Swapper(cfg)

    src = cv_utils.resize_img_hwc(cv_utils.read_img(cfg.src_path),
                                  cfg.image_size)
    tgt = cv_utils.resize_img_hwc(cv_utils.read_img(cfg.tgt_path),
                                  cfg.image_size)
    swapper.swap_setup(src, tgt)

    if cfg.post_tune:
        from impersonator_tpu.tasks.post_tune import post_tune_swapper
        post_tune_swapper(swapper)

    preds = np.asarray(swapper.swap(target_part=cfg.swap_part))[0]
    if cfg.save_res and cfg.output_dir:
        out = os.path.join(cfg.output_dir, "swap_result.png")
        cv_utils.save_img(preds, out)
        print("saved", out)
    return preds


if __name__ == "__main__":
    main()
