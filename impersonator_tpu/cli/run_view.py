"""Novel-view CLI (reference ``run_view.py:36-85``): either a single
(R, t) from --view_params or a full yaw sweep.

    python -m impersonator_tpu.cli.run_view --src_path src.jpg \
        --view_params "R=0,90,0/t=0,0,0"
"""

from __future__ import annotations

import os

import numpy as np

from impersonator_tpu.config import TestConfig, from_args
from impersonator_tpu.tasks.viewer import Viewer
from impersonator_tpu.utils import cv_utils
from impersonator_tpu.utils.video import frames_to_mp4


def main(argv=None, sweep: bool = True, n_views: int = 16):
    cfg = from_args(TestConfig, argv)
    cfg.save("test")
    viewer = Viewer(cfg)

    src = cv_utils.resize_img_hwc(cv_utils.read_img(cfg.src_path),
                                  cfg.image_size)
    viewer.personalize(src)

    if cfg.T_pose:
        # re-personalize with the canonical T-pose (zeroed articulation,
        # source cam/shape kept) before sweeping — demo_view.py:55-98
        theta = np.asarray(viewer.src_info["theta"]).copy()
        theta[:, 3:75] = 0.0
        viewer.personalize(src, smpl=theta[0])

    if sweep:
        yaws = np.linspace(0, 360, n_views, endpoint=False)
        preds = np.asarray(viewer.view_sweep(list(yaws)))
    else:
        vp = cfg.parse_view_params()
        preds = np.asarray(viewer.view(vp["R"], vp["t"]))

    if cfg.save_res and cfg.output_dir:
        os.makedirs(cfg.output_dir, exist_ok=True)
        for i, p in enumerate(preds):
            cv_utils.save_img(p, os.path.join(cfg.output_dir,
                                              f"view_{i:03d}.png"))
        if len(preds) > 1:
            try:
                frames_to_mp4(preds, os.path.join(cfg.output_dir, "views.mp4"))
            except RuntimeError as e:
                print(f"skipping video encode: {e}")
    print(f"rendered {len(preds)} views -> {cfg.output_dir}")
    return preds


if __name__ == "__main__":
    main()
