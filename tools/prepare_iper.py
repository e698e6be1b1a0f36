"""iPER dataset preparation: videos -> protocol-named frame folders.

Equivalent of the reference's ``tools/unzip_iPER.py`` (ffmpeg frame
extraction + renaming into the `{actor}/{outfit}/{cam}` protocol layout):

    python tools/prepare_iper.py --video_dir /data/iPER_videos \
        --out_dir /data/iPER/images_HD [--fps 25]

Video files are expected as `{actor}_{outfit}_{cam}.mp4` and the frames
land in `{out_dir}/{actor}/{outfit}/{cam}/frame_%08d.png`.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from impersonator_tpu.utils.video import video_to_frames  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--video_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--fps", type=int, default=None)
    args = ap.parse_args()

    videos = sorted(glob.glob(os.path.join(args.video_dir, "*.mp4")))
    if not videos:
        print(f"no videos under {args.video_dir}")
        return
    for path in videos:
        stem = os.path.splitext(os.path.basename(path))[0]
        parts = stem.split("_")
        if len(parts) >= 3:
            rel = os.path.join(parts[0], parts[1], parts[2])
        else:
            rel = stem
        out = os.path.join(args.out_dir, rel)
        if os.path.isdir(out) and os.listdir(out):
            print(f"skip {rel} (exists)")
            continue
        n = len(video_to_frames(path, out, fps=args.fps))
        print(f"{rel}: {n} frames")


if __name__ == "__main__":
    main()
