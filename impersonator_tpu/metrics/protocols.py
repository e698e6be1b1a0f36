"""Evaluation protocols.

JSON-driven eval splits mirroring the his_evaluators protocol layer
(``thirdparty/his_evaluators/protocols/iPER.py:10-400``): for each video,
a set of source frames (multi-view), a self-imitation frame range and a
cross-imitation target. The protocol file format is the reference's
``iPER_protocol.json``:

    [{"videoID": "001/1/1", "source": {"1": [frame...], ...},
      "self_imitation": {"begin": i, "end": j},
      "cross_imitation": {"videoID": ..., "begin": i, "end": j}}, ...]
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import List, Optional


@dataclass
class VideoProtocol:
    video_id: str
    source_frames: dict           # view angle -> [frame indices/names]
    self_range: tuple             # (begin, end)
    cross_video: Optional[str]
    cross_range: Optional[tuple]


class Protocol:
    """Base protocol: iterate (source image, target clip) eval units."""

    def __init__(self, data_dir: str, protocol_file: str):
        self.data_dir = data_dir
        with open(protocol_file) as f:
            raw = json.load(f)
        self.videos: List[VideoProtocol] = []
        for item in raw:
            cross = item.get("cross_imitation") or {}
            self.videos.append(VideoProtocol(
                video_id=item["videoID"],
                source_frames=item.get("source", {}),
                self_range=(item["self_imitation"]["begin"],
                            item["self_imitation"]["end"]),
                cross_video=cross.get("videoID"),
                cross_range=((cross["begin"], cross["end"])
                             if cross else None),
            ))

    def __len__(self):
        return len(self.videos)

    def frames_dir(self, video_id: str, images_folder: str = "images_HD"):
        return os.path.join(self.data_dir, images_folder, video_id)


class IPERProtocol(Protocol):
    """iPER evaluation protocol (protocols/iPER.py)."""


PROTOCOLS = {"iPER": IPERProtocol}


def build_protocol(name: str, data_dir: str, protocol_file: str) -> Protocol:
    if name not in PROTOCOLS:
        raise ValueError(f"unknown protocol {name}")
    return PROTOCOLS[name](data_dir, protocol_file)
