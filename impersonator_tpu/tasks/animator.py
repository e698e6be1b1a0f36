"""Sequence animator.

The reference registers an Animator but leaves it dead (factory raises
NotImplementedError, models/models.py:39-42; models/animator.py passes
kwargs the renderer no longer accepts — SURVEY §7.4). Here the animator
is alive: it drives a full SMPL θ sequence through the imitator core in
fixed-size device batches, optionally holding selected body parts to the
source pose (the part-masked-T-over-time idea of the stale code, realized
with the swapper's part tables).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from impersonator_tpu.config import TestConfig
from impersonator_tpu.tasks.imitator import Imitator


class Animator(Imitator):
    """Imitator specialization for long sequences."""

    def animate(self, smpl_sequence, cam_strategy: str = "smooth",
                batch: int = 16, freeze_parts=()):
        """smpl_sequence: (T, 85). freeze_parts: part names whose pose
        dims are held at the source pose across the sequence."""
        seq = np.array(smpl_sequence, np.float32, copy=True)
        if freeze_parts and self.src_info is not None:
            src_pose = np.asarray(self.src_info["pose"])[0]
            for part in freeze_parts:
                for j in _PART_JOINTS.get(part, ()):
                    seq[:, 3 + 3 * j: 6 + 3 * j] = src_pose[3 * j: 3 * j + 3]
        return self.inference_by_smpls(seq, cam_strategy=cam_strategy,
                                       batch=batch)


# part name -> SMPL joint ids whose axis-angle is frozen
_PART_JOINTS = {
    "01_head": (12, 15),
    "02_torso": (0, 3, 6, 9, 13, 14),
    "03_left_upper_arm": (16, 18),
    "04_left_lower_arm": (20, 22),
    "05_right_upper_arm": (17, 19),
    "06_right_lower_arm": (21, 23),
    "07_left_upper_leg": (1, 4),
    "08_left_lower_leg": (7, 10),
    "09_right_upper_leg": (2, 5),
    "10_right_lower_leg": (8, 11),
}
