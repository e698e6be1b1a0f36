"""Task registry (reference ModelsFactory, models/models.py:11-60).

The reference's 9 registered names map onto our drivers/trainers:

    imitator / swapper / viewer / animator       -> inference drivers
    impersonator_trainer / impersonator_trainer_aug -> training stacks
    concat / texture_warping / feature_warping   -> ablation baselines
    (the reference's 'animator' raised NotImplementedError; ours works)
"""

from __future__ import annotations


def get_by_name(name: str, cfg, **kwargs):
    if name == "imitator":
        from impersonator_tpu.tasks.imitator import Imitator
        return Imitator(cfg, **kwargs)
    if name == "swapper":
        from impersonator_tpu.tasks.swapper import Swapper
        return Swapper(cfg, **kwargs)
    if name == "viewer":
        from impersonator_tpu.tasks.viewer import Viewer
        return Viewer(cfg, **kwargs)
    if name == "animator":
        from impersonator_tpu.tasks.animator import Animator
        return Animator(cfg, **kwargs)
    if name == "impersonator_trainer":
        from impersonator_tpu.tasks.trainer import build_trainer
        return build_trainer(cfg, **kwargs)
    if name == "impersonator_trainer_aug":
        from impersonator_tpu.tasks.trainer_aug import build_aug_trainer
        return build_aug_trainer(cfg, **kwargs)
    if name in ("concat", "texture_warping", "feature_warping"):
        from impersonator_tpu.tasks.trainer_baseline import (
            build_baseline_trainer)
        return build_baseline_trainer(cfg, **kwargs)
    raise ValueError(f"Model {name} not recognized.")
