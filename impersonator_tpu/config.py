"""Configuration system.

Dataclass re-design of the reference's layered argparse options
(``options/base_options.py:11-142``, ``train_options.py:4-47``,
``test_options.py:4-50``): same flag names and defaults, but typed,
serializable and importable. ``to_argparse``/``from_args`` give CLI
parity for the entry points; ``save`` writes the ``opt_*.txt`` audit file
like BaseOptions._save (base_options.py:133-142).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import re
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass
class BaseConfig:
    # --- data / assets (base_options.py:16-37) ---
    data_dir: str = "/data/iPER"
    place_dir: str = "/data/places365_standard"
    fashion_dir: str = "/data/fashion"
    # dataset registry name (base_options.py:16 --dataset_mode; same
    # names: iPER | iPER_place | fashion | iPER_fashion_place | place |
    # synthetic | synthetic_bg). "auto" infers from --model and whether
    # real assets are configured (synthetic smoke when they are not).
    dataset_mode: str = "auto"
    images_folder: str = "images_HD"
    smpls_folder: str = "smpls"
    train_ids_file: str = "train.txt"
    test_ids_file: str = "val.txt"
    checkpoints_dir: str = "./outputs/checkpoints"
    name: str = "default"

    # asset files; empty → synthetic procedural assets (tests/benches)
    smpl_model: str = ""
    uv_mapping: str = ""
    part_info: str = ""
    front_info: str = ""
    head_info: str = ""
    hmr_model: str = ""
    face_model: str = ""

    # --- model (base_options.py:38-47) ---
    model: str = "impersonator_trainer"
    gen_name: str = "impersonator"
    image_size: int = 256
    # reference default 4 (base_options.py:39) was a 2019 11GB-GPU
    # memory artifact; 16 is the measured bf16 train-step throughput
    # knee on v5e (tools/train_sweep.py: 4->20.9, 16->46.4, 32->43.3
    # samples/s/chip). scripts/train_iPER.sh still pins 4 for
    # reference-recipe parity.
    batch_size: int = 16
    tex_size: int = 3
    repeat_num: int = 6
    map_name: str = "uv_seg"
    norm_type: str = "instance"
    bg_ks: int = 13
    ft_ks: int = 3

    # --- runtime ---
    load_epoch: int = -1
    load_path: str = ""
    n_threads: int = 4
    serial_batches: bool = False
    seed: int = 0

    # numeric policy: params fp32; compute dtype for conv/matmul heavy nets
    compute_dtype: str = "bfloat16"

    # parallelism (new; the reference only had DataParallel, SURVEY §2.3)
    mesh_shape: Tuple[int, ...] = (-1,)   # -1 → all devices on 'data'
    mesh_axes: Tuple[str, ...] = ("data",)

    def assets(self):
        """Resolve the asset bundle (real files or synthetic)."""
        from impersonator_tpu import assets as A
        if self.smpl_model:
            return A.load_smpl_assets(
                self.smpl_model, self.uv_mapping, self.part_info,
                self.front_info, self.head_info)
        return A.synthetic_assets()

    # ---- persistence ----------------------------------------------------

    def expr_dir(self) -> str:
        return os.path.join(self.checkpoints_dir, self.name)

    def save(self, phase: str = "train") -> str:
        os.makedirs(self.expr_dir(), exist_ok=True)
        path = os.path.join(self.expr_dir(), f"opt_{phase}.txt")
        with open(path, "w") as f:
            f.write("------------ Options -------------\n")
            for k, v in sorted(dataclasses.asdict(self).items()):
                f.write(f"{k}: {v}\n")
            f.write("-------------- End ----------------\n")
        return path

    def resolve_load_epoch(self) -> int:
        """load_epoch == -1 → latest checkpoint on disk
        (base_options.py:99-117)."""
        if self.load_epoch >= 0:
            return self.load_epoch
        expr = self.expr_dir()
        if not os.path.isdir(expr):
            return 0
        epochs = [0]
        for fname in os.listdir(expr):
            m = re.match(r"net_epoch_(\d+)_id_G", fname)
            if m:
                epochs.append(int(m.group(1)))
        return max(epochs)


@dataclass
class TrainConfig(BaseConfig):
    """Training flags (options/train_options.py:4-47)."""

    is_train: bool = True
    nepochs_no_decay: int = 5
    nepochs_decay: int = 25
    lr_G: float = 2e-4
    lr_D: float = 2e-4
    final_lr: float = 2e-6
    G_adam_b1: float = 0.5
    G_adam_b2: float = 0.999
    D_adam_b1: float = 0.5
    D_adam_b2: float = 0.999
    train_G_every_n_iterations: int = 1
    d_layers: int = 4  # PatchGAN depth (needs image_size >= 64)

    # loss weights (train_options.py:20-27; paper recipe train_iPER.sh:27-33)
    lambda_D_prob: float = 1.0
    lambda_rec: float = 10.0
    lambda_tsf: float = 10.0
    lambda_face: float = 5.0
    lambda_style: float = 0.0
    lambda_mask: float = 1.0
    lambda_mask_smooth: float = 1.0

    use_vgg: bool = True
    use_style: bool = False
    use_face: bool = True
    mask_bce: bool = True
    bg_both: bool = False
    # mixed-precision TRAIN step: G/D/VGG forwards in this dtype with
    # fp32 master params + fp32 loss terms (inference already honors
    # compute_dtype, tasks/imitator.py:109-130). "float32" | "bfloat16".
    train_dtype: str = "float32"
    # rematerialize the generator forward in the backward pass: trades
    # ~1/3 more G FLOPs for dropping all G activations from HBM - lets
    # batch/resolution scale past the activation-memory wall on a chip
    # (jax.checkpoint; no reference analog, torch would use
    # checkpoint_sequential)
    remat: bool = False

    # logging / checkpoint cadence (train_options.py:9-15)
    print_freq_s: int = 60
    display_freq_s: int = 300
    # multi-controller display/val cadence in STEPS: wall clocks drift
    # across hosts, and the val pass launches collectives on globally
    # sharded arrays, so every process must reach it at the same step
    display_freq_steps: int = 500
    save_latest_freq_s: int = 3600
    num_iters_validate: int = 1


@dataclass
class TestConfig(BaseConfig):
    """Inference flags (options/test_options.py:4-50)."""

    is_train: bool = False
    bg_model: str = "ORIGINAL"       # deepfillv2 ckpt path, or ORIGINAL
    src_path: str = ""
    tgt_path: str = ""
    output_dir: str = "./outputs/results"
    cam_strategy: str = "smooth"     # smooth | source | copy
    post_tune: bool = False
    front_warp: bool = False
    only_vis: bool = False
    has_detector: bool = False
    bg_replace: bool = False
    save_res: bool = True

    # swapper
    swap_part: str = "body"

    # viewer
    T_pose: bool = False
    view_params: str = "R=0,90,0/t=0,0,0"

    def parse_view_params(self):
        """'R=xxx,yyy,zzz/t=dx,dy,dz' (degrees) → dict
        (test_options.py parsing of --view_params)."""
        params = {}
        for part in self.view_params.split("/"):
            key, vals = part.split("=")
            params[key.strip()] = [float(v) for v in vals.split(",")]
        return params


def to_argparse(config_cls) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    for f in dataclasses.fields(config_cls):
        if f.type in ("bool", bool):
            # supports both --flag and --no-flag
            parser.add_argument(f"--{f.name}",
                                action=argparse.BooleanOptionalAction,
                                default=f.default)
        elif isinstance(f.default, tuple):
            parser.add_argument(f"--{f.name}", type=str,
                                default=",".join(map(str, f.default)))
        else:
            typ = type(f.default) if f.default is not None else str
            parser.add_argument(f"--{f.name}", type=typ, default=f.default)
    return parser


def from_args(config_cls, argv=None):
    parser = to_argparse(config_cls)
    ns, _ = parser.parse_known_args(argv)
    kwargs = vars(ns)
    for f in dataclasses.fields(config_cls):
        if isinstance(f.default, tuple) and isinstance(kwargs[f.name], str):
            parts = [p for p in kwargs[f.name].split(",") if p]
            cast = int if all(p.lstrip("-").isdigit() for p in parts) else str
            kwargs[f.name] = tuple(cast(p) for p in parts)
    return config_cls(**kwargs)
