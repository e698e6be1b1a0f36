"""Datasets.

Host-side re-design of the reference's ``data/`` package (SURVEY §2.1):
every dataset yields numpy dicts with the trainer contract
``{'images': (2, S, S, 3) float32 [-1,1], 'smpls': (2, 85) float32}``
(impersonator_trainer.set_input, :289-314). No torch dependency — the
loader threads + device feed replace torch DataLoader workers.

* :class:`ImPerDataset` — iPER video pair sampler: each item picks two
  frames of one video + their per-frame SMPL thetas from the ``smpls``
  pickle (data/imper_dataset.py:13-151).
* :class:`PlaceDataset` — Places2 background crops for the aug trainer
  (data/place_dataset.py).
* :class:`FashionPairDataset` — DeepFashion front/back pairs
  (data/fashion_dataset.py:13-239).
* :class:`ImPerPlaceDataset` — composite: iPER pair + a random Places2
  background per item (data/imper_fashion_place_dataset.py:9-74).
* :class:`SyntheticPairDataset` — procedurally generated pairs so the
  training stack runs with zero downloads (tests/benches).
"""

from __future__ import annotations

import glob
import os
import pickle
import random
from typing import Optional

import numpy as np

from impersonator_tpu.utils import cv_utils


class _Dataset:
    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, idx):
        raise NotImplementedError


def _load_pickle(path):
    with open(path, "rb") as f:
        return pickle.load(f)


class ImPerDataset(_Dataset):
    """iPER motion pair sampler.

    Expects: {data_dir}/{images_folder}/{video_id}/*.jpg and
    {data_dir}/{smpls_folder}/{video_id}/pose_shape.pkl with key 'cams'
    (N,3) + 'pose' (N,72) + 'shape' (N,10), the layout documented in the
    reference (imper_dataset.py:34-101).
    """

    def __init__(self, data_dir: str, ids_file: str, image_size: int = 256,
                 images_folder: str = "images_HD", smpls_folder: str = "smpls",
                 interval: int = 10, seed: int = 0):
        self.image_size = image_size
        self.interval = interval
        self.rng = random.Random(seed)
        self.videos = []
        ids_path = os.path.join(data_dir, ids_file)
        with open(ids_path) as f:
            vids = [line.strip() for line in f if line.strip()]
        for vid in vids:
            img_dir = os.path.join(data_dir, images_folder, vid)
            smpl_pkl = os.path.join(data_dir, smpls_folder, vid,
                                    "pose_shape.pkl")
            frames = sorted(glob.glob(os.path.join(img_dir, "*")))
            if len(frames) < 2 or not os.path.exists(smpl_pkl):
                continue
            self.videos.append((frames, smpl_pkl))
        self._smpl_cache = {}

    def __len__(self):
        return len(self.videos)

    def _smpls(self, pkl_path):
        if pkl_path not in self._smpl_cache:
            d = _load_pickle(pkl_path)
            self._smpl_cache[pkl_path] = np.concatenate(
                [np.asarray(d["cams"], np.float32),
                 np.asarray(d["pose"], np.float32),
                 np.asarray(d["shape"], np.float32)], axis=1)
        return self._smpl_cache[pkl_path]

    def __getitem__(self, idx):
        frames, pkl = self.videos[idx % len(self.videos)]
        smpls = self._smpls(pkl)
        n = min(len(frames), smpls.shape[0])
        i = self.rng.randrange(n)
        j = min(n - 1, i + self.rng.randrange(1, self.interval + 1))
        images = np.stack([
            cv_utils.resize_img_hwc(cv_utils.read_img(frames[i]), self.image_size),
            cv_utils.resize_img_hwc(cv_utils.read_img(frames[j]), self.image_size),
        ])
        return {"images": images, "smpls": smpls[[i, j]]}


class PlaceDataset(_Dataset):
    """Flat recursive image-folder of backgrounds with random crop+flip
    (data/place_dataset.py)."""

    def __init__(self, data_dir: str, image_size: int = 256, seed: int = 0):
        self.paths = sorted(
            glob.glob(os.path.join(data_dir, "**", "*.jpg"), recursive=True))
        self.image_size = image_size
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx):
        img = cv_utils.read_img(self.paths[idx % len(self.paths)])
        h, w = img.shape[:2]
        s = self.image_size
        if h > s and w > s:
            y = self.rng.randrange(h - s + 1)
            x = self.rng.randrange(w - s + 1)
            img = img[y:y + s, x:x + s]
        out = cv_utils.resize_img_hwc(img, s)
        if self.rng.random() < 0.5:
            out = out[:, ::-1].copy()
        return {"bg": out}


class FashionPairDataset(_Dataset):
    """DeepFashion (src, tsf) pairs from a pair-list file: each line
    'src_rel_path tsf_rel_path' with sibling smpl pkl per image
    (data/fashion_dataset.py:13-239)."""

    def __init__(self, data_dir: str, pairs_file: str = "pairs.txt",
                 image_size: int = 256):
        self.data_dir = data_dir
        self.image_size = image_size
        self.pairs = []
        path = os.path.join(data_dir, pairs_file)
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    parts = line.split()
                    if len(parts) >= 2:
                        self.pairs.append((parts[0], parts[1]))

    def __len__(self):
        return len(self.pairs)

    def _load(self, rel):
        img = cv_utils.resize_img_hwc(
            cv_utils.read_img(os.path.join(self.data_dir, rel)),
            self.image_size)
        smpl_path = os.path.join(
            self.data_dir, os.path.splitext(rel)[0] + "_smpl.pkl")
        d = _load_pickle(smpl_path)
        smpl = np.concatenate([
            np.asarray(d["cams"], np.float32).reshape(-1),
            np.asarray(d["pose"], np.float32).reshape(-1),
            np.asarray(d["shape"], np.float32).reshape(-1)])
        return img, smpl

    def __getitem__(self, idx):
        a, b = self.pairs[idx % len(self.pairs)]
        img_a, smpl_a = self._load(a)
        img_b, smpl_b = self._load(b)
        return {"images": np.stack([img_a, img_b]),
                "smpls": np.stack([smpl_a, smpl_b])}


class ImPerPlaceDataset(_Dataset):
    """iPER pair + random Places2 background (the aug trainer's stream,
    data/imper_fashion_place_dataset.py:9-74)."""

    def __init__(self, imper: ImPerDataset, place: PlaceDataset, seed: int = 0):
        self.imper = imper
        self.place = place
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.imper)

    def __getitem__(self, idx):
        sample = self.imper[idx]
        sample["bg"] = self.place[self.rng.randrange(len(self.place))]["bg"]
        return sample


class SyntheticPairDataset(_Dataset):
    """Procedural pairs with plausible thetas — lets the full training
    stack run without any dataset on disk."""

    def __init__(self, image_size: int = 64, length: int = 64, seed: int = 0,
                 with_bg: bool = False):
        self.image_size = image_size
        self.length = length
        self.seed = seed
        self.with_bg = with_bg

    def __len__(self):
        return self.length

    def __getitem__(self, idx):
        rng = np.random.default_rng(self.seed * 100003 + idx)
        s = self.image_size
        images = rng.uniform(-1, 1, (2, s, s, 3)).astype(np.float32)
        smpls = np.zeros((2, 85), np.float32)
        smpls[:, 0] = 0.9
        smpls[:, 3:75] = rng.normal(0, 0.05, (2, 72))
        out = {"images": images, "smpls": smpls}
        if self.with_bg:
            out["bg"] = rng.uniform(-1, 1, (s, s, 3)).astype(np.float32)
        return out


class ImPerFashionPlaceDataset(_Dataset):
    """iPER + DeepFashion pairs pooled, each with a random Places2
    background (the all-set trainer's stream,
    data/imper_fashion_place_dataset.py + ImpersonatorAllSetTrain,
    impersonator_trainer_aug.py:526-566)."""

    def __init__(self, imper: ImPerDataset, fashion: FashionPairDataset,
                 place: PlaceDataset, seed: int = 0):
        self.sources = [d for d in (imper, fashion) if len(d) > 0]
        self.place = place
        self.rng = random.Random(seed)

    def __len__(self):
        return sum(len(d) for d in self.sources)

    def __getitem__(self, idx):
        for d in self.sources:
            if idx < len(d):
                sample = d[idx]
                break
            idx -= len(d)
        else:
            sample = self.sources[0][idx]
        sample["bg"] = self.place[self.rng.randrange(len(self.place))]["bg"]
        return sample


def dataset_by_name(name: str, cfg, ids_file: str | None = None):
    """Dataset registry (reference data/dataset.py:15-41).
    ``ids_file`` overrides the split file (e.g. cfg.test_ids_file for the
    validation loader)."""
    ids = ids_file or cfg.train_ids_file
    if name == "iPER":
        return ImPerDataset(cfg.data_dir, ids, cfg.image_size,
                            cfg.images_folder, cfg.smpls_folder)
    if name == "iPER_place":
        return ImPerPlaceDataset(
            ImPerDataset(cfg.data_dir, ids, cfg.image_size,
                         cfg.images_folder, cfg.smpls_folder),
            PlaceDataset(cfg.place_dir, cfg.image_size))
    if name == "fashion":
        return FashionPairDataset(cfg.fashion_dir, image_size=cfg.image_size)
    if name == "iPER_fashion_place":
        return ImPerFashionPlaceDataset(
            ImPerDataset(cfg.data_dir, ids, cfg.image_size,
                         cfg.images_folder, cfg.smpls_folder),
            FashionPairDataset(cfg.fashion_dir, image_size=cfg.image_size),
            PlaceDataset(cfg.place_dir, cfg.image_size))
    if name == "place":
        return PlaceDataset(cfg.place_dir, cfg.image_size)
    if name == "synthetic":
        return SyntheticPairDataset(cfg.image_size)
    if name == "synthetic_bg":
        return SyntheticPairDataset(cfg.image_size, with_bg=True)
    raise ValueError(f"unknown dataset: {name}")
