"""Output-parity harness vs the PyTorch reference.

BASELINE.md's quality procedure: run the reference recipe on the iPER
demo assets, then diff this framework's frames one-for-one. The torch
reference needs CUDA and the released checkpoints, so it can't run in
this environment; this harness takes a directory of its saved outputs
(pred_*.jpg from run_imitator.py) plus the converted checkpoints and
reports SSIM / PSNR / perceptual distance per frame and aggregate.

    python tools/parity_harness.py \
        --src_path 009_5_1_000.jpg --tgt_path frames_dir \
        --ref_dir torch_outputs/ \
        --gen_ckpt gen.msgpack --hmr_ckpt hmr.msgpack \
        --smpl_model smpl_model.pkl --uv_mapping mapper.txt
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src_path", required=True)
    ap.add_argument("--tgt_path", required=True)
    ap.add_argument("--ref_dir", required=True,
                    help="directory of the torch reference's pred_*.jpg")
    ap.add_argument("--gen_ckpt", default="")
    ap.add_argument("--hmr_ckpt", default="")
    ap.add_argument("--smpl_model", default="")
    ap.add_argument("--uv_mapping", default="")
    ap.add_argument("--lpips_ckpt", default="",
                    help="converted LPIPS msgpack (tools/convert_weights "
                         "lpips) — adds the BASELINE.md 'lps' column")
    ap.add_argument("--image_size", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import serialization

    # parity comparisons need true fp32 convs: this backend's default
    # conv/matmul precision is bf16-like even on CPU
    jax.config.update("jax_default_matmul_precision", "highest")

    from impersonator_tpu.config import TestConfig
    from impersonator_tpu.metrics import ssim, psnr
    from impersonator_tpu.tasks.imitator import Imitator
    from impersonator_tpu.utils import cv_utils

    cfg = TestConfig(image_size=args.image_size, smpl_model=args.smpl_model,
                     uv_mapping=args.uv_mapping)
    imitator = Imitator(cfg)

    if args.gen_ckpt:
        with open(args.gen_ckpt, "rb") as f:
            imitator.nets.gen_params = serialization.from_bytes(
                imitator.nets.gen_params, f.read())
    if args.hmr_ckpt:
        with open(args.hmr_ckpt, "rb") as f:
            imitator.nets.hmr_params = serialization.from_bytes(
                imitator.nets.hmr_params, f.read())

    lpips_fn = None
    if args.lpips_ckpt:
        import jax
        from impersonator_tpu.metrics.zoo import LPIPS
        with open(args.lpips_ckpt, "rb") as f:
            from flax.serialization import msgpack_restore
            tree = msgpack_restore(f.read())
        model = LPIPS()
        lpips_fn = jax.jit(lambda a, b: model.apply(tree, a, b))

    src = cv_utils.resize_img_hwc(cv_utils.read_img(args.src_path),
                                  cfg.image_size)
    imitator.personalize(src)

    frames = sorted(glob.glob(os.path.join(args.tgt_path, "*")))
    tgt224 = np.stack([
        cv_utils.resize_img_hwc(cv_utils.read_img(p), 224) for p in frames])
    preds = np.asarray(imitator.inference(tgt224))

    per_frame = []
    for p, pred in zip(frames, preds):
        name = "pred_" + os.path.split(p)[-1]
        ref_path = os.path.join(args.ref_dir, name)
        if not os.path.exists(ref_path):
            continue
        ref = cv_utils.resize_img_hwc(cv_utils.read_img(ref_path),
                                      cfg.image_size)
        a = jnp.asarray(pred)[None]
        b = jnp.asarray(ref)[None]
        row = {
            "frame": name,
            "ssim": float(ssim(a, b)),
            "psnr": float(psnr(a, b)),
        }
        if lpips_fn is not None:
            row["lps"] = float(lpips_fn(a, b)[0])
        per_frame.append(row)

    if not per_frame:
        print(json.dumps({"error": "no matching reference frames"}))
        return
    agg = {
        "frames": len(per_frame),
        "ssim_mean": float(np.mean([f["ssim"] for f in per_frame])),
        "psnr_mean": float(np.mean([f["psnr"] for f in per_frame])),
    }
    if lpips_fn is not None:
        agg["lps_mean"] = float(np.mean([f["lps"] for f in per_frame]))
    print(json.dumps({"aggregate": agg, "per_frame": per_frame}, indent=1))


if __name__ == "__main__":
    main()
