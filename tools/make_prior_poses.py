"""Build a prior-pose bank pkl from a directory of images.

The reference's adaptive personalization renders poses recovered from
``assets/samples/A_priors`` images (run_imitator.py:69-95 meta_imitate:
scan_tgt_paths + per-image HMR). This tool runs the same HMR sweep once,
offline, and saves the thetas in the pkl format
``tasks.post_tune.load_prior_poses`` consumes — so ``run_imitator
--post_tune --prior_poses priors.pkl`` matches the reference recipe
without re-running HMR per personalization.

    python tools/make_prior_poses.py --img_dir A_priors/ --out priors.pkl \
        [--hmr_ckpt hmr.msgpack] [--itv 40]
"""

from __future__ import annotations

import argparse
import glob
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--img_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--hmr_ckpt", default="",
                    help="converted HMR msgpack; random weights if absent "
                         "(smoke only)")
    ap.add_argument("--itv", type=int, default=40,
                    help="take every itv-th frame (scan_tgt_paths itv=40)")
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from impersonator_tpu.models.hmr import HumanModelRecovery
    from impersonator_tpu.utils import cv_utils

    paths = sorted(glob.glob(os.path.join(args.img_dir, "*")))[::args.itv]
    if not paths:
        raise SystemExit(f"no images under {args.img_dir}")

    hmr = HumanModelRecovery()
    if args.hmr_ckpt:
        from flax import serialization
        params = hmr.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 224, 224, 3)))
        with open(args.hmr_ckpt, "rb") as f:
            params = serialization.from_bytes(params, f.read())
    else:
        print("make_prior_poses: no --hmr_ckpt, using random HMR weights")
        params = jax.jit(hmr.init)(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 224, 224, 3)))
    apply = jax.jit(hmr.apply)

    thetas = []
    for i in range(0, len(paths), args.batch):
        chunk = paths[i:i + args.batch]
        imgs = np.stack([
            cv_utils.resize_img_hwc(cv_utils.read_img(p), 224)
            for p in chunk])
        pad = args.batch - len(chunk)
        if pad:
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, 0)])
        out = np.asarray(apply(params, jnp.asarray(imgs)))
        thetas.append(out[:len(chunk)])
    arr = np.concatenate(thetas).astype(np.float32)

    with open(args.out, "wb") as f:
        pickle.dump({"cams": arr[:, :3], "pose": arr[:, 3:75],
                     "shape": arr[:, 75:]}, f)
    print(f"wrote {arr.shape[0]} prior poses -> {args.out}")


if __name__ == "__main__":
    main()
