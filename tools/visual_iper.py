"""iPER dataset QA renders: debug-textured SMPL over extracted frames.

TPU-native equivalent of the reference's ``tools/visual_iPER.py``
(debug visualization of extracted smpls: render the all-ones debug
texture body — ``SMPLRenderer.debug_textures``, utils/nmr.py:661-662 —
plus the silhouette-masked frame, visual_iPER.py:21-75). Differences by
design: batched jitted rendering instead of a per-frame CUDA loop, and
PNG triptychs (original | debug render | silhouette-masked) written to
``--out_dir`` instead of pushes to a visdom server (zero-egress TPU
pods have none).

    python tools/visual_iper.py --frames_dir data/001/1/1 \
        --smpl_pkl data/smpls/001/1/1/pose_shape.pkl --out_dir /tmp/qa

When ``--smpl_pkl`` is absent the HMR regressor recovers thetas from
the frames themselves (the reference assumes a precomputed
smpl_infos.h5); pass ``--hmr_ckpt`` for converted weights, else the
sweep runs with random weights (smoke only).
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


def load_thetas(pkl_path: str) -> np.ndarray:
    """pose_shape.pkl {cams, pose, shape} -> (N, 85) thetas (the layout
    metrics.protocols.IPERProtocol.smpls consumes)."""
    with open(pkl_path, "rb") as f:
        d = pickle.load(f)
    return np.concatenate(
        [d["cams"], d["pose"], d["shape"]], axis=1).astype(np.float32)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames_dir", required=True,
                    help="folder of extracted frames (prepare_iper.py)")
    ap.add_argument("--smpl_pkl", default="",
                    help="pose_shape.pkl for the video; HMR recovers "
                         "thetas from the frames when absent")
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--itv", type=int, default=1,
                    help="take every itv-th frame")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--smpl_model", default="",
                    help="real SMPL pkl for assets; synthetic when absent")
    ap.add_argument("--uv_mapping", default="")
    ap.add_argument("--hmr_ckpt", default="")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from impersonator_tpu import assets as A
    from impersonator_tpu.ops import rasterizer as rast
    from impersonator_tpu.ops import smpl as smpl_ops
    from impersonator_tpu.tasks.renderer import SMPLRenderer
    from impersonator_tpu.utils import cv_utils

    paths = sorted(
        p for p in glob.glob(os.path.join(args.frames_dir, "*"))
        if p.lower().endswith((".jpg", ".jpeg", ".png")))[::args.itv]
    if not paths:
        raise SystemExit(f"no frames under {args.frames_dir}")

    if args.smpl_model:
        assets = A.load_smpl_assets(args.smpl_model, args.uv_mapping)
    else:
        print("visual_iper: no --smpl_model, using synthetic assets")
        assets = A.synthetic_assets()
    renderer = SMPLRenderer.create(assets, image_size=args.image_size)
    smpl_params = smpl_ops.SMPLParams.from_assets(assets)
    parents = assets.parents

    if args.smpl_pkl:
        thetas = load_thetas(args.smpl_pkl)[::args.itv]
        if len(thetas) < len(paths):
            print(f"visual_iper: {len(paths)} frames but {len(thetas)} "
                  "thetas; truncating to the shorter")
            paths = paths[:len(thetas)]
        thetas = thetas[:len(paths)]
        hmr_fn = None
    else:
        from impersonator_tpu.models.hmr import HumanModelRecovery
        hmr = HumanModelRecovery()
        if args.hmr_ckpt:
            from flax import serialization
            params = hmr.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 224, 224, 3)))
            with open(args.hmr_ckpt, "rb") as f:
                params = serialization.from_bytes(params, f.read())
        else:
            print("visual_iper: no --hmr_ckpt, random HMR weights "
                  "(smoke only)")
            params = jax.jit(hmr.init)(jax.random.PRNGKey(0),
                                       jnp.zeros((1, 224, 224, 3)))
        apply = jax.jit(hmr.apply)
        hmr_fn = lambda imgs224: apply(params, imgs224)  # noqa: E731
        thetas = None

    @jax.jit
    def render_batch(theta85):
        info = smpl_ops.get_details(smpl_params, theta85, parents)
        f2verts, fim, wim = renderer.render_fim_wim(info["cam"],
                                                    info["verts"])
        nf = f2verts.shape[1]
        tex = jnp.ones(
            (theta85.shape[0], nf, renderer.tex_size ** 2, 3),
            jnp.float32)  # debug_textures: all-ones (nmr.py:661-662)
        rgb = renderer.render_textured(fim, wim, tex)
        sil = rast.render_silhouette(fim)
        return rgb, sil

    os.makedirs(args.out_dir, exist_ok=True)
    n = len(paths)
    for i in range(0, n, args.batch):
        chunk = paths[i:i + args.batch]
        imgs = cv_utils.load_image_batch(chunk, args.image_size)
        pad = args.batch - len(chunk)
        if pad:  # keep one compiled shape
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, 0)])
        if thetas is not None:
            th = thetas[i:i + args.batch]
            if pad:
                th = np.concatenate([th, np.repeat(th[-1:], pad, 0)])
        else:
            imgs224 = np.stack([
                cv_utils.resize_img_hwc(im, 224) for im in imgs])
            th = np.asarray(hmr_fn(jnp.asarray(imgs224)))
        rgb, sil = render_batch(jnp.asarray(th))
        rgb = np.asarray(rgb)          # [0,1] texture paint, 0 bg
        sil = np.asarray(sil)[..., None]
        for j, p in enumerate(chunk):
            frame = imgs[j]                              # [-1, 1]
            body = rgb[j] * 2.0 - 1.0                    # -> [-1, 1]
            masked = frame * sil[j] - (1.0 - sil[j])     # bg -> black
            trip = np.concatenate([frame, body, masked], axis=1)
            stem = os.path.splitext(os.path.basename(p))[0]
            cv_utils.save_img(trip, os.path.join(
                args.out_dir, f"qa_{stem}.png"))
    print(f"visual_iper: wrote {n} triptychs -> {args.out_dir}")


if __name__ == "__main__":
    main()
