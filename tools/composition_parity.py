"""Record the end-to-end composition-parity artifact.

Runs the FULL imitation chain (personalize -> flow -> warp ->
cached-feature LWB decode -> compositing; imitator.py:83-145 + 236-342 +
nmr.py:617-659) through both the jax stack and the functional-torch
oracle (tests/torch_ref.py) on random converted weights, and writes a
JSON with per-stage agreement. This is the provable substitute for the
frame-for-frame diff vs the released PyTorch checkpoints, which cannot
run here (no CUDA, no released weights) — see BASELINE.md.

    python tools/composition_parity.py --out PARITY_COMPOSITION.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def run(image_size=64, conv_dim=8, repeat=2, n_frames=4, seed=0,
        bg_ks=7, ft_ks=3, x64=False):
    """``x64``: run BOTH stacks in float64 — fp32 diffs are instance-norm
    noise amplification through the deep stack (measured f64 chain
    agreement ~1e-6, so the composition is semantically exact); the f64
    row is the rigorous pipeline-equivalence number, the fp32 row the
    production noise floor."""
    import jax
    import jax.numpy as jnp
    import torch

    import torch_ref
    from tools import convert_weights as cw
    from impersonator_tpu import assets as A
    from impersonator_tpu.metrics.metrics import psnr, ssim
    from impersonator_tpu.models.generator import ImpersonatorGenerator
    from impersonator_tpu.ops import smpl as smpl_ops
    from impersonator_tpu.tasks import imitator as I
    from impersonator_tpu.tasks.renderer import SMPLRenderer

    rng = np.random.default_rng(seed)
    S = image_size
    sd = {**torch_ref.make_bg_sd(rng, 4, conv_dim, repeat),
          **torch_ref.make_resunet_sd(rng, "src_model", 6, conv_dim, repeat),
          **torch_ref.make_resunet_sd(rng, "tsf_model", 6, conv_dim, repeat)}
    gen_params = cw.convert_generator(sd, repeat=repeat)
    if x64:
        assert jax.config.jax_enable_x64, "run with JAX_ENABLE_X64=1"
        sd = {k: v.double() for k, v in sd.items()}
        gen_params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), gen_params)
    gen = ImpersonatorGenerator(bg_dim=4, src_dim=6, tsf_dim=6,
                                conv_dim=conv_dim, repeat_num=repeat)
    nets = I.ImitatorNets(gen, gen_params, None, None, None, None)

    assets = A.synthetic_assets()
    renderer = SMPLRenderer.create(assets, image_size=S, map_name="uv_seg")
    smpl_params = smpl_ops.SMPLParams.from_assets(assets)
    parents = assets.parents

    fdtype = np.float64 if x64 else np.float32
    src_img = jnp.asarray(rng.uniform(-1, 1, (1, S, S, 3)).astype(fdtype))
    src_theta = np.zeros((1, 85), fdtype)
    src_theta[:, 0] = 0.9
    tsf_theta = np.tile(src_theta, (n_frames, 1))
    tsf_theta[:, 3:75] += rng.normal(0, 0.08, (n_frames, 72)).astype(fdtype)
    src_theta = jnp.asarray(src_theta)
    tsf_theta = jnp.asarray(tsf_theta)

    src_state = jax.jit(lambda: I.personalize_core(
        nets, renderer, smpl_params, parents, src_img, src_theta,
        bg_ks=bg_ks, ft_ks=ft_ks))()
    preds_j = np.asarray(jax.jit(lambda: I.imitate_core(
        nets, renderer, smpl_params, parents, src_state, tsf_theta))())

    tsf_info = smpl_ops.get_details(smpl_params, tsf_theta, parents)
    _, tsf_fim, tsf_wim = renderer.render_fim_wim(
        tsf_info["cam"], tsf_info["verts"])
    tsf_cond = renderer.encode_fim(tsf_fim)

    def nchw(x):
        return torch.from_numpy(
            np.ascontiguousarray(np.asarray(x).transpose(0, 3, 1, 2)))

    p2 = np.ascontiguousarray(np.broadcast_to(
        np.asarray(src_state["p2verts"]),
        (n_frames,) + src_state["p2verts"].shape[1:]))
    preds_t, T_t, bg_t, _ = torch_ref.imitate_chain_torch(
        sd,
        nchw(np.broadcast_to(np.asarray(src_img), (n_frames, S, S, 3))),
        nchw(np.broadcast_to(np.asarray(src_state["cond"]),
                             (n_frames, S, S, 3))),
        torch.from_numpy(p2),
        torch.from_numpy(np.asarray(tsf_fim)),
        torch.from_numpy(np.asarray(tsf_wim)),
        nchw(np.asarray(tsf_cond)),
        image_size=S, bg_ks=bg_ks, ft_ks=ft_ks, repeat=repeat)

    t_j = np.asarray(renderer.cal_bc_transform(
        jnp.asarray(p2), tsf_fim, tsf_wim))
    preds_t = preds_t.numpy().transpose(0, 2, 3, 1)
    bg_t = bg_t.numpy().transpose(0, 2, 3, 1)

    a, b = jnp.asarray(preds_j), jnp.asarray(preds_t)
    return {
        "what": "end-to-end imitation chain (personalize -> flow -> warp "
                "-> LWB decode -> composite) jax vs functional-torch "
                "oracle on random converted weights",
        "image_size": S, "conv_dim": conv_dim, "repeat": repeat,
        "n_frames": n_frames,
        "coverage_frac": float((np.asarray(tsf_fim) >= 0).mean()),
        "flow_T_max_abs_diff": float(np.abs(t_j - T_t.numpy()).max()),
        "bg_max_abs_diff": float(
            np.abs(np.asarray(src_state["bg"]) - bg_t[:1]).max()),
        "preds_max_abs_diff": float(np.abs(preds_j - preds_t).max()),
        "preds_mean_abs_diff": float(np.abs(preds_j - preds_t).mean()),
        "preds_ssim_vs_oracle": float(ssim(a, b)),
        "preds_psnr_vs_oracle": float(psnr(a, b)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PARITY_COMPOSITION.json")
    ap.add_argument("--image_size", type=int, default=64)
    ap.add_argument("--n_frames", type=int, default=4)
    ap.add_argument("--x64_worker", action="store_true",
                    help="internal: emit the f64 row only")
    args = ap.parse_args()

    if args.x64_worker:
        print("X64ROW " + json.dumps(run(image_size=args.image_size,
                                         n_frames=args.n_frames, x64=True)))
        return

    res = {"fp32": run(image_size=args.image_size, n_frames=args.n_frames)}
    # f64 needs JAX_ENABLE_X64 before jax initializes -> subprocess
    import subprocess
    env = dict(os.environ)
    env["JAX_ENABLE_X64"] = "1"
    env.setdefault("JAX_PLATFORMS", "cpu")
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_x64c"
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--x64_worker",
         "--image_size", str(args.image_size),
         "--n_frames", str(args.n_frames)],
        env=env, capture_output=True, text=True, timeout=3000)
    for line in proc.stdout.splitlines():
        if line.startswith("X64ROW "):
            res["float64"] = json.loads(line[len("X64ROW "):])
    if "float64" not in res:
        res["float64_error"] = proc.stderr[-1500:]
    else:
        # the rigorous equivalence bound: in f64 the two stacks must be
        # numerically indistinguishable (fp32 diffs are conditioning)
        assert res["float64"]["preds_max_abs_diff"] < 1e-4, res["float64"]

    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
