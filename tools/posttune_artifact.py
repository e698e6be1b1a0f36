"""Record post-tune adaptation quality as a JSON artifact.

The reference's test-time personalization (run_imitator.py:199-211,
imitator.post_personalize :344-472, budget semantics :415-433) only
prints losses; its quality was judged visually. This tool makes the
adaptation a RECORDED number (VERDICT r3 next-step #7): it runs the full
adaptive-personalize loop and persists

* the per-epoch cycle-loss trajectory (must improve),
* self-imitation SSIM before vs after (imitate the source's own pose —
  ground truth is the source image itself; exactly what personalization
  optimizes),
* held-out cycle SSIM before vs after (a pose NOT in the tuning prior
  set, imitated then warped back to the source frame via T_cycle and
  compared to the source inside the body silhouette).

Usage::

    python tools/posttune_artifact.py [--out POSTTUNE.json]
        [--size 64] [--priors 6] [--epochs 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _self_ssim(imit, jnp, ssim):
    """SSIM of self-imitation (tsf theta == src theta) vs the source."""
    pred = imit.inference_by_smpls(np.asarray(imit.src_info["theta"]),
                                   cam_strategy="copy", batch=1)
    return float(ssim(pred, imit.src_info["img"]))


def _heldout_cycle_ssim(imit, heldout_theta, jnp, ssim):
    """Imitate a held-out pose, warp the prediction back to the source
    frame through T_cycle (write_pair_info semantics,
    run_imitator.py:40-45), and compare to the source inside the body
    mask."""
    from impersonator_tpu.ops import smpl as smpl_ops
    from impersonator_tpu.ops.sampler import grid_sample
    from impersonator_tpu.tasks import imitator as I

    src = imit.src_info
    renderer = imit.renderer
    tsf = I.swap_smpl(src["cam"], src["shape"], heldout_theta,
                      heldout_theta[0:1, 0:3], "smooth")
    info = smpl_ops.get_details(imit.smpl_params, tsf, imit.parents)
    f2v, fim, wim = renderer.render_fim_wim(info["cam"], info["verts"])
    tsf_p2verts = renderer.f2pts_from_f2verts(f2v)
    t_cycle = renderer.cal_bc_transform(tsf_p2verts, src["fim"], src["wim"])

    pred = I.imitate_core(imit.nets, renderer, imit.smpl_params,
                          imit.parents, src, tsf)
    back = grid_sample(pred, t_cycle)
    mask = src["cond"][..., -1:] < 0.5   # body region of the source cond
    return float(ssim(back * mask, src["img"] * mask))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="POSTTUNE.json")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--priors", type=int, default=6)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from impersonator_tpu import assets as A
    from impersonator_tpu.config import TestConfig
    from impersonator_tpu.metrics.metrics import ssim
    from impersonator_tpu.tasks import post_tune as PT
    from impersonator_tpu.tasks.imitator import Imitator

    cfg = TestConfig(image_size=args.size, repeat_num=2)
    imit = Imitator(cfg, assets=A.synthetic_assets())
    rng = np.random.default_rng(args.seed)
    theta = np.zeros(85, np.float32)
    theta[0] = 0.9
    src_img = rng.uniform(-1, 1, (args.size, args.size, 3)).astype(np.float32)
    imit.personalize(src_img, src_smpl=theta)

    priors = PT.default_prior_poses(imit.src_info["theta"], n=args.priors,
                                    scale=0.12, seed=args.seed)
    # held-out pose: same distribution, different draw — NOT in the set
    heldout = PT.default_prior_poses(imit.src_info["theta"], n=1,
                                     scale=0.12, seed=args.seed + 1000)

    before = {
        "self_ssim": _self_ssim(imit, jnp, ssim),
        "heldout_cycle_ssim": _heldout_cycle_ssim(imit, heldout, jnp, ssim),
    }
    metrics = PT.adaptive_personalize(
        imit, priors, epochs=args.epochs, use_face=False,
        batch_size=min(4, args.priors), seed=args.seed, verbose=True)
    after = {
        "self_ssim": _self_ssim(imit, jnp, ssim),
        "heldout_cycle_ssim": _heldout_cycle_ssim(imit, heldout, jnp, ssim),
    }

    cyc = [float(c) for c in metrics["cyc_history"]]
    result = {
        "config": {"size": args.size, "priors": args.priors,
                   "epochs": args.epochs,
                   "budget_steps": int(metrics["n_steps"]),
                   "lr": 2e-4, "seed": args.seed},
        "cycle_loss_per_epoch": [round(c, 6) for c in cyc],
        "cycle_improvement": round(cyc[0] / max(cyc[-1], 1e-12), 3),
        "before": {k: round(v, 5) for k, v in before.items()},
        "after": {k: round(v, 5) for k, v in after.items()},
        "self_ssim_delta": round(after["self_ssim"] - before["self_ssim"], 5),
        "heldout_cycle_ssim_delta": round(
            after["heldout_cycle_ssim"] - before["heldout_cycle_ssim"], 5),
    }
    # Adaptation must actually adapt: the optimized objective's
    # trajectory must fall monotonically, and at least one held-out
    # quality number must move up. (self_ssim alone is NOT asserted:
    # with random-init weights it sits at the ~0.002 noise floor, so its
    # sign after a 10-step budget is a coin flip — both deltas are
    # recorded for the artifact either way.)
    assert all(b < a for a, b in zip(cyc, cyc[1:])), \
        f"cycle loss not monotone: {cyc}"
    assert max(result["self_ssim_delta"],
               result["heldout_cycle_ssim_delta"]) > 0, result
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
