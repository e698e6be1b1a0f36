"""Record the end-to-end composition-parity artifact.

Runs the FULL imitation chain (personalize -> flow -> warp ->
cached-feature LWB decode -> compositing; imitator.py:83-145 + 236-342 +
nmr.py:617-659) through both the jax stack and the functional-torch
oracle (tests/torch_ref.py) on random converted weights, and writes a
JSON with per-stage agreement. This is the provable substitute for the
frame-for-frame diff vs the released PyTorch checkpoints, which cannot
run here (no CUDA, no released weights) — see BASELINE.md.

Precision protocol: the rasterizer runs once in fp32 (it is separately
bit-verified against the CUDA-semantics oracle) and its products are
saved; the continuous downstream (flow -> warp -> nets -> composite) is
compared jax-vs-torch BOTH in fp32 and in float64 under
``jax_default_matmul_precision=highest`` (this backend's DEFAULT conv
precision is bf16-like even on CPU — a single f32 conv deviates ~1e-2
from the f64 truth and varies with operand layout, which is also what
made earlier multichip artifacts flaky). The float64 row must agree to
1e-4 and is the rigorous equivalence bound; the fp32 row records the
production-precision noise floor alongside a same-program rerun delta.

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


def _full_precision():
    """This backend's default conv/matmul precision is bf16-like even on
    CPU (a single f32 conv deviates ~1e-2 from the f64 truth); parity
    comparisons are meaningless there. Force true fp32."""
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")


PRODUCTS = "/tmp/composition_parity_products.npz"


def make_products(image_size=64, n_frames=4, seed=0, path=PRODUCTS):
    """fp32 parent only: rasterize once, save every raster product the
    downstream needs (fim/wim/cond/p2verts for src + tsf)."""
    import jax.numpy as jnp

    _full_precision()
    from impersonator_tpu import assets as A
    from impersonator_tpu.ops import smpl as smpl_ops
    from impersonator_tpu.tasks.renderer import SMPLRenderer

    rng = np.random.default_rng(seed + 1000)   # separate stream from sd
    S = image_size
    assets = A.synthetic_assets()
    renderer = SMPLRenderer.create(assets, image_size=S, map_name="uv_seg")
    smpl_params = smpl_ops.SMPLParams.from_assets(assets)
    parents = assets.parents

    src_img = rng.uniform(-1, 1, (1, S, S, 3)).astype(np.float32)
    src_theta = np.zeros((1, 85), np.float32)
    src_theta[:, 0] = 0.9
    tsf_theta = np.tile(src_theta, (n_frames, 1))
    tsf_theta[:, 3:75] += rng.normal(0, 0.08,
                                     (n_frames, 72)).astype(np.float32)

    si = smpl_ops.get_details(smpl_params, jnp.asarray(src_theta), parents)
    f2v, sfim, swim = renderer.render_fim_wim(si["cam"], si["verts"])
    sp2 = renderer.f2pts_from_f2verts(f2v)
    scond = renderer.encode_fim(sfim)
    ti = smpl_ops.get_details(smpl_params, jnp.asarray(tsf_theta), parents)
    _, tfim, twim = renderer.render_fim_wim(ti["cam"], ti["verts"])
    tcond = renderer.encode_fim(tfim)

    np.savez(path, src_img=src_img,
             sfim=np.asarray(sfim), swim=np.asarray(swim),
             sp2=np.asarray(sp2), scond=np.asarray(scond),
             tfim=np.asarray(tfim), twim=np.asarray(twim),
             tcond=np.asarray(tcond))


def run_downstream(image_size=64, conv_dim=8, repeat=2, seed=0,
                   bg_ks=7, ft_ks=3, x64=False, path=PRODUCTS):
    """Compare the continuous chain jax-vs-torch on saved raster
    products, in fp32 or (x64=True) float64."""
    import jax
    import jax.numpy as jnp
    import torch

    _full_precision()
    import torch_ref
    from tools import convert_weights as cw
    from impersonator_tpu.metrics.metrics import psnr, ssim
    from impersonator_tpu.models.generator import ImpersonatorGenerator
    from impersonator_tpu.tasks import imitator as I
    from impersonator_tpu.tasks.renderer import SMPLRenderer
    from impersonator_tpu import assets as A

    rng = np.random.default_rng(seed)
    S = image_size
    sd = {**torch_ref.make_bg_sd(rng, 4, conv_dim, repeat),
          **torch_ref.make_resunet_sd(rng, "src_model", 6, conv_dim, repeat),
          **torch_ref.make_resunet_sd(rng, "tsf_model", 6, conv_dim, repeat)}
    gen_params = cw.convert_generator(sd, repeat=repeat)
    fdtype = np.float64 if x64 else np.float32
    if x64:
        assert jax.config.jax_enable_x64, "run with JAX_ENABLE_X64=1"
        sd = {k: v.double() for k, v in sd.items()}
        gen_params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), gen_params)
    gen = ImpersonatorGenerator(bg_dim=4, src_dim=6, tsf_dim=6,
                                conv_dim=conv_dim, repeat_num=repeat)
    nets = I.ImitatorNets(gen, gen_params, None, None, None, None)
    renderer = SMPLRenderer.create(A.synthetic_assets(), image_size=S,
                                   map_name="uv_seg")

    z = np.load(path)

    def up(a):
        a = np.asarray(a)
        return a.astype(fdtype) if np.issubdtype(a.dtype, np.floating) else a

    src_img = jnp.asarray(up(z["src_img"]))
    sfim, tfim = jnp.asarray(z["sfim"]), jnp.asarray(z["tfim"])
    swim, twim = jnp.asarray(up(z["swim"])), jnp.asarray(up(z["twim"]))
    sp2 = jnp.asarray(up(z["sp2"]))
    scond, tcond = jnp.asarray(up(z["scond"])), jnp.asarray(up(z["tcond"]))
    n_frames = int(tfim.shape[0])

    dummy_info = {k: jnp.zeros((1, 1), jnp.float32)
                  for k in ("theta", "cam", "shape", "pose", "j2d")}
    src_state = jax.jit(lambda: I.personalize_from_raster(
        nets, src_img, dummy_info, sfim, swim, sp2, scond,
        bg_ks=bg_ks, ft_ks=ft_ks))()
    imitate_jit = jax.jit(lambda: I.imitate_from_raster(
        nets, renderer, src_state, tfim, twim, tcond))
    preds_j = np.asarray(imitate_jit())
    # same compiled program, second execution: measures the HOST's own
    # run-to-run noise through the ill-conditioned random-weight IN
    # stack — the yardstick for reading the jax-vs-torch fp32 numbers
    run_noise = float(np.abs(np.asarray(imitate_jit()) - preds_j).max())

    def nchw(x):
        return torch.from_numpy(
            np.ascontiguousarray(np.asarray(x).transpose(0, 3, 1, 2)))

    p2 = np.ascontiguousarray(np.broadcast_to(
        np.asarray(src_state["p2verts"]),
        (n_frames,) + src_state["p2verts"].shape[1:]))
    preds_t, T_t, bg_t, _ = torch_ref.imitate_chain_torch(
        sd,
        nchw(np.broadcast_to(np.asarray(src_img), (n_frames, S, S, 3))),
        nchw(np.broadcast_to(np.asarray(scond), (n_frames, S, S, 3))),
        torch.from_numpy(p2),
        torch.from_numpy(np.asarray(tfim)),
        torch.from_numpy(np.asarray(twim)),
        nchw(np.asarray(tcond)),
        image_size=S, bg_ks=bg_ks, ft_ks=ft_ks, repeat=repeat)

    t_j = np.asarray(renderer.cal_bc_transform(jnp.asarray(p2), tfim, twim))
    preds_t = preds_t.numpy().transpose(0, 2, 3, 1)
    bg_t = bg_t.numpy().transpose(0, 2, 3, 1)

    a = jnp.asarray(preds_j, jnp.float32)
    b = jnp.asarray(preds_t, jnp.float32)
    return {
        "what": "imitation chain downstream of the (bit-verified) "
                "rasterizer: flow -> warp -> LWB decode -> composite, "
                "jax vs functional-torch oracle on random converted "
                "weights",
        "dtype": "float64" if x64 else "float32",
        "image_size": S, "conv_dim": conv_dim, "repeat": repeat,
        "n_frames": n_frames,
        "coverage_frac": float((np.asarray(tfim) >= 0).mean()),
        "flow_T_max_abs_diff": float(np.abs(t_j - T_t.numpy()).max()),
        "bg_max_abs_diff": float(
            np.abs(np.asarray(src_state["bg"]) - bg_t[:1]).max()),
        "preds_max_abs_diff": float(np.abs(preds_j - preds_t).max()),
        "preds_mean_abs_diff": float(np.abs(preds_j - preds_t).mean()),
        "jax_same_program_rerun_max_abs_diff": run_noise,
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
    ap.add_argument("--fp32_worker", action="store_true",
                    help="internal: emit the fp32 row only")
    args = ap.parse_args()

    if args.x64_worker:
        print("X64ROW " + json.dumps(run_downstream(
            image_size=args.image_size, x64=True)))
        return
    if args.fp32_worker:
        print("FP32ROW " + json.dumps(run_downstream(
            image_size=args.image_size)))
        return

    make_products(image_size=args.image_size, n_frames=args.n_frames)

    # BOTH rows run in a SCRUBBED subprocess env: the host's axon
    # site-packages hook corrupts CPU numerics for large compiled f32
    # programs even at matmul_precision=highest (and f64 under it came
    # out wrong by O(1)); the clean jaxlib CPU path agrees with torch to
    # the expected ulp level in both dtypes. x64 additionally needs
    # JAX_ENABLE_X64 before jax initializes.
    import subprocess
    drop = ("TPU", "AXON", "LIBTPU", "PJRT", "MEGASCALE")
    env = {k: v for k, v in os.environ.items()
           if not any(s in k.upper() for s in drop)
           and k not in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_PLATFORM_NAME",
                         "PYTHONPATH")}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo
    env["JAX_PLATFORMS"] = "cpu"

    res = {}
    for row, tag, key in (("--fp32_worker", "FP32ROW", "fp32"),
                          ("--x64_worker", "X64ROW", "float64")):
        wenv = dict(env)
        if key == "float64":
            wenv["JAX_ENABLE_X64"] = "1"
        wenv["JAX_COMPILATION_CACHE_DIR"] = f"/tmp/jax_cache_cp_{key}"
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), row,
             "--image_size", str(args.image_size)],
            env=wenv, capture_output=True, text=True, timeout=3000)
        for line in proc.stdout.splitlines():
            if line.startswith(tag + " "):
                res[key] = json.loads(line[len(tag) + 1:])
        if key not in res:
            res[key + "_error"] = proc.stderr[-1500:]

    # the rigorous equivalence bound: in f64 the two stacks must be
    # numerically indistinguishable; fp32 must sit at its ulp-noise floor
    assert res.get("float64", {}).get("preds_max_abs_diff", 1.0) < 1e-4, res
    assert res.get("fp32", {}).get("preds_max_abs_diff", 1.0) < 5e-2, res

    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
