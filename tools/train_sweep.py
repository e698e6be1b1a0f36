"""Sweep the bf16 train step's batch size to its throughput knee.

The reference's batch_size 4 is a 2019 GPU-memory artifact
(options/base_options.py:39), not a target; the inference path was
sweep-tuned to its v5e knee (32) in round 4 — this applies the same
methodology to ``make_train_step`` (VERDICT r4 #5): paper config at
256², rec+vgg+face+mask losses, fused G+D update, one compiled program
per batch size, median of 3 timed steps after a warmup.

    python tools/train_sweep.py [--batches 4 8 16 32 64] [--size 256]

Prints one JSON line per batch and a final summary with the knee
(highest samples/s; ties break toward the smaller batch for latency).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def sweep(batches, image_size=256, repeat_num=6, reps=3):
    import jax
    import jax.numpy as jnp

    from impersonator_tpu import assets as A
    from impersonator_tpu.config import TrainConfig
    from impersonator_tpu.tasks import trainer as trainer_mod

    assets = A.bench_assets()
    rng = np.random.default_rng(0)
    rows = []
    for bs in batches:
        tcfg = TrainConfig(image_size=image_size, batch_size=bs,
                           repeat_num=repeat_num, use_vgg=True,
                           use_style=False, use_face=True,
                           train_dtype="bfloat16")
        tr = trainer_mod.build_trainer(tcfg, assets)
        state = tr.init_state()
        step = jax.jit(trainer_mod.make_train_step(tr, train_d=True),
                       donate_argnums=(0,))
        thetas = np.zeros((bs, 2, 85), np.float32)
        thetas[..., 0] = 0.9
        thetas[..., 3:75] = rng.normal(0, 0.03, (bs, 2, 72))
        batch = {
            "images": jnp.asarray(
                rng.uniform(-1, 1, (bs, 2, image_size, image_size, 3)),
                jnp.float32),
            "smpls": jnp.asarray(thetas),
        }
        try:
            state, m = step(state, batch)           # compile + warm
            jax.block_until_ready(m["g_total"])
            vals = []
            for _ in range(reps):
                t0 = time.perf_counter()
                state, m = step(state, batch)
                jax.block_until_ready(m["g_total"])
                vals.append(time.perf_counter() - t0)
            ms = sorted(vals)[len(vals) // 2] * 1e3
            row = {"batch": bs, "step_ms": round(ms, 1),
                   "samples_per_sec": round(bs / (ms / 1e3), 2),
                   "runs_ms": [round(v * 1e3, 1) for v in vals]}
        except Exception as e:                      # OOM at big batches
            row = {"batch": bs, "error": f"{type(e).__name__}: {e}"[:200]}
        rows.append(row)
        print(json.dumps(row), flush=True)
        del state, step, batch
    ok = [r for r in rows if "samples_per_sec" in r]
    if ok:
        best = max(ok, key=lambda r: (r["samples_per_sec"], -r["batch"]))
        summary = {"knee_batch": best["batch"],
                   "knee_samples_per_sec": best["samples_per_sec"],
                   "rows": rows}
        print(json.dumps(summary), flush=True)
        return summary
    return {"rows": rows}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[4, 8, 16, 32, 64])
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--repeat_num", type=int, default=6)
    args = ap.parse_args(argv)
    return sweep(args.batches, image_size=args.size,
                 repeat_num=args.repeat_num)


if __name__ == "__main__":
    main()
