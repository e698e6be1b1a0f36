"""Benchmark: motion-imitation throughput at 256×256 (frames/sec/chip).

Runs the full per-frame pipeline (SMPL LBS -> fim/wim rasterization ->
correspondence flow -> LWB generator decode with cached source features)
on the attached accelerator with real-scale synthetic assets (~12.9k
faces vs SMPL's 13776) and the production network sizes.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N/30}
vs_baseline is against the BASELINE.md north-star target of 30 f/s/chip
(the reference publishes no throughput; >30 f/s/chip on v5e is the goal).
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from impersonator_tpu import assets as A
    from impersonator_tpu.config import TestConfig
    from impersonator_tpu.tasks import imitator as I

    cfg = TestConfig(image_size=256, repeat_num=6)
    assets = A.bench_assets()
    imit = I.Imitator(cfg, assets=assets)

    rng = np.random.default_rng(0)
    src_img = rng.uniform(-1, 1, (256, 256, 3)).astype(np.float32)
    src_theta = np.zeros((85,), np.float32)
    src_theta[0] = 0.9

    imit.personalize(src_img, src_smpl=src_theta)

    batch = 16
    n_frames = 128
    thetas = np.tile(src_theta, (n_frames, 1))
    thetas[:, 3:75] += rng.normal(0, 0.05, (n_frames, 72)).astype(np.float32)

    # warmup / compile
    out = imit.inference_by_smpls(thetas[:batch], batch=batch)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    out = imit.inference_by_smpls(thetas, batch=batch)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps_smpl = n_frames / dt

    # full per-frame path incl. HMR pose regression from target frames
    # (the reference's per-frame loop runs HMR when no smpls are given,
    # imitator.py:270-283)
    tgt224 = jax.device_put(
        rng.uniform(-1, 1, (n_frames, 224, 224, 3)).astype(np.float32))
    out = imit.inference(tgt224[:batch], batch=batch)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = imit.inference(tgt224, batch=batch)
    jax.block_until_ready(out)
    fps_full = n_frames / (time.perf_counter() - t0)

    n_chips = jax.device_count()
    print(json.dumps({
        "metric": "frames/sec/chip at 256x256 motion imitation (HMR + SMPL"
                  " + rasterize + flow + LWB decode per frame)",
        "value": round(fps_full / n_chips, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps_full / n_chips / 30.0, 3),
        "fps_given_smpls": round(fps_smpl / n_chips, 3),
    }))


if __name__ == "__main__":
    main()
