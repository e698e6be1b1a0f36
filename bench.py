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


def _probe_backend(timeout_s: float = 240.0):
    """Fail fast when the accelerator is unreachable.

    The host's axon PJRT plugin registers at ``import jax`` (via
    sitecustomize) and retries a dead relay tunnel indefinitely, so a
    relay outage would hang this process at import time — before any
    code below runs. Probe device init in a subprocess with a timeout
    and return the backend name, or ``None`` with a printed diagnostic.
    """
    import subprocess
    import sys
    try:
        p = subprocess.run(
            [sys.executable, "-c",
             "import jax; print('BACKEND=' + jax.default_backend())"],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        print(f"# backend probe timed out after {timeout_s:.0f}s "
              "(accelerator tunnel unreachable?)")
        return None
    for line in p.stdout.splitlines():
        if line.startswith("BACKEND="):
            return line.split("=", 1)[1]
    tail = (p.stderr or "").strip().splitlines()[-3:]
    print(f"# backend probe failed rc={p.returncode}: {' | '.join(tail)}")
    return None


def _peak_bf16_flops(dev):
    """Per-chip peak bf16 FLOP/s by device kind (public numbers from the
    TPU generations table, jax-ml.github.io/scaling-book)."""
    kind = getattr(dev, "device_kind", "").lower()
    table = [("v6", 918e12), ("trillium", 918e12), ("v5p", 459e12),
             ("v5 lite", 197e12), ("v5litepod", 197e12), ("v5e", 197e12),
             ("v4", 275e12), ("v3", 123e12), ("v2", 45e12)]
    for sub, peak in table:
        if sub in kind:
            return peak
    return None


def _compiled_flops(fn, *args):
    """FLOPs of the exact compiled program via XLA cost analysis."""
    import jax
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception as e:
        print(f"# cost_analysis unavailable: {e}")
        return None


def main():
    import sys

    import jax
    import jax.numpy as jnp

    # --profile DIR: wrap the measured sections in a jax.profiler trace
    # (xplane + trace-viewer dump) for kernel-level analysis
    profile_dir = None
    if "--profile" in sys.argv:
        i = sys.argv.index("--profile")
        profile_dir = sys.argv[i + 1] if i + 1 < len(sys.argv) \
            else "/tmp/bench_trace"

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

    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    t0 = time.perf_counter()
    out = imit.inference_by_smpls(thetas, batch=batch)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    if profile_dir:
        jax.profiler.stop_trace()
        print(f"# profiler trace -> {profile_dir}")
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

    # ---- end-to-end with host IO in the measured loop: JPEG decode
    # (native C++ prefetch loader when built) -> HMR -> imitation --------
    fps_e2e = fps_e2e_rb = None
    try:
        import cv2
        frame_dir = "/tmp/bench_frames"
        os.makedirs(frame_dir, exist_ok=True)
        paths = []
        for i in range(n_frames):
            p = os.path.join(frame_dir, f"{i:04d}.jpg")
            if not os.path.exists(p):
                cv2.imwrite(p, rng.uniform(0, 255, (256, 256, 3))
                            .astype(np.uint8))
            paths.append(p)
        out = imit.inference_from_paths(paths[:batch], batch=batch)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = imit.inference_from_paths(paths, batch=batch)
        jax.block_until_ready(out)
        fps_e2e = n_frames / (time.perf_counter() - t0)
        # the COMPLETE video job: u8 decode -> H2D -> imitate -> u8
        # quantize -> D2H readback to host memory
        out = np.asarray(imit.inference_from_paths(
            paths[:batch], batch=batch, as_uint8=True))
        t0 = time.perf_counter()
        out = np.asarray(imit.inference_from_paths(
            paths, batch=batch, as_uint8=True))
        fps_e2e_rb = n_frames / (time.perf_counter() - t0)
        assert out.dtype == np.uint8 and out.shape[0] == n_frames
    except Exception as e:  # bench must still report device numbers
        print(f"# e2e host-io bench skipped: {e}")

    # ---- pallas-vs-xla raster parity + tile-occupancy headroom ---------
    from impersonator_tpu.ops import rasterizer as rast, smpl as smpl_ops
    info = smpl_ops.get_details(imit.smpl_params,
                                jnp.asarray(thetas[:batch]), imit.parents)
    fv = rast.project_to_raster_space(info["verts"], info["cam"],
                                      imit.smpl_params.faces)
    tile, cap, span = imit.renderer.tile_params()
    stats = {k: int(np.asarray(v).max())
             for k, v in imit.renderer.tile_stats(fv).items()}
    raster_parity = None
    if jax.default_backend() == "tpu":
        # production bucket kernel vs the BRUTE oracle (bit-matched CUDA
        # semantics), executed on the TPU itself — catches Mosaic
        # lowering regressions that CPU interpret-mode tests can't
        fv2 = fv[:2]
        fa, wa = rast.rasterize_fim_wim(fv2, cfg.image_size)
        fb, wb = rast.rasterize_fim_wim_bucket(
            fv2, cfg.image_size, tile=tile, span=span, txb=4)
        raster_parity = {
            "fim_match": float((np.asarray(fa) == np.asarray(fb)).mean()),
            "wim_max_abs_diff": float(
                np.abs(np.asarray(wa) - np.asarray(wb)).max()),
        }
        # regression guard, not just a recording: fim must bit-match the
        # brute oracle; wim drift is bounded (observed 2.5e-3 on TPU)
        assert raster_parity["fim_match"] == 1.0, raster_parity
        assert raster_parity["wim_max_abs_diff"] < 5e-3, raster_parity

    # ---- phase breakdown (one timed call per stage) ---------------------
    def timeit(fn, *args, reps=3):
        o = fn(*args)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(reps):
            o = fn(*args)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / reps

    smpl_fn = jax.jit(lambda t: smpl_ops.get_details(
        imit.smpl_params, t, imit.parents)["verts"])
    if jax.default_backend() == "tpu":
        rast_fn = jax.jit(lambda f: rast.rasterize_fim_wim_bucket(
            f, cfg.image_size, tile=tile, span=span, txb=4))
    else:
        rast_fn = jax.jit(lambda f: rast.rasterize_fim_wim_tiled(
            f, cfg.image_size, tile=tile, cap=cap, span=span,
            backend="xla"))
    tb = jnp.asarray(thetas[:batch])
    breakdown_ms = {
        "smpl": round(timeit(smpl_fn, tb) * 1e3, 2),
        "rasterize": round(timeit(rast_fn, fv) * 1e3, 2),
        "full_step": round(timeit(
            lambda t: imit._imitate_swap_jit(
                imit.src_info, t, jnp.asarray(thetas[0:1, 0:3]),
                cam_strategy="smooth"), tb) * 1e3, 2),
    }

    # ---- GAN train-step throughput (paper config: 256², batch 4,
    # rec+vgg+face+mask losses, fused G+D update) ------------------------
    train_ms = None
    try:
        from impersonator_tpu.config import TrainConfig
        from impersonator_tpu.tasks import trainer as trainer_mod

        tcfg = TrainConfig(image_size=256, batch_size=4, repeat_num=6,
                           use_vgg=True, use_style=False, use_face=True,
                           train_dtype="bfloat16")
        tr = trainer_mod.build_trainer(tcfg, assets)
        tstate = tr.init_state()
        step = jax.jit(trainer_mod.make_train_step(tr, train_d=True))
        tthetas = np.zeros((4, 2, 85), np.float32)
        tthetas[..., 0] = 0.9
        tthetas[..., 3:75] = rng.normal(0, 0.03, (4, 2, 72))
        tbatch = {
            "images": jnp.asarray(
                rng.uniform(-1, 1, (4, 2, 256, 256, 3)), jnp.float32),
            "smpls": jnp.asarray(tthetas),
        }
        tstate, m = step(tstate, tbatch)
        jax.block_until_ready(m["g_total"])
        t0 = time.perf_counter()
        for _ in range(3):
            tstate, m = step(tstate, tbatch)
        jax.block_until_ready(m["g_total"])
        train_ms = (time.perf_counter() - t0) / 3 * 1e3
        train_flops = _compiled_flops(step, tstate, tbatch)
    except Exception as e:
        train_flops = None
        print(f"# train-step bench skipped: {e}")

    # ---- MFU: achieved TFLOP/s (XLA cost-analysis flop counts of the
    # exact compiled programs) vs the chip's peak bf16 throughput --------
    peak = _peak_bf16_flops(jax.devices()[0])
    imitate_flops = _compiled_flops(
        lambda t: imit._imitate_swap_jit(
            imit.src_info, t, jnp.asarray(thetas[0:1, 0:3]),
            cam_strategy="smooth"), tb)
    mfu = {"peak_bf16_tflops": (round(peak / 1e12, 1) if peak else None)}
    if imitate_flops:
        ach = imitate_flops / (breakdown_ms["full_step"] / 1e3)
        mfu["imitate_achieved_tflops"] = round(ach / 1e12, 2)
        mfu["imitate"] = round(ach / peak, 4) if peak else None
    if train_flops and train_ms:
        ach = train_flops / (train_ms / 1e3)
        mfu["train_achieved_tflops"] = round(ach / 1e12, 2)
        mfu["train"] = round(ach / peak, 4) if peak else None

    n_chips = jax.device_count()
    result = {
        "metric": "frames/sec/chip at 256x256 motion imitation (HMR + SMPL"
                  " + rasterize + flow + LWB decode per frame)",
        "value": round(fps_full / n_chips, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps_full / n_chips / 30.0, 3),
        "fps_given_smpls": round(fps_smpl / n_chips, 3),
        "tile_stats": stats,
        "breakdown_ms_batch16": breakdown_ms,
    }
    if fps_e2e is not None:
        result["fps_e2e_host_io"] = round(fps_e2e / n_chips, 3)
    if fps_e2e_rb is not None:
        result["fps_e2e_with_readback"] = round(fps_e2e_rb / n_chips, 3)
    if raster_parity is not None:
        result["raster_parity"] = raster_parity
    if train_ms is not None:
        result["train_step_ms_batch4"] = round(train_ms, 2)
        result["train_samples_per_sec_chip"] = round(
            4.0 / (train_ms / 1e3) / n_chips, 2)
        result["train_dtype"] = tcfg.train_dtype
    result["mfu"] = mfu
    # HBM stats: explicit null when the platform exposes none, per the
    # no-silent-caps rule (VERDICT r2 weak #5)
    result["hbm_stats"] = None
    try:
        from impersonator_tpu.utils.profiling import device_memory_stats
        ms = device_memory_stats()
        if ms:
            result["hbm_stats"] = {
                k: v for k, v in next(iter(ms.values())).items()
                if k in ("bytes_in_use", "peak_bytes_in_use",
                         "bytes_limit")}
    except Exception as e:
        print(f"# device_memory_stats failed: {e}")
    if result["hbm_stats"] is None:
        print("# hbm_stats: platform exposes no device memory stats")
    print(json.dumps(result))


def _probe_with_retries(attempts: int = 3, timeout_s: float = 240.0):
    """Ride out a transient tunnel outage: a few spaced probes before
    declaring the accelerator unreachable."""
    import time as _t
    for i in range(attempts):
        backend = _probe_backend(timeout_s)
        if backend is not None:
            return backend
        if i + 1 < attempts:
            print(f"# probe attempt {i + 1}/{attempts} failed; "
                  "retrying in 60s")
            _t.sleep(60)
    return None


if __name__ == "__main__":
    if _probe_with_retries() is None:
        # One honest JSON line instead of an infinite import-time hang:
        # the driver records bench stdout; value 0 + error beats silence.
        print(json.dumps({
            "metric": "frames/sec/chip at 256x256 motion imitation (HMR +"
                      " SMPL + rasterize + flow + LWB decode per frame)",
            "value": 0.0,
            "unit": "frames/s/chip",
            "vs_baseline": 0.0,
            "error": "accelerator backend failed to initialize (tunnel "
                     "outage?) — no measurement taken this run",
        }))
        raise SystemExit(1)
    main()
