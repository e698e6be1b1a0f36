"""Per-stage throughput breakdown of the imitation pipeline on the
attached accelerator. Run: python tools/bench_breakdown.py [batch]

``--sweep`` additionally grid-searches the bucket-kernel schedule
(txb × chunk) on TPU and prints a ms table — the tuning loop for
``SMPLRenderer._bucket_config``'s constants."""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import sys
import time

import numpy as np


def timeit(fn, *args, n=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from impersonator_tpu import assets as A
    from impersonator_tpu.config import TestConfig
    from impersonator_tpu.ops import smpl as smpl_ops, rasterizer as rast

    from impersonator_tpu.tasks import imitator as I

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cfg = TestConfig(image_size=256, repeat_num=6)
    assets = A.bench_assets()
    imit = I.Imitator(cfg, assets=assets)
    rng = np.random.default_rng(0)

    theta = np.zeros((batch, 85), np.float32)
    theta[:, 0] = 0.9
    theta[:, 3:75] = rng.normal(0, 0.05, (batch, 72))
    theta = jnp.asarray(theta)

    # 1. SMPL
    smpl_fn = jax.jit(lambda t: smpl_ops.get_details(
        imit.smpl_params, t, imit.parents)["verts"])
    t_smpl = timeit(smpl_fn, theta)

    info = smpl_ops.get_details(imit.smpl_params, theta, imit.parents)

    # 2. rasterizer — the PRODUCTION path the renderer actually picks
    # (bucket Pallas on TPU, fixed-slot tiled XLA on CPU); timing the
    # other path here made the stage table lie (generator came out
    # negative)
    fv = rast.project_to_raster_space(info["verts"], info["cam"],
                                      imit.smpl_params.faces)
    tile, cap, span = imit.renderer.tile_params()
    # production bucket schedule (sweep-tuned, independent of the capped
    # XLA path's tile — see renderer._bucket_config)
    bucket = imit.renderer._bucket_config()
    btile, bspan, txb = bucket if bucket else (tile, span, 2)
    if jax.default_backend() == "tpu":
        rast_fn = jax.jit(lambda f: rast.rasterize_fim_wim_bucket(
            f, 256, tile=btile, span=bspan, txb=txb))
    else:
        rast_fn = jax.jit(lambda f: rast.rasterize_fim_wim_tiled(
            f, 256, tile=tile, cap=cap, span=span, backend="xla"))
    t_rast = timeit(rast_fn, fv)

    # 3. fused raster+flow + patched warp — the PRODUCTION decomposition
    # (imitate_from_flow): T comes out of the raster kernel, the warp is
    # the single-gather patch sampler. Batch-1 source, like production.
    p2 = jnp.asarray(rng.uniform(-1, 1, (1, assets.nf, 3, 2)).astype(np.float32))
    src_img1 = jnp.asarray(rng.uniform(-1, 1, (1, 256, 256, 3)), jnp.float32)

    def rastflow_fn(f, p2):
        return rast.rasterize_flow_bucket(
            f, p2, 256, tile=btile, span=bspan, txb=txb) \
            if jax.default_backend() == "tpu" else (
                rast.rasterize_fim_wim_tiled(
                    f, 256, tile=tile, cap=cap, span=span, backend="xla")[0],
                None)
    rastflow_j = jax.jit(rastflow_fn)
    t_rastflow = timeit(rastflow_j, fv, p2)
    _, t_map = rastflow_j(fv, p2)

    t_warp = None
    if t_map is not None:
        from impersonator_tpu.ops.sampler import grid_sample_patched
        warp_j = jax.jit(grid_sample_patched)
        t_warp = timeit(warp_j, src_img1, t_map)

    # 4. full step (cached src feats): smpl + raster+flow + warp + LWB
    src_state = imit._personalize_jit(src_img1, theta[:1])
    t_gen = timeit(
        lambda th: imit._imitate_jit(src_state, th), theta)

    print(f"batch={batch}")
    print(f"smpl        : {t_smpl*1e3:8.2f} ms  ({batch/t_smpl:8.1f} fps)")
    print(f"rasterize   : {t_rast*1e3:8.2f} ms  ({batch/t_rast:8.1f} fps)")
    print(f"raster+flow : {t_rastflow*1e3:8.2f} ms  ({batch/t_rastflow:8.1f} fps)  [fused kernel]")
    if t_warp is not None:
        print(f"patch warp  : {t_warp*1e3:8.2f} ms  ({batch/t_warp:8.1f} fps)")
    print(f"full step   : {t_gen*1e3:8.2f} ms  ({batch/t_gen:8.1f} fps)  "
          f"[smpl + raster+flow + warp + LWB decode]")

    # ---- optional schedule sweep (TPU only) -----------------------------
    if "--sweep" in sys.argv and jax.default_backend() == "tpu":
        print("\nbucket-kernel schedule sweep (raster / fused raster+flow,"
              " ms per batch):")
        print(f"{'tile':>5} {'span':>5} {'txb':>4} {'chunk':>6} "
              f"{'raster':>9} {'r+flow':>9}")
        import math
        nf = assets.nf
        for tl in (8, 16):
            g = 256 // tl
            # face linear size in tiles halves when the tile doubles
            sp = max(2, math.ceil(2.0 * math.sqrt(13776.0 / nf) * 8 / tl))
            for txb in (1, 2, 4, 8):
                if g % txb or tl * tl * txb > 2048:
                    continue
                for chunk in (64, 128, 256):
                    try:
                        r_fn = jax.jit(
                            lambda f, t=tl, s_=sp, tx=txb, ck=chunk:
                            rast.rasterize_fim_wim_bucket(
                                f, 256, tile=t, span=s_, txb=tx, chunk=ck))
                        f_fn = jax.jit(
                            lambda f, p, t=tl, s_=sp, tx=txb, ck=chunk:
                            rast.rasterize_flow_bucket(
                                f, p, 256, tile=t, span=s_, txb=tx,
                                chunk=ck))
                        tr_ms = timeit(r_fn, fv) * 1e3
                        tf_ms = timeit(f_fn, fv, p2) * 1e3
                        print(f"{tl:>5} {sp:>5} {txb:>4} {chunk:>6} "
                              f"{tr_ms:>9.2f} {tf_ms:>9.2f}")
                    except Exception as e:
                        print(f"{tl:>5} {sp:>5} {txb:>4} {chunk:>6}  "
                              f"failed: {str(e).splitlines()[0][:50]}")


if __name__ == "__main__":
    main()
