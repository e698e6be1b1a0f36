"""Per-stage throughput breakdown of the imitation pipeline on the
attached accelerator. Run: python tools/bench_breakdown.py [batch]"""

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
    from impersonator_tpu.ops.sampler import grid_sample
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
    if jax.default_backend() == "tpu":
        rast_fn = jax.jit(lambda f: rast.rasterize_fim_wim_bucket(
            f, 256, tile=tile, span=span, txb=4))
    else:
        rast_fn = jax.jit(lambda f: rast.rasterize_fim_wim_tiled(
            f, 256, tile=tile, cap=cap, span=span, backend="xla"))
    t_rast = timeit(rast_fn, fv)

    fim, wim = rast_fn(fv)

    # 3. flow + warp
    p2 = jnp.broadcast_to(rng.uniform(-1, 1, (1, assets.nf, 3, 2)
                                      ).astype(np.float32), (batch, assets.nf, 3, 2))
    img = jnp.asarray(rng.uniform(-1, 1, (batch, 256, 256, 3)), jnp.float32)

    def flow_fn(p2, fim, wim, img):
        t = imit.renderer.cal_bc_transform(p2, fim, wim)
        return grid_sample(img, t)
    flow_j = jax.jit(flow_fn)
    t_flow = timeit(flow_j, p2, fim, wim, img)

    # 4. generator decode (cached src feats)
    src_img = jnp.asarray(rng.uniform(-1, 1, (1, 256, 256, 3)), jnp.float32)
    theta1 = theta[:1]
    src_state = imit._personalize_jit(src_img, theta1)
    t_gen = timeit(
        lambda th: imit._imitate_jit(src_state, th), theta)

    total = t_smpl + t_rast + t_flow
    print(f"batch={batch}")
    print(f"smpl      : {t_smpl*1e3:8.2f} ms  ({batch/t_smpl:8.1f} fps)")
    print(f"rasterize : {t_rast*1e3:8.2f} ms  ({batch/t_rast:8.1f} fps)")
    print(f"flow+warp : {t_flow*1e3:8.2f} ms  ({batch/t_flow:8.1f} fps)")
    print(f"full step : {t_gen*1e3:8.2f} ms  ({batch/t_gen:8.1f} fps)  "
          f"[includes smpl+rast+flow+generator]")
    gen_only = t_gen - total
    print(f"generator ≈ {gen_only*1e3:8.2f} ms  ({batch/max(gen_only,1e-9):8.1f} fps)")


if __name__ == "__main__":
    main()
