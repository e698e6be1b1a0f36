"""Training driver.

Mirrors the reference ``train.py:9-137``: epoch loop with
G-every-step / D-every-n scheduling, timed printing, periodic visual
dumps, latest + per-epoch checkpointing, and post-decay LR updates —
but the step itself is ONE compiled program running on the data mesh.

Usage:
    python -m impersonator_tpu.cli.train --data_dir ... --name exp1
    python -m impersonator_tpu.cli.train --dataset synthetic  (smoke run)
"""

from __future__ import annotations

import argparse
import time

import jax
import numpy as np

from impersonator_tpu.config import TrainConfig, from_args
from impersonator_tpu.data import DataLoader, dataset_by_name
from impersonator_tpu.parallel import make_data_mesh, make_mesh
from impersonator_tpu.parallel.mesh import replicate_tree
from impersonator_tpu.tasks import trainer as trainer_mod
from impersonator_tpu.utils import checkpoint as ckpt
from impersonator_tpu.utils.visualizer import Visualizer


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--coordinator", default=None,
                        help="host:port of process 0 for multi-host runs")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    extra, _ = parser.parse_known_args(argv)

    # multi-host init MUST precede the first backend-touching jax call
    # (SURVEY §2.3 table row "multi-host": jax.distributed + DCN)
    from impersonator_tpu.parallel.distributed import (
        global_mesh, global_shard_batch, init_distributed)
    multiprocess = init_distributed(extra.coordinator, extra.num_processes,
                                    extra.process_id)

    cfg = from_args(TrainConfig, argv)
    if jax.process_index() == 0:
        cfg.save("train")

    aug = cfg.model == "impersonator_trainer_aug"
    baseline = cfg.model in ("concat", "texture_warping", "feature_warping")
    if cfg.dataset_mode != "auto":
        dataset_name = cfg.dataset_mode   # reference --dataset_mode names
    elif not cfg.smpl_model:
        dataset_name = "synthetic_bg" if aug else "synthetic"
    else:
        dataset_name = "iPER_place" if aug else "iPER"

    if aug:
        from impersonator_tpu.tasks import trainer_aug as aug_mod
        trainer = aug_mod.build_aug_trainer(cfg)
        state = aug_mod.init_aug_state(trainer)
        make_step = aug_mod.make_aug_train_step
    elif baseline:
        # paper ablations (reference models/baseline.py, --model concat|
        # texture_warping|feature_warping)
        from impersonator_tpu.tasks import trainer_baseline as base_mod
        trainer = base_mod.build_baseline_trainer(cfg)
        state = trainer.init_state()
        make_step = base_mod.make_train_step
    else:
        trainer = trainer_mod.build_trainer(cfg)
        state = trainer.init_state()
        make_step = trainer_mod.make_train_step

    if multiprocess:
        # identical global mesh on every process; each process feeds its
        # local slice of the global batch
        mesh = global_mesh()
        assert cfg.batch_size % jax.process_count() == 0
        local_bs = cfg.batch_size // jax.process_count()
    else:
        mesh = (make_data_mesh(cfg.batch_size)
                if cfg.mesh_shape == (-1,) else
                make_mesh(cfg.mesh_shape, cfg.mesh_axes))
        local_bs = cfg.batch_size
    state = replicate_tree(state, mesh)

    dataset = dataset_by_name(dataset_name, cfg)
    # Multi-host: every process shuffles the SAME global index stream
    # (common seed) and takes its disjoint per-step slice, so the global
    # batch assembled by global_shard_batch has process_count distinct
    # shards (not duplicated data with wrong gradient statistics).
    loader = DataLoader(dataset, local_bs, num_workers=cfg.n_threads,
                        seed=cfg.seed,
                        mesh=None if multiprocess else mesh,
                        shard_index=jax.process_index(),
                        shard_count=jax.process_count())

    vis = Visualizer(cfg.expr_dir())
    step_fn = jax.jit(make_step(trainer, train_d=True))
    step_g_only = jax.jit(make_step(trainer, train_d=False))
    visuals_fn = (jax.jit(trainer_mod.make_visuals_fn(trainer))
                  if not (aug or baseline) else None)

    # held-out validation pass (reference _display_visualizer_val,
    # train.py:91-137): eval-mode losses on the test split, no updates
    val_loader = eval_fn = None
    if not (aug or baseline):
        try:
            val_ds = dataset_by_name(dataset_name, cfg,
                                     ids_file=cfg.test_ids_file)
            # sharded like the train loader: each host feeds its disjoint
            # slice and (drop_last) every host yields the same batch count,
            # keeping the lockstep val pass below in sync
            val_loader = DataLoader(val_ds, local_bs, num_workers=1,
                                    seed=cfg.seed + 1,
                                    mesh=None if multiprocess else mesh,
                                    shard_index=jax.process_index(),
                                    shard_count=jax.process_count())
            eval_fn = jax.jit(make_step(trainer, eval_only=True))
        except Exception as e:
            print(f"train: no validation split ({e}); val pass disabled")

    start_epoch = cfg.resolve_load_epoch()
    if start_epoch > 0:
        state = ckpt.load_train_state(state, cfg.expr_dir(), start_epoch)
        state = replicate_tree(state, mesh)

    total_epochs = cfg.nepochs_no_decay + cfg.nepochs_decay
    i_step = 0
    last_print = time.time()
    last_save = time.time()
    last_display = time.time()
    is_chief = jax.process_index() == 0
    # serialization + disk IO of the 4 G/D pytrees happens off-thread
    # while the next steps run (utils.checkpoint.AsyncCheckpointer)
    saver = ckpt.AsyncCheckpointer() if is_chief else None
    with mesh:
        for epoch in range(start_epoch, total_epochs):
            state = trainer.set_lr(
                state, trainer.epoch_lr(epoch),
                trainer.epoch_lr(epoch, base=cfg.lr_D))
            for batch in loader:
                if multiprocess:
                    batch = global_shard_batch(batch, mesh)
                train_d = (i_step % cfg.train_G_every_n_iterations) == 0
                fn = step_fn if train_d else step_g_only
                t0 = time.perf_counter()
                state, metrics = fn(state, batch)
                if time.time() - last_print > cfg.print_freq_s and is_chief:
                    jax.block_until_ready(metrics["g_total"])
                    dt = time.perf_counter() - t0
                    errors = {k: float(v) for k, v in metrics.items()}
                    vis.print_current_errors(epoch, i_step, errors,
                                             dt / cfg.batch_size)
                    vis.log_scalars(i_step, epoch, errors)
                    last_print = time.time()
                # display/val cadence. Multi-controller: EVERY process must
                # launch the val computations (they run over the global
                # mesh; a chief-only launch on non-fully-addressable arrays
                # deadlocks the other hosts) at the SAME step — so the
                # trigger is a deterministic step count, not drifting wall
                # clocks. Single-process keeps the reference's wall-time
                # cadence (train.py:62-85).
                if multiprocess:
                    do_display = i_step > 0 and (
                        i_step % max(cfg.display_freq_steps, 1) == 0)
                else:
                    do_display = (time.time() - last_display
                                  > cfg.display_freq_s)
                if visuals_fn is not None and do_display:
                    if not multiprocess and is_chief:
                        # image dump is single-host only: the visuals are
                        # image-sized global arrays a chief host cannot
                        # materialize alone in multi-controller mode
                        vis.save_images(i_step, visuals_fn(state, batch))
                    if eval_fn is not None and val_loader is not None:
                        val_errors: dict = {}
                        n_val = 0
                        for val_batch in val_loader:
                            if n_val >= cfg.num_iters_validate:
                                break
                            if multiprocess:
                                val_batch = global_shard_batch(val_batch,
                                                               mesh)
                            vm = eval_fn(state, val_batch)
                            for k, v in vm.items():
                                val_errors[k] = (val_errors.get(k, 0.0)
                                                 + float(v))
                            n_val += 1
                        if n_val and is_chief:   # logging is host-side
                            val_errors = {k: v / n_val
                                          for k, v in val_errors.items()}
                            vis.print_current_errors(epoch, i_step,
                                                     val_errors, 0.0)
                            vis.log_scalars(i_step, epoch, val_errors,
                                            phase="val")
                    last_display = time.time()
                if time.time() - last_save > cfg.save_latest_freq_s \
                        and is_chief:
                    saver.submit(state, cfg.expr_dir(), "latest")
                    last_save = time.time()
                i_step += 1
            if is_chief:
                saver.submit(state, cfg.expr_dir(), epoch + 1)
                print(f"saved epoch {epoch + 1}", flush=True)
    if saver is not None:
        saver.close()   # drain queued saves; re-raise writer errors
    print("training done.", flush=True)
    return state


if __name__ == "__main__":
    main()
