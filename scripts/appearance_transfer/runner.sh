#!/bin/bash
# Appearance-transfer preset (reference scripts/appearance_transfer/runner.sh).
set -e

python -m impersonator_tpu.cli.run_swap \
    --gen_name impersonator --image_size 256 \
    --name imper_results \
    --checkpoints_dir ./outputs/checkpoints \
    --output_dir ./outputs/results \
    --src_path ./samples/src_imgs/men1_256.jpg \
    --tgt_path ./samples/src_imgs/8_256.jpg \
    --bg_ks 13 --ft_ks 3 --swap_part body \
    --has_detector --post_tune --front_warp --save_res
