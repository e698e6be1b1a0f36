#!/bin/bash
# Novel-view preset (reference scripts/novel_view_synthesis/runner.sh).
set -e

python -m impersonator_tpu.cli.run_view \
    --gen_name impersonator --image_size 256 \
    --name imper_results \
    --checkpoints_dir ./outputs/checkpoints \
    --output_dir ./outputs/results \
    --src_path ./samples/src_imgs/men1_256.jpg \
    --bg_ks 13 --ft_ks 3 \
    --bg_replace --front_warp --save_res
