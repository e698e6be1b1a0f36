#!/bin/bash
# Motion-imitation preset (reference scripts/motion_imitation/runner.sh).
set -e

src_path=./samples/src_imgs/men1_256.jpg
tgt_path=./samples/ref_imgs/024_8_2

name=imper_results
checkpoints_dir=./outputs/checkpoints
output_dir=./outputs/results

# converted checkpoints (tools/convert_weights.py); comment out to run
# the built-in BGNet / random weights
load_path=./ckpt/lwb_imper_fashion_place_G.msgpack
bg_model=./ckpt/deepfillv2_G.msgpack

python -m impersonator_tpu.cli.run_imitator \
    --gen_name impersonator \
    --image_size 256 \
    --name "${name}" \
    --checkpoints_dir "${checkpoints_dir}" \
    --bg_model   "${bg_model}" \
    --load_path  "${load_path}" \
    --output_dir "${output_dir}" \
    --src_path   "${src_path}" \
    --tgt_path   "${tgt_path}" \
    --bg_ks 7 --ft_ks 3 \
    --has_detector --post_tune --front_warp --save_res
