#!/bin/bash
# Paper recipe on iPER (reference scripts/train_iPER.sh), TPU edition.
# Replace the data/checkpoint paths; chips are used automatically via
# the default data mesh (no --gpu_ids here — see docs/train.md).
set -e

# dataset configs
dataset_mode=iPER
data_dir=/data/iPER                      # need to be replaced!
images_folder=images_HD
smpls_folder=smpls
train_ids_file=train.txt
test_ids_file=val.txt

# asset configs (converted once with tools/convert_weights.py)
smpl_model=assets/smpl_model.pkl
uv_mapping=assets/mapper.obj

# saving configs
checkpoints_dir=./outputs/checkpoints    # need to be replaced!
name=exp_iPER

# model configs
model=impersonator_trainer
gen_name=impersonator
image_size=256

# training configs (paper loss weights; train_iPER.sh:27-35)
batch_size=4
lambda_rec=10.0
lambda_tsf=10.0
lambda_face=5.0
lambda_style=0.0
lambda_mask=1.0
lambda_mask_smooth=1.0
nepochs_no_decay=5
nepochs_decay=25

python -m impersonator_tpu.cli.train \
    --data_dir          "${data_dir}" \
    --images_folder     "${images_folder}" \
    --smpls_folder      "${smpls_folder}" \
    --checkpoints_dir   "${checkpoints_dir}" \
    --train_ids_file    "${train_ids_file}" \
    --test_ids_file     "${test_ids_file}" \
    --smpl_model        "${smpl_model}" \
    --uv_mapping        "${uv_mapping}" \
    --model             "${model}" \
    --gen_name          "${gen_name}" \
    --name              "${name}" \
    --dataset_mode      "${dataset_mode}" \
    --image_size        "${image_size}" \
    --batch_size        "${batch_size}" \
    --lambda_rec        "${lambda_rec}" \
    --lambda_tsf        "${lambda_tsf}" \
    --lambda_face       "${lambda_face}" \
    --lambda_style      "${lambda_style}" \
    --lambda_mask       "${lambda_mask}" \
    --lambda_mask_smooth "${lambda_mask_smooth}" \
    --nepochs_no_decay  "${nepochs_no_decay}" \
    --nepochs_decay     "${nepochs_decay}" \
    --use_vgg --use_face --mask_bce \
    --train_dtype bfloat16
