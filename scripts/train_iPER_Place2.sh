#!/bin/bash
# iPER + Places2 auxiliary-background recipe (reference
# scripts/train_iPER_Place2.sh), TPU edition. Add
# --dataset_mode iPER_fashion_place --fashion_dir ... for the
# three-source mix the released lwb_imper_fashion_place model used.
set -e

dataset_mode=iPER_place
data_dir=/data/iPER                      # need to be replaced!
place_dir=/data/places365_standard      # need to be replaced!
checkpoints_dir=./outputs/checkpoints
name=exp_iPER_place

smpl_model=assets/smpl_model.pkl
uv_mapping=assets/mapper.obj

python -m impersonator_tpu.cli.train \
    --data_dir        "${data_dir}" \
    --place_dir       "${place_dir}" \
    --checkpoints_dir "${checkpoints_dir}" \
    --smpl_model      "${smpl_model}" \
    --uv_mapping      "${uv_mapping}" \
    --model           impersonator_trainer_aug \
    --name            "${name}" \
    --dataset_mode    "${dataset_mode}" \
    --image_size 256 --batch_size 4 \
    --use_vgg --use_face --mask_bce \
    --train_dtype bfloat16
