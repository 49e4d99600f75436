#!/usr/bin/env bash
# The full TODA two-stage recipe (reference: stage1_cutmix_dist_train.sh,
# generate_pseudo_labels_perturb_dist.sh, stage2_mixup_dist_train_cl.sh).
#
#   bash tools/scripts/run_toda.sh <stage1_cfg> <pseudo_cfg> <stage2_cfg> <tag>
set -euo pipefail

STAGE1_CFG=$1
PSEUDO_CFG=$2
STAGE2_CFG=$3
TAG=${4:-toda}

python tools/stage1_cutmix_train.py --cfg_file "$STAGE1_CFG" --extra_tag "$TAG"

STAGE1_CKPT=$(ls -d output/*/"$(basename "$STAGE1_CFG" .yaml)"/"$TAG"/ckpt/checkpoint_epoch_* | sort -V | tail -1)

python tools/generate_pseudo_labels.py --cfg_file "$PSEUDO_CFG" \
    --ckpt "$STAGE1_CKPT" --perturb --score_thresh 0.2 \
    --output output/pseudo_infos_"$TAG".pkl

python tools/stage2_mixup_train_cl.py --cfg_file "$STAGE2_CFG" \
    --pseudo_info_path output/pseudo_infos_"$TAG".pkl \
    --pretrained_model "$STAGE1_CKPT" --extra_tag "$TAG"
