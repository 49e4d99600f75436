#!/usr/bin/env bash
# Sharded adversarial pseudo-label generation (reference
# generate_pseudo_labels_perturb_dist.sh / _perturb_k_dist.sh — the voxel-coord
# `_k` storage is always written alongside).
set -euo pipefail
NPROC=$1; CFG=$2; CKPT=$3; shift 3
for ((i = 0; i < NPROC; i++)); do
    python tools/generate_pseudo_labels.py --cfg_file "${CFG}" --ckpt "${CKPT}" \
        --perturb --dist --num_processes "${NPROC}" --process_id "${i}" \
        --coordinator "${COORDINATOR:-127.0.0.1:29500}" "$@" &
done
wait
