#!/usr/bin/env bash
# Stage-1 inter-domain mix training over N hosts (reference stage1_cutmix_dist_train.sh).
set -euo pipefail
NPROC=$1; CFG=$2; shift 2
for ((i = 0; i < NPROC; i++)); do
    python tools/stage1_cutmix_train.py --cfg_file "${CFG}" --dist \
        --num_processes "${NPROC}" --process_id "${i}" \
        --coordinator "${COORDINATOR:-127.0.0.1:29500}" "$@" &
done
wait
