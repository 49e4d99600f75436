#!/usr/bin/env bash
# Stage-2 consistency (CL) training over N hosts (reference stage2_mixup_dist_train_cl.sh).
set -euo pipefail
NPROC=$1; CFG=$2; PSEUDO=$3; shift 3
for ((i = 0; i < NPROC; i++)); do
    python tools/stage2_mixup_train_cl.py --cfg_file "${CFG}" --pseudo_infos "${PSEUDO}" \
        --dist --num_processes "${NPROC}" --process_id "${i}" \
        --coordinator "${COORDINATOR:-127.0.0.1:29500}" "$@" &
done
wait
