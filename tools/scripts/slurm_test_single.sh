#!/usr/bin/env bash
# Single-task SLURM eval (reference slurm_test_single.sh).
set -euo pipefail
PARTITION=$1; JOB_NAME=$2; CFG=$3; CKPT=$4; shift 4
srun -p "${PARTITION}" --job-name="${JOB_NAME}" --ntasks=1 --kill-on-bad-exit=1 \
    python tools/test.py --cfg_file "${CFG}" --ckpt "${CKPT}" "$@"
