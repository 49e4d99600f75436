#!/usr/bin/env bash
# Multi-task SLURM eval with distributed result merge (reference slurm_test_mgpu.sh).
set -euo pipefail
PARTITION=$1; JOB_NAME=$2; NTASKS=$3; CFG=$4; shift 4
srun -p "${PARTITION}" --job-name="${JOB_NAME}" --ntasks="${NTASKS}" --kill-on-bad-exit=1 \
    python tools/test.py --cfg_file "${CFG}" --dist --slurm "$@"
