#!/usr/bin/env bash
# SLURM launcher (reference tools/scripts/slurm_train.sh): one task per host;
# toda_tpu derives the process group from SLURM_* env via parallel.mesh.init_dist_slurm.
# Usage: sbatch/srun slurm_train.sh <partition> <job_name> <ntasks> <cfg> [extra args...]
set -euo pipefail
PARTITION=$1; JOB_NAME=$2; NTASKS=$3; CFG=$4; shift 4
srun -p "${PARTITION}" --job-name="${JOB_NAME}" --ntasks="${NTASKS}" \
    --ntasks-per-node="${NTASKS_PER_NODE:-1}" --kill-on-bad-exit=1 \
    python tools/train.py --cfg_file "${CFG}" --dist --slurm "$@"
