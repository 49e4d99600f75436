#!/usr/bin/env bash
# Multi-host data-parallel training launcher.
#
# Reference: tools/scripts/dist_train.sh (torch.distributed.launch, one process
# per GPU). JAX is one process per HOST: each host sees its local TPU chips and
# jax.distributed.initialize forms the group. Launch this script once per host:
#
#   COORDINATOR=host0:12345 NUM_PROCESSES=4 PROCESS_ID=$I \
#       bash tools/scripts/dist_train.sh <cfg> [extra args...]
#
# Single-host multi-chip runs need no env at all (XLA sees all local chips).
set -euo pipefail

CFG=$1
shift

ARGS=()
if [[ -n "${COORDINATOR:-}" ]]; then
    ARGS+=(--coordinator_address "$COORDINATOR" \
           --num_processes "${NUM_PROCESSES:?set NUM_PROCESSES}" \
           --process_id "${PROCESS_ID:?set PROCESS_ID}")
fi

python tools/train.py --cfg_file "$CFG" "${ARGS[@]}" "$@"
