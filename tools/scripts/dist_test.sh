#!/usr/bin/env bash
# Evaluation launcher (reference: tools/scripts/dist_test.sh).
set -euo pipefail
CFG=$1
shift
python tools/test.py --cfg_file "$CFG" "$@"
