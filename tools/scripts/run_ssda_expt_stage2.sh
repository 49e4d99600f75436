#!/usr/bin/env bash
# SSDA experiment, stage 2: extend the EVIDENCE.md stage-1 comparison through
# the full TODA recipe on the synthetic dense->sparse domain pair.
#
#   1. perturbed pseudo-label generation over the 32 target train scenes with
#      the stage-1 CutMix checkpoint,
#   2. filter the pseudo pool to the unlabeled complement (scenes 4..31 — the
#      4 labeled scenes stay GT-only, matching the reference's
#      labeled-percentage split convention),
#   3. stage-2 adversarial MixUp + two-view consistency (CL) training from the
#      stage-1 weights, evaluated post-train on the disjoint target val split.
#
# Usage: bash tools/scripts/run_ssda_expt_stage2.sh <stage1_ckpt> [epochs] [tag]
set -e
cd "$(dirname "$0")/../.."

STAGE1_CKPT=${1:?usage: run_ssda_expt_stage2.sh <stage1_ckpt> [epochs] [tag]}
EPOCHS=${2:-60}
TAG=${3:-ssda_expt_stage2}
OUT=output/synthetic_models/ssda_expt/pseudo_pointpillar/${TAG}

python tools/generate_pseudo_labels.py \
    --cfg_file tools/cfgs/synthetic_models/ssda_expt/pseudo_pointpillar.yaml \
    --ckpt "${STAGE1_CKPT}" --extra_tag "${TAG}" \
    --score_thresh 0.3 --perturb --output "${OUT}/pseudo_infos_all.pkl"

python - "$OUT" <<'PY'
import pickle, sys
out = sys.argv[1]
infos = pickle.load(open(f"{out}/pseudo_infos_all.pkl", "rb"))
unlab = [i for i in infos if int(i["index"]) >= 4]
pickle.dump(unlab, open(f"{out}/pseudo_infos_unlabeled.pkl", "wb"))
print(f"pseudo pool: {len(infos)} frames -> {len(unlab)} unlabeled (scenes 4+)")
PY

python tools/stage2_mixup_train_cl.py \
    --cfg_file tools/cfgs/synthetic_models/ssda_expt/stage2_mixup_pointpillar.yaml \
    --pseudo_info_path "${OUT}/pseudo_infos_unlabeled.pkl" \
    --pretrained_model "${STAGE1_CKPT}" \
    --epochs "${EPOCHS}" --extra_tag "${TAG}" --fix_random_seed
