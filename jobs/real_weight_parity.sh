#!/bin/bash
# Real-weight zero-shot WER parity vs the reference's published baselines
# (BASELINE.md; /root/reference/PROJECT_REQUIREMENTS.md:22-28, produced with
# test_inference_run.py on FLEURS test).
#
# Run this the moment the environment has network/HF-cache access:
#   jobs/real_weight_parity.sh                 # small+medium+large, 4 langs
#   jobs/real_weight_parity.sh whisper-small   # one model
#   jobs/real_weight_parity.sh --dry-run       # print the exact commands
#
# Each cell downloads+converts the HF checkpoint, runs the compiled greedy
# decode over the FLEURS test split (greedy, max_new_tokens=256 — the
# settings of /root/reference/scripts/evaluate_model.py:71-72), writes
# metrics.json + predictions, then compare_baseline.py diffs every cell
# against BASELINE.md's table into parity_diff.json.
#SBATCH --job-name=real-weight-parity
#SBATCH --time=12:00:00
#SBATCH --output=logs/parity_%j.out

set -euo pipefail
cd "$(dirname "$0")/.."

DRY=0
if [ "${1:-}" = "--dry-run" ]; then DRY=1; shift; fi
MODELS=${*:-whisper-small whisper-medium whisper-large}
LANGS=${LANGS:-hindi italian punjabi telugu}
OUT=${OUT:-results/real_weight_parity}
mkdir -p "$OUT"

run() { if [ "$DRY" = 1 ]; then echo "DRY: $*"; else "$@"; fi; }

for MODEL in $MODELS; do
  for LANG in $LANGS; do
    run python scripts/evaluate_model.py \
      --checkpoint none \
      --model "$MODEL" \
      --language "$LANG" \
      --data_sources fleurs \
      --split test \
      --num_beams 1 \
      --max_new_tokens 256 \
      --save_predictions \
      --output_dir "$OUT/${MODEL}_${LANG}" \
      ${EXTRA_ARGS:-}
  done
done

run python scripts/compare_baseline.py --results "$OUT" \
  --output "$OUT/parity_diff.json"
