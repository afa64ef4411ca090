#!/bin/bash
# Evaluate a checkpoint: greedy transcription + WER/CER + saved predictions.
# Parity with /root/reference/slurm_jobs/evaluate.sh (positional
# checkpoint/model/language).
#SBATCH --job-name=evaluate
#SBATCH --time=4:00:00
#SBATCH --output=logs/eval_%j.out

set -euo pipefail
cd "$(dirname "$0")/.."

CHECKPOINT=${1:?usage: evaluate.sh <checkpoint> <model> <language>}
MODEL=${2:?}
LANGUAGE=${3:?}

python scripts/evaluate_model.py \
  --checkpoint "$CHECKPOINT" \
  --model "$MODEL" \
  --language "$LANGUAGE" \
  --split test \
  --num_beams 1 \
  --save_predictions \
  --output_dir "results/$(basename "$CHECKPOINT")_${LANGUAGE}" \
  ${EXTRA_ARGS:-}
