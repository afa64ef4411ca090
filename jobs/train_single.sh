#!/bin/bash
# Train one (model, language, rank) cell.
# Parity with /root/reference/slurm_jobs/train_single.sh (max_steps 3500,
# eval every 500).
#SBATCH --job-name=lora_single
#SBATCH --time=24:00:00
#SBATCH --output=logs/lora_single_%j.out

set -euo pipefail
cd "$(dirname "$0")/.."

MODEL=${1:?usage: train_single.sh <model> <language> <rank>}
LANGUAGE=${2:?}
RANK=${3:?}
ALPHA=$((RANK * 2))

case "$LANGUAGE" in
  italian) SOURCES="common_voice mls" ;;
  *)       SOURCES="common_voice ai4bharat" ;;
esac

python scripts/train_lora.py \
  --model "$MODEL" \
  --language "$LANGUAGE" \
  --lora_rank "$RANK" \
  --lora_alpha "$ALPHA" \
  --data_sources $SOURCES \
  --mixed_precision bf16 \
  --max_steps "${MAX_STEPS:-3500}" \
  --eval_steps "${EVAL_STEPS:-500}" \
  --output_dir "${OUTPUT_ROOT:-checkpoints}/${MODEL}_${LANGUAGE}_r${RANK}" \
  ${EXTRA_ARGS:-}
