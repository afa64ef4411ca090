#!/bin/bash
# Phase-1 training grid: models x languages x ranks, one accelerator per cell.
# Parity with /root/reference/slurm_jobs/train_lora_array.sh (36-task array:
# 3 models x 4 languages x 3 ranks, alpha = 2*rank, per-language sources).
# Works as a SLURM array job on a TPU partition, or standalone via
# TASK_ID=<n> ./jobs/train_lora_array.sh for sequential/looped execution.
#SBATCH --job-name=lora_array
#SBATCH --array=0-35
#SBATCH --time=24:00:00
#SBATCH --output=logs/lora_%A_%a.out

set -euo pipefail
cd "$(dirname "$0")/.."

MODELS=(whisper-small whisper-medium whisper-large)
LANGUAGES=(hindi italian punjabi telugu)
RANKS=(8 16 32)

TASK_ID=${SLURM_ARRAY_TASK_ID:-${TASK_ID:?set TASK_ID or run under SLURM}}

# Index decomposition: task = model*12 + language*3 + rank.
MODEL=${MODELS[$((TASK_ID / 12))]}
LANGUAGE=${LANGUAGES[$(((TASK_ID / 3) % 4))]}
RANK=${RANKS[$((TASK_ID % 3))]}
ALPHA=$((RANK * 2))

# Per-language data sources (reference train_lora_array.sh:46-50).
case "$LANGUAGE" in
  italian) SOURCES="common_voice mls" ;;
  *)       SOURCES="common_voice ai4bharat" ;;
esac

OUTPUT_DIR=${OUTPUT_ROOT:-checkpoints}/${MODEL}_${LANGUAGE}_r${RANK}
echo "task $TASK_ID: $MODEL / $LANGUAGE / r$RANK (alpha=$ALPHA) -> $OUTPUT_DIR"

python scripts/train_lora.py \
  --model "$MODEL" \
  --language "$LANGUAGE" \
  --lora_rank "$RANK" \
  --lora_alpha "$ALPHA" \
  --data_sources $SOURCES \
  --mixed_precision bf16 \
  --max_steps "${MAX_STEPS:-5000}" \
  --eval_steps "${EVAL_STEPS:-1000}" \
  --output_dir "$OUTPUT_DIR" \
  ${EXTRA_ARGS:-}
