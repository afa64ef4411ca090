#!/bin/bash
# Phase-2: train the LID classifier on frozen encoder features.
# Parity with /root/reference/slurm_jobs/train_lid.sh (env-var parameterized:
# BASE_MODEL, SAMPLES_PER_LANG=5000, MAX_STEPS=2000, ...).
#SBATCH --job-name=train_lid
#SBATCH --time=12:00:00
#SBATCH --output=logs/lid_%j.out

set -euo pipefail
cd "$(dirname "$0")/.."

python scripts/train_router.py \
  --base_model "${BASE_MODEL:-whisper-small}" \
  --languages hindi italian punjabi telugu \
  --data_sources ${DATA_SOURCES:-common_voice} \
  --samples_per_language "${SAMPLES_PER_LANG:-5000}" \
  --pooling "${POOLING:-mean}" \
  --encoder_layer "${ENCODER_LAYER:--1}" \
  --max_steps "${MAX_STEPS:-2000}" \
  --eval_steps "${EVAL_STEPS:-200}" \
  --batch_size "${BATCH_SIZE:-32}" \
  --learning_rate "${LEARNING_RATE:-1e-3}" \
  --output_dir "${OUTPUT_DIR:-checkpoints/lid_${BASE_MODEL:-whisper-small}}" \
  ${EXTRA_ARGS:-}
