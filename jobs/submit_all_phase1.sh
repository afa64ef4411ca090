#!/bin/bash
# Submit the full Phase-1 grid (parity with
# /root/reference/slurm_jobs/submit_all_phase1.sh). Without SLURM, runs the
# 36 cells sequentially.
set -euo pipefail
cd "$(dirname "$0")"

if command -v sbatch >/dev/null 2>&1; then
  sbatch train_lora_array.sh
else
  for t in $(seq 0 35); do
    TASK_ID=$t bash train_lora_array.sh
  done
fi
