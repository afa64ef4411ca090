#!/bin/bash
# Monitor the training grid: queue state, best checkpoints, errors, WER table.
# Parity with /root/reference/slurm_jobs/monitor_jobs.sh:7-37 (squeue, find
# best checkpoints, grep errors, print metrics.json WER); nvidia-smi becomes
# the JAX device listing.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "=== queue ==="
command -v squeue >/dev/null 2>&1 && squeue -u "$USER" || echo "(no SLURM)"

echo "=== best checkpoints ==="
find "${OUTPUT_ROOT:-checkpoints}" -maxdepth 2 -name best -type d 2>/dev/null

echo "=== recent errors ==="
grep -l -iE "error|exception|traceback" logs/*.out 2>/dev/null | tail -5

echo "=== WER from results ==="
for f in results/*/metrics.json; do
  [ -e "$f" ] || continue
  printf "%-50s " "$(dirname "$f")"
  python -c "import json,sys; m=json.load(open(sys.argv[1])); print(f\"WER={m['wer']*100:.2f}% CER={m['cer']*100:.2f}% n={m.get('num_samples','?')}\")" "$f"
done

echo "=== devices ==="
python -c "import jax; print(jax.devices())" 2>/dev/null || true
