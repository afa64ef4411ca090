#!/bin/bash
# Launch the HTTP transcription server (sar_tpu/serving) on a TPU host.
# No reference counterpart — the reference has no serving surface at all.
#
#   jobs/serve.sh whisper-small hindi [port]
#   jobs/serve.sh whisper-small - 8000 --classifier ckpt/lid \
#     --adapters hindi=... italian=... punjabi=... telugu=...   # routed
#
# First request pays the one-time XLA compile of the two programs
# (minutes on a remote-compile tunnel); /healthz answers immediately.
#SBATCH --job-name=serve
#SBATCH --time=24:00:00
#SBATCH --output=logs/serve_%j.out

set -euo pipefail
cd "$(dirname "$0")/.."

MODEL=${1:-whisper-small}
LANGUAGE=${2:-hindi}
PORT=8000
[ $# -ge 1 ] && shift
[ $# -ge 1 ] && shift
# Optional [port] positional: only consume it if the next arg isn't a flag.
if [ $# -ge 1 ] && [ "${1#-}" = "$1" ]; then
  PORT=$1
  shift
fi

ARGS=(--model "$MODEL" --port "$PORT" --batch_size "${BATCH_SIZE:-16}" \
      --max_wait_ms "${MAX_WAIT_MS:-20}")
if [ "$LANGUAGE" != "-" ]; then
  ARGS+=(--language "$LANGUAGE")
fi

exec python scripts/serve.py "${ARGS[@]}" "$@"
