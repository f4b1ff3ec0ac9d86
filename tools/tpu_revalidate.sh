#!/bin/bash
# One-shot hardware revalidation after a TPU relay restore: correctness
# gate first, then stage-resolved decode/encode profiles, then the bench.
# Usage: bash tools/tpu_revalidate.sh [logdir]
set -u
LOG=${1:-/tmp/tpu_revalidate}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."
echo "== selftest ==" | tee "$LOG/summary.txt"
timeout 1800 python tools/tpu_selftest.py 2>&1 | tee "$LOG/selftest.txt" | tail -6 | tee -a "$LOG/summary.txt"
echo "== decode profile ==" | tee -a "$LOG/summary.txt"
timeout 1800 python tools/profile_decode.py 512 512 > "$LOG/decode.txt" 2>&1
tail -8 "$LOG/decode.txt" | tee -a "$LOG/summary.txt"
echo "== encode profile ==" | tee -a "$LOG/summary.txt"
timeout 1800 python tools/profile_encode.py 2048 > "$LOG/encode.txt" 2>&1
tail -3 "$LOG/encode.txt" | tee -a "$LOG/summary.txt"
echo "== bench ==" | tee -a "$LOG/summary.txt"
timeout 3000 python bench.py > "$LOG/bench.json" 2> "$LOG/bench.err"
tail -1 "$LOG/bench.json" | tee -a "$LOG/summary.txt"
echo "done; logs in $LOG"
