#!/bin/bash
# One-shot hardware revalidation after a TPU relay restore.  ORDER MATTERS:
# the relay can die again mid-session (it has), so the round's driver-visible
# deliverable (bench.py's headline JSON, which self-gates on a bit-exact
# round trip) runs FIRST, then the correctness selftest, then the
# stage-resolved profiles.
# Usage: bash tools/tpu_revalidate.sh [logdir]
set -u
LOG=${1:-/tmp/tpu_revalidate}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."
echo "== bench ==" | tee "$LOG/summary.txt"
timeout 3000 python bench.py > "$LOG/bench.json" 2> "$LOG/bench.err"
tail -2 "$LOG/bench.json" | tee -a "$LOG/summary.txt"
echo "== selftest ==" | tee -a "$LOG/summary.txt"
timeout 1800 python tools/tpu_selftest.py 2>&1 | tee "$LOG/selftest.txt" | tail -6 | tee -a "$LOG/summary.txt"
echo "== decode profile ==" | tee -a "$LOG/summary.txt"
timeout 1800 python tools/profile_decode.py 512 512 > "$LOG/decode.txt" 2>&1
tail -8 "$LOG/decode.txt" | tee -a "$LOG/summary.txt"
echo "== encode profile ==" | tee -a "$LOG/summary.txt"
timeout 1800 python tools/profile_encode.py 2048 > "$LOG/encode.txt" 2>&1
tail -3 "$LOG/encode.txt" | tee -a "$LOG/summary.txt"
echo "done; logs in $LOG"
