#!/bin/bash
# A/B sweep of bench.py RasterConfig levers on the real chip.
# Usage: tools/ab_sweep.sh [logfile]   (default /tmp/ab_sweep.log)
# Each mode gets its own process + timeout so one wedge doesn't kill the rest.
LOG=${1:-/tmp/ab_sweep.log}
cd "$(dirname "$0")/.."
echo "=== ab_sweep $(date) ===" >> "$LOG"
echo "--- parity gate $(date +%H:%M:%S)" >> "$LOG"
timeout 1500 python tools/tpu_parity_check.py >> "$LOG" 2>&1
echo "--- parity rc=$?" >> "$LOG"
for mode in "" noalign notrim roll perm perm+roll roll+c256 scatter; do
  label=${mode:-baseline}
  echo "--- mode: $label $(date +%H:%M:%S)" >> "$LOG"
  timeout 1500 python bench.py "$mode" >> "$LOG" 2>&1
  rc=$?
  echo "--- rc=$rc" >> "$LOG"
  if [ $rc -ne 0 ] && [ $rc -ne 124 ]; then
    # a hard failure (assert/compile error) usually repeats — keep going,
    # later modes may still work
    sleep 30
  fi
done
echo "--- step_overhead $(date +%H:%M:%S)" >> "$LOG"
timeout 1500 python tools/step_overhead.py >> "$LOG" 2>&1
echo "--- step_overhead c256 $(date +%H:%M:%S)" >> "$LOG"
timeout 1500 python tools/step_overhead.py --chunk 256 --steps 4000 >> "$LOG" 2>&1
echo "--- profile default $(date +%H:%M:%S)" >> "$LOG"
timeout 2400 python tools/profile_bench.py --iters 10 --top 45 >> "$LOG" 2>&1
echo "=== done $(date) ===" >> "$LOG"
