#!/bin/bash
# Watch the pairs log; after each gate=run pair completes (i.e. a calm-ish
# window just existed), immediately attempt a bench suite run under the
# heavy lock. bench.py re-probes and self-labels calm/collapsed, so a
# closed window costs one labeled artifact, never a silent bad number.
LOG=${1:-/root/repo/bench_logs/r5/pairs.jsonl}
OUT=${2:-/root/repo/bench_logs/r5/bench_attempts.jsonl}
seen=$(grep -c '"gate": "run"' "$LOG")
for i in $(seq 1 720); do
  sleep 30
  now=$(grep -c '"gate": "run"' "$LOG" 2>/dev/null || echo "$seen")
  if [ "$now" -gt "$seen" ]; then
    seen=$now
    echo "=== bench attempt after pair #$now $(date +%T) ===" >> "$OUT"
    bash /root/repo/scripts/heavy.sh python /root/repo/bench.py 2>/dev/null | tail -1 >> "$OUT"
  fi
done
