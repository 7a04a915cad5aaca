#!/bin/bash
# Round-5 scaling-evidence loop: repeatedly run the pre-registered
# calm_pair protocol (1 vs 4 pinned cores, 842k-turn corpus) until the
# log holds enough bracket-clean pairs. Every attempt (incl. gate skips)
# is appended to the jsonl log; nothing is cherry-picked.
#
# Serialization with session work: burn brackets bound the pair but can't
# see contention that starts and ends INSIDE the pair window (observed
# 07:04-07:15 — clean brackets around a pair whose interior overlapped a
# 16-core index build; see BENCH.md round-5). Two lockfiles fix it:
#   /tmp/esbench_heavy.lock — session holds it while running heavy jobs;
#     the loop refuses to start an attempt while it exists.
#   /tmp/esbench_pair.lock  — held for the duration of each attempt;
#     heavy session jobs wait on it before starting.
set -u
LOG=${1:-/root/repo/bench_logs/r5/pairs.jsonl}
N=${2:-12}
export PAIR_LO=${PAIR_LO:-1}
export PAIR_GATE_AGG=${PAIR_GATE_AGG:-8}
for i in $(seq 1 "$N"); do
  echo "=== attempt $i/$N $(date +%T) ==="
  if [ -e /tmp/esbench_heavy.lock ]; then
    echo "session heavy job active; skipping attempt (not logged — no burn ran)"
    sleep 60
    continue
  fi
  touch /tmp/esbench_pair.lock
  python3 /root/repo/scripts/calm_pair.py "$LOG" ${PAIR_EXTRA:-} || echo "attempt $i failed"
  rm -f /tmp/esbench_pair.lock
  clean=$(python3 - "$LOG" <<'EOF'
import json, sys
n = 0
for line in open(sys.argv[1]):
    r = json.loads(line)
    if r.get("gate") == "run" and r.get("pre", {}).get("hw_eff", 0) >= 0.8 \
       and r.get("post", {}).get("hw_eff", 0) >= 0.8:
        n += 1
print(n)
EOF
)
  echo "bracket-clean pairs so far: $clean"
  if [ "$clean" -ge 4 ]; then echo "enough clean pairs; stopping"; break; fi
  sleep 45
done
rm -f /tmp/esbench_pair.lock
