#!/bin/bash
# Re-run bench.py until it captures a healthy window (vs_baseline >= 1.0),
# then immediately run the interleaved A/B battery (healthy_capture --force)
# in the same window. Logs everything to the file given as $1.
LOG="${1:-/tmp/flap_watch.log}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:$PYTHONPATH"
for i in $(seq 1 200); do
  echo "=== attempt $i $(date -u +%H:%M:%S) ===" >> "$LOG"
  OUT=$(BENCH_MAX_SECONDS=1500 timeout 1800 python "$REPO/bench.py" 2>/dev/null | tail -1)
  echo "$OUT" >> "$LOG"
  if echo "$OUT" | python -c 'import json,sys; d=json.loads(sys.stdin.read() or "{}"); raise SystemExit(0 if d.get("vs_baseline",0)>=1.0 else 1)' 2>/dev/null; then
    echo "=== HEALTHY WINDOW CAUGHT — running battery ===" >> "$LOG"
    timeout 2400 python "$REPO/benchmarks/healthy_capture.py" --force >> "$LOG" 2>&1
    exit 0
  fi
done
exit 1
