#!/usr/bin/env bash
# The per-round validation ritual, in one command (dev-harness only).
# Runs, in order, FAILING LOUDLY per step (pipefail + explicit gates —
# a broken round must exit non-zero, not print a green summary):
#   1. sbt test                       (unit + plan-guard + differential)
#   2. 1200-seed extended sweep       (GRAFT_SWEEP=1, ExtendedSweepSpec)
#   3. full oracle correctness sf0.01 (Verify + DuckDB compare)
#   4. full oracle correctness sf0.1  (the 10x gate)
#   5. bench sf0.1                    (BENCH_r{N}_sf01 candidate)
#   6. 9x scale bench + linearity     (needs testdata_sf1 — run
#      `sbt "runMain graft.tools.ScaleUp /root/testdata/sf0.1 \
#       /root/repo/testdata_sf1 9"` once per data regeneration)
# Usage: scripts/round_ritual.sh [fast]   ("fast" skips steps 4-6)
set -uo pipefail
cd "$(dirname "$0")/.."
FAST="${1:-}"
status=0
step() { echo; echo "=== $1 ==="; }
gate() { # gate <label>: mark the round failed
  echo "STEP FAILED: $1"; status=1
}

step "1/6 sbt test"
out=$(sbt -batch test 2>&1 | grep -E "Tests:|All tests" | tail -2)
echo "$out"
echo "$out" | grep -q "failed 0" || gate "sbt test"

step "2/6 extended sweep (1200 seeds)"
out=$(GRAFT_SWEEP=1 sbt -batch "testOnly graft.ExtendedSweepSpec" 2>&1 |
  grep -E "seeds|Tests:" | tail -3)
echo "$out"
echo "$out" | grep -q "failed 0" || gate "extended sweep"

run_verify() { # run_verify <sfDir> <outDir> <label>
  if ! sbt -batch "runMain graft.Verify $1 $2" >/dev/null 2>&1; then
    gate "$3 (Verify crashed)"; return
  fi
  local line
  line=$(python3 scripts/oracle_check.py "$1" "$2" | tail -1)
  echo "$line"
  echo "$line" | grep -q "^PASS" || gate "$3"
}

step "3/6 oracle correctness sf0.01"
run_verify /root/testdata/sf0.01 /tmp/ritual_v001 "oracle sf0.01"

if [ "$FAST" != "fast" ]; then
  step "4/6 oracle correctness sf0.1"
  SPARK_GRAFT_CPUS=16 run_verify /root/testdata/sf0.1 /tmp/ritual_v01 \
    "oracle sf0.1"

  step "5/6 bench sf0.1"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
    2>/dev/null | grep '"metric"' > /tmp/ritual_bench_sf01.json || true
  python3 - <<'PY' || gate "bench sf0.1"
import json, sys
d = json.load(open('/tmp/ritual_bench_sf01.json'))
print('total', d['value'], 'failed', d['failed'])
sys.exit(1 if d['failed'] else 0)
PY

  step "6/6 9x bench + linearity"
  if [ -d /root/repo/testdata_sf1 ]; then
    SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf1 sbt -batch \
      "runMain graft.Bench" 2>/dev/null | grep '"metric"' \
      > /tmp/ritual_bench_sf1.json || true
    # a query failing ONLY at 9x is exactly what this step exists to
    # catch — gate the artifact's failed list before the ratio check
    python3 - <<'PY' || gate "9x bench (failed queries)"
import json, sys
d = json.load(open('/tmp/ritual_bench_sf1.json'))
print('9x total', d['value'], 'failed', d['failed'])
sys.exit(1 if d['failed'] else 0)
PY
    if python3 scripts/linearity.py /tmp/ritual_bench_sf01.json \
         /tmp/ritual_bench_sf1.json 9 > /tmp/ritual_linearity.txt; then
      tail -2 /tmp/ritual_linearity.txt
      tail -1 /tmp/ritual_linearity.txt |
        grep -Eq "; 0/[0-9]+ queries over" ||
        gate "linearity (super-linear queries)"
    else
      tail -2 /tmp/ritual_linearity.txt
      gate "linearity (unparseable bench artifacts)"
    fi
  else
    echo "testdata_sf1 missing — run graft.tools.ScaleUp first"
    gate "9x bench (no data)"
  fi
fi

echo; echo "ritual exit: $status"
exit $status
