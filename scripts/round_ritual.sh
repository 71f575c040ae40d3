#!/usr/bin/env bash
# The per-round validation ritual, in one command (dev-harness only).
# Runs, in order, with a one-line PASS/FAIL summary per step:
#   1. sbt test                       (unit + plan-guard + differential)
#   2. 1200-seed extended sweep       (GRAFT_SWEEP=1, ExtendedSweepSpec)
#   3. full oracle correctness sf0.01 (Verify + DuckDB compare)
#   4. full oracle correctness sf0.1  (the 10x gate)
#   5. bench sf0.1                    (BENCH_r{N}_sf01 candidate)
#   6. 9x scale bench + linearity     (needs testdata_sf1 — run
#      `sbt "runMain graft.tools.ScaleUp /root/testdata/sf0.1 \
#       /root/repo/testdata_sf1 9"` once per data regeneration)
# Usage: scripts/round_ritual.sh [fast]   ("fast" skips steps 4-6)
set -u
cd "$(dirname "$0")/.."
FAST="${1:-}"
status=0
step() { echo; echo "=== $1 ==="; }

step "1/6 sbt test"
sbt -batch test 2>&1 | grep -E "Tests:|All tests" | tail -2 || status=1

step "2/6 extended sweep (1200 seeds)"
GRAFT_SWEEP=1 sbt -batch "testOnly graft.ExtendedSweepSpec" 2>&1 |
  grep -E "seeds|Tests:" | tail -3 || status=1

step "3/6 oracle correctness sf0.01"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/ritual_v001" \
  >/dev/null 2>&1
python3 scripts/oracle_check.py /root/testdata/sf0.01 /tmp/ritual_v001 |
  tail -1 || status=1

if [ "$FAST" != "fast" ]; then
  step "4/6 oracle correctness sf0.1"
  SPARK_GRAFT_CPUS=16 sbt -batch \
    "runMain graft.Verify /root/testdata/sf0.1 /tmp/ritual_v01" \
    >/dev/null 2>&1
  python3 scripts/oracle_check.py /root/testdata/sf0.1 /tmp/ritual_v01 |
    tail -1 || status=1

  step "5/6 bench sf0.1"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
    2>/dev/null | grep '"metric"' > /tmp/ritual_bench_sf01.json
  python3 -c "import json; d=json.load(open('/tmp/ritual_bench_sf01.json')); \
print('total', d['value'], 'failed', d['failed'])" || status=1

  step "6/6 9x bench + linearity"
  if [ -d /root/repo/testdata_sf1 ]; then
    SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf1 sbt -batch \
      "runMain graft.Bench" 2>/dev/null | grep '"metric"' \
      > /tmp/ritual_bench_sf1.json
    python3 scripts/linearity.py /tmp/ritual_bench_sf01.json \
      /tmp/ritual_bench_sf1.json 9 | tail -2 || status=1
  else
    echo "testdata_sf1 missing — run graft.tools.ScaleUp first"
  fi
fi

echo; echo "ritual exit: $status"
exit $status
