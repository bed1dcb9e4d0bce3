#!/bin/bash
# Round-close correctness protocol (r11 verdict #1: the driver's
# window OOM'd DuckDB on 3 queries whose oracles need ~1.2 GB peak —
# purely environmental, but adjudicating that cost a judge session).
# This script reproduces the driver's correctness gate locally on a
# (presumed) quiet box and leaves a COMMITTED transcript + machine
# sidecar, so a driver-red row at review time can be compared against
# a same-binary quiet-box run without re-litigation:
#   1. full graft.Verify dump at sf0.01;
#   2. scripts/compare.py over every oracle entry;
#   3. any FAIL is re-run isolated (one query, fresh DuckDB) and the
#      per-query transcript appended — separating plan bugs (fail
#      twice) from contention (fail in the batch, pass isolated);
#   4. machine state (loadavg + MemAvailable) recorded at each phase.
# Output: correctness_close.txt + correctness_machine.json (commit
# both with the round's close).
# Usage: scripts/close_correctness.sh [sfDir] [outDir]
set -u
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/verify_close}"
LOG=correctness_close.txt
MACHINE=correctness_machine.json

machine() {
  printf '{"phase":"%s","ts":"%s","loadavg":"%s","mem_available_kb":%s}' \
    "$1" "$(date -u +%FT%TZ)" "$(cut -d' ' -f1-3 /proc/loadavg)" \
    "$(awk '/MemAvailable/{print $2}' /proc/meminfo)"
}

{
  echo "# close correctness: commit $(git rev-parse --short HEAD) sf=$SF"
  echo "machine[open]: $(machine open)"
} > "$LOG"
echo "{\"phases\":[$(machine open)" > "$MACHINE.tmp"

SPARK_GRAFT_SF_DIR="$SF" sbt -batch \
  "runMain graft.Verify $SF $OUT" 2>&1 | grep -E '\[verify\]' >> "$LOG"
echo ",$(machine post_verify)" >> "$MACHINE.tmp"

python3 scripts/compare.py "$SF" "$OUT" > /tmp/compare_close.txt 2>&1
RC=$?
cat /tmp/compare_close.txt >> "$LOG"
echo ",$(machine post_compare)" >> "$MACHINE.tmp"
echo "compare exit=$RC" >> "$LOG"

# isolated re-run of any FAIL: a row that fails in the batch but
# passes isolated is contention, not code — the r11 OOM-trio signature
FAILS=$(grep -E ': FAIL' /tmp/compare_close.txt | cut -d: -f1 | sort -u)
if [ -n "$FAILS" ]; then
  echo "== isolated re-runs of batch FAILs: $FAILS" >> "$LOG"
  for q in $FAILS; do
    echo "machine[pre_$q]: $(machine "pre_$q")" >> "$LOG"
    python3 scripts/compare.py "$SF" "$OUT" "$q" >> "$LOG" 2>&1
    echo "isolated $q exit=$?" >> "$LOG"
  done
fi
echo ",$(machine close)]}" >> "$MACHINE.tmp"
mv "$MACHINE.tmp" "$MACHINE"
echo "machine[close]: $(machine close)" >> "$LOG"
tail -5 "$LOG"
echo "== transcript: $LOG ; sidecar: $MACHINE — commit both"
exit $RC
