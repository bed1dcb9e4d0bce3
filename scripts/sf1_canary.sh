#!/bin/bash
# sf1 SCALE canary (VERDICT r13 #4): decade rehearsals are per-family
# and the r13 full 10x one-shot was a one-off — a scale regression
# between rounds (an operator silently going quadratic, a broadcast
# turning into a shuffle) was invisible at sf0.1 where everything sits
# near the job-overhead floor. This runs a pinned 25-entry subset (the
# sf1 top-cost tier + one per family + the auto scale paths) on the
# 10x scale-up against committed per-entry bounds
# (scripts/sf1_canary_bounds.json, ~4x the quiet measured values).
#
# TWO-STAGE gate, because the box has documented 5-20x external
# contention spikes (BENCH_NOTES r11): a stage-1 breach is re-measured
# IN ISOLATION; only an isolated breach blocks the close. (The r14
# shake-out run demonstrated exactly this: q_ann_graph_mp_topk read
# 78 s under load-10 as the cold first query of the set, and 9.8 s
# isolated minutes later.)
#
# Usage: scripts/sf1_canary.sh   (env: SF1_DIR, SF1_SRC)
# Exit 0 = pass; writes bench_sf1_canary.json (commit with the close).
set -u
cd "$(dirname "$0")/.."
SF1_DIR="${SF1_DIR:-target/sf1}"
SF1_SRC="${SF1_SRC:-/root/testdata/sf0.1}"
BOUNDS=scripts/sf1_canary_bounds.json

if [ ! -d "$SF1_DIR/embeddings.parquet" ]; then
  echo "== sf1 canary: $SF1_DIR missing — rebuilding via ScaleUp"
  sbt -batch "runMain graft.ScaleUp $SF1_SRC $SF1_DIR 10" \
    >/dev/null 2>&1 || {
    echo "FATAL: ScaleUp rebuild of $SF1_DIR failed" >&2; exit 5; }
fi

QUERIES=$(python3 -c "
import json
b = json.load(open('$BOUNDS'))
print(' '.join(k for k in sorted(b) if not k.startswith('_')))")

run_set() {
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR="$SF1_DIR" \
    SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    sbt -batch "runMain graft.Bench $*" >/dev/null 2>&1
  python3 -c "import json;json.load(open('bench_out_partial.json'))" \
    2>/dev/null || {
    echo "FATAL: sf1 canary left no parseable bench_out_partial.json" >&2
    exit 5; }
}

check() {
  # prints space-separated breaching names; -1.0 (failed query) always
  # breaches — a crash at 10x is a scale regression by definition
  python3 - "$1" <<'EOF'
import json, sys
bounds = {k: v for k, v in
          json.load(open('scripts/sf1_canary_bounds.json')).items()
          if not k.startswith('_')}
d = json.load(open('bench_out_partial.json'))
qs = d['queries']
breach = []
for name in sys.argv[1].split():
    t = qs.get(name)
    if t is None or t < 0 or t > bounds[name]:
        breach.append(name)
        print(f"  BREACH {name}: {t}s > bound {bounds[name]}s"
              if t is not None and t >= 0 else
              f"  BREACH {name}: FAILED ({d['errors'].get(name)})",
              file=sys.stderr)
print(' '.join(breach))
EOF
}

echo "== sf1 canary stage 1: $(echo $QUERIES | wc -w) entries" \
  "load=$(cut -d' ' -f1-3 /proc/loadavg)"
run_set $QUERIES
cp bench_out_partial.json bench_sf1_canary.json
BREACH=$(check "$QUERIES" | tail -1)
if [ -z "$BREACH" ]; then
  echo "== sf1 canary PASS (stage 1): all entries within bounds"
  exit 0
fi

echo "== sf1 canary stage 2: isolated re-measure of [$BREACH]" \
  "load=$(cut -d' ' -f1-3 /proc/loadavg)"
run_set $BREACH
BREACH2=$(check "$BREACH" | tail -1)
if [ -n "$BREACH2" ]; then
  echo "FATAL: sf1 canary BREACH confirmed in isolation: $BREACH2" >&2
  echo "  (bounds: $BOUNDS; isolated map: bench_out_partial.json)" >&2
  exit 6
fi
# merge the isolated (trustworthy) timings over the stage-1 spikes so
# the committed canary artifact records the defensible numbers
python3 - "$BREACH" <<'EOF'
import json, sys
full = json.load(open('bench_sf1_canary.json'))
iso = json.load(open('bench_out_partial.json'))
for name in sys.argv[1].split():
    full['queries'][name] = iso['queries'][name]
full['value'] = round(sum(v for v in full['queries'].values() if v >= 0), 3)
full['stage2_isolated'] = sys.argv[1].split()
json.dump(full, open('bench_sf1_canary.json', 'w'))
EOF
echo "== sf1 canary PASS (stage 2): [$BREACH] within bounds isolated"
