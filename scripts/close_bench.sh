#!/bin/bash
# Round-close bench protocol (r9 verdict #1: a single-shot closing
# number did not reproduce — driver and judge both read ~1.6x the
# builder's close with a UNIFORM per-query multiplier, i.e. box-wide
# drift, not plans). So the close now:
#   1. runs a fixed 6-query CANARY at open, between full runs, and at
#      close (the ladder separates box drift from plan regressions:
#      drift moves every rung by the same factor);
#   2. runs the FULL surface N times (default 3);
#   3. keeps the best-total full map as bench_out.json (committed),
#      leaving every run's map as bench_out_run<i>.json;
#   4. records uptime load next to every number (quiet-box rule);
#   5. emits a DRIFT COEFFICIENT (close-canary total / open-canary
#      total) and a drift-normalized best total, so cross-round
#      comparisons stop eating the 1.1-1.2x window noise (r10
#      verdict #6);
#   6. runs the LEAK SCAN as the FINAL step, so the committed
#      LEAKCHECK sidecar's scanned_commit is the tree the round
#      actually ships (r10 verdict #4) — commit the artifacts of this
#      script and the sidecar together, LAST.
# A failed full run is FATAL (r10 advice: an empty $T used to be
# swallowed as "not best" while the stale bench_out.json was still
# copied to bench_out_run<i>.json — a failed run could end up
# committed as the close).
# Output is BENCH_NOTES-ready. Usage: scripts/close_bench.sh [N]
set -u
N="${1:-3}"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
CANARY="q1_lineitem_agg q_profile_lineitem q_funnel q_cosine_topk q_bm25 att_fit_cold_bstrap"

# r11 verdict #1: the driver's window read 2.4x the close with 21x
# spikes on trivial queries AND 3 DuckDB OOMs — all environmental, and
# it cost a full judge session to adjudicate because nothing recorded
# machine state next to the numbers. The close now emits a MACHINE
# SIDECAR (bench_machine.json, committed with the artifacts): load avg
# + MemAvailable at every phase, so any future spread can be read off
# the sidecar instead of re-litigated by hand.
MACHINE_LOG=bench_machine.json
echo '{"phases":[' > "$MACHINE_LOG.tmp"
MACHINE_FIRST=1
machine() {
  local tag="$1"
  [ "$MACHINE_FIRST" -eq 0 ] && echo ',' >> "$MACHINE_LOG.tmp"
  MACHINE_FIRST=0
  printf '{"phase":"%s","ts":"%s","loadavg":"%s","mem_available_kb":%s}' \
    "$tag" "$(date -u +%FT%TZ)" "$(cut -d' ' -f1-3 /proc/loadavg)" \
    "$(awk '/MemAvailable/{print $2}' /proc/meminfo)" >> "$MACHINE_LOG.tmp"
}

canary() {
  local tag="$1"
  echo "== canary[$tag] load=$(cut -d' ' -f1-3 /proc/loadavg)"
  SPARK_GRAFT_SF_DIR="$SF" sbt -batch \
    "runMain graft.Bench $CANARY" >/dev/null 2>&1
  # arg-restricted runs write the PARTIAL file (they must never
  # clobber the committed full-surface map)
  if ! python3 -c "import json;json.load(open('bench_out_partial.json'))" \
      2>/dev/null; then
    echo "FATAL: canary[$tag] left no parseable bench_out_partial.json" >&2
    exit 3
  fi
  echo "canary[$tag]: $(cat bench_out_partial.json)"
  cp bench_out_partial.json "bench_canary_${tag}.json"
}

machine open
canary open
BEST=""
BEST_T=""
for i in $(seq 1 "$N"); do
  machine "run$i"
  echo "== full run $i/$N load=$(cut -d' ' -f1-3 /proc/loadavg)"
  SPARK_GRAFT_SF_DIR="$SF" sbt -batch "runMain graft.Bench" \
    2>&1 | grep -E '"metric"' | tail -1
  SBT_RC=${PIPESTATUS[0]}
  # fail LOUDLY on a broken run: sbt must exit 0 AND bench_out.json
  # must carry a fresh numeric total — never let a stale map masquerade
  # as run i's result
  T=$(python3 -c "
import json, sys
d = json.load(open('bench_out.json'))
v = d['value']
assert isinstance(v, (int, float)) and v == v and v > 0, v
print(v)" 2>/dev/null)
  if [ "$SBT_RC" -ne 0 ] || [ -z "$T" ]; then
    echo "FATAL: full run $i failed (sbt rc=$SBT_RC, total='${T:-}')" \
      " — refusing to copy a stale/broken map as bench_out_run${i}.json" >&2
    exit 2
  fi
  cp bench_out.json "bench_out_run${i}.json"
  echo "full run $i total=${T}s"
  if [ -z "$BEST_T" ] || \
      python3 -c "import sys;sys.exit(0 if $T < $BEST_T else 1)"; then
    BEST_T="$T"; BEST="bench_out_run${i}.json"
  fi
  [ "$i" -lt "$N" ] && canary "mid$i"
done
canary close
machine close
cp "$BEST" bench_out.json
echo "== close: best full run = $BEST total=${BEST_T}s (of $N runs)"
# r11 verdict #1: ISOLATED re-measure of the 10 most expensive entries
# from the best full map, run arg-mode one batch on a (presumed) quiet
# box right at close. If a future driver window spikes these same
# entries, bench_top10_isolated.json is the committed counterfactual:
# same binary + data, quiet box, per-query seconds.
TOP10=$(python3 -c "
import json
d = json.load(open('bench_out.json'))
qs = sorted(d['queries'].items(), key=lambda kv: -kv[1])[:10]
print(' '.join(k for k, _ in qs))")
echo "== isolated top-10 re-measure: $TOP10"
SPARK_GRAFT_SF_DIR="$SF" sbt -batch "runMain graft.Bench $TOP10" \
  >/dev/null 2>&1
if python3 -c "import json;json.load(open('bench_out_partial.json'))" \
    2>/dev/null; then
  cp bench_out_partial.json bench_top10_isolated.json
  echo "top10 isolated: $(cat bench_top10_isolated.json)"
else
  echo "WARN: top-10 isolated re-measure failed (non-fatal)" >&2
fi
# r14 (VERDICT r13 #4): sf1 SCALE canary — a pinned 25-entry subset on
# the 10x scale-up against committed per-entry bounds, two-stage
# (isolated re-measure absorbs the box's documented contention
# spikes). A confirmed breach blocks the close like a red oracle:
# scale regressions between rounds were previously invisible because
# everything at sf0.1 sits near the job-overhead floor.
machine sf1canary
bash scripts/sf1_canary.sh || {
  echo "FATAL: sf1 scale canary breached — do NOT commit the close" >&2
  exit 6; }
machine final
echo ']}' >> "$MACHINE_LOG.tmp"
mv "$MACHINE_LOG.tmp" "$MACHINE_LOG"
echo "== machine sidecar: $(cat $MACHINE_LOG)"
# drift coefficient: the canary ladder's close/open ratio is the
# box-wide multiplier the window imposed on identical plans; the
# normalized total divides it out so r(N) vs r(N+1) totals compare
# plans, not windows
python3 - "$BEST_T" <<'EOF'
import json, sys
best = float(sys.argv[1])
def tot(tag):
    d = json.load(open(f'bench_canary_{tag}.json'))
    qs = d['queries']
    # Bench writes -1.0 sentinels for failed queries: a failed canary
    # must abort the close, not silently corrupt the drift coefficient
    bad = {k: v for k, v in qs.items() if v < 0}
    assert not bad, f"canary[{tag}] had FAILED queries: {bad}"
    return sum(qs.values())
o, c = tot('open'), tot('close')
assert o > 0 and c > 0, f"degenerate canary totals open={o} close={c}"
drift = c / o
print(f"== drift: canary open={o:.1f}s close={c:.1f}s "
      f"coefficient={drift:.3f}")
print(f"== normalized best total = {best / drift:.1f}s "
      f"(raw {best:.1f}s / drift {drift:.3f}) — put BOTH in BENCH_NOTES")
EOF
# leak scan LAST, over the exact tree being shipped: scanned_commit in
# the sidecar must equal the close commit's parent tree — commit the
# bench artifacts + LEAKCHECK*.json together, with NO source commits
# after this point
python3 scripts/leakcheck.py || {
  echo "FATAL: leak scan failed — do NOT commit the close" >&2; exit 4; }
python3 - <<'EOF'
import json
d = json.load(open('LEAKCHECK.json'))
# hit lists live UNDER d['hits'] (top level is round/commit/counts) —
# check both the per-category lists and the n_hits counter so a
# format drift in either direction cannot sneak a hit past the gate
bad = {k: v for k, v in d.get('hits', {}).items()
       if isinstance(v, list) and v}
assert not bad and d.get('n_hits', 1) == 0, \
    f"leak scan HITS (n_hits={d.get('n_hits')}): {bad}"
print("== leak scan clean at close — commit bench artifacts + sidecar now")
EOF
