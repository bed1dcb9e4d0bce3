#!/usr/bin/env python3
"""Oracle-at-scale sweep (r9 verdict #7, now scripted so the
discipline survives round turnover).

Selects every query whose latest bench time exceeds a threshold
(default 1.0 s, from bench_out.json's per-query map) plus any names
passed on the command line (the new-this-round set), re-runs
graft.Verify for exactly those queries at sf0.1, and hash-compares
each against its DuckDB oracle with the committed comparator
(scripts/compare.py — type-strict, never a lax copy).

Queries without an oracle entry (the two permanent rows-only
adjudications) are skipped with a notice, not silently dropped.

Usage:
  python3 scripts/oracle_at_scale.py [--bench bench_out.json]
      [--threshold 1.0] [--sf /root/testdata/sf0.1] [name ...]

Prints a BENCH_NOTES-ready table and exits nonzero on any mismatch.
"""
import argparse
import json
import os
import subprocess
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", default="bench_out.json")
    ap.add_argument("--threshold", type=float, default=1.0)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/vout_scale")
    ap.add_argument("names", nargs="*")
    a = ap.parse_args()

    heavy = []
    if os.path.exists(a.bench):
        b = json.load(open(a.bench))
        heavy = sorted(q for q, t in b.get("queries", {}).items()
                       if t is not None and t > a.threshold)
    else:
        print(f"[scale] WARNING no {a.bench}; heavy set empty")

    todo = sorted(set(heavy) | set(a.names))
    if not todo:
        print("[scale] nothing selected"); return 0

    # drop names with no oracle (rows-only adjudications, the
    # flagship) — compare.py would count them as failures
    oracle_probe = subprocess.run(
        ["sbt", "-batch",
         "runMain graft.Verify %s %s %s" % (a.sf, a.out, " ".join(todo))],
        capture_output=True, text=True)
    tail = (oracle_probe.stdout + oracle_probe.stderr)[-2000:]
    if oracle_probe.returncode != 0:
        print(f"[scale] Verify FAILED rc={oracle_probe.returncode}\n{tail}")
        return 2
    print(f"[scale] Verify OK for {len(todo)} queries at {a.sf}")

    oracles = json.load(open(f"{a.out}/oracle_sql.json"))
    with_oracle = [q for q in todo if q in oracles]
    for q in todo:
        if q not in oracles:
            print(f"[scale] SKIP {q}: no oracle entry (rows-only "
                  f"adjudication or flagship)")

    cmp_run = subprocess.run(
        [sys.executable, "scripts/compare.py", a.sf, a.out] + with_oracle,
        capture_output=True, text=True)
    print(cmp_run.stdout, end="")
    if cmp_run.stderr:
        print(cmp_run.stderr[-1500:], file=sys.stderr)
    n_ok = cmp_run.stdout.count(": OK")
    print(f"[scale] {n_ok}/{len(with_oracle)} hash-exact at {a.sf} "
          f"(heavy>{a.threshold}s: {len(heavy)}, named: {len(a.names)})")
    return cmp_run.returncode


if __name__ == "__main__":
    sys.exit(main())
