#!/usr/bin/env python3
"""Independent fixture for q_rouge_l (the gen_bpe_train_fixture.py
pattern): token-level LCS between each document's text and its
REVERSED token sequence (the synthesized reference that makes LCS a
real DP answer rather than a trivial subsequence), computed by a
from-scratch Python DP. Keyed by md5(text) so the DuckDB oracle joins
it for any SF dir; rows are deduped across SFs.
Token contract: lower + whitespace split, empties dropped (the
engine's cleanTokens convention, mirrored by graft.functions.Lcs).
"""
import csv
import hashlib
import os
import re

import duckdb


def toks(t):
    return [w for w in re.split(r"\s+", t.lower()) if w]


def lcs(x, y):
    if not x or not y:
        return 0
    prev = [0] * (len(y) + 1)
    for xi in x:
        cur = [0] * (len(y) + 1)
        for j, yj in enumerate(y):
            cur[j + 1] = prev[j] + 1 if xi == yj \
                else max(prev[j + 1], cur[j])
        prev = cur
    return prev[len(y)]


def main():
    con = duckdb.connect()
    rows = {}
    for sf in ("0.001", "0.01", "0.1"):
        path = f"/root/testdata/sf{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        for (t,) in con.sql(
                f"SELECT text FROM '{path}' WHERE text IS NOT NULL")\
                .fetchall():
            fp = hashlib.md5(t.encode("utf-8")).hexdigest()
            if fp not in rows:
                tk = toks(t)
                rows[fp] = lcs(tk, list(reversed(tk)))
    out = os.path.join(os.path.dirname(__file__),
                       "../src/test/resources/rouge_lcs.csv")
    with open(out, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["fp", "lcs"])
        w.writerows(sorted(rows.items()))
    print(f"wrote {len(rows)} rows to {out}")


if __name__ == "__main__":
    main()
