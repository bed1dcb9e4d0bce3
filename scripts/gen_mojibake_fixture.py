#!/usr/bin/env python3
"""Independent mojibake-repair fixture (driver-side tooling).

Promotes q_mojibake_repair to the DuckDB oracle gate: Python
independently replays the deterministic artifact synth (doc_id % 8 —
MUST stay codepoint-identical to SparkEntry.mojiDocs / mojiCte) and
the strict CP1252-encode / UTF-8-decode fixpoint repair (<= 3 passes,
a failing leg returns the input unchanged — the engine's
MojibakeRepairExpr contract). Known codec boundary: Python cp1252 and
the JDK windows-1252 differ only on the 5 undefined bytes
(0x81 0x8D 0x8F 0x90 0x9D), which the synth never produces.

Keyed by the same SQL-replayable RAW-corpus fingerprint as the
compression fixture, so regenerated testdata fails loudly.

Usage: python3 scripts/gen_mojibake_fixture.py [sfdir ...]
Writes src/test/resources/mojibake_repair.csv.
"""
import csv
import hashlib
import sys

import duckdb

# MUST stay textually identical to the fp CTE in SparkEntry's
# q_mojibake_repair oracle SQL.
FP_SQL = """fp AS (SELECT md5(string_agg(doc_id || ':' || md5(text), ';'
  ORDER BY doc_id)) AS fp FROM documents)"""

ARTIFACTS = {
    0: " caf" + chr(0xC3) + chr(0xA9),
    1: " na" + chr(0xC3) + chr(0xAF) + "ve",
    2: (" " + chr(0xE2) + chr(0x20AC) + chr(0x153) + "quote"
        + chr(0xE2) + chr(0x20AC) + chr(0x2122)),
    3: " 25" + chr(0xC2) + chr(0xB0) + " outside",
    4: (" " + chr(0xC3) + chr(0x192) + chr(0xC2) + chr(0xA9)
        + "clair"),
}

MAX_PASSES = 3


def one_pass(t):
    try:
        return t.encode("cp1252", errors="strict").decode(
            "utf-8", errors="strict")
    except (UnicodeEncodeError, UnicodeDecodeError):
        return t


def repair(t):
    cur = t
    for _ in range(MAX_PASSES):
        nxt = one_pass(cur)
        if nxt == cur:
            break
        cur = nxt
    return cur


def main():
    sfdirs = sys.argv[1:] or [
        "/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1"]
    rows = []
    for sf in sfdirs:
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
        fp = con.sql("WITH " + FP_SQL + " SELECT fp FROM fp").fetchone()[0]
        docs = con.sql("SELECT doc_id, text FROM documents").fetchall()
        n_changed = 0
        for did, text in docs:
            moji = text + ARTIFACTS.get(did % 8, "")
            rep = repair(moji)
            changed = rep != moji
            n_changed += changed
            rows.append((
                fp, did,
                hashlib.md5(rep.encode("utf-8")).hexdigest(),
                "true" if changed else "false"))
        print(f"{sf}: fp={fp} docs={len(docs)} changed={n_changed}")
    with open("src/test/resources/mojibake_repair.csv", "w",
              newline="") as f:
        w = csv.writer(f)
        w.writerow(["input_fp", "doc_id", "repaired_md5", "is_changed"])
        w.writerows(rows)
    print(f"wrote {len(rows)} rows")


if __name__ == "__main__":
    main()
