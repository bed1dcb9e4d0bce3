#!/usr/bin/env python3
"""Independent deflate-ratio fixture (driver-side tooling).

Promotes q_compression_ratio from rows-only to the DuckDB oracle gate:
Python's zlib (raw deflate, level 6 — the same madler/zlib algorithm
java.util.zip.Deflater bundles) independently recomputes every doc's
compression ratio; a probe over the full sf0.001 corpus confirmed
byte-identical compressed lengths before this fixture existed. Keyed
by a SQL-replayable corpus fingerprint (md5 over doc_id + md5(text)),
so regenerated testdata fails loudly.

Usage: python3 scripts/gen_compression_fixture.py [sfdir ...]
Writes src/test/resources/compression_ratio.csv.
"""
import sys, csv, zlib
from decimal import Decimal, ROUND_HALF_UP

import duckdb

# MUST stay textually identical to the fp CTE in SparkEntry's
# q_compression_ratio oracle SQL.
FP_SQL = """fp AS (SELECT md5(string_agg(doc_id || ':' || md5(text), ';'
  ORDER BY doc_id)) AS fp FROM documents)"""


def rnd6(v):
    return float(Decimal(repr(float(v))).quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP))


def ratio(text):
    b = text.encode("utf-8")
    if not b:
        return None
    co = zlib.compressobj(6, zlib.DEFLATED, -15)  # raw deflate, level 6
    return rnd6(len(co.compress(b) + co.flush()) / len(b))


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
        for did, text in docs:
            r = ratio(text)
            rows.append((fp, did, "" if r is None else r))
        print(f"{sf}: fp={fp} docs={len(docs)}")
    with open("src/test/resources/compression_ratio.csv", "w",
              newline="") as f:
        w = csv.writer(f)
        w.writerow(["input_fp", "doc_id", "deflate_ratio"])
        w.writerows(rows)
    print(f"wrote {len(rows)} rows")


if __name__ == "__main__":
    main()
