#!/usr/bin/env python3
"""Independent content-defined-chunking fixture (driver-side tooling).

Promotes q_cdc_chunks to the DuckDB oracle gate: Python independently
rebuilds the gear table (first 8 bytes of md5("gear|<byte>"),
big-endian — no JVM-side constants) and replays the simplified-FastCDC
boundary rule over each document's UTF-8 bytes (h = (h<<1)+gear[b]
wrapping 64-bit; cut when len >= 32 and (h & 0x3F) == 0, hard cut at
512 — MUST stay identical to CdcChunksExpr). Emits per doc the chunk
count and the md5 of the comma-joined chunk-md5 list, keyed by the
same raw-corpus fingerprint as the other fixtures.

Usage: python3 scripts/gen_cdc_fixture.py [sfdir ...]
Writes src/test/resources/cdc_chunks.csv.
"""
import csv
import hashlib
import sys

import duckdb

FP_SQL = """fp AS (SELECT md5(string_agg(doc_id || ':' || md5(text), ';'
  ORDER BY doc_id)) AS fp FROM documents)"""

MIN_LEN = 32
MASK = 0x3F
MAX_LEN = 512
M64 = (1 << 64) - 1

GEAR = [int.from_bytes(
    hashlib.md5(f"gear|{b}".encode()).digest()[:8], "big")
    for b in range(256)]


def chunks(text):
    bs = text.encode("utf-8")
    out = []
    start = 0
    h = 0
    for i, b in enumerate(bs):
        h = ((h << 1) + GEAR[b]) & M64
        ln = i - start + 1
        if (ln >= MIN_LEN and (h & MASK) == 0) or ln == MAX_LEN \
                or i == len(bs) - 1:
            out.append(hashlib.md5(bs[start:i + 1]).hexdigest())
            start = i + 1
            h = 0
    return out


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
        tot = 0
        for did, text in docs:
            cs = chunks(text)
            tot += len(cs)
            rows.append((fp, did, len(cs),
                         hashlib.md5(",".join(cs).encode()).hexdigest()))
        print(f"{sf}: fp={fp} docs={len(docs)} chunks={tot}")
    with open("src/test/resources/cdc_chunks.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["input_fp", "doc_id", "n_chunks", "chunks_md5"])
        w.writerows(rows)
    print(f"wrote {len(rows)} rows")


if __name__ == "__main__":
    main()
