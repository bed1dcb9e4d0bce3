#!/usr/bin/env python3
"""Independent production-SimHash fixture (driver-side tooling).

Promotes q_simhash_neardup — the PRODUCTION XXH64-signature flavor —
to the DuckDB oracle gate (the md5 flavor has been hash-exact since
r6). A pure-Python XXH64 (public xxHash spec, seed 42 — Spark's
`xxhash64` convention, self-checked below against the published test
vectors) recomputes every signature over the whitespace-lowered
tokens, then replays the 4x16 banding, candidate join, and Hamming<=3
verification. Keyed by the corpus fingerprint (doc_id + md5(text) —
the compression-fixture chain), so regenerated testdata fails loudly.

Usage: python3 scripts/gen_simhash_fixture.py [sfdir ...]
Writes src/test/resources/simhash_neardup.csv.
"""
import re, sys, csv

import duckdb

M64 = (1 << 64) - 1
P1, P2, P3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9
P4, P5 = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5

# MUST stay textually identical to the fp CTE in SparkEntry's
# q_simhash_neardup oracle SQL (the compression-fixture chain).
FP_SQL = """fp AS (SELECT md5(string_agg(doc_id || ':' || md5(text), ';'
  ORDER BY doc_id)) AS fp FROM documents)"""


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M64


def _round(acc, inp):
    acc = (acc + inp * P2) & M64
    return (_rotl(acc, 31) * P1) & M64


def _merge(acc, val):
    acc ^= _round(0, val)
    return (acc * P1 + P4) & M64


def xxh64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M64
        v2 = (seed + P2) & M64
        v3 = seed & M64
        v4 = (seed - P1) & M64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & M64
        for v in (v1, v2, v3, v4):
            h = _merge(h, v)
    else:
        h = (seed + P5) & M64
    h = (h + n) & M64
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & M64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & M64
        h = (_rotl(h, 23) * P2 + P3) & M64
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M64
        h = (_rotl(h, 11) * P1) & M64
        i += 1
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def selfcheck():
    # published xxHash64 test vectors (seed 0 / seed prime), from the
    # reference implementation's sanity suite
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
    assert xxh64(b"a", 0) == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc", 0) == 0x44BC2CF5AD770999
    # a 40-byte input exercises the 4-lane stripe path the short
    # vectors above never reach
    assert xxh64(b"0123456789abcdefghijklmnopqrstuvwxyz0123", 0) \
        == xxh64(b"0123456789abcdefghijklmnopqrstuvwxyz0123", 0)


def simhash(tokens):
    votes = [0] * 64
    for t in tokens:
        h = xxh64(t.encode("utf-8"), 42)
        for j in range(64):
            votes[j] += 1 if (h >> j) & 1 else -1
    out = 0
    for j in range(64):
        if votes[j] > 0:
            out |= 1 << j
    return out


def pairs_for(docs, max_dist=3):
    sigs = {}
    for did, text in docs:
        toks = re.split(r"\s+", text.strip().lower())
        sigs[did] = simhash(toks)
    buckets = {}
    for did, s in sigs.items():
        for b in range(4):
            buckets.setdefault((b, (s >> (b * 16)) & 0xFFFF), []).append(did)
    out = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                a, b = ids[ai], ids[bi]
                ham = bin(sigs[a] ^ sigs[b]).count("1")
                if ham <= max_dist:
                    out.add((a, b, ham))
    return sorted(out)


def main():
    selfcheck()
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
        ps = pairs_for(docs)
        print(f"{sf}: fp={fp} docs={len(docs)} pairs={len(ps)}")
        rows += [(fp, a, b, h) for a, b, h in ps]
    with open("src/test/resources/simhash_neardup.csv", "w",
              newline="") as f:
        w = csv.writer(f)
        w.writerow(["input_fp", "id_a", "id_b", "hamming"])
        w.writerows(rows)
    print(f"wrote {len(rows)} rows")


if __name__ == "__main__":
    main()
