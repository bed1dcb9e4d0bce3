#!/usr/bin/env python3
"""Generate the randomized Jaro-Winkler cross-engine parity fixture.

Emits src/test/resources/jaro_parity.csv: 20,000 seeded random string
pairs scored by DuckDB's native jaro_winkler_similarity (the oracle
engine). JaroParitySpec replays every pair through
graft.functions.JaroWinklerExpr.jaroWinkler and asserts agreement,
pinning the convention edges a handful of textbook pins cannot:
odd transposition counts (integer t/2), the 0.7 boost-threshold
boundary, match-window floors, non-ASCII code points, empties.

Run from the repo root:  python3 tools/gen_jaro_parity_fixture.py
Deterministic (seed 20260814); regeneration is byte-stable for a given
DuckDB version (generated with 1.0.0).
"""
import csv
import random

import duckdb

SEED = 20260814
N_RANDOM = 20000
OUT = "src/test/resources/jaro_parity.csv"

rng = random.Random(SEED)

# Small alphabets force shared characters, transpositions, and
# boost-threshold-boundary scores; the unicode pool probes the
# code-point (not byte / not UTF-16-unit) convention, including an
# astral-plane char.
ALPHABETS = [
    "ab",                      # dense collisions, many transpositions
    "abc",
    "abcde",
    "abcdefghij",
    "abcdefghijklmnopqrstuvwxyz",
    "aàâäéèêëîïôöùûüçñ",       # accented latin
    "abc日本語漢字",            # mixed ASCII + CJK
    "αβγδε",                   # greek
    "a\U0001F600b\U0001F601",  # astral plane (emoji)
]


def rand_str(alpha: str, max_len: int) -> str:
    n = rng.randint(0, max_len)
    return "".join(rng.choice(alpha) for _ in range(n))


def mutate(s: str, alpha: str) -> str:
    """Near-duplicate of s: swaps, edits, prefix kept — the regime
    where Winkler boost and transposition counting actually bite."""
    cs = list(s)
    for _ in range(rng.randint(0, 3)):
        if len(cs) >= 2 and rng.random() < 0.5:
            i = rng.randrange(len(cs) - 1)
            cs[i], cs[i + 1] = cs[i + 1], cs[i]  # adjacent swap
        elif cs and rng.random() < 0.5:
            cs[rng.randrange(len(cs))] = rng.choice(alpha)
        else:
            cs.insert(rng.randrange(len(cs) + 1), rng.choice(alpha))
    return "".join(cs)


pairs = []
# hand-picked convention edges first
pairs += [
    ("", ""), ("", "a"), ("a", ""), ("a", "a"), ("a", "b"),
    ("ab", "ba"), ("abc", "acb"), ("abcd", "badc"),   # odd/even t
    ("martha", "marhta"), ("dixon", "dicksonx"), ("jellyfish", "smellyfish"),
    ("dwayne", "duane"), ("al", "al"), ("aabbcc", "ccbbaa"),
    ("abcdef", "fedcba"),                              # window floors
    ("\U0001F600", "\U0001F600"), ("\U0001F600a", "a\U0001F600"),
]
for _ in range(N_RANDOM):
    alpha = rng.choice(ALPHABETS)
    a = rand_str(alpha, 12)
    b = mutate(a, alpha) if rng.random() < 0.5 else rand_str(alpha, 12)
    pairs.append((a, b))

con = duckdb.connect()
con.execute("CREATE TABLE p(a VARCHAR, b VARCHAR)")
con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
rows = con.execute(
    "SELECT a, b, jaro_winkler_similarity(a, b) FROM p").fetchall()
assert len(rows) == len(pairs)

with open(OUT, "w", newline="", encoding="utf-8") as f:
    w = csv.writer(f)
    w.writerow(["a", "b", "duckdb_jw"])
    for a, b, s in rows:
        w.writerow([a, b, repr(float(s))])
print(f"wrote {len(rows)} pairs -> {OUT}")
