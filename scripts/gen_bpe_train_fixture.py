#!/usr/bin/env python3
"""Independent fixture generator for q_bpe_train (driver-side tooling,
like the bpe_counts.csv generator): trains byte-level BPE merges over
each testdata documents table with a from-scratch Python implementation
of the public GPT-2 algorithm, and writes
src/test/resources/bpe_train_merges.csv with a corpus fingerprint per
row so the DuckDB oracle can select the rows for whichever corpus the
driver verifies against.

Contract mirrored by graft.operators.BpeTrain (kept deliberately
independent in code):
  - GPT-2 regex pre-tokenizer (regex module: \\p{L}/\\p{N}/Unicode \\s);
  - byte -> symbol: 0x20 -> 'Ġ', printable ASCII -> itself,
    else chr(0x100 + byte);
  - best pair = max summed pre-token frequency, ties by (left, right)
    ascending (codepoint order == UTF-8 byte order);
  - merge application: non-overlapping left-to-right;
  - stop at nMerges or when the best count < minCount.
Corpus fingerprint: md5(concat of md5(text) ordered by doc_id) over
non-null texts — replayable in DuckDB as
  SELECT md5(string_agg(md5(text), '' ORDER BY doc_id)) FROM documents
  WHERE text IS NOT NULL.
"""
import csv
import hashlib
import os
from collections import Counter

import duckdb
import regex

N_MERGES = 48
MIN_COUNT = 2
PAT = regex.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
    r"|\s+(?!\S)|\s+")


def byte_char(b: int) -> str:
    if b == 0x20:
        return "Ġ"  # 'Ġ'
    if 0x20 < b < 0x7F:
        return chr(b)
    return chr(0x100 + b)


def train(texts):
    words = Counter()
    for t in texts:
        for w in PAT.findall(t):
            words[w] += 1
    vocab = {
        tuple(byte_char(b) for b in w.encode("utf-8")): f
        for w, f in words.items()
    }
    merges = []
    for _ in range(N_MERGES):
        pairs = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # max count; ties -> smallest (l, r) in codepoint order
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < MIN_COUNT:
            break
        merges.append(best)
        l, r = best
        new_vocab = {}
        for syms, f in vocab.items():
            out = []
            i = 0
            n = len(syms)
            while i < n:
                if i < n - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = f
        vocab = new_vocab
    return merges


def main():
    con = duckdb.connect()
    rows = []
    for sf in ("0.001", "0.01", "0.1"):
        path = f"/root/testdata/sf{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        docs = con.sql(
            f"SELECT text FROM '{path}' WHERE text IS NOT NULL "
            "ORDER BY doc_id").fetchall()
        texts = [t for (t,) in docs]
        fp = hashlib.md5("".join(
            hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts)
            .encode()).hexdigest()
        merges = train(texts)
        print(f"sf{sf}: {len(texts)} docs, fp={fp}, {len(merges)} merges, "
              f"first={merges[:3]}")
        for rank, (l, r) in enumerate(merges):
            rows.append((fp, rank, l, r))
    out = os.path.join(os.path.dirname(__file__),
                       "../src/test/resources/bpe_train_merges.csv")
    with open(out, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["corpus_fp", "rank", "lsym", "rsym"])
        w.writerows(rows)
    print(f"wrote {len(rows)} rows to {out}")


if __name__ == "__main__":
    main()
