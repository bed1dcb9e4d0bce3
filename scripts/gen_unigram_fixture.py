#!/usr/bin/env python3
"""Independent fixture generator for q_unigram_train / q_unigram_count
(driver-side tooling, the gen_bpe_train_fixture.py pattern): trains a
SentencePiece-style unigram-LM tokenizer over each testdata documents
table with a from-scratch Python implementation, and writes
  src/test/resources/unigram_vocab.csv   (corpus_fp, rank, piece, cnt)
  src/test/resources/unigram_counts.csv  (fp, n_uni)   [committed vocab]
  src/main/resources/graft/unigram_vocab.txt  [sf0.001-trained vocab the
      ENGINE encoder ships, piece<TAB>cnt in rank order]

Contract mirrored by graft.operators.UnigramTrain (kept deliberately
independent in code) — hard-EM (Viterbi) unigram training with EXACT
INTEGER arithmetic so no float ever enters a comparison (cross-language
bit-equality by construction):

  - words: re.split(r'\\s+', text.lower()), empties dropped, each word
    prefixed with the SentencePiece marker '▁';
  - seed: all substrings (len 2..maxPieceLen) of words no longer than
    32 chars, weighted by word freq x occurrences, kept if total count
    >= minCount, capped to seedSize by (count desc, piece asc); PLUS
    every single char of every word with its weighted count;
  - Viterbi segmentation maximizes prod(cnt(piece)) / T^k (T = sum of
    vocab counts) — compared EXACTLY via cross-multiplied big integers;
    ties -> fewer pieces, then lexicographically smallest piece list
    (codepoint order; pieces are BMP so JVM UTF-16 order agrees);
  - a single char absent from the vocab segments with an implicit
    count of 1 (coverage floor — never skipped, never a float);
  - E-step: piece counts = sum over distinct words of freq x uses in
    that word's Viterbi segmentation; M-step: those counts ARE the new
    vocab (unused pieces drop); nIters rounds;
  - final vocab: every surviving single-char piece + the top
    (vocabSize - #chars) multi-char pieces by (count desc, piece asc);
    rank assigned in that same order.

Corpus fingerprint: md5(concat of md5(text) ordered by doc_id) over
non-null texts — replayable in DuckDB (the q_bpe_train key).
"""
import csv
import hashlib
import os
import re
from collections import Counter

import duckdb

VOCAB_SIZE = 300
SEED_SIZE = 1000
N_ITERS = 3
MAX_PIECE_LEN = 6
MIN_COUNT = 2
MAX_SEED_WORD_LEN = 32
MARKER = "▁"


def words_of(text):
    return [MARKER + w for w in re.split(r"\s+", text.lower()) if w]


def word_freqs(texts):
    wf = Counter()
    for t in texts:
        for w in words_of(t):
            wf[w] += 1
    return wf


def seed_vocab(wf):
    sub = Counter()
    chars = Counter()
    for w, f in wf.items():
        for c in w:
            chars[c] += f
        if len(w) > MAX_SEED_WORD_LEN:
            continue
        for i in range(len(w)):
            for j in range(i + 2, min(i + MAX_PIECE_LEN, len(w)) + 1):
                sub[w[i:j]] += f
    multi = sorted(((s, c) for s, c in sub.items() if c >= MIN_COUNT),
                   key=lambda kv: (-kv[1], kv[0]))[:SEED_SIZE]
    vocab = dict(chars)
    vocab.update(multi)
    return vocab, chars


def viterbi(w, vocab, t):
    n = len(w)
    pow_t = [1] * (n + 1)
    for i in range(1, n + 1):
        pow_t[i] = pow_t[i - 1] * t
    # state per position: (prod, k, pieces) or None
    best = [None] * (n + 1)
    best[0] = (1, 0, [])
    for i in range(1, n + 1):
        bi = None
        for j in range(max(0, i - MAX_PIECE_LEN), i):
            if best[j] is None:
                continue
            p = w[j:i]
            c = vocab.get(p)
            if c is None:
                if len(p) != 1:
                    continue
                c = 1  # implicit single-char coverage floor
            cand = (best[j][0] * c, best[j][1] + 1, best[j][2] + [p])
            if bi is None:
                bi = cand
                continue
            lhs = cand[0] * pow_t[bi[1]]
            rhs = bi[0] * pow_t[cand[1]]
            if lhs != rhs:
                if lhs > rhs:
                    bi = cand
            elif cand[1] != bi[1]:
                if cand[1] < bi[1]:
                    bi = cand
            elif cand[2] < bi[2]:
                bi = cand
        best[i] = bi
    return best[n][2]


def em_round(wf, vocab):
    t = sum(vocab.values())
    new = Counter()
    for w, f in wf.items():
        for p in viterbi(w, vocab, t):
            new[p] += f
    return dict(new)


def finalize(vocab):
    chars = sorted(((p, c) for p, c in vocab.items() if len(p) == 1),
                   key=lambda kv: (-kv[1], kv[0]))
    multi = sorted(((p, c) for p, c in vocab.items() if len(p) > 1),
                   key=lambda kv: (-kv[1], kv[0]))
    keep = chars + multi[:max(0, VOCAB_SIZE - len(chars))]
    keep.sort(key=lambda kv: (-kv[1], kv[0]))
    return keep  # [(piece, cnt)] in rank order


def train(texts):
    wf = word_freqs(texts)
    vocab, _ = seed_vocab(wf)
    for _ in range(N_ITERS):
        vocab = em_round(wf, vocab)
    return finalize(wf and vocab or {})


def encode_count(text, vocab, t):
    return sum(len(viterbi(w, vocab, t)) for w in words_of(text))


def main():
    con = duckdb.connect()
    here = os.path.dirname(__file__)
    vocab_rows = []
    committed = None  # sf0.001-trained vocab for the engine encoder
    count_rows = {}
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
        ranked = train(texts)
        print(f"sf{sf}: {len(texts)} docs fp={fp} vocab={len(ranked)} "
              f"top={ranked[:3]}")
        for rank, (p, c) in enumerate(ranked):
            vocab_rows.append((fp, rank, p, c))
        if sf == "0.001":
            committed = ranked
    # committed-vocab encode counts for every text across all SFs
    cv = dict(committed)
    ct = sum(cv.values())
    for sf in ("0.001", "0.01", "0.1"):
        path = f"/root/testdata/sf{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        for (t,) in con.sql(
                f"SELECT text FROM '{path}' WHERE text IS NOT NULL")\
                .fetchall():
            h = hashlib.md5(t.encode("utf-8")).hexdigest()
            if h not in count_rows:
                count_rows[h] = encode_count(t, cv, ct)

    out = os.path.join(here, "../src/test/resources/unigram_vocab.csv")
    with open(out, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["corpus_fp", "rank", "piece", "cnt"])
        w.writerows(vocab_rows)
    print(f"wrote {len(vocab_rows)} vocab rows")
    out = os.path.join(here, "../src/test/resources/unigram_counts.csv")
    with open(out, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["fp", "n_uni"])
        w.writerows(sorted(count_rows.items()))
    print(f"wrote {len(count_rows)} count rows")
    out = os.path.join(here, "../src/main/resources/graft/unigram_vocab.txt")
    with open(out, "w", encoding="utf-8") as f:
        for p, c in committed:
            f.write(f"{p}\t{c}\n")
    print(f"wrote committed vocab ({len(committed)} pieces)")


if __name__ == "__main__":
    main()
