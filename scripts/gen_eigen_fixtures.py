#!/usr/bin/env python3
"""Independent eigendecomposition fixtures (driver-side tooling).

Promotes the two remaining eigen-based rows-only queries to the DuckDB
oracle gate via the committed-independent-fixture pattern
(pretest_wald.csv / attgt_cov.csv precedent):

- q_embed_pca: covariance PCA of the 64-dim embeddings. DuckDB
  computes the Gram/sum moments exactly as the engine does (12dp Gram
  round); numpy's eigh — an implementation independent of the engine's
  Breeze eigSym — produces the top-8 components with the engine's
  deterministic sign convention (largest-|loading| pivot positive).
- q_word_vectors: PPMI factorization word vectors. DuckDB replays the
  tokenization + windowed ordered pair counts (the same SQL chain the
  hash-green q_token_pmi oracle pins, INTEGER counts so the input is
  bit-exact); numpy builds the symmetric PPMI matrix and eigh gives
  the top-8 sqrt-eigenvalue-scaled components.

Float safety: the 6dp output round sits ~4+ orders of magnitude above
the eigenvector perturbation bound (input noise / relative eigengap;
measured gaps >= 1e-3 of the top eigenvalue on all scales — printed by
this script so a regeneration that drifts into a degenerate spectrum
is caught at generation time, not as a silent oracle flake).

Each fixture row is keyed by an input fingerprint REPLAYABLE IN SQL
(md5 over the rounded moment tables / exact pair counts), so a
testdata regeneration makes the oracle join 0 rows — a loud failure.

Usage: python3 scripts/gen_eigen_fixtures.py [sfdir ...]
Writes src/test/resources/embed_pca.csv and word_vectors.csv.
"""
import sys, csv
from decimal import Decimal, ROUND_HALF_UP

import duckdb
import numpy as np


def rnd(v, s):
    return float(Decimal(repr(float(v))).quantize(
        Decimal(1).scaleb(-s), rounding=ROUND_HALF_UP))


# MUST stay textually identical to the fp CTEs in SparkEntry's
# q_embed_pca oracle SQL.
PCA_FP_SQL = """ss AS (
  SELECT i, ROUND(SUM(CAST(embedding[i + 1] AS DOUBLE)), 3) AS s
  FROM embeddings, range(64) r(i)
  WHERE embedding IS NOT NULL GROUP BY i),
gg AS (
  SELECT i, j, ROUND(SUM(CAST(embedding[i + 1] AS DOUBLE) *
                         CAST(embedding[j + 1] AS DOUBLE)), 3) AS g
  FROM embeddings, range(64) r1(i), range(64) r2(j)
  WHERE j >= i AND embedding IS NOT NULL GROUP BY i, j),
nn AS (SELECT COUNT(*) AS n FROM embeddings WHERE embedding IS NOT NULL),
fp AS (SELECT md5((SELECT n FROM nn) || '|' ||
  (SELECT string_agg(i || ':' || s, ';' ORDER BY i) FROM ss) || '|' ||
  (SELECT string_agg(i || ',' || j || ':' || g, ';' ORDER BY i, j)
   FROM gg)) AS fp)"""

# MUST stay textually identical to the wv/fp CTEs in SparkEntry's
# q_word_vectors oracle SQL (window=2, maxVocab=512, minCount=0).
WV_PAIRS_SQL = """d AS (
  SELECT string_split_regex(lower(trim(text)), '\\s+') AS t
  FROM documents),
dd AS (SELECT t FROM d WHERE len(t) > 0),
toks AS (SELECT unnest(t) AS w FROM dd),
vocab AS (
  SELECT w FROM (
    SELECT w, count(*) AS c FROM toks WHERE len(w) > 0 GROUP BY w)
  ORDER BY c DESC, w ASC LIMIT 512),
rawp AS (
  SELECT unnest(t[1:len(t)-1]) AS wa, unnest(t[2:len(t)]) AS wb
  FROM dd WHERE len(t) >= 2
  UNION ALL
  SELECT unnest(t[1:len(t)-2]) AS wa, unnest(t[3:len(t)]) AS wb
  FROM dd WHERE len(t) >= 3),
pc AS (
  SELECT wa, wb, count(*) AS c FROM rawp
  JOIN vocab va ON va.w = rawp.wa
  JOIN vocab vb ON vb.w = rawp.wb
  GROUP BY wa, wb),
fp AS (SELECT md5(string_agg(wa || ',' || wb || ':' || c, ';'
  ORDER BY wa, wb)) AS fp FROM pc)"""


def topk_eigh(m, k):
    evals, evecs = np.linalg.eigh(m)
    order = np.argsort(-evals)[:k]
    se = np.sort(evals)[::-1]
    gaps = (se[:k] - se[1:k + 1]) / max(abs(se[0]), 1e-300)
    return evals, evecs, order, gaps


def pivot_sign(raw):
    piv = max(range(len(raw)), key=lambda p: (abs(raw[p]), -p))
    return -1.0 if raw[piv] < 0 else 1.0


def gen_pca(con):
    fp = con.sql("WITH " + PCA_FP_SQL + " SELECT fp FROM fp").fetchone()[0]
    X = np.array([e[0] for e in con.sql(
        "SELECT embedding FROM embeddings WHERE embedding IS NOT NULL"
    ).fetchall()], dtype=np.float64)
    n = len(X)
    G12 = np.vectorize(lambda v: rnd(v, 12))(X.T @ X)
    s = X.sum(axis=0)
    cov = G12 / n - np.outer(s / n, s / n)
    evals, evecs, order, gaps = topk_eigh(cov, 8)
    assert gaps.min() > 1e-4, f"degenerate PCA spectrum: {gaps}"
    total = evals.sum()
    rows = []
    for comp, idx in enumerate(order):
        ev = evals[idx]
        v = evecs[:, idx] * pivot_sign(evecs[:, idx])
        for pos in range(len(v)):
            rows.append((fp, comp, rnd(ev, 6), rnd(ev / total, 6),
                         pos, rnd(v[pos], 6)))
    return fp, gaps, rows


def gen_wv(con):
    got = con.sql("WITH " + WV_PAIRS_SQL +
                  " SELECT pc.*, (SELECT fp FROM fp) FROM pc").fetchall()
    fp = got[0][3]
    cab, ca = {}, {}
    for a, b, c, _ in got:
        cab[(a, b)] = cab.get((a, b), 0) + c
        cab[(b, a)] = cab.get((b, a), 0) + c
    for (a, _), c in cab.items():
        ca[a] = ca.get(a, 0) + c
    vocab = sorted(ca.keys())
    vi = {w: i for i, w in enumerate(vocab)}
    n = len(vocab)
    total = float(sum(cab.values()))
    m = np.zeros((n, n))
    for (a, b), c in cab.items():
        m[vi[a], vi[b]] = max(0.0, np.log(c * total / (ca[a] * ca[b])))
    evals, evecs, order, gaps = topk_eigh(m, min(8, n))
    assert gaps.min() > 1e-4, f"degenerate PPMI spectrum: {gaps}"
    rows = []
    for comp, idx in enumerate(order):
        sc = np.sqrt(max(evals[idx], 0.0))
        v = evecs[:, idx] * pivot_sign(evecs[:, idx])
        for w in range(n):
            rows.append((fp, vocab[w], comp, rnd(v[w] * sc, 6)))
    return fp, gaps, rows


def main():
    sfdirs = sys.argv[1:] or [
        "/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1"]
    pca_rows, wv_rows = [], []
    for sf in sfdirs:
        con = duckdb.connect()
        con.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{sf}/embeddings.parquet'")
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
        fp1, g1, r1 = gen_pca(con)
        fp2, g2, r2 = gen_wv(con)
        print(f"{sf}: pca fp={fp1} rows={len(r1)} min_gap={g1.min():.5f}; "
              f"wv fp={fp2} rows={len(r2)} min_gap={g2.min():.5f}")
        pca_rows += r1
        wv_rows += r2
    with open("src/test/resources/embed_pca.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["input_fp", "component", "eigenvalue", "evr", "pos",
                    "loading"])
        w.writerows(pca_rows)
    with open("src/test/resources/word_vectors.csv", "w", newline="",
              encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["input_fp", "tok", "comp", "value"])
        w.writerows(wv_rows)
    print(f"wrote {len(pca_rows)} pca rows, {len(wv_rows)} wv rows")


if __name__ == "__main__":
    main()
