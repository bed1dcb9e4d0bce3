#!/usr/bin/env python3
"""Independent pre-trend Wald fixture generator (driver-side tooling).

Computes (w, pval, df) for the pre-treatment Wald test from the raw
parquet testdata with an implementation fully independent of the Scala
engine: DuckDB replays the influence-function chain (the same public
closed-form algebra the q_att_gt_vcov oracle pins), numpy inverts the
pre-cell covariance, and the chi-square upper tail comes from the
textbook finite-sum closed form for integer df (math.erfc /
math.gamma — no scipy, no commons-math3).

Each fixture row is keyed by an input fingerprint REPLAYABLE IN SQL
(md5 over the rounded, oracle-checked att + vcov tables), so a testdata
regeneration makes the oracle join 0 rows — a loud failure, never a
stale pass. The same pattern as the BPE trainer fixture
(bpe_train_merges.csv).

Usage: python3 scripts/gen_pretest_fixture.py [sfdir ...]
Writes src/test/resources/pretest_wald.csv (one row per sf dir).
"""
import sys, csv, math
import duckdb
import numpy as np

PANEL_SQL = """SELECT o_custkey AS id,
  CAST(year(o_orderdate) AS DOUBLE) AS t,
  CAST(CASE o_custkey % 4 WHEN 1 THEN 1997 WHEN 2 THEN 1999
       WHEN 3 THEN 2001 ELSE 0 END AS DOUBLE) AS g,
  ROUND(SUM(o_totalprice), 2) AS y
FROM orders GROUP BY 1, 2, 3"""

# Full-precision replay of the engine's per-unit influence chain — the
# same CTE text as SparkEntry.ifUnitCte (which the hash-green
# q_if_norms / q_att_gt_vcov oracles pin), minus any rounding.
IF_UNIT_CTE = """tl AS (SELECT t, row_number() OVER (ORDER BY t) AS idx
         FROM (SELECT DISTINCT t FROM panel)),
gs AS (SELECT DISTINCT g FROM panel WHERE g > 0),
cells AS (
  SELECT gs.g, tl.t AS tn,
    CASE WHEN gs.g <= tl.t
         THEN (SELECT max(t2.t) FROM tl t2 WHERE t2.t < gs.g)
         ELSE (SELECT t2.t FROM tl t2 WHERE t2.idx = tl.idx - 1) END AS tpre
  FROM gs CROSS JOIN tl WHERE tl.idx >= 2),
lf AS (
  SELECT c.g, c.tn, p.id, p.y,
    CASE WHEN p.g = c.g THEN 1 ELSE 0 END AS d,
    CASE WHEN p.t = c.tn THEN 1 ELSE 0 END AS pst
  FROM cells c JOIN panel p
    ON (p.t = c.tn OR p.t = c.tpre) AND (p.g = c.g OR p.g = 0)),
k AS (
  SELECT g, tn, COUNT(*) AS ncell,
    SUM(CASE WHEN d=1 AND pst=1 THEN 1 ELSE 0 END) AS w11,
    AVG(CASE WHEN d=1 AND pst=1 THEN y END) AS mu11,
    SUM(CASE WHEN d=1 AND pst=0 THEN 1 ELSE 0 END) AS w10,
    AVG(CASE WHEN d=1 AND pst=0 THEN y END) AS mu10,
    SUM(CASE WHEN d=0 AND pst=1 THEN 1 ELSE 0 END) AS w01,
    AVG(CASE WHEN d=0 AND pst=1 THEN y END) AS mu01,
    SUM(CASE WHEN d=0 AND pst=0 THEN 1 ELSE 0 END) AS w00,
    AVG(CASE WHEN d=0 AND pst=0 THEN y END) AS mu00
  FROM lf GROUP BY g, tn),
r AS (
  SELECT lf.g, lf.tn, lf.id,
    CASE WHEN d=1 AND pst=1 THEN  (k.ncell * 1.0 / k.w11) * (lf.y - k.mu11)
         WHEN d=1 AND pst=0 THEN -(k.ncell * 1.0 / k.w10) * (lf.y - k.mu10)
         WHEN d=0 AND pst=1 THEN -(k.ncell * 1.0 / k.w01) * (lf.y - k.mu01)
         ELSE (k.ncell * 1.0 / k.w00) * (lf.y - k.mu00) END AS infr
  FROM lf JOIN k ON lf.g = k.g AND lf.tn = k.tn
  WHERE k.w11 > 0 AND k.w10 > 0 AND k.w01 > 0 AND k.w00 > 0),
u AS (SELECT g, tn, id, SUM(infr) AS inf FROM r GROUP BY 1, 2, 3),
nn AS (SELECT COUNT(DISTINCT id) AS n FROM panel)"""

# Replayable fingerprint over the ROUNDED (hash-green, cross-engine
# deterministic) att + vcov tables. MUST stay textually identical to
# the fp CTE in SparkEntry's q_pretest_wald oracle SQL.
FP_SQL = """att_r AS (
  SELECT g, tn, ROUND((mu11 - mu10) - (mu01 - mu00), 4) AS att FROM k
  WHERE w11 > 0 AND w10 > 0 AND w01 > 0 AND w00 > 0),
vv_r AS (
  SELECT a.g AS g1, a.tn AS t1, b.g AS g2, b.tn AS t2,
    ROUND(SUM(a.inf * b.inf) / (nn.n * nn.n), 2) AS cov
  FROM u a JOIN u b ON a.id = b.id, nn
  WHERE (a.g, a.tn) <= (b.g, b.tn)
  GROUP BY a.g, a.tn, b.g, b.tn, nn.n),
fp AS (SELECT md5(
  (SELECT string_agg(g || ',' || tn || ',' || att, ';' ORDER BY g, tn)
   FROM att_r) || '|' ||
  (SELECT string_agg(g1 || ',' || t1 || ',' || g2 || ',' || t2 || ','
                     || cov, ';' ORDER BY g1, t1, g2, t2)
   FROM vv_r)) AS fp)"""

# engine's Stats.DegenerateTol = sqrt(ulp(1.0)) * 10
DEGENERATE_TOL = math.sqrt(2.220446049250313e-16) * 10


def chi2_sf(w, df):
    """Upper-tail chi-square probability, integer df, closed form.

    df even: exp(-w/2) * sum_{k=0}^{df/2-1} (w/2)^k / k!
    df odd:  erfc(sqrt(w/2)) + exp(-w/2) *
             sum_{k=1}^{(df-1)/2} (w/2)^{k-1/2} / Gamma(k+1/2)
    """
    if w <= 0:
        return 1.0
    x = w / 2.0
    if df % 2 == 0:
        total, term = 0.0, 1.0
        for k in range(df // 2):
            if k > 0:
                term *= x / k
            total += term
        return min(1.0, math.exp(-x) * total)
    total = math.erfc(math.sqrt(x))
    for k in range(1, (df - 1) // 2 + 1):
        total += math.exp(-x) * x ** (k - 0.5) / math.gamma(k + 0.5)
    return min(1.0, total)


def selfcheck():
    # pin the closed form against independently known values
    # (chi2 sf at w=df has well-tabulated values; these are from
    # standard tables / direct series evaluation)
    assert abs(chi2_sf(3.841458820694124, 1) - 0.05) < 1e-12
    assert abs(chi2_sf(5.991464547107979, 2) - 0.05) < 1e-12
    assert abs(chi2_sf(16.918977604620448, 9) - 0.05) < 1e-12
    # numeric cross-check: trapezoid integration of the density
    for df in (3, 6, 9):
        w = 1.7 * df
        grid = np.linspace(1e-9, 400.0, 4_000_001)
        pdf = (grid ** (df / 2 - 1) * np.exp(-grid / 2)
               / (2 ** (df / 2) * math.gamma(df / 2)))
        approx = np.trapz(pdf[grid >= w], grid[grid >= w])
        assert abs(chi2_sf(w, df) - approx) < 1e-6, (df, w)


def one(sfdir):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{sfdir}/orders.parquet'")
    base = f"WITH panel AS ({PANEL_SQL}),\n{IF_UNIT_CTE}"
    n = con.sql(base + "\nSELECT n FROM nn").fetchone()[0]
    att = {(g, t): a for g, t, a in con.sql(
        base + """
        SELECT g, tn, (mu11 - mu10) - (mu01 - mu00) FROM k
        WHERE w11 > 0 AND w10 > 0 AND w01 > 0 AND w00 > 0""").fetchall()}
    cov = {(g1, t1, g2, t2): c for g1, t1, g2, t2, c in con.sql(
        base + """
        SELECT a.g, a.tn, b.g, b.tn,
          SUM(a.inf * b.inf) / (nn.n * nn.n)
        FROM u a JOIN u b ON a.id = b.id, nn
        WHERE (a.g, a.tn) <= (b.g, b.tn)
        GROUP BY a.g, a.tn, b.g, b.tn, nn.n""").fetchall()}
    pre = sorted([c for c in att if c[1] < c[0]])
    kmat = len(pre)
    V = np.zeros((kmat, kmat))
    for i, ci in enumerate(pre):
        for j, cj in enumerate(pre):
            key = (ci[0], ci[1], cj[0], cj[1])
            alt = (cj[0], cj[1], ci[0], ci[1])
            V[i, j] = cov.get(key, cov.get(alt, 0.0))
    keep = [i for i in range(kmat) if V[i, i] > DEGENERATE_TOL]
    Vk = V[np.ix_(keep, keep)]
    a = np.array([att[pre[i]] for i in keep])
    w = float(a @ np.linalg.solve(Vk, a))
    df = len(keep)
    pval = chi2_sf(w, df)
    fp = con.sql(
        base + ",\n" + FP_SQL + "\nSELECT fp FROM fp").fetchone()[0]
    con.close()
    return fp, round(w, 6), round(pval, 6), df, n


def main():
    selfcheck()
    dirs = sys.argv[1:] or [f"/root/testdata/sf{s}"
                            for s in ("0.001", "0.01", "0.1")]
    rows = []
    for d in dirs:
        fp, w, pval, df, n = one(d)
        print(f"{d}: fp={fp} w={w} pval={pval} df={df} n={n}")
        rows.append((fp, w, pval, df))
    with open("src/test/resources/pretest_wald.csv", "w", newline="") as f:
        out = csv.writer(f)
        out.writerow(["input_fp", "w", "pval", "df"])
        out.writerows(rows)


if __name__ == "__main__":
    main()
