#!/usr/bin/env python3
"""Independent covariate ATT(g,t) fixture generator (driver-side tooling).

Computes the doubly-robust ATT(g,t) surface WITH a covariate — the
engine's `q_att_gt_cov` query: panel from orders, covariate
x1 = c_acctbal/1000 from customer, xfmla 'y ~ x1' — with an
implementation fully independent of the Scala engine: DuckDB reads the
raw parquet and builds the (g,t) cell samples in SQL; numpy fits the
unpenalized logistic propensity (Newton MLE, converged to 1e-12; the
engine's IRLS stops at 1e-10, so both sit at the same unique MLE)
and the bucket outcome regressions, then evaluates Sant'Anna & Zhao
(2020)'s locally efficient doubly-robust repeated-cross-section
estimator and its analytic influence function straight from the
published formulas (J. Econometrics 219(1), eqs. 3.4/A.2; the same
surface the reference imports from the external `drdid` package,
csdids/ATTgt.py:19,429).

Regime notes (Callaway & Sant'Anna conventions, mirrored from the
reference's default flags): unbalanced panel downgrades to repeated
cross sections with unit-level rows; control group = never treated;
varying base period; weights all 1. A cell is skipped when any of its
four (D, post) buckets is empty. Per-unit influence = sum of the
unit's row-level IF values within the cell; SE = sqrt(sum_u IF_u^2)/n
with n = number of distinct units.

Each fixture row is keyed by an input fingerprint REPLAYABLE IN SQL
(md5 over the rounded panel+covariate rows), so a testdata
regeneration makes the oracle join 0 rows — a loud failure, never a
stale pass. Same pattern as pretest_wald.csv / bpe_train_merges.csv.

Usage: python3 scripts/gen_attgt_cov_fixture.py [sfdir ...]
Writes src/test/resources/attgt_cov.csv (doubly-robust, one row per sf
dir per cell) plus attgt_cov_reg.csv / attgt_cov_ipw.csv — the same
surface under the outcome-regression-only and Hajek-IPW estimators
(reg_did.reg_did_rc / the ipw flavor the reference advertises but
never wires), so all three est_method paths sit behind the hash gate.
"""
import sys, csv
from decimal import Decimal, ROUND_HALF_UP

import duckdb
import numpy as np

PANEL_SQL = """SELECT o_custkey AS id,
  CAST(year(o_orderdate) AS DOUBLE) AS t,
  CAST(CASE o_custkey % 4 WHEN 1 THEN 1997 WHEN 2 THEN 1999
       WHEN 3 THEN 2001 ELSE 0 END AS DOUBLE) AS g,
  ROUND(SUM(o_totalprice), 2) AS y
FROM orders GROUP BY 1, 2, 3"""

# Replayable fingerprint over the estimator's exact input rows (panel
# joined with the covariate, both ROUNDED so the string form is
# cross-regeneration deterministic). MUST stay textually identical to
# the px/fp CTE in SparkEntry's q_att_gt_cov oracle SQL.
FP_SQL = """px AS (
  SELECT p.id, p.t, p.g, p.y, c.c_acctbal / 1000.0 AS x1
  FROM panel p JOIN customer c ON c.c_custkey = p.id),
fp AS (SELECT md5(string_agg(
  id || ',' || t || ',' || g || ',' || ROUND(y, 2) || ','
     || ROUND(x1, 9), ';' ORDER BY id, t)) AS fp FROM px)"""


def sigmoid(v):
    out = np.empty_like(v)
    pos = v >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-v[pos]))
    ev = np.exp(v[~pos])
    out[~pos] = ev / (1.0 + ev)
    return out


def logit_mle(x, d, w, tol=1e-12, max_iter=200):
    """Unpenalized weighted logistic MLE, Newton-Raphson from 0.

    The log-likelihood is strictly concave (barring separation), so the
    converged point is THE MLE regardless of iteration details; 1e-12
    on the step is far inside the engine's 1e-10 so both agree to
    ~machine precision at the optimum."""
    p = x.shape[1]
    beta = np.zeros(p)
    for _ in range(max_iter):
        mu = sigmoid(x @ beta)
        wirls = np.maximum(w * mu * (1.0 - mu), 1e-12)
        h = x.T @ (x * wirls[:, None])
        grad = x.T @ (w * (d - mu))
        step = np.linalg.solve(h, grad)
        beta = beta + step
        if np.max(np.abs(step)) < tol:
            break
    return beta


def wls(x, y, w):
    xtx = x.T @ (x * w[:, None])
    xty = (x * w[:, None]).T @ y
    return np.linalg.solve(xtx, xty)


def ols_lin_rep(x, y, w, ind, beta):
    """(w*ind*(y - xb)) X (X'WX/n)^-1 — the asymptotic linear
    representation rows of a weighted OLS fit on subsample `ind`."""
    n = len(y)
    wi = w * ind
    xtx_inv = np.linalg.inv(x.T @ (x * wi[:, None]) / n)
    resid = (y - x @ beta) * wi
    return (x * resid[:, None]) @ xtx_inv


def drdid_rc(y, post, d, w, x):
    """Sant'Anna-Zhao locally efficient DR DiD, repeated cross sections.

    Returns (att, per-row influence). Published formulas; every mean is
    an UNWEIGHTED mean over the cell rows of a weighted term (the
    n-denominator convention of the drdid package)."""
    n = len(y)
    iw = w / np.mean(w)
    one = np.ones(n)

    gamma = logit_mle(x, d, iw)
    ps = np.minimum(sigmoid(x @ gamma), 1 - 1e-16)

    sub = {(dv, pv): ((d == dv) & (post == pv)).astype(float)
           for dv in (0, 1) for pv in (0, 1)}
    b = {k: wls(x, y, iw * ind) for k, ind in sub.items()}
    out_c0, out_c1 = x @ b[(0, 0)], x @ b[(0, 1)]
    out_t0, out_t1 = x @ b[(1, 0)], x @ b[(1, 1)]
    out_c = post * out_c1 + (1 - post) * out_c0

    ps_odds = ps / (1 - ps)
    w_treat_pre = iw * d * (1 - post)
    w_treat_post = iw * d * post
    w_cont_pre = iw * ps_odds * (1 - d) * (1 - post)
    w_cont_post = iw * ps_odds * (1 - d) * post
    w_d = iw * d
    w_dt1 = iw * d * post
    w_dt0 = iw * d * (1 - post)

    def eta(wv, v):
        return (wv * v) / np.mean(wv)

    eta_tp = eta(w_treat_pre, y - out_c)
    eta_tq = eta(w_treat_post, y - out_c)
    eta_cp = eta(w_cont_pre, y - out_c)
    eta_cq = eta(w_cont_post, y - out_c)
    eta_dq = eta(w_d, out_t1 - out_c1)
    eta_dt1q = eta(w_dt1, out_t1 - out_c1)
    eta_dp = eta(w_d, out_t0 - out_c0)
    eta_dt0p = eta(w_dt0, out_t0 - out_c0)

    m = np.mean
    att = ((m(eta_tq) - m(eta_tp)) - (m(eta_cq) - m(eta_cp))
           + (m(eta_dq) - m(eta_dt1q)) - (m(eta_dp) - m(eta_dt0p)))

    # --- influence function ---
    rep_c0 = ols_lin_rep(x, y, iw, sub[(0, 0)], b[(0, 0)])
    rep_c1 = ols_lin_rep(x, y, iw, sub[(0, 1)], b[(0, 1)])
    rep_t0 = ols_lin_rep(x, y, iw, sub[(1, 0)], b[(1, 0)])
    rep_t1 = ols_lin_rep(x, y, iw, sub[(1, 1)], b[(1, 1)])
    ps_score = x * (iw * (d - ps))[:, None]
    ps_hess_inv = np.linalg.inv(
        x.T @ (x * (iw * ps * (1 - ps))[:, None]) / n)
    rep_ps = ps_score @ ps_hess_inv

    def col_means_w(wv, extra):
        return (x * (wv * extra)[:, None]).sum(axis=0) / n

    inf_treat_post = eta_tq - w_treat_post * (m(eta_tq) / m(w_treat_post))
    inf_treat_pre = eta_tp - w_treat_pre * (m(eta_tp) / m(w_treat_pre))
    m1_post = col_means_w(w_treat_post, post) * (-1.0 / m(w_treat_post))
    m1_pre = col_means_w(w_treat_pre, 1 - post) * (-1.0 / m(w_treat_pre))
    inf_treat = (inf_treat_post - inf_treat_pre
                 + rep_c1 @ m1_post + rep_c0 @ m1_pre)

    inf_cont_post = eta_cq - w_cont_post * (m(eta_cq) / m(w_cont_post))
    inf_cont_pre = eta_cp - w_cont_pre * (m(eta_cp) / m(w_cont_pre))
    m2_post = col_means_w(w_cont_post, y - out_c - m(eta_cq)) / m(w_cont_post)
    m2_pre = col_means_w(w_cont_pre, y - out_c - m(eta_cp)) / m(w_cont_pre)
    m3_post = col_means_w(w_cont_post, post) * (-1.0 / m(w_cont_post))
    m3_pre = col_means_w(w_cont_pre, 1 - post) * (-1.0 / m(w_cont_pre))
    inf_cont = (inf_cont_post - inf_cont_pre
                + rep_ps @ (m2_post - m2_pre)
                + rep_c1 @ m3_post + rep_c0 @ m3_pre)

    inf_eff = ((eta_dq - w_d * (m(eta_dq) / m(w_d)))
               - (eta_dt1q - w_dt1 * (m(eta_dt1q) / m(w_dt1)))
               - ((eta_dp - w_d * (m(eta_dp) / m(w_d)))
                  - (eta_dt0p - w_dt0 * (m(eta_dt0p) / m(w_dt0)))))
    mom_post = col_means_w(w_d / m(w_d) - w_dt1 / m(w_dt1), one)
    mom_pre = col_means_w(w_d / m(w_d) - w_dt0 / m(w_dt0), one)
    inf_or = (rep_t1 - rep_c1) @ mom_post - (rep_t0 - rep_c0) @ mom_pre

    return att, inf_treat - inf_cont + inf_eff + inf_or


def reg_did_rc(y, post, d, w, x):
    """Outcome-regression-only DiD, repeated cross sections
    (reg_did.reg_did_rc): control outcome regressions per period,
    treated means minus predicted control change."""
    n = len(y)
    iw = w / np.mean(w)
    m = np.mean
    i_c0 = ((d == 0) & (post == 0)).astype(float)
    i_c1 = ((d == 0) & (post == 1)).astype(float)
    b_c0 = wls(x, y, iw * i_c0)
    b_c1 = wls(x, y, iw * i_c1)
    out_pre, out_post = x @ b_c0, x @ b_c1

    w_treat_pre = iw * d * (1 - post)
    w_treat_post = iw * d * post
    w_cont = iw * d
    reg_tp = w_treat_pre * y
    reg_tq = w_treat_post * y
    reg_c = w_cont * (out_post - out_pre)
    eta_tp = m(reg_tp) / m(w_treat_pre)
    eta_tq = m(reg_tq) / m(w_treat_post)
    eta_c = m(reg_c) / m(w_cont)
    att = (eta_tq - eta_tp) - eta_c

    rep_c0 = ols_lin_rep(x, y, iw, i_c0, b_c0)
    rep_c1 = ols_lin_rep(x, y, iw, i_c1, b_c1)

    def col_means_w(wv):
        return (x * wv[:, None]).sum(axis=0) / n

    inf_tp = (reg_tp - w_treat_pre * eta_tp) / m(w_treat_pre)
    inf_tq = (reg_tq - w_treat_post * eta_tq) / m(w_treat_post)
    inf_c1 = (reg_c - w_cont * eta_c) / m(w_cont)
    m1 = col_means_w(w_cont * post) / m(w_cont)
    m2 = col_means_w(w_cont * (1 - post)) / m(w_cont)
    inf_c2 = rep_c1 @ m1 - rep_c0 @ m2
    return att, (inf_tq - inf_tp) - (inf_c1 + inf_c2)


def ipw_did_rc(y, post, d, w, x):
    """Hajek (standardized) IPW DiD, repeated cross sections —
    Abadie-style propensity weighting of the four (D, post) buckets,
    propensity estimation effect on the control terms only."""
    n = len(y)
    iw = w / np.mean(w)
    m = np.mean
    gamma = logit_mle(x, d, iw)
    ps = np.minimum(sigmoid(x @ gamma), 1 - 1e-16)
    ps_odds = ps / (1 - ps)

    w_tp = iw * d * (1 - post)
    w_tq = iw * d * post
    w_cp = iw * ps_odds * (1 - d) * (1 - post)
    w_cq = iw * ps_odds * (1 - d) * post

    def eta_of(wv):
        return m(wv * y) / m(wv)

    eta_tp, eta_tq = eta_of(w_tp), eta_of(w_tq)
    eta_cp, eta_cq = eta_of(w_cp), eta_of(w_cq)
    att = (eta_tq - eta_tp) - (eta_cq - eta_cp)

    ps_score = x * (iw * (d - ps))[:, None]
    ps_hess_inv = np.linalg.inv(
        x.T @ (x * (iw * ps * (1 - ps))[:, None]) / n)
    rep_ps = ps_score @ ps_hess_inv

    def col_means_w(wv):
        return (x * wv[:, None]).sum(axis=0) / n

    def inf_of(wv, eta_v, ps_corrected):
        base = (wv * (y - eta_v)) / m(wv)
        if not ps_corrected:
            return base
        return base + rep_ps @ (col_means_w(wv * (y - eta_v)) / m(wv))

    inf = (inf_of(w_tq, eta_tq, False) - inf_of(w_tp, eta_tp, False)
           - (inf_of(w_cq, eta_cq, True) - inf_of(w_cp, eta_cp, True)))
    return att, inf


def rnd(v, scale):
    return float(Decimal(repr(float(v))).quantize(
        Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP))


def surface(con, estimator=drdid_rc):
    """Cell grid + samples from SQL, estimator in numpy."""
    rows = con.sql(
        "WITH panel AS (" + PANEL_SQL + "), " + FP_SQL.replace("fp AS", "fpq AS")
        + " SELECT px.*, (SELECT fp FROM fpq) AS fp FROM px").fetchall()
    fp = rows[0][5]
    data = np.array([r[:5] for r in rows], dtype=float)
    ids, ts, gs, ys, x1s = (data[:, i] for i in range(5))

    tlist = np.unique(ts)
    fpd = tlist[0]
    glist = sorted(g for g in np.unique(gs) if g > 0 and g > fpd)
    n_units = len(np.unique(ids))

    out = []
    for g in glist:
        for ti in range(len(tlist) - 1):
            tn = tlist[ti + 1]
            if g <= tn:  # varying base: last period strictly before g
                tpre = tlist[tlist < g][-1]
            else:
                tpre = tlist[ti]
            sel = ((np.isin(ts, [tn, tpre])) & ((gs == g) | (gs == 0)))
            if not sel.any():
                continue
            y, d = ys[sel], (gs[sel] == g).astype(float)
            post = (ts[sel] == tn).astype(float)
            uid = ids[sel]
            buckets = {(dv, pv): ((d == dv) & (post == pv)).sum()
                       for dv in (0, 1) for pv in (0, 1)}
            if any(v == 0 for v in buckets.values()):
                continue
            x = x1s[sel][:, None]  # 'y ~ x1': single covariate, no icept
            att, inf = estimator(y, post, d, np.ones(len(y)), x)
            per_unit = {}
            for u, v in zip(uid, inf):
                per_unit[u] = per_unit.get(u, 0.0) + v
            ss = sum(v * v for v in per_unit.values())
            se = np.sqrt(ss) / n_units
            out.append((fp, g, tn, rnd(att, 4), rnd(se, 6)))
    return out


def main():
    sfdirs = sys.argv[1:] or [
        "/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1"]
    flavors = [("attgt_cov.csv", drdid_rc), ("attgt_cov_reg.csv", reg_did_rc),
               ("attgt_cov_ipw.csv", ipw_did_rc)]
    rows = {fn: [] for fn, _ in flavors}
    for sf in sfdirs:
        con = duckdb.connect()
        con.sql(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
        con.sql(
            f"CREATE VIEW customer AS SELECT * FROM '{sf}/customer.parquet'")
        for fn, est in flavors:
            cells = surface(con, est)
            print(f"{sf} {fn}: fp={cells[0][0]} cells={len(cells)}")
            rows[fn] += cells
    for fn, _ in flavors:
        with open(f"src/test/resources/{fn}", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["input_fp", "g", "t", "att", "se"])
            for r in rows[fn]:
                w.writerow(r)
        print(f"wrote {len(rows[fn])} rows -> src/test/resources/{fn}")


if __name__ == "__main__":
    main()
