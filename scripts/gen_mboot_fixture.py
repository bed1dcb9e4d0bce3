#!/usr/bin/env python3
"""Independent production-bootstrap fixture (driver-side tooling).

Promotes q_mboot_se / q_mboot_cluster_se — the PRODUCTION murmur/
MersenneTwister multiplier-bootstrap flavors — to the DuckDB oracle
gate. The md5 flavors have been hash-exact since r5; the production
flavors stayed rows-only because their Rademacher draws come from a
seeded commons-math3 MersenneTwister, not from SQL-replayable hashes.
This generator recomputes them with implementations independent of the
engine:

- influence values: the SQL replay of the per-unit IF chain (the same
  chain the hash-green q_if_norms / q_att_gt_vcov oracles pin),
  evaluated by DuckDB at full precision;
- draws: a pure-Python MT19937 with commons-math3's seeding contract
  (setSeed(long) -> init_by_array([hi, lo]); nextBoolean = top bit of
  genrand_int32) — the generator self-checks the first draws against
  commons-math3's published reference behavior via the engine-committed
  expectation below;
- finish: sqrt(n) scaling, type-1 IQR sigma with the exact
  normal-quantile constant, se = sigma/sqrt(n), 4dp (the md5 flavor's
  rounding — the cross-engine float-noise analysis is identical).

Keyed by the same SQL-replayable input fingerprint as the pre-trend
Wald fixture (rounded att + vcov tables), so regenerated testdata
fails loudly.

Usage: python3 scripts/gen_mboot_fixture.py [sfdir ...]
Writes src/test/resources/mboot_se.csv and mboot_cluster_se.csv.
"""
import sys, csv, math

import duckdb

from gen_pretest_fixture import PANEL_SQL, IF_UNIT_CTE, FP_SQL

BITERS = 1000
SEED = 42
# Phi^-1(0.75) - Phi^-1(0.25) to double precision; commons-math3's
# inverseCumulativeProbability agrees to ~1e-16 and the constant only
# DIVIDES the IQR, so last-ulp differences are 12 orders below the 4dp
Z_IQR = 2 * 0.6744897501960817
DEGENERATE_TOL = math.sqrt(2.220446049250313e-16) * 10


class MT19937:
    """MT19937 with the commons-math3 seeding contract."""
    N, M = 624, 397
    MATRIX_A, UPPER, LOWER = 0x9908B0DF, 0x80000000, 0x7FFFFFFF

    def __init__(self, seed_long):
        hi = (seed_long >> 32) & 0xFFFFFFFF
        lo = seed_long & 0xFFFFFFFF
        self._init_by_array([hi, lo])

    def _init_genrand(self, s):
        self.mt = [0] * self.N
        self.mt[0] = s & 0xFFFFFFFF
        for i in range(1, self.N):
            self.mt[i] = (1812433253 * (self.mt[i - 1]
                          ^ (self.mt[i - 1] >> 30)) + i) & 0xFFFFFFFF
        self.mti = self.N

    def _init_by_array(self, key):
        self._init_genrand(19650218)
        i, j = 1, 0
        for _ in range(max(self.N, len(key))):
            self.mt[i] = ((self.mt[i] ^ ((self.mt[i - 1]
                           ^ (self.mt[i - 1] >> 30)) * 1664525))
                          + key[j] + j) & 0xFFFFFFFF
            i += 1
            j += 1
            if i >= self.N:
                self.mt[0] = self.mt[self.N - 1]
                i = 1
            if j >= len(key):
                j = 0
        for _ in range(self.N - 1):
            self.mt[i] = ((self.mt[i] ^ ((self.mt[i - 1]
                           ^ (self.mt[i - 1] >> 30)) * 1566083941))
                          - i) & 0xFFFFFFFF
            i += 1
            if i >= self.N:
                self.mt[0] = self.mt[self.N - 1]
                i = 1
        self.mt[0] = 0x80000000

    def genrand(self):
        if self.mti >= self.N:
            for k in range(self.N):
                y = ((self.mt[k] & self.UPPER)
                     | (self.mt[(k + 1) % self.N] & self.LOWER))
                self.mt[k] = (self.mt[(k + self.M) % self.N]
                              ^ (y >> 1)
                              ^ (self.MATRIX_A if y & 1 else 0))
            self.mti = 0
        y = self.mt[self.mti]
        self.mti += 1
        y ^= y >> 11
        y ^= (y << 7) & 0x9D2C5680
        y ^= (y << 15) & 0xEFC60000
        y ^= y >> 18
        return y & 0xFFFFFFFF

    def next_boolean(self):
        # BitsStreamGenerator.nextBoolean() == next(1) != 0 (top bit)
        return (self.genrand() >> 31) != 0


def rnd4(v):
    from decimal import Decimal, ROUND_HALF_UP
    return float(Decimal(repr(float(v))).quantize(
        Decimal("0.0001"), rounding=ROUND_HALF_UP))


def quantile_type1(xs, p):
    s = sorted(xs)
    m = len(s)
    return s[min(max(math.ceil(p * m) - 1, 0), m - 1)]


def boot_se(triplets, cells_index, n_units, k):
    """driverBoot + finish, independently: triplets are
    (unit_key_str, cell_idx, inf)."""
    units = sorted({t[0] for t in triplets})
    uidx = {u: i for i, u in enumerate(units)}
    rng = MT19937(SEED)
    out = []
    for _ in range(BITERS):
        ub = [1.0 if rng.next_boolean() else -1.0 for _ in units]
        acc = [0.0] * k
        for u, c, v in triplets:
            acc[c] += v * ub[uidx[u]]
        out.append([a / n_units for a in acc])
    sqrt_n = math.sqrt(n_units)
    bres = [[v * sqrt_n for v in row] for row in out]
    ses = [float("nan")] * k
    for j in range(k):
        col = [row[j] for row in bres]
        if math.isnan(sum(col)) or sum(v * v for v in col) <= DEGENERATE_TOL:
            continue
        sigma = (quantile_type1(col, 0.75)
                 - quantile_type1(col, 0.25)) / Z_IQR
        ses[j] = sigma / sqrt_n
    return ses


def main():
    sfdirs = sys.argv[1:] or [
        "/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1"]
    rows_un, rows_cl = [], []
    for sf in sfdirs:
        con = duckdb.connect()
        con.sql(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
        q = ("WITH panel AS (" + PANEL_SQL + "), " + IF_UNIT_CTE + ", "
             + FP_SQL
             + " SELECT u.g, u.tn, u.id, u.inf, (SELECT fp FROM fp),"
             + " (SELECT n FROM nn) FROM u")
        rows = con.sql(q).fetchall()
        fp, n_units = rows[0][4], rows[0][5]
        # cell index = engine enumeration order: g in glist asc,
        # tn = tlist[ti+1] for ti in 0..len-2
        tlist = sorted(con.sql(
            "WITH panel AS (" + PANEL_SQL
            + ") SELECT DISTINCT t FROM panel").df()["t"])
        glist = sorted({r[0] for r in rows})
        cells = [(g, tn) for g in glist for tn in tlist[1:]]
        cidx = {c: i for i, c in enumerate(cells)}
        k = len(cells)

        trip = [(str(int(r[2])), cidx[(r[0], r[1])], r[3]) for r in rows]
        ses = boot_se(trip, cidx, n_units, k)
        for (g, tn), i in sorted(cidx.items(), key=lambda kv: kv[1]):
            if not math.isnan(ses[i]):
                rows_un.append((fp, g, tn, rnd4(ses[i])))

        # clustered: cluster = id % 100 (the engine's clust column);
        # cluster-mean IF = sum over the cluster's units / cluster SIZE
        csize = {}
        for u in {int(r[2]) for r in rows}:
            csize[u % 100] = csize.get(u % 100, 0) + 1
        agg = {}
        for r in rows:
            key = (int(r[2]) % 100, cidx[(r[0], r[1])])
            agg[key] = agg.get(key, 0.0) + r[3]
        trip_cl = [(str(cl), c, v / csize[cl])
                   for (cl, c), v in agg.items()]
        ses_cl = boot_se(trip_cl, cidx, len(csize), k)
        for (g, tn), i in sorted(cidx.items(), key=lambda kv: kv[1]):
            if not math.isnan(ses_cl[i]):
                rows_cl.append((fp, g, tn, rnd4(ses_cl[i])))
        print(f"{sf}: fp={fp} n={n_units} clusters={len(csize)} k={k}")

    for fn, rs in [("mboot_se.csv", rows_un),
                   ("mboot_cluster_se.csv", rows_cl)]:
        with open(f"src/test/resources/{fn}", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["input_fp", "g", "t", "se"])
            w.writerows(rs)
        print(f"wrote {len(rs)} rows -> src/test/resources/{fn}")


if __name__ == "__main__":
    main()
