#!/usr/bin/env python3
"""Driver-style DuckDB oracle comparator (see .claude/skills/verify).

Usage: compare.py <sfDir> <verifyOut> [query ...]
Compares each query's Spark parquet dump against its oracle_sql.json
entry run in DuckDB: sorted columns, sorted rows, exact values.
"""
import duckdb, json, glob, os, sys
import pandas as pd
from pandas.testing import assert_frame_equal

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])


def fresh_con():
    c = duckdb.connect()
    # Bound DuckDB so a heavy oracle SPILLS instead of dying: every
    # r10-r12 OOM happened under concurrent Spark/driver load on a
    # shared box, where DuckDB's default limit (80% of physical RAM)
    # is a lie. With an explicit limit + a temp dir, out-of-core
    # operators page to disk instead of raising OutOfMemoryException.
    # The limit is min(16GB, 25% of physical RAM) overridable via
    # GRAFT_DUCKDB_MEM — a hardcoded 16GB would be LOOSER than the
    # default on a small box and OOM the host before DuckDB spills.
    mem = os.environ.get('GRAFT_DUCKDB_MEM')
    if not mem:
        try:
            with open('/proc/meminfo') as f:
                kb = int(next(l for l in f
                              if l.startswith('MemTotal')).split()[1])
            mem = f"{min(16, max(1, kb // 4 // 1048576))}GB"
        except Exception:
            mem = '16GB'
    c.sql(f"SET memory_limit='{mem}'")
    c.sql("SET temp_directory='/tmp/duckdb_spill'")
    c.sql("SET threads=8")
    for t in ['region', 'nation', 'customer', 'supplier', 'part',
              'orders', 'lineitem', 'events', 'documents',
              'embeddings']:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return c


con = fresh_con()
oracle = json.load(open(f'{out}/oracle_sql.json'))
fail = 0
names = sorted(only) if only else sorted(oracle)
for name in names:
    if name not in oracle:
        # only reachable for explicitly-requested names: a typo or a
        # dropped oracle entry must not silently pass the gate
        print(f'{name}: FAIL no oracle entry (typo, dropped entry, '
              f'or a rows-only query this tool cannot check)')
        fail += 1
        continue
    d = f'{out}/{name}.parquet' if os.path.isdir(f'{out}/{name}.parquet') \
        else f'{out}/{name}'
    files = sorted(glob.glob(f'{d}/*.parquet'))
    if not files:
        print(f'{name}: FAIL no spark output')
        fail += 1
        continue
    spark = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    # the oracle runs OUTSIDE the compare try so a compare mismatch
    # stays a compare FAIL — but it gets its own guard + ONE retry on
    # a fresh connection: the r11 driver (and an r12 local run under
    # concurrent load) hit DuckDB "Failed to allocate 32768 bytes"
    # ~100 queries into the batch while the same query passes
    # isolated — buffer accumulation across one long-lived
    # connection, not the query. A crash here used to kill the WHOLE
    # gate; now it records a per-query FAIL and the close protocol's
    # isolated re-run separates contention from plan bugs.
    try:
        ora = con.sql(oracle[name]).df()
    except Exception as e:
        print(f'{name}: RETRY on fresh connection '
              f'after {type(e).__name__}')
        try:
            con = fresh_con()
            ora = con.sql(oracle[name]).df()
        except Exception as e2:
            print(f'{name}: FAIL oracle exec {str(e2)[:300]}')
            fail += 1
            continue
    try:
        s = spark.reindex(sorted(spark.columns), axis=1)
        o = ora.reindex(sorted(ora.columns), axis=1)
        s = s.sort_values(by=list(s.columns), ignore_index=True)
        o = o.sort_values(by=list(o.columns), ignore_index=True)
        # Match the DRIVER's strictness exactly (calibrated against its
        # round-8 verdicts): integer WIDTHS and datetime UNITS are
        # representation, not type — the driver passed int32-vs-int64
        # (q_simhash_neardup) and ns-vs-us parquet timestamps
        # (q_nearest_event) — but numeric CLASS is type: it failed
        # DOUBLE-vs-BIGINT (q_funnel_ttc). So: widen ints and datetimes
        # to one canonical width, then compare dtype-strict. Never pass
        # check_dtype=False — a lax working copy of this script let the
        # q_funnel_ttc red row ship in r8.
        for d in (s, o):
            for c in d.columns:
                k = d[c].dtype.kind
                if k in 'iu':
                    d[c] = d[c].astype('int64')
                elif k == 'M':
                    d[c] = d[c].astype('datetime64[us]')
        assert_frame_equal(s, o, check_exact=True, check_dtype=True)
        print(f'{name}: OK rows={len(s)}')
    except Exception as e:
        print(f'{name}: FAIL {str(e)[:300]}')
        fail += 1
sys.exit(1 if fail else 0)
