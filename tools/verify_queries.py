"""Local stand-in for the driver's correctness gate.

Runs every ``__ray_entry__.queries()`` entry at a given sf_dir, runs the
matching ``oracle_sql()`` through DuckDB on the same parquet tables, and
compares row count + column-name set + order-insensitive value equality.

Usage: python tools/verify_queries.py [sf_dir] [query ...]
"""

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']


def to_pandas(result):
    import pyarrow as pa
    import ray.data
    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind='mergesort').reset_index(drop=True)
    return df


def compare(name, ray_df, sql_df):
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append('columns: ray=%s sql=%s' % (sorted(ray_df.columns),
                                                    sorted(sql_df.columns)))
        return problems
    if len(ray_df) != len(sql_df):
        problems.append('rows: ray=%d sql=%d' % (len(ray_df), len(sql_df)))
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b) and not a.equals(b):
        neq = (a != b) & ~(a.isna() & b.isna())
        bad_cols = [c for c in a.columns if neq[c].any()]
        for c in bad_cols[:3]:
            i = neq[c].idxmax()
            problems.append('value mismatch col=%s row=%d ray=%r sql=%r'
                            % (c, i, a[c][i], b[c][i]))
    return problems


def main():
    args = [a for a in sys.argv[1:]]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else '/root/testdata/sf0.01'
    only = set(args)

    import ray
    if not ray.is_initialized():
        ray.init(address='local', num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level='ERROR')

    # generated oracles (IVF centroids) must be built for THIS sf dir
    os.environ['GRAFT_ORACLE_SF_DIR'] = sf_dir
    import __ray_entry__ as entrymod
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, t + '.parquet')
        if os.path.exists(p):
            con.execute("CREATE VIEW %s AS SELECT * FROM read_parquet('%s')" % (t, p))

    n_fail = 0
    import gc
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # Dataset executors/actor pools tear down via cyclic GC; collect so
        # query N+1 doesn't wait on query N's pool CPUs (18s vs 2.4s).
        gc.collect()
        t0 = time.perf_counter()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            import traceback
            traceback.print_exc()
            print('%-28s FAIL ray error: %r' % (name, e))
            n_fail += 1
            continue
        wall = time.perf_counter() - t0
        if name not in oracles:
            print('%-28s rows-only  rows=%-7d %.1fs' % (name, len(ray_df), wall))
            continue
        sql_df = con.execute(oracles[name]).fetchdf()
        problems = compare(name, ray_df, sql_df)
        if problems:
            n_fail += 1
            print('%-28s FAIL (%d rows ray / %d sql) %.1fs' % (name, len(ray_df),
                                                               len(sql_df), wall))
            for p in problems:
                print('    ' + p)
        else:
            print('%-28s OK    rows=%-7d %.1fs' % (name, len(ray_df), wall))
    print('failures:', n_fail)
    return 1 if n_fail else 0


if __name__ == '__main__':
    rc = main()
    import ray
    ray.shutdown()
    sys.exit(rc)
