"""Table-level DATA-QUALITY audits — the checks a pipeline owner runs
before trusting an ingested corpus (Deequ/great-expectations shape,
re-expressed as combiner-first Ray Data aggregations):

- :func:`fk_integrity_audit` — orphan foreign keys across the fact
  tables (a broken upstream export shows up here first).  On the
  clean sf tables every orphan count is 0 by construction; the
  corrupted-fixture test exercises the non-zero branch (the
  events_late_arrivals pattern).
- :func:`table_profile` — per-column row/null/exact-distinct profile
  of a table.

Both keep the exchange at combiner cardinality: per-block Arrow
group_by/unique first, one md5/key-bucketed groupby, tiny final fold.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .common import read_table, pool

__all__ = ['fk_integrity_audit', 'FK_INTEGRITY_SQL',
           'table_profile', 'TABLE_PROFILE_SQL']

# (relation label, child table, child key col, parent table, parent key col)
FK_RELATIONS = [
    ('orders->customer', 'orders', 'o_custkey', 'customer', 'c_custkey'),
    ('lineitem->orders', 'lineitem', 'l_orderkey', 'orders', 'o_orderkey'),
]


def fk_integrity_audit(sf_dir, relations=None, num_buckets=64):
    """ORPHAN-KEY audit: for each declared child→parent relationship,
    count child rows / distinct child keys whose key has NO parent row.
    Output: (relation, n_child, n_keys, n_orphan_rows, n_orphan_keys).

    Shape: child side folds to one (key, cnt) row per distinct key per
    block, parent side to one (key) row per distinct key per block —
    the exchange carries combiner rows, never facts.  A key lives in
    exactly one (relation, key & (nb-1)) bucket, so the anti-join
    (``is_in`` against the bucket's parent keys) and the distinct
    arithmetic are exact per bucket and the final fold just sums —
    the dedup_exact floor.  All integers."""
    rels = relations if relations is not None else FK_RELATIONS
    nb = num_buckets

    def make_child(rel_id, key_col):
        def partial(batch: pa.Table) -> pa.Table:
            g = pa.table({'key': pc.cast(batch.column(key_col),
                                         pa.int64())}) \
                  .group_by('key').aggregate([([], 'count_all')])
            k = g.column('key').to_numpy(zero_copy_only=False)
            return pa.table({
                'bucket': pa.array(rel_id * nb + (k & (nb - 1)),
                                   pa.int64()),
                'key': g.column('key'),
                'cnt': g.column('count_all').cast(pa.int64()),
                'is_parent': pa.array(np.zeros(len(k), bool)),
            })
        return partial

    def make_parent(rel_id, key_col):
        def partial(batch: pa.Table) -> pa.Table:
            u = pc.unique(pc.cast(batch.column(key_col), pa.int64()))
            k = u.to_numpy(zero_copy_only=False)
            return pa.table({
                'bucket': pa.array(rel_id * nb + (k & (nb - 1)),
                                   pa.int64()),
                'key': u,
                'cnt': pa.array(np.zeros(len(k), np.int64)),
                'is_parent': pa.array(np.ones(len(k), bool)),
            })
        return partial

    def fold(group: pa.Table) -> pa.Table:
        rel_id = int(group.column('bucket')[0].as_py()) // nb
        relation = rels[rel_id][0]
        is_par = group.column('is_parent')
        child = group.filter(pc.invert(is_par)) \
                     .group_by('key').aggregate([('cnt', 'sum')])
        parents = pc.unique(group.filter(is_par).column('key'))
        ck = child.column('key')
        cnt = child.column('cnt_sum').to_numpy(zero_copy_only=False) \
                   .astype(np.int64)
        orphan = pc.invert(pc.is_in(ck, value_set=parents)) \
                   .to_numpy(zero_copy_only=False)
        return pa.table({
            'relation': pa.array([relation], pa.string()),
            'n_child': pa.array([int(cnt.sum())], pa.int64()),
            'n_keys': pa.array([len(ck)], pa.int64()),
            'n_orphan_rows': pa.array([int(cnt[orphan].sum())],
                                      pa.int64()),
            'n_orphan_keys': pa.array([int(orphan.sum())], pa.int64()),
        })

    def final(group: pa.Table) -> pa.Table:
        g = group.group_by('relation').aggregate(
            [('n_child', 'sum'), ('n_keys', 'sum'),
             ('n_orphan_rows', 'sum'), ('n_orphan_keys', 'sum')])
        return g.rename_columns(['relation', 'n_child', 'n_keys',
                                 'n_orphan_rows', 'n_orphan_keys'])

    parts = []
    for rel_id, (_, child_t, child_k, parent_t, parent_k) in \
            enumerate(rels):
        parts.append(
            read_table(sf_dir, child_t, columns=[child_k],
                       min_blocks=pool()[1])
            .map_batches(make_child(rel_id, child_k),
                         batch_format='pyarrow', zero_copy_batch=True))
        parts.append(
            read_table(sf_dir, parent_t, columns=[parent_k],
                       min_blocks=pool()[1])
            .map_batches(make_parent(rel_id, parent_k),
                         batch_format='pyarrow', zero_copy_batch=True))
    ds = parts[0].union(*parts[1:])
    return ds.groupby('bucket').map_groups(fold, batch_format='pyarrow') \
             .groupby('relation').map_groups(final,
                                             batch_format='pyarrow')


FK_INTEGRITY_SQL = """
SELECT 'orders->customer' AS relation,
       count(*)::BIGINT AS n_child,
       count(DISTINCT o.o_custkey)::BIGINT AS n_keys,
       count(*) FILTER (WHERE c.c_custkey IS NULL)::BIGINT
         AS n_orphan_rows,
       count(DISTINCT o.o_custkey)
         FILTER (WHERE c.c_custkey IS NULL)::BIGINT AS n_orphan_keys
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
UNION ALL
SELECT 'lineitem->orders',
       count(*)::BIGINT,
       count(DISTINCT l.l_orderkey)::BIGINT,
       count(*) FILTER (WHERE o2.o_orderkey IS NULL)::BIGINT,
       count(DISTINCT l.l_orderkey)
         FILTER (WHERE o2.o_orderkey IS NULL)::BIGINT
FROM lineitem l LEFT JOIN orders o2 ON l.l_orderkey = o2.o_orderkey
"""


PROFILE_TABLE = 'orders'
PROFILE_COLS = ['o_orderkey', 'o_custkey', 'o_orderstatus',
                'o_totalprice', 'o_orderdate', 'o_orderpriority']


def table_profile(sf_dir, table=PROFILE_TABLE, columns=None,
                  num_buckets=64):
    """PER-COLUMN profile of a table: row count, null count, EXACT
    distinct count (non-null).  Output: (col, n_rows, n_nulls,
    n_distinct) — one row per column.

    Shape: per block, each column folds to its DISTINCT value strings
    (Arrow ``unique`` over the string cast — engine-internal
    representation only; the oracle counts distinct natively) hashed
    to int64, plus one (col, n_rows, n_nulls) stats row; the exchange
    carries per-block-distinct cardinality.  A value hash lives in one
    (col, hash & (nb-1)) bucket, so per-bucket unique counts sum to
    the exact global distinct.  Profiling inherently reads every
    column — there is nothing to prune."""
    import pandas as pd

    cols = columns if columns is not None else PROFILE_COLS
    nb = num_buckets
    col_id = {c: i for i, c in enumerate(cols)}

    def partial(batch: pa.Table) -> pa.Table:
        out_col, out_h, out_rows, out_nulls = [], [], [], []
        for c in cols:
            arr = batch.column(c)
            n = len(arr)
            nulls = arr.null_count
            u = pc.unique(pc.cast(arr.drop_null(), pa.string()))
            # ENGINE-INTERNAL hash (never compared to the oracle, which
            # counts distinct natively), so a vectorized cython siphash
            # replaces the per-value Python md5 loop; the fixed pandas
            # hash key keeps it deterministic across worker processes
            hs = (pd.util.hash_array(
                u.to_numpy(zero_copy_only=False), categorize=False)
                >> np.uint64(1)).astype(np.int64)
            out_col.append(pa.array([c] * len(hs), pa.string()))
            out_h.append(pa.array(hs, pa.int64()))
            out_rows.append(pa.array(np.zeros(len(hs), np.int64)))
            out_nulls.append(pa.array(np.zeros(len(hs), np.int64)))
            # stats row: h = -1, lands in this column's bucket 0
            out_col.append(pa.array([c], pa.string()))
            out_h.append(pa.array([-1], pa.int64()))
            out_rows.append(pa.array([n], pa.int64()))
            out_nulls.append(pa.array([nulls], pa.int64()))
        col_arr = pa.concat_arrays([a.combine_chunks() if
                                    isinstance(a, pa.ChunkedArray) else a
                                    for a in out_col])
        h_arr = pa.concat_arrays(out_h)
        ids = np.array([col_id[c] for c in col_arr.to_pylist()], np.int64)
        hv = h_arr.to_numpy(zero_copy_only=False)
        bucket = ids * nb + np.where(hv < 0, 0, hv & (nb - 1))
        return pa.table({
            'col': col_arr,
            'h': h_arr,
            'n_rows': pa.concat_arrays(out_rows),
            'n_nulls': pa.concat_arrays(out_nulls),
            'bucket': pa.array(bucket, pa.int64()),
        })

    def fold(group: pa.Table) -> pa.Table:
        col = group.column('col')[0].as_py()
        stats = pc.equal(group.column('h'), -1)
        n_rows = pc.sum(group.filter(stats).column('n_rows')).as_py() or 0
        n_nulls = pc.sum(group.filter(stats).column('n_nulls')).as_py() or 0
        nd = len(pc.unique(group.filter(pc.invert(stats)).column('h')))
        return pa.table({
            'col': pa.array([col], pa.string()),
            'n_rows': pa.array([int(n_rows)], pa.int64()),
            'n_nulls': pa.array([int(n_nulls)], pa.int64()),
            'n_distinct': pa.array([nd], pa.int64()),
        })

    def final(group: pa.Table) -> pa.Table:
        g = group.group_by('col').aggregate(
            [('n_rows', 'sum'), ('n_nulls', 'sum'), ('n_distinct', 'sum')])
        return g.rename_columns(['col', 'n_rows', 'n_nulls', 'n_distinct'])

    ds = read_table(sf_dir, table, columns=cols, min_blocks=pool()[1])
    return ds.map_batches(partial, batch_format='pyarrow',
                          zero_copy_batch=True) \
             .groupby('bucket').map_groups(fold, batch_format='pyarrow') \
             .groupby('col').map_groups(final, batch_format='pyarrow')


TABLE_PROFILE_SQL = '\nUNION ALL\n'.join(
    "SELECT '{c}' AS col, count(*)::BIGINT AS n_rows,\n"
    "       (count(*) - count({c}))::BIGINT AS n_nulls,\n"
    "       count(DISTINCT {c})::BIGINT AS n_distinct FROM {t}"
    .format(c=c, t=PROFILE_TABLE) for c in PROFILE_COLS)
