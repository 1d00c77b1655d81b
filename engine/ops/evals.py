"""TIER-EVALUATION operators — measure a cheap approximate tier against
its exact ground truth on the same corpus, the QA gate a pipeline runs
before letting an approximation filter data at 100 TB:

- :func:`dedup_simhash_eval` — precision/recall of the simhash
  (hamming ≤ 3) near-dup tier against exact n-gram Jaccard ≥ 0.8 truth.
  (The minhash tier verifies candidates exactly, so its precision is 1.0
  by construction — simhash is the tier whose error is a real number.)
- :func:`ann_recall_eval` — per-query recall@k of the IVF ANN tier
  against the exact brute-force top-k.

Both REUSE the production operators (engine.ops.dedup /
engine.ops.similarity) for the two sides, so the eval measures the code
that actually ships; both oracles CTE-wrap the same generated oracle
SQLs the production ops are hash-checked against, so the eval itself is
independently recomputed end-to-end.

Scale shape: pair/result sets are outputs of already-scale-safe tiers;
the eval folds them to counters via one pair-hash-bucketed exchange
(dedup eval) or a per-query join of two (n_queries × k)-row tables (ANN
eval — query sets are broadcast-small by the ann_topk contract).  All
divisions are single int64-exact float ops, half-up r6 (common.sql_round
convention)."""

import numpy as np
import pyarrow as pa

import ray

from .common import round_half_up, sql_round
from . import dedup as _dedup
from . import relational as _relational
from . import similarity as _similarity

__all__ = ['dedup_simhash_eval', 'ann_recall_eval',
           'simhash_eval_oracle_sql', 'ann_recall_oracle_sql',
           'tdigest_error_eval', 'tdigest_error_oracle_sql']


def _pair_keys(a, b):
    """Structured (a, b) composite keys — exact set algebra on int64
    pairs without overflow-prone arithmetic packing."""
    out = np.empty(len(a), dtype=[('a', '<i8'), ('b', '<i8')])
    out['a'], out['b'] = a, b
    return out


def dedup_simhash_eval(sf_dir, num_buckets=16):
    """One row: (n_truth, n_pred, tp, fp, fn, precision, recall) of
    simhash_near_dup vs exact ngram_jaccard_pairs on documents."""
    nb = num_buckets

    def tag(flag):
        def inner(batch: pa.Table) -> pa.Table:
            a = batch.column('doc_id_a').to_numpy(zero_copy_only=False)
            b = batch.column('doc_id_b').to_numpy(zero_copy_only=False)
            # bucket by the pair identity so each (a, b) lands in ONE
            # group and per-bucket set ops compose by summation
            bucket = (a * 1000003 + b) & (nb - 1)
            return pa.table({
                'a': pa.array(a, pa.int64()),
                'b': pa.array(b, pa.int64()),
                'is_truth': pa.array(np.full(len(a), flag, np.bool_)),
                'bucket': pa.array(bucket, pa.int64()),
            })
        return inner

    def bucket_counts(group: pa.Table) -> pa.Table:
        m = group.column('is_truth').to_numpy(zero_copy_only=False)
        a = group.column('a').to_numpy(zero_copy_only=False)
        b = group.column('b').to_numpy(zero_copy_only=False)
        t = _pair_keys(a[m], b[m])
        p = _pair_keys(a[~m], b[~m])
        tp = len(np.intersect1d(t, p))
        return pa.table({'n_truth': pa.array([len(t)], pa.int64()),
                         'n_pred': pa.array([len(p)], pa.int64()),
                         'tp': pa.array([tp], pa.int64())})

    truth = _dedup.ngram_jaccard_pairs(sf_dir) \
        .map_batches(tag(True), batch_format='pyarrow')
    pred = _dedup.simhash_near_dup(sf_dir) \
        .map_batches(tag(False), batch_format='pyarrow')
    parts = [t for t in ray.get(
        truth.union(pred).groupby('bucket')
             .map_groups(bucket_counts, batch_format='pyarrow')
             .to_arrow_refs()) if t.num_rows]
    from .common import concat_tables_or_empty
    tbl = concat_tables_or_empty(
        parts, pa.schema([('n_truth', pa.int64()), ('n_pred', pa.int64()),
                          ('tp', pa.int64())]))
    n_truth = int(np.sum(tbl.column('n_truth').to_numpy()))
    n_pred = int(np.sum(tbl.column('n_pred').to_numpy()))
    tp = int(np.sum(tbl.column('tp').to_numpy()))
    return pa.table({
        'n_truth': pa.array([n_truth], pa.int64()),
        'n_pred': pa.array([n_pred], pa.int64()),
        'tp': pa.array([tp], pa.int64()),
        'fp': pa.array([n_pred - tp], pa.int64()),
        'fn': pa.array([n_truth - tp], pa.int64()),
        'precision': pa.array(
            [round_half_up(np.float64(tp) / np.float64(n_pred), 6)],
            pa.float64()),
        'recall': pa.array(
            [round_half_up(np.float64(tp) / np.float64(n_truth), 6)],
            pa.float64()),
    })


def simhash_eval_oracle_sql(truth_sql, pred_sql):
    """CTE-wrap the two generated production oracles."""
    return """
WITH truth AS ({truth}),
pred AS ({pred}),
j AS (SELECT t.doc_id_a IS NOT NULL AS in_t, p.doc_id_a IS NOT NULL AS in_p
      FROM truth t FULL OUTER JOIN pred p
        ON t.doc_id_a = p.doc_id_a AND t.doc_id_b = p.doc_id_b)
SELECT count(*) FILTER (in_t)::BIGINT AS n_truth,
       count(*) FILTER (in_p)::BIGINT AS n_pred,
       count(*) FILTER (in_t AND in_p)::BIGINT AS tp,
       count(*) FILTER (in_p AND NOT in_t)::BIGINT AS fp,
       count(*) FILTER (in_t AND NOT in_p)::BIGINT AS fn,
       {prec} AS precision,
       {rec} AS recall
FROM j
""".format(
        truth=truth_sql.strip(), pred=pred_sql.strip(),
        prec=sql_round('CAST(count(*) FILTER (in_t AND in_p) AS DOUBLE)'
                       ' / CAST(count(*) FILTER (in_p) AS DOUBLE)', 6),
        rec=sql_round('CAST(count(*) FILTER (in_t AND in_p) AS DOUBLE)'
                      ' / CAST(count(*) FILTER (in_t) AS DOUBLE)', 6))


def ann_recall_eval(sf_dir):
    """Per-query recall@k of ann_topk_ivf vs exact ann_topk: (query_id,
    n_exact, n_hit, recall).  Both sides are (n_queries × k)-row tables
    by the ann contract, so the join is driver-side by design."""
    from .common import concat_tables_or_empty
    _ann_schema = pa.schema([('query_id', pa.int64()),
                             ('neighbor_id', pa.int64())])
    exact = concat_tables_or_empty(
        ray.get(_similarity.ann_topk(sf_dir).to_arrow_refs()), _ann_schema)
    approx = concat_tables_or_empty(
        ray.get(_similarity.ann_topk_ivf(sf_dir).to_arrow_refs()),
        _ann_schema)
    eq = exact.column('query_id').to_numpy(zero_copy_only=False)
    en = exact.column('neighbor_id').to_numpy(zero_copy_only=False)
    ak = _pair_keys(approx.column('query_id').to_numpy(zero_copy_only=False),
                    approx.column('neighbor_id').to_numpy(
                        zero_copy_only=False))
    ak.sort()
    ek = _pair_keys(eq, en)
    idx = np.searchsorted(ak, ek)
    idx[idx == len(ak)] = 0
    hit = (ak[idx] == ek).astype(np.int64) if len(ak) else \
        np.zeros(len(ek), np.int64)
    t = pa.table({'query_id': pa.array(eq, pa.int64()),
                  'hit': pa.array(hit, pa.int64())})
    g = t.group_by('query_id').aggregate([('hit', 'sum'), ([], 'count_all')])
    n_hit = g.column('hit_sum').to_numpy(zero_copy_only=False) \
             .astype(np.int64)
    n_exact = g.column('count_all').to_numpy(zero_copy_only=False) \
               .astype(np.int64)
    return pa.table({
        'query_id': g.column('query_id').cast(pa.int64()),
        'n_exact': pa.array(n_exact, pa.int64()),
        'n_hit': pa.array(n_hit, pa.int64()),
        'recall': pa.array(
            round_half_up(n_hit.astype(np.float64)
                          / n_exact.astype(np.float64), 6), pa.float64()),
    })


def ann_recall_oracle_sql(exact_sql, approx_sql):
    return """
WITH exact AS ({exact}),
approx AS ({approx})
SELECT e.query_id,
       count(*)::BIGINT AS n_exact,
       count(a.neighbor_id)::BIGINT AS n_hit,
       {rec} AS recall
FROM exact e LEFT JOIN approx a
  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
GROUP BY e.query_id
""".format(exact=exact_sql.strip(), approx=approx_sql.strip(),
           rec=sql_round('CAST(count(a.neighbor_id) AS DOUBLE)'
                         ' / CAST(count(*) AS DOUBLE)', 6))


def tdigest_error_eval(sf_dir, eps_pct=5):
    """Measured RANK ERROR of the t-digest quantile tier
    (:func:`engine.ops.relational.events_value_tdigest`) against the
    raw data — the accuracy audit that turns the sketch's error BUDGET
    (sampling ~1/sqrt(k) + digest ~2pi·q(1-q)/delta) into an observed
    number per (event_type, quantile): (est, n, n_le, rank_err,
    within_eps) where n_le counts raw values ≤ the estimate.

    Arithmetic is oracle-exact: rank_err = |100·n_le − qpct·n| /
    (100·n) — integer numerator and denominator, ONE float division,
    half-up r6; within_eps is the pure-integer inequality
    |100·n_le − qpct·n| ≤ eps_pct·n (no float anywhere).

    Scale shape: the estimates table is (types × 3) rows (the tdigest
    contract), shipped inside the task closure; the raw pass is a
    per-block vectorized count fold — the exchange carries
    (type, qpct, n_le) partials, never events."""
    from .common import concat_tables_or_empty
    td = concat_tables_or_empty(
        ray.get(_relational.events_value_tdigest(sf_dir).to_arrow_refs()),
        pa.schema([('event_type', pa.string()), ('n_events', pa.int64()),
                   ('p50_est', pa.float64()), ('p90_est', pa.float64()),
                   ('p99_est', pa.float64())]))
    ests = []   # (event_type, qpct, est, n_events)
    for i in range(td.num_rows):
        typ = td.column('event_type')[i].as_py()
        n = td.column('n_events')[i].as_py()
        for qpct in (50, 90, 99):
            ests.append((typ, qpct, td.column('p%02d_est' % qpct)[i].as_py(),
                         n))

    def partial(batch: pa.Table) -> pa.Table:
        et = batch.column('event_type').to_numpy(zero_copy_only=False)
        val = batch.column('value').to_numpy(zero_copy_only=False)
        rows_t, rows_q, rows_c = [], [], []
        for typ, qpct, est, _n in ests:
            rows_t.append(typ)
            rows_q.append(qpct)
            rows_c.append(int(np.count_nonzero((et == typ) & (val <= est))))
        return pa.table({'event_type': pa.array(rows_t, pa.string()),
                         'qpct': pa.array(rows_q, pa.int64()),
                         'n_le': pa.array(rows_c, pa.int64())})

    def final(group: pa.Table) -> pa.Table:
        g = group.group_by(['event_type', 'qpct']).aggregate([('n_le',
                                                               'sum')])
        typ = g.column('event_type').to_numpy(zero_copy_only=False)
        qp = g.column('qpct').to_numpy(zero_copy_only=False)
        nle = g.column('n_le_sum').to_numpy(zero_copy_only=False) \
               .astype(np.int64)
        meta = {(t, q): (e, n) for t, q, e, n in ests}
        est = np.array([meta[(t, int(q))][0] for t, q in zip(typ, qp)],
                       np.float64)
        n = np.array([meta[(t, int(q))][1] for t, q in zip(typ, qp)],
                     np.int64)
        err_num = np.abs(100 * nle - qp * n)
        return pa.table({
            'event_type': pa.array(typ, pa.string()),
            'qpct': pa.array(qp, pa.int64()),
            'est': pa.array(est, pa.float64()),
            'n': pa.array(n, pa.int64()),
            'n_le': pa.array(nle, pa.int64()),
            'rank_err': pa.array(
                round_half_up(err_num.astype(np.float64)
                              / (100.0 * n.astype(np.float64)), 6),
                pa.float64()),
            'within_eps': pa.array(err_num <= eps_pct * n, pa.bool_()),
        })

    from .common import read_table
    ds = read_table(sf_dir, 'events', columns=['event_type', 'value'])
    return ds.map_batches(partial, batch_format='pyarrow',
                          zero_copy_batch=True) \
             .groupby('event_type').map_groups(final,
                                               batch_format='pyarrow')


def tdigest_error_oracle_sql(tdigest_sql, eps_pct=5):
    """CTE-wrap the generated tdigest oracle (estimates inlined as the
    SAME r6 literals the engine emitted) and recount n_le from raw."""
    return """
WITH td AS ({td}),
u AS (
  SELECT event_type, 50 AS qpct, p50_est AS est, n_events AS n FROM td
  UNION ALL
  SELECT event_type, 90, p90_est, n_events FROM td
  UNION ALL
  SELECT event_type, 99, p99_est, n_events FROM td
), c AS (
  SELECT u.event_type, u.qpct, u.est, u.n,
         (SELECT count(*) FROM events e
          WHERE e.event_type = u.event_type
            AND e.value <= u.est)::BIGINT AS n_le
  FROM u
)
SELECT event_type, CAST(qpct AS BIGINT) AS qpct, est, n, n_le,
       {err} AS rank_err,
       abs(100 * n_le - qpct * n) <= {eps} * n AS within_eps
FROM c
""".format(td=tdigest_sql.strip(), eps=eps_pct,
           err=sql_round('CAST(abs(100 * n_le - qpct * n) AS DOUBLE)'
                         ' / CAST(100 * n AS DOUBLE)', 6))
