"""Mergeable cardinality sketches — the approximate-distinct tier a
100 TB pipeline uses where an exact ``count(DISTINCT ...)`` would shuffle
every raw value.

KMV (k-minimum-values, Bar-Yossef et al. 2002): hash every value to a
uniform 63-bit key and keep only the ``k`` smallest per group; the k-th
smallest normalized hash estimates the distinct count as
``(k-1) / (h_k / 2^63)``.  The sketch is a MERGEABLE combiner — union
two k-sets and re-take the k smallest — so the groupby exchange moves at
most k rows per (group, block), never raw values.  Deterministic (md5,
no seeds), so the DuckDB oracle re-derives the identical estimate with
the same float expression — an *approximate* operator with an EXACT
oracle over its defined computation.
"""

import numpy as np
import pyarrow as pa

import ray.data

from .common import round_half_up, read_table, hash63_keys

__all__ = ['distinct_users_kmv']

_MASK63 = (1 << 63) - 1
_M63F = float(_MASK63)


def _hash63(ids):
    """md5(str(v)) → 63-bit int64 keys (common.hash63_keys — the
    oracle-shared convention)."""
    return hash63_keys(ids)


def distinct_users_kmv(sf_dir, k=64):
    """Approximate distinct ``user_id`` per event type via a KMV sketch.

    Scale shape: per block — distinct (type, user) via Arrow group_by,
    hash, and a vectorized per-type k-smallest cut (lexsort + run-rank),
    so the exchange carries ≤ k hashes per (type, block); per group —
    merge the partial k-sets (distinct fold, sort, cut at k) and emit
    ``est_distinct = (k-1) / (h_k / 2^63)`` (exact distinct-hash count
    when fewer than k hashes exist).  Identical float expression to the
    oracle SQL, half-up r4."""
    from .relational import rank_in_sorted_key

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(['event_type', 'user_id']).aggregate([])
        types = g.column('event_type').to_numpy(zero_copy_only=False)
        hk = _hash63(g.column('user_id').to_numpy(zero_copy_only=False))
        order = np.lexsort((hk, types))
        rank = rank_in_sorted_key(types[order])
        keep = order[rank <= k]
        return pa.table({
            'event_type': pa.array(types[keep], pa.string()),
            'hk': pa.array(hk[keep], pa.int64()),
        })

    def fold(group: pa.Table) -> pa.Table:
        g = group.group_by('hk').aggregate([])
        hk = np.sort(g.column('hk').to_numpy(zero_copy_only=False))[:k]
        n = len(hk)
        if n < k:
            est = float(n)
        else:
            # same expression tree as the oracle: (k-1) / (h_k / 2^63)
            est = round_half_up([(k - 1) / (float(hk[-1]) / _M63F)], 4)[0]
        return pa.table({
            'event_type': group.column('event_type').slice(0, 1),
            'est_distinct': pa.array([est], pa.float64()),
            'n_hashes': pa.array([n], pa.int64()),
        })

    ds = read_table(sf_dir, 'events', columns=['event_type', 'user_id'])
    return ds.map_batches(partial, batch_format='pyarrow',
                          zero_copy_batch=True) \
             .groupby('event_type').map_groups(fold, batch_format='pyarrow')


def kmv_oracle_sql(k=64):
    """DuckDB re-derivation of :func:`distinct_users_kmv` — identical
    hashing, k-cut and float expression."""
    return """
WITH h AS (
  SELECT DISTINCT event_type,
         (md5_number_lower(user_id::VARCHAR) & 9223372036854775807)::BIGINT AS hk
  FROM events
), r AS (
  SELECT event_type, hk,
         row_number() OVER (PARTITION BY event_type ORDER BY hk) AS rn
  FROM h
), kv AS (
  SELECT event_type, max(hk) AS hk_k, count(*)::BIGINT AS n_hashes
  FROM r WHERE rn <= {k} GROUP BY event_type
)
SELECT event_type,
       CASE WHEN n_hashes < {k} THEN n_hashes::DOUBLE
            ELSE floor(({k} - 1)::DOUBLE
                       / (hk_k::DOUBLE / 9223372036854775807.0)
                       * 10000 + 0.5) / 10000 END AS est_distinct,
       n_hashes
FROM kv
""".format(k=k)
