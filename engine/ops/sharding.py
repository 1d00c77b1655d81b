"""TRAINING-SHARD ASSIGNMENT — the step that turns a cleaned corpus
into K contiguous, token-balanced shards for a data loader (resumable
training wants shards of near-equal TOKEN mass, not equal doc counts,
and wants them CONTIGUOUS in doc_id so a shard maps to a key range).

shard(doc) = floor(cum_excl(doc) · K / T) where cum_excl is the exact
global prefix sum of token counts in doc_id order and T the corpus
total — i.e. the doc starts in the shard its first token falls into.
All arithmetic is integer, so the DuckDB oracle (a window SUM) agrees
bit-for-bit.

This is the repo's DISTRIBUTED ORDERED PREFIX-SCAN shape: a global
running total in key order, which a plain groupby cannot express.
Three-step scan, the textbook decomposition:

1. per-block combiner: token counts fold to per-RANGE-BUCKET sums
   (rbucket = doc_id // range_size — contiguous key ranges, so bucket
   order IS key order); the exchange carries one row per (block,
   rbucket);
2. driver-side exclusive scan over the per-bucket totals — bounded by
   n_docs / range_size rows and guarded LOUDLY by ``max_rbuckets``
   (at 10¹² docs, raise ``range_size`` or add a tree level; the scan
   state is the only non-distributed piece and it is measured, not
   assumed);
3. per-bucket finalize: sort the bucket's docs by doc_id, in-bucket
   cumulative sum + the broadcast bucket offset → shard id.

The documents table is read twice (steps 1 and 3) — re-tokenizing is a
cheap vectorized regex count, cheaper at scale than materializing
(doc_id, n_tok) through an extra exchange.

Overflow honesty: shard = cum·K // T is evaluated vectorized in int64
only when T·K < 2⁶³ (checked on the driver against the MEASURED total);
otherwise the per-bucket finalize falls back to exact Python-int
arithmetic.  The oracle computes in HUGEINT either way.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .common import read_table, pool

__all__ = ['doc_shard_assign', 'SHARD_ASSIGN_SQL_TMPL',
           'shard_assign_oracle_sql', 'shard_balance',
           'shard_balance_oracle_sql']

_TOKEN_RE = r'\S+'   # the repo-wide tokenize rule (textstats.TOKEN_RE)


def doc_shard_assign(sf_dir, n_shards=8, range_size=4096,
                     max_rbuckets=1 << 20):
    """(doc_id, n_tok, cum_excl, shard) for every document."""
    K = int(n_shards)

    def counts(batch: pa.Table) -> pa.Table:
        ids = batch.column('doc_id')
        n_tok = pc.cast(pc.count_substring_regex(batch.column('text'),
                                                 pattern=_TOKEN_RE),
                        pa.int64())
        return pa.table({
            'doc_id': ids,
            'n_tok': n_tok,
            'rbucket': pc.divide(ids, pa.scalar(range_size, pa.int64())),
        })

    def bucket_sums(batch: pa.Table) -> pa.Table:
        g = batch.select(['rbucket', 'n_tok']).group_by('rbucket') \
                 .aggregate([('n_tok', 'sum')])
        return g.rename_columns(['rbucket', 'tok_sum'])

    _, width = pool()
    base = read_table(sf_dir, 'documents', columns=['doc_id', 'text'],
                      min_blocks=width)

    # step 1+2: per-bucket totals → driver-side exclusive scan (tiny by
    # construction, loudly guarded — this fold is one row per rbucket)
    parts = [t for t in ray.get(
        base.map_batches(counts, batch_format='pyarrow',
                         zero_copy_batch=True)
            .map_batches(bucket_sums, batch_format='pyarrow')
            .groupby('rbucket')
            .map_groups(lambda g: g.group_by('rbucket')
                        .aggregate([('tok_sum', 'sum')])
                        .rename_columns(['rbucket', 'tok_sum']),
                        batch_format='pyarrow')
            .to_arrow_refs()) if t.num_rows]
    totals = pa.concat_tables(parts) if parts else \
        pa.table({'rbucket': pa.array([], pa.int64()),
                  'tok_sum': pa.array([], pa.int64())})
    if totals.num_rows > max_rbuckets:
        raise RuntimeError(
            'doc_shard_assign: %d range buckets exceeds max_rbuckets=%d; '
            'raise range_size (driver scan state is bounded by '
            'n_docs/range_size)' % (totals.num_rows, max_rbuckets))
    rb = totals.column('rbucket').to_numpy(zero_copy_only=False)
    ts = totals.column('tok_sum').to_numpy(zero_copy_only=False)
    order = np.argsort(rb, kind='stable')
    rb, ts = rb[order], ts[order]
    # exact exclusive scan in Python ints (bucket totals can exceed what
    # a float carries; int64 cumsum is fine until ~9e18 total tokens,
    # checked below together with the multiply bound)
    offs, acc = [], 0
    for v in ts:
        offs.append(acc)
        acc += int(v)
    total = acc
    offsets = {int(b): o for b, o in zip(rb, offs)}
    vec_ok = total == 0 or total * K < (1 << 63)
    offsets_ref = ray.put(offsets)

    def finalize(group: pa.Table) -> pa.Table:
        ids = group.column('doc_id').to_numpy(zero_copy_only=False)
        nt = group.column('n_tok').to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind='stable')
        ids, nt = ids[order], nt[order]
        off = ray.get(offsets_ref)[int(ids[0]) // range_size] if len(ids) \
            else 0
        if total == 0:
            shard = np.zeros(len(ids), np.int64)
            cume = np.zeros(len(ids), np.int64)
        elif vec_ok:
            cume = off + np.cumsum(nt) - nt
            shard = np.minimum(cume * K // total, K - 1)
        else:
            cume_l, acc2 = [], off
            for v in nt:
                cume_l.append(acc2)
                acc2 += int(v)
            shard = np.array([min(c * K // total, K - 1) for c in cume_l],
                             np.int64)
            cume = np.array(cume_l, np.int64)
        return pa.table({
            'doc_id': pa.array(ids, pa.int64()),
            'n_tok': pa.array(nt, pa.int64()),
            'cum_excl': pa.array(cume, pa.int64()),
            'shard': pa.array(shard, pa.int64()),
        })

    return base.map_batches(counts, batch_format='pyarrow',
                            zero_copy_batch=True) \
               .groupby('rbucket').map_groups(finalize,
                                              batch_format='pyarrow')


SHARD_ASSIGN_SQL_TMPL = """
WITH d AS (
  SELECT doc_id, len(regexp_extract_all(text, '\\S+'))::BIGINT AS n_tok
  FROM documents
), c AS (
  SELECT doc_id, n_tok,
         coalesce(sum(n_tok) OVER (ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0)::BIGINT AS cum_excl
  FROM d
), t AS (SELECT coalesce(sum(n_tok), 0)::BIGINT AS total FROM d)
SELECT doc_id, n_tok, cum_excl,
       (CASE WHEN t.total = 0 THEN 0
             ELSE least((cum_excl::HUGEINT * {K}) // t.total,
                        {K} - 1) END)::BIGINT AS shard
FROM c, t
"""


def shard_assign_oracle_sql(n_shards=8):
    return SHARD_ASSIGN_SQL_TMPL.format(K=int(n_shards))


def shard_balance(sf_dir, n_shards=8, range_size=4096):
    """BALANCE AUDIT over :func:`doc_shard_assign` — per shard: doc and
    token totals (the number a loader owner checks before trusting the
    sharding: max/min shard mass should be ~1 ± max_doc/shard_size).
    Pure integer combiner over the assignment output; one tiny keyed
    exchange."""
    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(['shard', 'n_tok']).group_by('shard') \
                 .aggregate([('n_tok', 'sum'), ([], 'count_all')])
        return g.rename_columns(['shard', 'sum_tokens', 'n_docs'])

    def fold(group: pa.Table) -> pa.Table:
        g = group.group_by('shard').aggregate(
            [('sum_tokens', 'sum'), ('n_docs', 'sum')])
        return pa.table({
            'shard': g.column('shard'),
            'n_docs': g.column('n_docs_sum').cast(pa.int64()),
            'sum_tokens': g.column('sum_tokens_sum').cast(pa.int64()),
        })

    return doc_shard_assign(sf_dir, n_shards=n_shards,
                            range_size=range_size) \
        .map_batches(partial, batch_format='pyarrow',
                     zero_copy_batch=True) \
        .groupby('shard').map_groups(fold, batch_format='pyarrow')


def shard_balance_oracle_sql(n_shards=8):
    return """
WITH a AS ({a}
)
SELECT shard, count(*)::BIGINT AS n_docs,
       sum(n_tok)::BIGINT AS sum_tokens
FROM a GROUP BY shard
""".format(a=SHARD_ASSIGN_SQL_TMPL.format(K=int(n_shards)).strip())
