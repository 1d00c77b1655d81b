"""Conversation-level statistics over the TRANSCRIPTS corpus — the
flagship's own input table (BASELINE.json input_hint shape: conv_id,
turn_idx, role, text, tool, ts).  The per-conversation rollup (turn
count, distinct roles, tool-call turns, total text bytes) is the first
query any transcript-corpus owner runs, and it exercises a string-keyed
combiner-first aggregate with a count-DISTINCT inside: per-block
partials are folded per (conv_id, role) so the exchange carries at most
conversations × roles rows per block, never turns — at 10¹² turns the
shuffle width is the conversation count, not the corpus.
"""

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .textstats import _string_bucket

__all__ = ['conv_stats', 'conv_stats_oracle_sql',
           'conv_text_md5', 'conv_text_oracle_sql',
           'conv_role_transitions', 'conv_role_transitions_oracle_sql',
           'conv_tool_usage', 'conv_tool_usage_oracle_sql',
           'conv_turn_gaps', 'conv_turn_gaps_oracle_sql',
           'conv_split_manifest', 'conv_split_oracle_sql',
           'conv_first_tool', 'conv_first_tool_oracle_sql',
           'conv_pack_manifest', 'conv_pack_oracle_sql',
           'conv_near_dup', 'conv_near_dup_oracle_sql',
           'conv_near_dup_lsh', 'conv_near_dup_lsh_oracle_sql',
           'conv_context_growth', 'conv_context_growth_oracle_sql',
           'tool_transition_matrix', 'tool_transition_oracle_sql',
           'conv_role_token_stats', 'conv_role_token_oracle_sql',
           'conv_boilerplate_turns', 'conv_boilerplate_oracle_sql',
           'conv_dedup_clusters', 'conv_dedup_clusters_oracle_sql']


def conv_stats(corpus_dir, num_buckets=64):
    """Per-conversation (n_turns, n_roles, n_tool_turns, n_chars)."""
    nb = num_buckets

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            'conv_id': batch.column('conv_id'),
            'role': batch.column('role'),
            'n_chars': pc.cast(pc.utf8_length(batch.column('text')),
                               pa.int64()),
            'n_tool': pc.cast(pc.not_equal(batch.column('tool'), ''),
                              pa.int64()),
        })
        g = t.group_by(['conv_id', 'role']).aggregate(
            [('n_chars', 'sum'), ('n_tool', 'sum'), ([], 'count_all')])
        g = g.rename_columns(['conv_id', 'role', 'n_chars', 'n_tool',
                              'n_turns'])
        return g.append_column('bucket',
                               _string_bucket(g.column('conv_id'), nb))

    def bucket_fold(group: pa.Table) -> pa.Table:
        per_role = group.group_by(['conv_id', 'role']).aggregate(
            [('n_chars', 'sum'), ('n_tool', 'sum'), ('n_turns', 'sum')])
        per_role = per_role.rename_columns(
            ['conv_id', 'role', 'n_chars', 'n_tool', 'n_turns'])
        g = per_role.group_by('conv_id').aggregate(
            [('n_turns', 'sum'), ([], 'count_all'), ('n_tool', 'sum'),
             ('n_chars', 'sum')])
        return pa.table({
            'conv_id': g.column('conv_id'),
            'n_turns': g.column('n_turns_sum').cast(pa.int64()),
            'n_roles': g.column('count_all').cast(pa.int64()),
            'n_tool_turns': g.column('n_tool_sum').cast(pa.int64()),
            'n_chars': g.column('n_chars_sum').cast(pa.int64()),
        })

    ds = ray.data.read_parquet(corpus_dir,
                               columns=['conv_id', 'role', 'text', 'tool'])
    return ds.map_batches(partial, batch_format='pyarrow',
                          zero_copy_batch=True) \
             .groupby('bucket').map_groups(bucket_fold,
                                           batch_format='pyarrow')


def conv_stats_oracle_sql(corpus_dir):
    """DuckDB over the SAME corpus parquet files."""
    return """
SELECT conv_id, count(*)::BIGINT AS n_turns,
       count(DISTINCT role)::BIGINT AS n_roles,
       count(*) FILTER (WHERE tool <> '')::BIGINT AS n_tool_turns,
       sum(length(text))::BIGINT AS n_chars
FROM read_parquet('{corpus}/*.parquet')
GROUP BY conv_id
""".format(corpus=corpus_dir)


def conv_text_md5(corpus_dir, num_buckets=64):
    """DOCUMENT ASSEMBLY over the flagship's input table: concatenate
    each conversation's turns in stable (turn_idx) order into one
    document and emit its md5 + length — the corpus-building step that
    turns a turn-level log back into trainable documents (the md5 keeps
    the comparable surface small; a real run would emit the text).

    One bucketed exchange of (conv_id, turn_idx, text); per bucket one
    lexsort + ListArray-from-run-offsets + Arrow ``binary_join`` with a
    newline separator — assembly never loops over conversations.  Skew
    bound = the largest single conversation, the same contract as the
    flagship compaction stage."""
    import hashlib

    import numpy as np

    nb = num_buckets

    def add_bucket(batch: pa.Table) -> pa.Table:
        t = batch.select(['conv_id', 'turn_idx', 'text'])
        return t.append_column('bucket',
                               _string_bucket(t.column('conv_id'), nb))

    def assemble(group: pa.Table) -> pa.Table:
        conv = group.column('conv_id').to_numpy(zero_copy_only=False)
        tidx = group.column('turn_idx').to_numpy(zero_copy_only=False)
        order = np.lexsort((tidx, conv))
        c = conv[order]
        text = group.column('text').take(pa.array(order, pa.int64()))
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        offsets = np.r_[starts, len(c)].astype(np.int64)
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()),
            pc.cast(text.combine_chunks(), pa.large_string()))
        joined = pc.binary_join(lists, pa.scalar('\n', pa.large_string()))
        # hash straight off the Arrow value buffer (zero-copy slices of
        # the already-utf-8 data) — a to_pylist() here would duplicate
        # the bucket's entire assembled text as Python strings
        joff = np.frombuffer(joined.buffers()[1], np.int64,
                             len(joined) + 1, joined.offset * 8)
        jdata = memoryview(joined.buffers()[2])
        md5s = [hashlib.md5(jdata[joff[i]:joff[i + 1]]).hexdigest()
                for i in range(len(joined))]
        return pa.table({
            'conv_id': pa.array(c[starts].tolist(), pa.string()),
            'n_turns': pa.array(np.diff(offsets), pa.int64()),
            'doc_len': pc.cast(pc.utf8_length(joined), pa.int64()),
            'doc_md5': pa.array(md5s, pa.string()),
        })

    ds = ray.data.read_parquet(corpus_dir,
                               columns=['conv_id', 'turn_idx', 'text'])
    return ds.map_batches(add_bucket, batch_format='pyarrow',
                          zero_copy_batch=True) \
             .groupby('bucket').map_groups(assemble,
                                           batch_format='pyarrow')


def conv_text_oracle_sql(corpus_dir):
    """DuckDB assembles the same documents with an ordered string_agg."""
    return """
SELECT conv_id, count(*)::BIGINT AS n_turns,
       length(string_agg(text, chr(10) ORDER BY turn_idx))::BIGINT
         AS doc_len,
       md5(string_agg(text, chr(10) ORDER BY turn_idx)) AS doc_md5
FROM read_parquet('{corpus}/*.parquet')
GROUP BY conv_id
""".format(corpus=corpus_dir)


def conv_role_transitions(corpus_dir, num_buckets=64):
    """DIALOGUE-STRUCTURE audit over the flagship's input table: the
    role-bigram transition counts (role_from, role_to, n) across all
    conversations, each ordered by turn_idx — the Markov view of the
    corpus a transcript owner checks before training on tool-use data
    (are there assistant→assistant runs? user→tool jumps?).

    Same partitioning contract as :func:`conv_text_md5`: one bucketed
    exchange keyed by conv_id (a conversation's turns land in ONE
    group), per bucket one lexsort + a vectorized shift compare — the
    adjacent-pair extraction never loops over conversations.  Bucket
    partials are (roles × roles)-sized, so the final fold's exchange is
    bounded by num_buckets × 9 rows regardless of corpus size."""
    import numpy as np

    nb = num_buckets

    def add_bucket(batch: pa.Table) -> pa.Table:
        t = batch.select(['conv_id', 'turn_idx', 'role'])
        return t.append_column('bucket',
                               _string_bucket(t.column('conv_id'), nb))

    def pairs(group: pa.Table) -> pa.Table:
        conv = group.column('conv_id').to_numpy(zero_copy_only=False)
        tidx = group.column('turn_idx').to_numpy(zero_copy_only=False)
        role = group.column('role').to_numpy(zero_copy_only=False)
        order = np.lexsort((tidx, conv))
        c, r = conv[order], role[order]
        same = c[1:] == c[:-1]
        t = pa.table({
            'role_from': pa.array(r[:-1][same], pa.string()),
            'role_to': pa.array(r[1:][same], pa.string()),
        })
        g = t.group_by(['role_from', 'role_to']).aggregate(
            [([], 'count_all')])
        g = g.rename_columns(['role_from', 'role_to', 'n'])
        # all partials fold in one tiny final group
        return g.append_column('fbucket',
                               pa.array(np.zeros(g.num_rows, np.int64)))

    def fold(group: pa.Table) -> pa.Table:
        g = group.group_by(['role_from', 'role_to']).aggregate(
            [('n', 'sum')])
        return pa.table({
            'role_from': g.column('role_from'),
            'role_to': g.column('role_to'),
            'n': g.column('n_sum').cast(pa.int64()),
        })

    ds = ray.data.read_parquet(corpus_dir,
                               columns=['conv_id', 'turn_idx', 'role'])
    return ds.map_batches(add_bucket, batch_format='pyarrow',
                          zero_copy_batch=True) \
             .groupby('bucket').map_groups(pairs, batch_format='pyarrow') \
             .groupby('fbucket').map_groups(fold, batch_format='pyarrow')


def conv_role_transitions_oracle_sql(corpus_dir):
    """DuckDB recomputes the bigrams with a window lead()."""
    return """
WITH o AS (
  SELECT role,
         lead(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS role_to
  FROM read_parquet('{corpus}/*.parquet')
)
SELECT role AS role_from, role_to, count(*)::BIGINT AS n
FROM o WHERE role_to IS NOT NULL
GROUP BY role, role_to
""".format(corpus=corpus_dir)


def conv_tool_usage(corpus_dir, num_buckets=64):
    """TOOL-USAGE audit over the transcripts corpus: per tool, the turn
    count, the number of DISTINCT conversations using it, and its share
    of all tool turns — what a tool-use-training owner checks before
    weighting tool trajectories ('' rows — non-tool turns — are
    excluded).  share is one division of int64-exact operands, r6.

    Shape: per-block (conv, tool) distinct+count combiner →
    conv-bucketed exchange (a conversation lives in one bucket, so
    per-bucket distinct-conv counts SUM globally) → per-(bucket, tool)
    partials → one tiny tool-keyed fold."""
    import numpy as np

    from .common import round_half_up

    nb = num_buckets

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(['conv_id', 'tool']) \
                 .filter(pc.not_equal(batch.column('tool'), ''))
        g = t.group_by(['conv_id', 'tool']).aggregate([([], 'count_all')])
        g = g.rename_columns(['conv_id', 'tool', 'n_turns'])
        return g.append_column('bucket',
                               _string_bucket(g.column('conv_id'), nb))

    def bucket_fold(group: pa.Table) -> pa.Table:
        per_ct = group.group_by(['conv_id', 'tool']).aggregate(
            [('n_turns', 'sum')])
        g = per_ct.group_by('tool').aggregate(
            [('n_turns_sum', 'sum'), ([], 'count_all')])
        g = g.rename_columns(['tool', 'n_turns', 'n_convs'])
        return g.append_column('fbucket',
                               _string_bucket(g.column('tool'), 8))

    def fold(group: pa.Table) -> pa.Table:
        g = group.group_by('tool').aggregate([('n_turns', 'sum'),
                                              ('n_convs', 'sum')])
        return pa.table({
            'tool': g.column('tool'),
            'n_turns': g.column('n_turns_sum').cast(pa.int64()),
            'n_convs': g.column('n_convs_sum').cast(pa.int64()),
        })

    ds = ray.data.read_parquet(corpus_dir, columns=['conv_id', 'tool'])
    per_tool = ds.map_batches(partial, batch_format='pyarrow',
                              zero_copy_batch=True) \
        .groupby('bucket').map_groups(bucket_fold,
                                      batch_format='pyarrow') \
        .groupby('fbucket').map_groups(fold, batch_format='pyarrow')
    # total tool turns: fold the tiny per-tool table driver-side for the
    # share column (rows = distinct tools, bounded by the tool registry)
    import ray as _ray
    from .common import concat_tables_or_empty
    tbl = concat_tables_or_empty(
        _ray.get(per_tool.to_arrow_refs()),
        pa.schema([('tool', pa.string()), ('n_turns', pa.int64()),
                   ('n_convs', pa.int64())]))
    nt = tbl.column('n_turns').to_numpy(zero_copy_only=False) \
            .astype(np.int64)
    total = int(nt.sum())
    share = round_half_up(nt.astype(np.float64) / np.float64(max(total, 1)),
                          6) if total > 0 else np.zeros(len(nt))
    return tbl.append_column('share', pa.array(share, pa.float64()))


def conv_tool_usage_oracle_sql(corpus_dir):
    return """
WITH t AS (
  SELECT tool, count(*)::BIGINT AS n_turns,
         count(DISTINCT conv_id)::BIGINT AS n_convs
  FROM read_parquet('{corpus}/*.parquet')
  WHERE tool <> ''
  GROUP BY tool
)
SELECT tool, n_turns, n_convs,
       floor(CAST(n_turns AS DOUBLE)
             / CAST((SELECT sum(n_turns) FROM t) AS DOUBLE)
             * 1000000 + 0.5) / 1000000 AS share
FROM t
""".format(corpus=corpus_dir)


def conv_turn_gaps(corpus_dir, num_buckets=64):
    """INTER-TURN LATENCY rollup over the flagship's input table: per
    conversation, the turn count, the LARGEST gap between consecutive
    turns (in turn_idx order) and the mean gap — the cadence audit an
    agent-transcript owner runs to find stalled sessions and
    segmentation bugs (a huge max_gap inside one conv_id usually means
    two sessions were glued together).  Output: (conv_id, n_turns,
    max_gap_us, mean_gap_us r6); single-turn conversations have NULL
    gaps.

    Shape: one conv-bucketed exchange of (conv_id, turn_idx, ts) rows
    (row-cardinality, the conv_text_md5 contract — skew bound = the
    largest single conversation); per bucket one lexsort + vectorized
    run arithmetic (np.diff + maximum.at), no per-conversation Python.
    Gaps are int64 µs end-to-end; the mean telescopes to
    (ts_last − ts_first)/(n−1) — one float division of int64-exact
    operands, half-up r6."""
    import numpy as np

    from .common import round_half_up

    nb = num_buckets

    def add_bucket(batch: pa.Table) -> pa.Table:
        t = batch.select(['conv_id', 'turn_idx', 'ts'])
        return t.append_column('bucket',
                               _string_bucket(t.column('conv_id'), nb))

    def fold(group: pa.Table) -> pa.Table:
        conv = group.column('conv_id').to_numpy(zero_copy_only=False)
        tidx = group.column('turn_idx').to_numpy(zero_copy_only=False)
        ts = group.column('ts').to_numpy(zero_copy_only=False) \
                  .view(np.int64)
        order = np.lexsort((tidx, conv))
        c, t = conv[order], ts[order]
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        ends = np.r_[starts[1:], len(c)]
        n = (ends - starts).astype(np.int64)
        d = np.diff(t)
        valid = np.ones(max(len(c) - 1, 0), bool)
        if len(starts) > 1:
            valid[starts[1:] - 1] = False
        run_of_gap = np.repeat(np.arange(len(starts)), n)[1:][valid] \
            if len(c) > 1 else np.zeros(0, np.int64)
        maxg = np.full(len(starts), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(maxg, run_of_gap, d[valid])
        has = n > 1
        span = t[ends - 1] - t[starts]
        mean = np.where(has, round_half_up(
            span.astype(np.float64) / np.maximum(n - 1, 1).astype(np.float64),
            6), 0.0)
        return pa.table({
            'conv_id': pa.array(c[starts]),
            'n_turns': pa.array(n, pa.int64()),
            'max_gap_us': pa.array(maxg, pa.int64(), mask=~has),
            'mean_gap_us': pa.array(mean, pa.float64(), mask=~has),
        })

    ds = ray.data.read_parquet(corpus_dir,
                               columns=['conv_id', 'turn_idx', 'ts'])
    return ds.map_batches(add_bucket, batch_format='pyarrow',
                          zero_copy_batch=True) \
             .groupby('bucket').map_groups(fold, batch_format='pyarrow')


def conv_turn_gaps_oracle_sql(corpus_dir):
    """DuckDB over the SAME corpus parquet files: lag() gaps in turn_idx
    order; sum(gap) telescopes to the engine's span, count(gap) = n−1."""
    return """
WITH g AS (
  SELECT conv_id,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap
  FROM read_parquet('{corpus}/*.parquet')
)
SELECT conv_id, count(*)::BIGINT AS n_turns,
       max(gap)::BIGINT AS max_gap_us,
       CASE WHEN count(gap) > 0
            THEN floor(sum(gap)::DOUBLE / count(gap)::DOUBLE
                       * 1000000 + 0.5) / 1000000
            ELSE NULL END AS mean_gap_us
FROM g GROUP BY conv_id
""".format(corpus=corpus_dir)


def conv_split_manifest(corpus_dir, val_pct=5, test_pct=5, num_buckets=64):
    """CONVERSATION-GRANULAR train/val/test split manifest over the
    flagship's input table — the transcripts counterpart of
    sampling.split_manifest with the integrity constraint that matters
    here: a conversation NEVER spans splits (turn-level splitting leaks
    dialogue context across the boundary).  Deterministic md5(conv_id)
    keying, so any node can recompute any conversation's split without
    coordination.  Output: (split, n_convs, n_turns, n_chars).

    Shape: per-block (conv_id, counts) combiner → conv-bucketed
    exchange so each conversation's distinct-ness resolves in one
    bucket → ≤ 3 rows per bucket fold driver-side via one tiny final
    groupby.  All integers."""
    import hashlib

    import numpy as np

    nb = num_buckets

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            'conv_id': batch.column('conv_id'),
            'n_chars': pc.cast(pc.utf8_length(batch.column('text')),
                               pa.int64()),
        })
        g = t.group_by('conv_id').aggregate([('n_chars', 'sum'),
                                             ([], 'count_all')])
        g = g.rename_columns(['conv_id', 'n_chars', 'n_turns'])
        return g.append_column('bucket',
                               _string_bucket(g.column('conv_id'), nb))

    def fold(group: pa.Table) -> pa.Table:
        g = group.group_by('conv_id').aggregate([('n_chars', 'sum'),
                                                 ('n_turns', 'sum')])
        convs = g.column('conv_id').to_pylist()
        # md5_number_lower(conv_id) % 100 percent bucket (the
        # common.hash63_keys byte rule: LAST 8 digest bytes
        # little-endian): < test → test, < test+val → val, else train
        pcts = np.array([int.from_bytes(
            hashlib.md5(c.encode('utf-8')).digest()[8:16], 'little') % 100
            for c in convs], np.uint64).astype(np.int64)
        split = np.where(pcts < test_pct, 'test',
                         np.where(pcts < test_pct + val_pct, 'val',
                                  'train'))
        t = pa.table({
            'split': pa.array(split.tolist(), pa.string()),
            'n_chars': g.column('n_chars_sum').cast(pa.int64()),
            'n_turns': g.column('n_turns_sum').cast(pa.int64()),
        })
        s = t.group_by('split').aggregate([([], 'count_all'),
                                           ('n_turns', 'sum'),
                                           ('n_chars', 'sum')])
        return s.rename_columns(['split', 'n_convs', 'n_turns', 'n_chars'])

    def final(group: pa.Table) -> pa.Table:
        g = group.group_by('split').aggregate([('n_convs', 'sum'),
                                               ('n_turns', 'sum'),
                                               ('n_chars', 'sum')])
        return pa.table({
            'split': g.column('split'),
            'n_convs': g.column('n_convs_sum').cast(pa.int64()),
            'n_turns': g.column('n_turns_sum').cast(pa.int64()),
            'n_chars': g.column('n_chars_sum').cast(pa.int64()),
        })

    ds = ray.data.read_parquet(corpus_dir, columns=['conv_id', 'text'])
    return ds.map_batches(partial, batch_format='pyarrow',
                          zero_copy_batch=True) \
        .groupby('bucket').map_groups(fold, batch_format='pyarrow') \
        .groupby('split').map_groups(final, batch_format='pyarrow')


def conv_split_oracle_sql(corpus_dir, val_pct=5, test_pct=5):
    """DuckDB over the SAME corpus: the percent key is
    md5_number_lower(conv_id) % 100 (last 8 digest bytes little-endian
    — the common.hash63_keys byte rule)."""
    return """
WITH c AS (
  SELECT conv_id, count(*)::BIGINT AS n_turns,
         sum(length(text))::BIGINT AS n_chars,
         md5_number_lower(conv_id) % 100 AS pct
  FROM read_parquet('{corpus}/*.parquet')
  GROUP BY conv_id
)
SELECT CASE WHEN pct < {test} THEN 'test'
            WHEN pct < {test} + {val} THEN 'val'
            ELSE 'train' END AS split,
       count(*)::BIGINT AS n_convs,
       sum(n_turns)::BIGINT AS n_turns,
       sum(n_chars)::BIGINT AS n_chars
FROM c GROUP BY 1
""".format(corpus=corpus_dir, test=test_pct, val=val_pct)


def conv_first_tool(corpus_dir, num_buckets=64):
    """TIME-TO-FIRST-TOOL-CALL per conversation — the agent-behavior
    metric a transcript owner tracks across model versions (how many
    turns, and how much wall time, before the agent reaches for a
    tool).  Output: (conv_id, first_tool_turn, first_tool, us_to_tool)
    for conversations that call at least one tool; turns are compared
    by turn_idx, the clock starts at the conversation's FIRST turn's
    ts (by turn_idx, not min ts — out-of-order timestamps are data,
    not noise).

    Shape: map-side filter to tool turns + per-conv min fold, one
    conv-bucketed co-partition with the per-conv first-turn rows —
    the exchange carries two combiner rows per conversation, never
    turns."""
    import numpy as np

    nb = num_buckets

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            'conv_id': batch.column('conv_id'),
            'turn_idx': pc.cast(batch.column('turn_idx'), pa.int64()),
            'tool': batch.column('tool'),
            'ts_us': pa.array(batch.column('ts')
                              .to_numpy(zero_copy_only=False)
                              .view(np.int64), pa.int64()),
        })
        # side 1: first turn per conversation (clock origin)
        f = t.sort_by([('conv_id', 'ascending'), ('turn_idx', 'ascending')]) \
             .group_by('conv_id', use_threads=False) \
             .aggregate([('turn_idx', 'first'), ('ts_us', 'first')])
        f = f.rename_columns(['conv_id', 'turn_idx', 'ts_us'])
        first = pa.table({
            'conv_id': f.column('conv_id'),
            'turn_idx': f.column('turn_idx'),
            'tool': pa.nulls(f.num_rows, pa.string()),
            'ts_us': f.column('ts_us'),
        })
        # side 2: first TOOL turn per conversation
        tt = t.filter(pc.not_equal(t.column('tool'), ''))
        g = tt.sort_by([('conv_id', 'ascending'),
                        ('turn_idx', 'ascending')]) \
              .group_by('conv_id', use_threads=False) \
              .aggregate([('turn_idx', 'first'), ('tool', 'first'),
                          ('ts_us', 'first')])
        g = g.rename_columns(['conv_id', 'turn_idx', 'tool', 'ts_us'])
        both = pa.concat_tables([first, g.select(
            ['conv_id', 'turn_idx', 'tool', 'ts_us'])])
        return both.append_column(
            'bucket', _string_bucket(both.column('conv_id'), nb))

    def fold(group: pa.Table) -> pa.Table:
        is_first = pc.is_null(group.column('tool'))
        f = group.filter(is_first) \
                 .sort_by([('conv_id', 'ascending'),
                           ('turn_idx', 'ascending')]) \
                 .group_by('conv_id', use_threads=False) \
                 .aggregate([('ts_us', 'first')])
        f = f.rename_columns(['conv_id', 'ts0'])
        g = group.filter(pc.invert(is_first)) \
                 .sort_by([('conv_id', 'ascending'),
                           ('turn_idx', 'ascending')]) \
                 .group_by('conv_id', use_threads=False) \
                 .aggregate([('turn_idx', 'first'), ('tool', 'first'),
                             ('ts_us', 'first')])
        g = g.rename_columns(['conv_id', 'first_tool_turn', 'first_tool',
                              'ts_tool'])
        j = g.join(f, keys='conv_id', join_type='inner')
        return pa.table({
            'conv_id': j.column('conv_id'),
            'first_tool_turn': j.column('first_tool_turn'),
            'first_tool': j.column('first_tool'),
            'us_to_tool': pc.subtract(j.column('ts_tool'),
                                      j.column('ts0')),
        })

    ds = ray.data.read_parquet(corpus_dir,
                               columns=['conv_id', 'turn_idx', 'tool',
                                        'ts'])
    return ds.map_batches(partial, batch_format='pyarrow',
                          zero_copy_batch=True) \
             .groupby('bucket').map_groups(fold, batch_format='pyarrow')


def conv_first_tool_oracle_sql(corpus_dir):
    return """
WITH t AS (
  SELECT conv_id, turn_idx, tool, epoch_us(ts) AS ts_us,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS rn_all
  FROM read_parquet('{corpus}/*.parquet')
), f AS (
  SELECT conv_id, ts_us AS ts0 FROM t WHERE rn_all = 1
), g AS (
  SELECT conv_id, turn_idx AS first_tool_turn, tool AS first_tool,
         ts_us AS ts_tool,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS rn
  FROM t WHERE tool <> ''
)
SELECT g.conv_id, g.first_tool_turn::BIGINT AS first_tool_turn,
       g.first_tool, (g.ts_tool - f.ts0)::BIGINT AS us_to_tool
FROM g JOIN f USING (conv_id) WHERE g.rn = 1
""".format(corpus=corpus_dir)


def conv_pack_manifest(corpus_dir, budget=512, num_buckets=64):
    """SEQUENCE PACKING manifest: greedily pack each conversation's
    turns, in turn_idx order, into training chunks of at most
    ``budget`` whitespace tokens — the planning pass every LLM trainer
    runs before tokenize-and-concat (how many sequences, how full are
    they, where do chunk boundaries fall).  Packing NEVER crosses a
    conversation (context integrity, same constraint as
    conv_split_manifest) and never reorders turns.  A single turn
    longer than the budget forms its own oversized chunk (a chunk
    always holds >= 1 turn).  Output: (conv_id, chunk_idx 0-based,
    first_turn, n_turns, n_tokens).

    Shape: the exchange carries (conv_id, turn_idx, tok) rows —
    row-cardinality, the conv_turn_gaps contract (skew bound = the
    largest single conversation).  Per bucket: ONE lexsort, a global
    no-reset cumsum, then a rounds loop that advances EVERY active
    conversation one chunk per iteration via a single vectorized
    np.searchsorted over the monotone cumsum — iterations = max chunks
    per conversation in the bucket, each O(active * log rows), so the
    total boundary work is O(total_chunks * log rows), near-linear in
    rows/budget even for one giant conversation.  All integers; no
    per-turn and no per-conversation Python."""
    import numpy as np

    from .textstats import TOKEN_RE
    nb = num_buckets
    B = int(budget)

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            'conv_id': batch.column('conv_id'),
            'turn_idx': pc.cast(batch.column('turn_idx'), pa.int64()),
            'tok': pc.cast(pc.count_substring_regex(
                batch.column('text'), pattern=TOKEN_RE), pa.int64()),
        })
        return t.append_column('bucket',
                               _string_bucket(t.column('conv_id'), nb))

    def fold(group: pa.Table) -> pa.Table:
        conv = group.column('conv_id').to_numpy(zero_copy_only=False)
        tidx = group.column('turn_idx').to_numpy(zero_copy_only=False)
        tok = group.column('tok').to_numpy(zero_copy_only=False)
        order = np.lexsort((tidx, conv))
        conv, tidx, tok = conv[order], tidx[order], tok[order]
        n = len(conv)
        # conversation segments over the sorted rows
        uniq, seg_start = np.unique(conv, return_index=True)
        seg_end = np.r_[seg_start[1:], n]
        cum = np.cumsum(tok, dtype=np.int64)          # global, monotone
        # rounds loop: every active conversation emits one chunk/round
        starts = np.zeros(n, np.int64)                # 1 at chunk starts
        p = seg_start.copy()
        active = p < seg_end
        while active.any():
            pa_, ea = p[active], seg_end[active]
            starts[pa_] = 1
            prev = np.where(pa_ > 0, cum[pa_ - 1], 0)
            e = np.searchsorted(cum, prev + B, side='right')
            e = np.minimum(np.maximum(e, pa_ + 1), ea)
            p[active] = e
            active = p < seg_end
        # chunk_idx per row = chunk starts seen so far within the conv
        glob = np.cumsum(starts) - 1                  # global chunk id
        chunk0 = glob[seg_start]                      # first chunk per conv
        conv_row = np.repeat(np.arange(len(uniq)), seg_end - seg_start)
        chunk_idx = glob - chunk0[conv_row]
        t = pa.table({
            'conv_id': pa.array(conv),
            'chunk_idx': pa.array(chunk_idx, pa.int64()),
            'turn_idx': pa.array(tidx, pa.int64()),
            'tok': pa.array(tok, pa.int64()),
        })
        g = t.group_by(['conv_id', 'chunk_idx']).aggregate(
            [('turn_idx', 'min'), ([], 'count_all'), ('tok', 'sum')])
        return pa.table({
            'conv_id': g.column('conv_id'),
            'chunk_idx': g.column('chunk_idx'),
            'first_turn': g.column('turn_idx_min').cast(pa.int64()),
            'n_turns': g.column('count_all').cast(pa.int64()),
            'n_tokens': g.column('tok_sum').cast(pa.int64()),
        })

    ds = ray.data.read_parquet(corpus_dir,
                               columns=['conv_id', 'turn_idx', 'text'])
    return ds.map_batches(partial, batch_format='pyarrow',
                          zero_copy_batch=True) \
             .groupby('bucket').map_groups(fold, batch_format='pyarrow')


def conv_pack_oracle_sql(corpus_dir, budget=512):
    """DuckDB greedy packing via a row-at-a-time recursive CTE (the
    recursion is set-based: each step advances EVERY conversation one
    turn, so depth = longest conversation) — independent semantics,
    same greedy rule: add the next turn iff acc + tok <= budget."""
    return """
WITH RECURSIVE t AS (
  SELECT conv_id, turn_idx,
         len(regexp_extract_all(text, '\\S+'))::BIGINT AS tok,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS rn
  FROM read_parquet('{corpus}/*.parquet')
), g AS (
  SELECT conv_id, rn, turn_idx, tok,
         0::BIGINT AS chunk_idx, tok AS acc
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.conv_id, t.rn, t.turn_idx, t.tok,
         CASE WHEN g.acc + t.tok <= {b} THEN g.chunk_idx
              ELSE g.chunk_idx + 1 END,
         CASE WHEN g.acc + t.tok <= {b} THEN g.acc + t.tok
              ELSE t.tok END
  FROM g JOIN t ON t.conv_id = g.conv_id AND t.rn = g.rn + 1
)
SELECT conv_id, chunk_idx, min(turn_idx)::BIGINT AS first_turn,
       count(*)::BIGINT AS n_turns, sum(tok)::BIGINT AS n_tokens
FROM g GROUP BY conv_id, chunk_idx
""".format(corpus=corpus_dir, b=int(budget))


def conv_near_dup(corpus_dir, threshold=0.5, num_buckets=64,
                  max_run=None):
    """NEAR-DUPLICATE CONVERSATIONS by turn-set Jaccard: two
    conversations are near-dups when they share most of their DISTINCT
    turn texts — the transcript-granular dedup tier (re-run sessions,
    retried agent episodes, template conversations), where
    whole-corpus minhash over concatenated text would dilute the
    per-turn structure.  Output: (conv_a, conv_b, inter, jac) for
    pairs with Jaccard >= threshold, pair ordered conv_a < conv_b.

    Shape: three bucketed exchanges, no joins, no driver state —
    1. fp-bucketed: distinct (conv, turn-fp) resolves exactly (a fp
       lives in one bucket); per-fp runs expand to canonical pairs
       (``common.run_pairs``, vectorized) and fold per (a, b); per-conv
       set-size partials fold per bucket.  The expansion is quadratic
       in a fp's run length — the shared_span_pairs contract:
       boilerplate-heavy corpora should run exact payload dedup first.
       The contract is now OBSERVED AND ENFORCEABLE (the minhash
       ``max_band_docs`` discipline, dedup.py:288): hot-fp telemetry is
       logged per bucket, and ``max_run`` skips fingerprints shared by
       more runs than the cap with a LOUD logged drop count — dropped
       fps undercount ``inter`` (pairs may be missed or their Jaccard
       biased down), so the default ``None`` drops nothing, preserving
       oracle parity.  For boilerplate-heavy corpora at scale prefer
       :func:`conv_near_dup_lsh`, the subquadratic discovery tier.
    2. conv-bucketed: each pair row rides TWICE (keyed by a, keyed by
       b) alongside the size partials, so inter fully folds and each
       side's set size attaches in ONE exchange with no dataset reuse.
    3. pair-bucketed: the two halves meet; uni = na + nb − inter, one
       exact-operand division, r6, threshold filter (identical float
       expression to the oracle)."""
    import numpy as np

    from .common import hash63_strings, round_half_up, run_pairs
    nb = num_buckets
    thr = float(threshold)
    # resolved DRIVER-side at call time and closed over (workers don't
    # see env mutations made after the Ray cluster started)
    pair_budget = int(os.environ.get('GRAFT_NEARDUP_MAX_PAIRS',
                                     str(1 << 23)))

    def explode(batch: pa.Table) -> pa.Table:
        # md5 only the block's DISTINCT texts (dictionary encode), then
        # scatter — a boilerplate corpus hashes dozens of strings, not
        # millions of turns
        enc = pc.dictionary_encode(batch.column('text')).combine_chunks()
        dict_fps = np.asarray(
            hash63_strings(enc.dictionary.to_pylist()), np.int64)
        fps = dict_fps[enc.indices.to_numpy(zero_copy_only=False)]
        t = pa.table({'conv_id': batch.column('conv_id'),
                      'fp': pa.array(fps, pa.int64())})
        g = t.group_by(['conv_id', 'fp']).aggregate([])
        fpv = g.column('fp').to_numpy(zero_copy_only=False)
        return g.append_column('bucket', pa.array(fpv & (nb - 1),
                                                  pa.int64()))

    def fp_fold(group: pa.Table) -> pa.Table:
        # exact distinct within the fp bucket, then runs per fp.  All
        # pair work happens on DICTIONARY CODES (conv strings hashed /
        # materialized once per distinct conv per bucket, never per
        # pair — the 18M-expansion buckets of a boilerplate corpus made
        # per-pair Python the hot path).
        g = group.group_by(['fp', 'conv_id']).aggregate([])
        enc = pc.dictionary_encode(g.column('conv_id')).combine_chunks()
        # dictionary order is first-appearance; pair canonicalization
        # needs STRING order (the oracle's conv_a < conv_b), so remap
        # codes onto the sorted dictionary
        dvals = enc.dictionary.to_pylist()
        sort_perm = np.argsort(np.asarray(dvals, dtype=object),
                               kind='stable')
        rank = np.empty(len(dvals), np.int64)
        rank[sort_perm] = np.arange(len(dvals))
        code = rank[enc.indices.to_numpy(zero_copy_only=False)]
        uconv = [dvals[i] for i in sort_perm]           # string-sorted
        hkeys = (np.asarray(hash63_strings(uconv), np.int64) & (nb - 1))
        fp = g.column('fp').to_numpy(zero_copy_only=False)
        order = np.lexsort((code, fp))
        fp, code = fp[order], code[order]
        starts = np.flatnonzero(np.r_[True, fp[1:] != fp[:-1]])
        lens = np.diff(np.r_[starts, len(fp)])
        pair_code = code
        if lens.size:
            import logging
            log = logging.getLogger('engine.ops.convstats')
            max_len = int(lens.max())
            if max_len >= 1000:
                log.warning(
                    'conv_near_dup hot-fp telemetry: bucket max run %d '
                    '(%d fps >= 1000 convs) — O(m^2) pair expansion; run '
                    'exact payload dedup first or use conv_near_dup_lsh',
                    max_len, int((lens >= 1000).sum()))
            if max_run is not None and max_len > max_run:
                over = lens > max_run
                dropped = int((lens[over] * (lens[over] - 1) // 2).sum())
                log.error(
                    'conv_near_dup: SKIPPING %d fingerprints over '
                    'max_run=%d (~%d pair partials dropped; inter counts '
                    'UNDERCOUNT — pairs may be missed or biased down; '
                    'raise the cap or run exact payload dedup first)',
                    int(over.sum()), max_run, dropped)
                keep_elems = np.repeat(~over, lens)
                pair_code = code[keep_elems]
                lens = lens[~over]
            # FAIL-FAST pair budget (enforced contract, not telemetry):
            # the round-5 crossover measurement showed the uncapped
            # expansion at 4× bench scale filling a 252 GB disk with
            # pair spill over ~3 minutes before dying inside a Ray
            # shuffle — this guard converts that into an immediate,
            # actionable error.  Per-bucket budget bounds the aggregate
            # at budget × num_buckets canonical pairs (each bucket sees
            # only its own fps; a fp lives in exactly one bucket).
            budget = pair_budget
            est = int((lens.astype(np.int64) * (lens - 1) // 2).sum())
            if est > budget:
                raise ValueError(
                    'conv_near_dup: this bucket would expand to %d '
                    'candidate pairs (> GRAFT_NEARDUP_MAX_PAIRS=%d; '
                    'worst run %d convs share one turn text). The exact '
                    'tier is the VERIFY tier — for boilerplate-heavy '
                    'corpora use conv_near_dup_lsh as the discovery '
                    'tier, run conv_boilerplate_turns + payload dedup '
                    'first, set max_run to cap hot fingerprints, or '
                    'raise GRAFT_NEARDUP_MAX_PAIRS explicitly.'
                    % (est, budget, int(lens.max()) if lens.size else 0))
        ai, bi = run_pairs(lens, upper=True)
        # per-bucket pair partial counts, folded on int codes (C++)
        pg = pa.table({'a': pa.array(pair_code[ai], pa.int64()),
                       'b': pa.array(pair_code[bi], pa.int64())}) \
               .group_by(['a', 'b']).aggregate([([], 'count_all')])
        a = pg.column('a').to_numpy(zero_copy_only=False)
        b = pg.column('b').to_numpy(zero_copy_only=False)
        n_pair = pg.column('count_all').to_numpy(zero_copy_only=False) \
                   .astype(np.int64)
        # per-conv set-size partials (each (conv, fp) counted once,
        # exactly — the fp lives in this bucket only)
        sz_cnt = np.bincount(code, minlength=len(uconv)).astype(np.int64)
        conv_arr = pa.array(uconv, pa.string())
        ca = pa.concat_arrays([conv_arr.take(pa.array(a, pa.int64()))] * 2
                              + [conv_arr])
        cb = pa.concat_arrays([conv_arr.take(pa.array(b, pa.int64()))] * 2
                              + [pa.nulls(len(uconv), pa.string())])
        key = np.concatenate([hkeys[a], hkeys[b], hkeys])
        kind = np.concatenate([np.zeros(len(a), np.int64),
                               np.ones(len(a), np.int64),
                               np.full(len(uconv), 2, np.int64)])
        n = np.concatenate([n_pair, n_pair, sz_cnt])
        return pa.table({
            'key': pa.array(key, pa.int64()),
            'kind': pa.array(kind, pa.int64()),
            'ca': ca,
            'cb': cb,
            'n': pa.array(n, pa.int64()),
        })

    def _scatter_over_distinct(col, fn):
        """Apply fn over the column's DISTINCT strings, scatter back —
        per-pair-row Python is the hot path this avoids."""
        enc = pc.dictionary_encode(col).combine_chunks()
        vals = np.asarray(fn(enc.dictionary.to_pylist()), np.int64)
        return vals[enc.indices.to_numpy(zero_copy_only=False)]

    def attach_fold(group: pa.Table) -> pa.Table:
        kinds = group.column('kind')
        sizes = group.filter(pc.equal(kinds, 2)) \
                     .group_by('ca').aggregate([('n', 'sum')])
        smap = dict(zip(sizes.column('ca').to_pylist(),
                        sizes.column('n_sum').to_pylist()))
        out = []
        for half in (0, 1):
            p = group.filter(pc.equal(kinds, half)) \
                     .group_by(['ca', 'cb']).aggregate([('n', 'sum')])
            if p.num_rows == 0:
                continue
            side = p.column('ca') if half == 0 else p.column('cb')
            sz = _scatter_over_distinct(
                side, lambda vs: [int(smap[c]) for c in vs])
            ha = _scatter_over_distinct(p.column('ca'), hash63_strings)
            hb = _scatter_over_distinct(p.column('cb'), hash63_strings)
            pb = (ha * 1_000_003 + hb) & (nb - 1)
            out.append(pa.table({
                'conv_a': p.column('ca'),
                'conv_b': p.column('cb'),
                'inter': p.column('n_sum').cast(pa.int64()),
                'sz': pa.array(sz, pa.int64()),
                'half': pa.array(np.full(p.num_rows, half, np.int64)),
                'pbucket': pa.array(pb, pa.int64()),
            }))
        if not out:
            return pa.table({
                'conv_a': pa.array([], pa.string()),
                'conv_b': pa.array([], pa.string()),
                'inter': pa.array([], pa.int64()),
                'sz': pa.array([], pa.int64()),
                'half': pa.array([], pa.int64()),
                'pbucket': pa.array([], pa.int64()),
            })
        return pa.concat_tables(out)

    def pair_fold(group: pa.Table) -> pa.Table:
        g = group.group_by(['conv_a', 'conv_b']).aggregate(
            [('inter', 'max'), ('sz', 'sum')])
        inter = g.column('inter_max').to_numpy(zero_copy_only=False) \
                 .astype(np.int64)
        uni = g.column('sz_sum').to_numpy(zero_copy_only=False) \
               .astype(np.int64) - inter
        jac = inter.astype(np.float64) / uni.astype(np.float64)
        keep = jac >= thr
        return pa.table({
            'conv_a': g.column('conv_a').filter(pa.array(keep)),
            'conv_b': g.column('conv_b').filter(pa.array(keep)),
            'inter': pa.array(inter[keep], pa.int64()),
            'jac': pa.array(round_half_up(jac[keep], 6), pa.float64()),
        })

    ds = ray.data.read_parquet(corpus_dir, columns=['conv_id', 'text'])
    return ds.map_batches(explode, batch_format='pyarrow',
                          zero_copy_batch=True) \
             .groupby('bucket').map_groups(fp_fold,
                                           batch_format='pyarrow') \
             .groupby('key').map_groups(attach_fold,
                                        batch_format='pyarrow') \
             .groupby('pbucket').map_groups(pair_fold,
                                            batch_format='pyarrow')


def conv_near_dup_oracle_sql(corpus_dir, threshold=0.5):
    """DuckDB turn-set Jaccard over DISTINCT (conv_id, text) — the
    engine's md5-derived fp sets mirror the text sets exactly (md5
    injectivity, the repo-wide oracle assumption)."""
    return """
WITH t AS (
  SELECT DISTINCT conv_id, text FROM read_parquet('{corpus}/*.parquet')
), sz AS (
  SELECT conv_id, count(*)::BIGINT AS n FROM t GROUP BY conv_id
), p AS (
  SELECT a.conv_id AS ca, b.conv_id AS cb, count(*)::BIGINT AS inter
  FROM t a JOIN t b ON a.text = b.text AND a.conv_id < b.conv_id
  GROUP BY 1, 2
)
SELECT ca AS conv_a, cb AS conv_b, inter,
       floor(inter::DOUBLE / (sa.n + sb.n - inter)::DOUBLE
             * 1000000 + 0.5) / 1000000 AS jac
FROM p JOIN sz sa ON sa.conv_id = ca JOIN sz sb ON sb.conv_id = cb
WHERE inter::DOUBLE / (sa.n + sb.n - inter)::DOUBLE >= {thr}
""".format(corpus=corpus_dir, thr=repr(float(threshold)))


def conv_near_dup_lsh(corpus_dir, threshold=0.5, num_buckets=64,
                      max_band_convs=None):
    """SUBQUADRATIC discovery tier for transcript-level near-dup — the
    minhash-over-turn-fp-sets companion to :func:`conv_near_dup`, the
    same tiering the document family already has (minhash_near_dup ←
    ngram_jaccard_pairs).  Output schema and verify math are identical
    to the exact op: (conv_a, conv_b, inter, jac) for candidate pairs
    whose EXACT turn-set Jaccard >= threshold — only candidate
    GENERATION is approximate (128-perm minhash over each
    conversation's distinct turn fingerprints, 32×4 banding), so cost
    scales with conversations × BANDS instead of Σ run², and a
    boilerplate turn shared by 10⁶ conversations never expands —
    band keys derive from whole-SIGNATURE minima, not per-turn fps.

    Permutation modulus: (a·h+b) mod 2³¹−1 with h reduced mod 2³¹−1 —
    NOT the 2⁶¹−1 the document minhash uses.  With 32-bit inputs and
    a < 2³¹, a map mod 2⁶¹−1 wraps at most ⌈a·2³²/2⁶¹⌉ ≤ 4 times, so
    it is piecewise ORDER-PRESERVING and the argmin collapses onto the
    few globally-smallest hashes (measured on this corpus: 58/128
    perm agreement for a true-Jaccard-0.91 pair, 0 matching bands —
    min-wise independence gone).  Mod 2³¹−1 the map wraps ~a times
    (same pair: 120/128 agreement, 24 matching bands).

    Shape — five stages, every exchange hash-bucketed, no joins, no
    driver state:
    1. map: distinct (conv, fp63) per block, bucketed by conv hash;
    2. conv-bucketed fold: exact per-conv distinct; 128 permuted
       minima via chunked ``np.minimum.reduceat`` (vectorized over the
       whole bucket); emits 32 band rows per conv (bucketed by band
       key) + one fp-set row per conv (sorted fp63 list, bucketed by
       conv hash) for the verify tier;
    3. band-bucketed fold: multi-conv bands expand to candidate pairs
       (``run_pairs``) with the minhash ``max_band_convs`` cap — loud
       logged drop count, default None drops nothing; pairs become two
       side rows keyed by each member conv; fp-set rows pass through;
    4. conv-bucketed attach: each side row picks up its key conv's
       fp-set (distinct fold dedupes a pair found by several bands);
       emits pair-hash-bucketed attached sides;
    5. pair-bucketed verify: exact |∩| via sorted-array searchsorted,
       uni = na + nb − inter, threshold filter, half-up r6 — float
       expression identical to the exact op and the oracle.

    Recall contract (the LSH tradeoff, documented not hidden): a pair
    at Jaccard j is caught with P = 1−(1−j⁴)³², ≈ 0.874 at j = 0.5,
    → 1 as j → 1; the ORACLE mirrors the same banding (inlined perm
    params, minima-list equality), so correctness is oracle-checked
    end-to-end, not assumed."""
    import zlib

    import numpy as np

    from .common import (concat_tables_or_empty, hash63_strings,
                         round_half_up, run_pairs)
    band_pair_budget = int(os.environ.get('GRAFT_NEARDUP_MAX_PAIRS',
                                          str(1 << 23)))
    from .dedup import _perms, BANDS, NUM_PERM, ROWS_PER_BAND
    nb = num_buckets
    thr = float(threshold)
    _M31 = np.uint64((1 << 31) - 1)

    _MID_SCHEMA = pa.schema([
        ('bucket', pa.int64()), ('kind', pa.int64()),
        ('band_key', pa.int64()), ('conv', pa.string()),
        ('other', pa.string()), ('fps', pa.list_(pa.int64())),
        ('n', pa.int64())])

    def _conv_hash(strs):
        return np.asarray(hash63_strings(strs), np.int64) & (nb - 1)

    def _scatter_hash(col):
        enc = pc.dictionary_encode(col).combine_chunks()
        vals = _conv_hash(enc.dictionary.to_pylist())
        return vals[enc.indices.to_numpy(zero_copy_only=False)]

    def explode(batch: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(batch.column('text')).combine_chunks()
        dict_fps = np.asarray(
            hash63_strings(enc.dictionary.to_pylist()), np.int64)
        fps = dict_fps[enc.indices.to_numpy(zero_copy_only=False)]
        t = pa.table({'conv_id': batch.column('conv_id'),
                      'fp': pa.array(fps, pa.int64())})
        g = t.group_by(['conv_id', 'fp']).aggregate([])
        return g.append_column(
            'bucket', pa.array(_scatter_hash(g.column('conv_id')),
                               pa.int64()))

    def sig_fold(group: pa.Table) -> pa.Table:
        g = group.group_by(['conv_id', 'fp']).aggregate([])
        enc = pc.dictionary_encode(g.column('conv_id')).combine_chunks()
        convs = enc.dictionary.to_pylist()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        fp = g.column('fp').to_numpy(zero_copy_only=False)
        order = np.lexsort((fp, code))
        fp_s, code_s = fp[order], code[order]
        starts = np.flatnonzero(np.r_[True, code_s[1:] != code_s[:-1]])
        lens = np.diff(np.r_[starts, len(code_s)])
        # dictionary codes are first-appearance order and every code
        # occurs, so segment i of the sorted array IS convs[code_s[starts[i]]]
        seg_conv = [convs[c] for c in code_s[starts]]
        n_convs = len(seg_conv)
        # 128 permuted minima, vectorized across the bucket in 32-perm
        # chunks so the (P_chunk, N) intermediate stays bounded
        a, b = _perms()
        h32 = (fp_s.astype(np.uint64) & np.uint64(0xFFFFFFFF)) % _M31
        mins = np.empty((NUM_PERM, n_convs), np.uint64)
        for i in range(0, NUM_PERM, 32):
            pm = (a[i:i + 32, None] * h32[None, :]
                  + b[i:i + 32, None]) % _M31
            mins[i:i + 32] = np.minimum.reduceat(pm, starts, axis=1)
        minsT = np.ascontiguousarray(mins.T)            # (n_convs, 128)
        band_keys = np.empty(n_convs * BANDS, np.int64)
        for ci in range(n_convs):
            rows = minsT[ci].reshape(BANDS, ROWS_PER_BAND)
            base = ci * BANDS
            for bi in range(BANDS):
                band_keys[base + bi] = (bi << 32) | zlib.crc32(
                    rows[bi].tobytes())
        conv_rep = pa.array(np.repeat(np.asarray(seg_conv, object), BANDS),
                            pa.string())
        band_tbl = pa.table({
            'bucket': pa.array(band_keys & (nb - 1), pa.int64()),
            'kind': pa.array(np.zeros(n_convs * BANDS, np.int64)),
            'band_key': pa.array(band_keys, pa.int64()),
            'conv': conv_rep,
            'other': pa.nulls(n_convs * BANDS, pa.string()),
            'fps': pa.nulls(n_convs * BANDS, pa.list_(pa.int64())),
            'n': pa.nulls(n_convs * BANDS, pa.int64()),
        })
        offsets = np.r_[0, np.cumsum(lens)].astype(np.int64)
        fps_list = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(fp_s, pa.int64()))
        fpset_tbl = pa.table({
            'bucket': pa.array(_conv_hash(seg_conv), pa.int64()),
            'kind': pa.array(np.ones(n_convs, np.int64)),
            'band_key': pa.nulls(n_convs, pa.int64()),
            'conv': pa.array(seg_conv, pa.string()),
            'other': pa.nulls(n_convs, pa.string()),
            'fps': fps_list,
            'n': pa.array(lens, pa.int64()),
        })
        return concat_tables_or_empty([band_tbl, fpset_tbl], _MID_SCHEMA)

    def pairs_fold(group: pa.Table) -> pa.Table:
        kinds = group.column('kind')
        parts = []
        fpset = group.filter(pc.equal(kinds, 1))
        if fpset.num_rows:
            parts.append(fpset.select(_MID_SCHEMA.names))
        band = group.filter(pc.equal(kinds, 0))
        if band.num_rows:
            t = band.sort_by([('band_key', 'ascending'),
                              ('conv', 'ascending')])
            keys = t.column('band_key').to_numpy(zero_copy_only=False)
            convs = np.asarray(t.column('conv').to_pylist(), object)
            starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
            lens = np.diff(np.r_[starts, len(keys)])
            if lens.size:
                import logging
                log = logging.getLogger('engine.ops.convstats')
                max_band = int(lens.max())
                if max_band >= 1000:
                    log.warning(
                        'conv_near_dup_lsh band telemetry: bucket max '
                        'band size %d (%d bands >= 1000) — O(m^2) pair '
                        'emission; run exact payload dedup first',
                        max_band, int((lens >= 1000).sum()))
                if max_band_convs is not None and max_band > max_band_convs:
                    over = lens > max_band_convs
                    dropped = int((lens[over] * (lens[over] - 1) // 2).sum())
                    log.error(
                        'conv_near_dup_lsh: SKIPPING %d bands over '
                        'max_band_convs=%d (~%d candidate pairs dropped; '
                        'near-dups may be missed — run exact payload '
                        'dedup first or raise the cap)',
                        int(over.sum()), max_band_convs, dropped)
                    keep = np.repeat(~over, lens)
                    convs = convs[keep]
                    lens = lens[~over]
                # same FAIL-FAST budget as the exact tier: an
                # all-identical corpus makes every band degenerate and
                # candidate emission quadratic — raise actionably
                # instead of spilling the disk (conv_near_dup's guard)
                est = int((lens.astype(np.int64) * (lens - 1) // 2).sum())
                if est > band_pair_budget:
                    raise ValueError(
                        'conv_near_dup_lsh: this bucket would emit %d '
                        'candidate pairs (> GRAFT_NEARDUP_MAX_PAIRS=%d; '
                        'worst band holds %d convs — near-identical '
                        'conversations collapse into shared bands). Run '
                        'conv_boilerplate_turns + exact payload dedup '
                        'first, set max_band_convs to cap degenerate '
                        'bands, or raise GRAFT_NEARDUP_MAX_PAIRS.'
                        % (est, band_pair_budget,
                           int(lens.max()) if lens.size else 0))
                ai, bi = run_pairs(lens, upper=True)
                if ai.size:
                    pg = pa.table({'a': pa.array(convs[ai], pa.string()),
                                   'b': pa.array(convs[bi], pa.string())}) \
                           .group_by(['a', 'b']).aggregate([])
                    av, bv = pg.column('a'), pg.column('b')
                    m = pg.num_rows
                    for kind_val, key_col, other_col in ((2, av, bv),
                                                         (3, bv, av)):
                        parts.append(pa.table({
                            'bucket': pa.array(_scatter_hash(key_col),
                                               pa.int64()),
                            'kind': pa.array(np.full(m, kind_val, np.int64)),
                            'band_key': pa.nulls(m, pa.int64()),
                            'conv': key_col,
                            'other': other_col,
                            'fps': pa.nulls(m, pa.list_(pa.int64())),
                            'n': pa.nulls(m, pa.int64()),
                        }))
        return concat_tables_or_empty(parts, _MID_SCHEMA)

    _ATT_SCHEMA = pa.schema([
        ('pbucket', pa.int64()), ('conv_a', pa.string()),
        ('conv_b', pa.string()), ('kind', pa.int64()),
        ('fps', pa.list_(pa.int64())), ('n', pa.int64())])

    def attach_fold(group: pa.Table) -> pa.Table:
        kinds = group.column('kind')
        fp_rows = group.filter(pc.equal(kinds, 1))
        sides = group.filter(pc.greater(kinds, 1))
        if sides.num_rows == 0 or fp_rows.num_rows == 0:
            return concat_tables_or_empty([], _ATT_SCHEMA)
        # a pair surfaces once per matching band: the distinct fold here
        # IS the global candidate dedup (each side row lives in exactly
        # one conv bucket)
        d = sides.group_by(['conv', 'other', 'kind']).aggregate([])
        pos = {c: i for i, c in enumerate(
            fp_rows.column('conv').to_pylist())}
        idx = pa.array([pos[c] for c in d.column('conv').to_pylist()],
                       pa.int64())
        fps_sel = fp_rows.column('fps').combine_chunks().take(idx)
        n_sel = fp_rows.column('n').take(idx)
        kind = d.column('kind').to_numpy(zero_copy_only=False)
        is_a = pc.equal(d.column('kind'), 2)
        ca = pc.if_else(is_a, d.column('conv'), d.column('other'))
        cb = pc.if_else(is_a, d.column('other'), d.column('conv'))
        ha = np.asarray(hash63_strings(ca.to_pylist()), np.int64)
        hb = np.asarray(hash63_strings(cb.to_pylist()), np.int64)
        pb = (ha * 1_000_003 + hb) & (nb - 1)
        return pa.table({
            'pbucket': pa.array(pb, pa.int64()),
            'conv_a': ca,
            'conv_b': cb,
            'kind': pa.array(kind, pa.int64()),
            'fps': fps_sel,
            'n': n_sel,
        }).cast(_ATT_SCHEMA)

    _OUT_SCHEMA = pa.schema([
        ('conv_a', pa.string()), ('conv_b', pa.string()),
        ('inter', pa.int64()), ('jac', pa.float64())])

    def verify_fold(group: pa.Table) -> pa.Table:
        t = group.sort_by([('conv_a', 'ascending'),
                           ('conv_b', 'ascending'),
                           ('kind', 'ascending')])
        m = t.num_rows
        if m % 2:
            raise ValueError('unpaired candidate side row')
        lst = t.column('fps').combine_chunks()
        offs = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = lst.values.to_numpy(zero_copy_only=False)
        ns = t.column('n').to_numpy(zero_copy_only=False).astype(np.int64)
        ca = t.column('conv_a').to_pylist()
        cb = t.column('conv_b').to_pylist()
        out_a, out_b, out_i, out_j = [], [], [], []
        for i in range(0, m, 2):
            if ca[i] != ca[i + 1] or cb[i] != cb[i + 1]:
                raise ValueError('unpaired candidate side row')
            A = vals[offs[i]:offs[i + 1]]
            B = vals[offs[i + 1]:offs[i + 2]]
            # both sorted distinct: one searchsorted membership sweep
            j = np.searchsorted(B, A)
            j[j == len(B)] = max(len(B) - 1, 0)
            inter = int((B[j] == A).sum()) if len(B) else 0
            uni = int(ns[i] + ns[i + 1] - inter)
            jac = inter / uni if uni else 0.0
            if jac >= thr:
                out_a.append(ca[i])
                out_b.append(cb[i])
                out_i.append(inter)
                out_j.append(jac)
        if not out_a:
            return concat_tables_or_empty([], _OUT_SCHEMA)
        return pa.table({
            'conv_a': pa.array(out_a, pa.string()),
            'conv_b': pa.array(out_b, pa.string()),
            'inter': pa.array(out_i, pa.int64()),
            'jac': pa.array(round_half_up(out_j, 6), pa.float64()),
        })

    ds = ray.data.read_parquet(corpus_dir, columns=['conv_id', 'text'])
    return ds.map_batches(explode, batch_format='pyarrow',
                          zero_copy_batch=True) \
             .groupby('bucket').map_groups(sig_fold,
                                           batch_format='pyarrow') \
             .groupby('bucket').map_groups(pairs_fold,
                                           batch_format='pyarrow') \
             .groupby('bucket').map_groups(attach_fold,
                                           batch_format='pyarrow') \
             .groupby('pbucket').map_groups(verify_fold,
                                            batch_format='pyarrow')


def conv_near_dup_lsh_oracle_sql(corpus_dir, threshold=0.5):
    """Full SQL re-derivation of conv_near_dup_lsh (the
    minhash_oracle_sql discipline, oracles.py:296): the hash input is
    the low 32 bits of the engine's 63-bit md5 fingerprints (identical
    byte rule) reduced mod 2³¹−1, the SAME 128 seeded permutations
    inlined as VALUES rows, (a*h+b) % (2³¹−1) in BIGINT (a, h < 2³¹ —
    the product is < 2⁶², exact in both engines), banding by equality
    of the 4-minimum list (the engine keys band buckets by crc32 of
    those minima — list equality IS key equality, modulo crc
    collisions the engine exact-verifies away), then the exact
    turn-set verify with the shared |∩|/|∪| math and half-up r6."""
    from .dedup import _perm_params, NUM_PERM, ROWS_PER_BAND
    a, b = _perm_params()
    perm_rows = ',\n    '.join('(%d, %d, %d)' % (p, int(a[p]), int(b[p]))
                               for p in range(NUM_PERM))
    return """
WITH t AS (
  SELECT DISTINCT conv_id, text FROM read_parquet('{corpus}/*.parquet')
), hs AS (
  SELECT conv_id,
         ((md5_number_lower(text) & 4294967295) % 2147483647)::BIGINT AS h
  FROM t
), perms(p, a, b) AS (VALUES
    {perm_rows}
), pm AS (
  SELECT conv_id, p, min((a::BIGINT * h + b) % 2147483647)::BIGINT AS m
  FROM hs CROSS JOIN perms GROUP BY conv_id, p
), band AS (
  SELECT conv_id, p // {rpb} AS bi, list(m ORDER BY p) AS mins
  FROM pm GROUP BY conv_id, p // {rpb}
), cand AS (
  SELECT DISTINCT a.conv_id AS ca, b.conv_id AS cb
  FROM band a JOIN band b
    ON a.bi = b.bi AND a.mins = b.mins AND a.conv_id < b.conv_id
), sz AS (
  SELECT conv_id, count(*)::BIGINT AS n FROM t GROUP BY conv_id
), i AS (
  SELECT c.ca, c.cb, count(*)::BIGINT AS inter
  FROM cand c
  JOIN t a ON a.conv_id = c.ca
  JOIN t b ON b.conv_id = c.cb AND b.text = a.text
  GROUP BY 1, 2
)
SELECT i.ca AS conv_a, i.cb AS conv_b, i.inter,
       floor(i.inter::DOUBLE / (sa.n + sb.n - i.inter)::DOUBLE
             * 1000000 + 0.5) / 1000000 AS jac
FROM i JOIN sz sa ON sa.conv_id = i.ca JOIN sz sb ON sb.conv_id = i.cb
WHERE i.inter::DOUBLE / (sa.n + sb.n - i.inter)::DOUBLE >= {thr}
""".format(corpus=corpus_dir, perm_rows=perm_rows,
           rpb=ROWS_PER_BAND, thr=repr(float(threshold)))


def conv_context_growth(corpus_dir, num_buckets=64):
    """CONTEXT-WINDOW COST audit per conversation: at turn i the model
    re-reads the whole prefix, so serving/training cost scales with the
    SUM of prefix token counts, not the token total.  Output per
    conversation: n_turns, total_tokens (= final context size) and
    cum_token_turns = Σ_i ctx_i where ctx_i is the inclusive prefix
    token count at turn i (the attention-cost proxy a transcript owner
    tracks across model versions).  All integers.

    Shape: one conv-bucketed exchange of (conv_id, turn_idx, tok) rows
    (the conv_turn_gaps row-cardinality contract); per bucket ONE
    lexsort + global cumsum with per-segment rebase — no per-conv
    Python.  The telescoped identity Σ ctx_i = Σ_j tok_j·(n−j+1) means
    the fold needs only the sorted position within the conversation."""
    import numpy as np

    from .textstats import TOKEN_RE
    nb = num_buckets

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            'conv_id': batch.column('conv_id'),
            'turn_idx': pc.cast(batch.column('turn_idx'), pa.int64()),
            'tok': pc.cast(pc.count_substring_regex(
                batch.column('text'), pattern=TOKEN_RE), pa.int64()),
        })
        return t.append_column('bucket',
                               _string_bucket(t.column('conv_id'), nb))

    def fold(group: pa.Table) -> pa.Table:
        conv = group.column('conv_id').to_numpy(zero_copy_only=False)
        tidx = group.column('turn_idx').to_numpy(zero_copy_only=False)
        tok = group.column('tok').to_numpy(zero_copy_only=False)
        order = np.lexsort((tidx, conv))
        conv, tok = conv[order], tok[order]
        n = len(conv)
        uniq, seg_start = np.unique(conv, return_index=True)
        seg_end = np.r_[seg_start[1:], n]
        lens = seg_end - seg_start
        # inclusive prefix sums, rebased per conversation
        cum = np.cumsum(tok, dtype=np.int64)
        base = np.where(seg_start > 0, cum[seg_start - 1], 0)
        conv_row = np.repeat(np.arange(len(uniq)), lens)
        ctx = cum - base[conv_row]
        cum2 = np.cumsum(ctx, dtype=np.int64)
        base2 = np.where(seg_start > 0, cum2[seg_start - 1], 0)
        return pa.table({
            'conv_id': pa.array(uniq),
            'n_turns': pa.array(lens.astype(np.int64), pa.int64()),
            'total_tokens': pa.array(ctx[seg_end - 1], pa.int64()),
            'cum_token_turns': pa.array(cum2[seg_end - 1] - base2,
                                        pa.int64()),
        })

    ds = ray.data.read_parquet(corpus_dir,
                               columns=['conv_id', 'turn_idx', 'text'])
    return ds.map_batches(partial, batch_format='pyarrow',
                          zero_copy_batch=True) \
             .groupby('bucket').map_groups(fold, batch_format='pyarrow')


def conv_context_growth_oracle_sql(corpus_dir):
    return """
WITH t AS (
  SELECT conv_id,
         len(regexp_extract_all(text, '\\S+'))::BIGINT AS tok,
         sum(len(regexp_extract_all(text, '\\S+'))::BIGINT) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS UNBOUNDED PRECEDING) AS ctx
  FROM read_parquet('{corpus}/*.parquet')
)
SELECT conv_id, count(*)::BIGINT AS n_turns,
       sum(tok)::BIGINT AS total_tokens,
       sum(ctx)::BIGINT AS cum_token_turns
FROM t GROUP BY conv_id
""".format(corpus=corpus_dir)


def tool_transition_matrix(corpus_dir, num_buckets=64):
    """AGENT TOOL-FLOW audit: which tool follows which within a
    conversation — the Markov view of agent behavior (retry loops show
    as self-edges, search→read→edit chains as off-diagonals).  Turns
    are filtered to tool calls MAP-SIDE, so the exchange carries tool
    turns only; consecutive means adjacent IN THE TOOL SUBSEQUENCE
    (ordered by turn_idx), the standard agent-trace reading.  Output:
    (tool_from, tool_to, n).

    Same shape as :func:`conv_role_transitions`: conv-bucketed
    exchange, per bucket one lexsort + shift compare, partials bounded
    by tools² per bucket."""
    import numpy as np

    nb = num_buckets

    def add_bucket(batch: pa.Table) -> pa.Table:
        t = batch.select(['conv_id', 'turn_idx', 'tool']) \
                 .filter(pc.not_equal(batch.column('tool'), ''))
        return t.append_column('bucket',
                               _string_bucket(t.column('conv_id'), nb))

    def pairs(group: pa.Table) -> pa.Table:
        conv = group.column('conv_id').to_numpy(zero_copy_only=False)
        tidx = group.column('turn_idx').to_numpy(zero_copy_only=False)
        tool = group.column('tool').to_numpy(zero_copy_only=False)
        order = np.lexsort((tidx, conv))
        c, t = conv[order], tool[order]
        same = c[1:] == c[:-1]
        g = pa.table({
            'tool_from': pa.array(t[:-1][same], pa.string()),
            'tool_to': pa.array(t[1:][same], pa.string()),
        }).group_by(['tool_from', 'tool_to']).aggregate([([], 'count_all')])
        g = g.rename_columns(['tool_from', 'tool_to', 'n'])
        return g.append_column('fbucket',
                               pa.array(np.zeros(g.num_rows, np.int64)))

    def fold(group: pa.Table) -> pa.Table:
        g = group.group_by(['tool_from', 'tool_to']).aggregate([('n', 'sum')])
        return pa.table({
            'tool_from': g.column('tool_from'),
            'tool_to': g.column('tool_to'),
            'n': g.column('n_sum').cast(pa.int64()),
        })

    ds = ray.data.read_parquet(corpus_dir,
                               columns=['conv_id', 'turn_idx', 'tool'])
    return ds.map_batches(add_bucket, batch_format='pyarrow',
                          zero_copy_batch=True) \
             .groupby('bucket').map_groups(pairs, batch_format='pyarrow') \
             .groupby('fbucket').map_groups(fold, batch_format='pyarrow')


def tool_transition_oracle_sql(corpus_dir):
    return """
WITH t AS (
  SELECT conv_id, turn_idx, tool
  FROM read_parquet('{corpus}/*.parquet') WHERE tool <> ''
), o AS (
  SELECT tool AS tool_from,
         lead(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS tool_to
  FROM t
)
SELECT tool_from, tool_to, count(*)::BIGINT AS n
FROM o WHERE tool_to IS NOT NULL GROUP BY tool_from, tool_to
""".format(corpus=corpus_dir)


def conv_role_token_stats(corpus_dir):
    """WHO WRITES HOW MUCH: per role, turn count, token total, mean
    tokens per turn (r6) and the role's share of the corpus token mass
    (r6) — the first composition read of a dialogue corpus (is the
    assistant 10× wordier than the user? are tool outputs dominating
    the token budget?).  Pure combiner → one tiny role-keyed fold; the
    two ratios are single divisions of int64-exact operands."""
    import numpy as np

    from .common import round_half_up
    from .textstats import TOKEN_RE

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            'role': batch.column('role'),
            'tok': pc.cast(pc.count_substring_regex(
                batch.column('text'), pattern=TOKEN_RE), pa.int64()),
        })
        g = t.group_by('role').aggregate([('tok', 'sum'),
                                          ([], 'count_all')])
        g = g.rename_columns(['role', 'n_tokens', 'n_turns'])
        return g.append_column('fbucket',
                               pa.array(np.zeros(g.num_rows, np.int64)))

    def fold(group: pa.Table) -> pa.Table:
        g = group.group_by('role').aggregate([('n_tokens', 'sum'),
                                              ('n_turns', 'sum')])
        nt = g.column('n_tokens_sum').to_numpy(zero_copy_only=False) \
              .astype(np.int64)
        nu = g.column('n_turns_sum').to_numpy(zero_copy_only=False) \
              .astype(np.int64)
        total = int(nt.sum())
        return pa.table({
            'role': g.column('role'),
            'n_turns': pa.array(nu, pa.int64()),
            'n_tokens': pa.array(nt, pa.int64()),
            'avg_tokens': pa.array(round_half_up(
                nt.astype(np.float64) / nu.astype(np.float64), 6),
                pa.float64()),
            'token_share': pa.array(round_half_up(
                nt.astype(np.float64) / float(total), 6), pa.float64()),
        })

    ds = ray.data.read_parquet(corpus_dir, columns=['role', 'text'])
    return ds.map_batches(partial, batch_format='pyarrow',
                          zero_copy_batch=True) \
             .groupby('fbucket').map_groups(fold, batch_format='pyarrow')


def conv_role_token_oracle_sql(corpus_dir):
    return """
WITH r AS (
  SELECT role, count(*)::BIGINT AS n_turns,
         sum(len(regexp_extract_all(text, '\\S+')))::BIGINT AS n_tokens
  FROM read_parquet('{corpus}/*.parquet') GROUP BY role
)
SELECT role, n_turns, n_tokens,
       floor(n_tokens::DOUBLE / n_turns::DOUBLE * 1000000 + 0.5)
         / 1000000 AS avg_tokens,
       floor(n_tokens::DOUBLE / (SELECT sum(n_tokens)::BIGINT FROM r)::DOUBLE
             * 1000000 + 0.5) / 1000000 AS token_share
FROM r
""".format(corpus=corpus_dir)


def conv_boilerplate_turns(corpus_dir, min_convs=3, topk=50, num_buckets=64):
    """Boilerplate-turn detector: turn texts shared by ≥ ``min_convs``
    DISTINCT conversations ("ok", tool acks, canned prompts) — the very
    hot-fingerprint mass that conv_near_dup's cap guards against, surfaced
    as its own audit so a corpus owner can scrub it BEFORE pair discovery.

    Combiner-first: each block groups (text, conv_id) locally and emits one
    (text_md5, conv_id, n_occ) row per distinct pair — the exchange carries
    distinct-pairs-per-block, never turns, and never the text payloads
    (md5 happens map-side, once per distinct text per block).  Per md5
    bucket: fold pairs → n_convs = distinct convs, n_turns = Σ occ; apply
    the HAVING filter and a per-bucket top-k (n_convs desc, n_turns desc,
    md5 asc — the global order restricted to the bucket) so the final sort
    sees ≤ buckets × k rows.
    """
    import hashlib

    nb = num_buckets

    def partial(batch: pa.Table) -> pa.Table:
        g = pa.table({'text': batch.column('text'),
                      'conv_id': batch.column('conv_id')}) \
            .group_by(['text', 'conv_id']).aggregate([([], 'count_all')])
        g = g.rename_columns(['text', 'conv_id', 'n_occ'])
        md5s = [hashlib.md5(s.encode('utf-8')).hexdigest()
                for s in g.column('text').to_pylist()]
        t = pa.table({
            'text_md5': pa.array(md5s, pa.string()),
            'conv_id': g.column('conv_id'),
            'n_occ': pc.cast(g.column('n_occ'), pa.int64()),
        })
        return t.append_column('bucket',
                               _string_bucket(t.column('text_md5'), nb))

    def bucket_topk(group: pa.Table) -> pa.Table:
        pairs = group.group_by(['text_md5', 'conv_id']).aggregate(
            [('n_occ', 'sum')]).rename_columns(
            ['text_md5', 'conv_id', 'n_occ'])
        g = pairs.group_by('text_md5').aggregate(
            [([], 'count_all'), ('n_occ', 'sum')])
        g = g.rename_columns(['text_md5', 'n_convs', 'n_turns'])
        g = pa.table({'text_md5': g.column('text_md5'),
                      'n_convs': pc.cast(g.column('n_convs'), pa.int64()),
                      'n_turns': pc.cast(g.column('n_turns'), pa.int64())})
        g = g.filter(pc.greater_equal(g.column('n_convs'),
                                      pa.scalar(min_convs)))
        return g.sort_by([('n_convs', 'descending'),
                          ('n_turns', 'descending'),
                          ('text_md5', 'ascending')]).slice(0, topk)

    ds = ray.data.read_parquet(corpus_dir, columns=['conv_id', 'text'])
    return (ds.map_batches(partial, batch_format='pyarrow',
                           zero_copy_batch=True)
            .groupby('bucket').map_groups(bucket_topk,
                                          batch_format='pyarrow')
            .sort(['n_convs', 'n_turns', 'text_md5'],
                  descending=[True, True, False]).limit(topk))


def conv_boilerplate_oracle_sql(corpus_dir, min_convs=3, topk=50):
    return """
SELECT md5(text) AS text_md5, count(DISTINCT conv_id)::BIGINT AS n_convs,
       count(*)::BIGINT AS n_turns
FROM read_parquet('{corpus}/*.parquet')
GROUP BY text
HAVING count(DISTINCT conv_id) >= {k}
ORDER BY n_convs DESC, n_turns DESC, text_md5 ASC
LIMIT {topk}
""".format(corpus=corpus_dir, k=min_convs, topk=topk)


def conv_dedup_clusters(corpus_dir, threshold=0.5, num_buckets=64,
                        max_iters=50):
    """Conversation-level near-dup cluster collapse — the COLLAPSE tier
    completing the transcript dedup family (conv_near_dup_lsh discovers,
    conv_near_dup verifies, this folds verified pairs into connected
    components and elects survivors), exactly mirroring the document
    family's minhash → jaccard → dedup_clusters stack.

    Conversations are keyed by ``hash63(conv_id)`` so the SHARED int64
    min-label solver (:func:`engine.ops.clusters.components_from_pairs`
    — one solver, one measured small-graph gate, one convergence
    contract) runs unchanged; the oracle hashes with the identical
    ``md5_number_lower & (2^63−1)`` expression, so engine and oracle
    agree bit-for-bit even under a (2⁻⁶³-improbable) collision.  One
    extra conv-cardinality co-partition attaches the string conv_id
    back to the solver's hashed output.

    Returns one row per conversation: (conv_id, cluster_id, is_survivor)
    with cluster_id = min hash63 in the component and the survivor the
    conversation whose own hash equals it.
    """
    from .clusters import components_from_pairs
    from .common import hash63_strings

    nb = num_buckets

    def pair_ids(batch: pa.Table) -> pa.Table:
        return pa.table({
            'doc_id_a': pa.array(hash63_strings(
                batch.column('conv_a').to_pylist()), pa.int64()),
            'doc_id_b': pa.array(hash63_strings(
                batch.column('conv_b').to_pylist()), pa.int64()),
        })

    pairs = conv_near_dup(corpus_dir, threshold, num_buckets).map_batches(
        pair_ids, batch_format='pyarrow', zero_copy_batch=True)

    # distinct conversations: per-block distinct combiner → in-bucket
    # exact distinct (a conv_id lives in exactly one hash bucket)
    def block_distinct(batch: pa.Table) -> pa.Table:
        u = pc.unique(batch.column('conv_id'))
        h = hash63_strings(u.to_pylist())
        return pa.table({
            'conv_id': u,
            'doc_id': pa.array(h, pa.int64()),
            'bucket': pa.array(h & (nb - 1), pa.int64()),
        })

    def bucket_distinct(group: pa.Table) -> pa.Table:
        return group.group_by(['conv_id', 'doc_id']).aggregate([])

    convs = ray.data.read_parquet(corpus_dir, columns=['conv_id']) \
        .map_batches(block_distinct, batch_format='pyarrow',
                     zero_copy_batch=True) \
        .groupby('bucket').map_groups(bucket_distinct,
                                      batch_format='pyarrow')

    ents = convs.map_batches(
        lambda b: pa.table({'doc_id': b.column('doc_id')}),
        batch_format='pyarrow', zero_copy_batch=True)
    labeled = components_from_pairs(pairs, ents, num_buckets=nb,
                                    max_iters=max_iters)

    # attach conv_id back: one conv-cardinality bucketed co-partition
    def name_rows(batch: pa.Table) -> pa.Table:
        h = batch.column('doc_id')
        return pa.table({
            'doc_id': h,
            'conv_id': batch.column('conv_id'),
            'cluster_id': pa.nulls(batch.num_rows, pa.int64()),
            'is_survivor': pa.nulls(batch.num_rows, pa.bool_()),
            'jbucket': pa.array(
                h.to_numpy(zero_copy_only=False) & (nb - 1), pa.int64()),
        })

    def label_rows(batch: pa.Table) -> pa.Table:
        h = batch.column('doc_id')
        return pa.table({
            'doc_id': h,
            'conv_id': pa.nulls(batch.num_rows, pa.string()),
            'cluster_id': batch.column('cluster_id'),
            'is_survivor': batch.column('is_survivor'),
            'jbucket': pa.array(
                h.to_numpy(zero_copy_only=False) & (nb - 1), pa.int64()),
        })

    _OUT_EMPTY = pa.table({'conv_id': pa.array([], pa.string()),
                           'cluster_id': pa.array([], pa.int64()),
                           'is_survivor': pa.array([], pa.bool_())})

    def join_names(group: pa.Table) -> pa.Table:
        is_name = pc.is_valid(group.column('conv_id'))
        names = group.filter(is_name)
        labels = group.filter(pc.invert(is_name))
        if names.num_rows == 0 or labels.num_rows == 0:
            return _OUT_EMPTY
        pos = pc.index_in(labels.column('doc_id'),
                          value_set=names.column('doc_id'))
        hit = pc.is_valid(pos)
        labels, pos = labels.filter(hit), pos.filter(hit)
        return pa.table({
            'conv_id': pc.take(names.column('conv_id'), pos),
            'cluster_id': labels.column('cluster_id'),
            'is_survivor': labels.column('is_survivor'),
        })

    return convs.map_batches(name_rows, batch_format='pyarrow',
                             zero_copy_batch=True).union(
        labeled.map_batches(label_rows, batch_format='pyarrow',
                            zero_copy_batch=True)
    ).groupby('jbucket').map_groups(join_names, batch_format='pyarrow')


def conv_dedup_clusters_oracle_sql(corpus_dir, threshold=0.5):
    """Recursive transitive-closure CTE over the conv_near_dup oracle,
    on the SAME md5 63-bit conv keys the engine solver uses."""
    h = "(md5_number_lower(%s) & ((1::HUGEINT << 63) - 1))::BIGINT"
    pairs_sql = conv_near_dup_oracle_sql(corpus_dir, threshold)
    return """
WITH RECURSIVE convs AS (
  SELECT conv_id, {hc} AS h
  FROM (SELECT DISTINCT conv_id FROM read_parquet('{corpus}/*.parquet'))
), pairs AS (
  SELECT {ha} AS pa, {hb} AS pb FROM ({pairs_sql}) src
), sym AS (
  SELECT pa AS a, pb AS b FROM pairs
  UNION ALL
  SELECT pb AS a, pa AS b FROM pairs
), reach(n, m) AS (
  SELECT a, a FROM sym
  UNION
  SELECT r.n, s.b FROM reach r JOIN sym s ON s.a = r.m
), cl AS (
  SELECT n AS eid, min(m) AS cluster_id FROM reach GROUP BY n
)
SELECT c.conv_id,
       coalesce(cl.cluster_id, c.h) AS cluster_id,
       (coalesce(cl.cluster_id, c.h) = c.h) AS is_survivor
FROM convs c LEFT JOIN cl ON cl.eid = c.h
""".format(corpus=corpus_dir, pairs_sql=pairs_sql,
           hc=h % 'conv_id', ha=h % 'conv_a', hb=h % 'conv_b')
