"""TRAIN/TEST DECONTAMINATION — the screen every pretraining-data run
executes before an eval split ships: does any held-out (test) document
share a verbatim word k-gram with the training split?  (The GPT-3
appendix-C shape: 13-gram overlap against the training set.)

Split and screen are both deterministic md5 arithmetic, so a DuckDB
oracle recomputes them independently:

- split: ``hash63(doc_id) % 10 < 8`` → train (the repo's oracle-shared
  md5 convention, common.hash63_keys).
- gram identity: both sides join on ``hash63(gram)`` — the ENGINE and
  the ORACLE use the identical 63-bit md5 of the gram string, so the
  comparison semantics (including any theoretical collision) are the
  same on both sides, never "string join here, hash join there".

Scale shape (100 TB): per-doc distinct-gram sets fold map-side; the only
wide exchanges carry (gram_hash, doc_id) pairs bucketed by gram hash —
the train side collapses to a per-bucket distinct array, the test side
semi-joins against it inside the bucket (C++ sort + searchsorted, no
broadcast of the training gram universe, which at 100 TB is itself
TB-scale).  Per-bucket partial (doc_id, n_grams, n_hit) rows then
co-partition ONCE by doc bucket to the final per-test-doc report.
Gram-less test docs (< k tokens) join via a cheap vectorized
token-count pass that never md5s anything."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .common import hash63_keys, hash63_strings, read_table, pool

__all__ = ['decontaminate_split', 'decontam_oracle_sql']

import re

_TOKEN_RE = re.compile(r'\S+')

K = 13              # gram width (tokens) — the decontamination contract
TRAIN_MOD = 10      # hash63(doc_id) % TRAIN_MOD < TRAIN_LT → train split
TRAIN_LT = 8


def decontaminate_split(sf_dir, k=K, train_mod=TRAIN_MOD, train_lt=TRAIN_LT,
                        num_buckets=64):
    """Per-TEST-doc contamination report: (doc_id, n_grams, n_hit,
    contaminated) where n_hit counts the doc's distinct k-grams that
    also occur anywhere in the train split."""
    nb = num_buckets

    def emit_grams(batch: pa.Table) -> pa.Table:
        ids = batch.column('doc_id').to_numpy(zero_copy_only=False)
        is_train = (hash63_keys(ids) % train_mod) < train_lt
        out_gh, out_doc, out_tr = [], [], []
        for i, txt in enumerate(batch.column('text').to_pylist()):
            toks = _TOKEN_RE.findall(txt)
            grams = {' '.join(toks[j:j + k])
                     for j in range(len(toks) - k + 1)}
            if not grams:
                continue
            gh = hash63_strings(list(grams))
            out_gh.append(gh)
            out_doc.append(np.full(len(gh), ids[i], np.int64))
            out_tr.append(np.full(len(gh), bool(is_train[i]), np.bool_))
        if not out_gh:
            return pa.table({'gh': pa.array([], pa.int64()),
                             'doc_id': pa.array([], pa.int64()),
                             'is_train': pa.array([], pa.bool_()),
                             'bucket': pa.array([], pa.int64())})
        gh = np.concatenate(out_gh)
        return pa.table({
            'gh': pa.array(gh, pa.int64()),
            'doc_id': pa.array(np.concatenate(out_doc), pa.int64()),
            'is_train': pa.array(np.concatenate(out_tr), pa.bool_()),
            'bucket': pa.array(gh & (nb - 1), pa.int64()),
        })

    def bucket_fold(group: pa.Table) -> pa.Table:
        """Inside one gram-hash bucket: train distinct set, test
        semi-join, per-doc (n_grams, n_hit) partials."""
        tr_mask = group.column('is_train').to_numpy(zero_copy_only=False)
        gh = group.column('gh').to_numpy(zero_copy_only=False)
        doc = group.column('doc_id').to_numpy(zero_copy_only=False)
        tr = np.unique(gh[tr_mask])
        te_gh, te_doc = gh[~tr_mask], doc[~tr_mask]
        if not len(te_doc):
            return pa.table({'doc_id': pa.array([], pa.int64()),
                             'n_grams': pa.array([], pa.int64()),
                             'n_hit': pa.array([], pa.int64())})
        if len(tr):
            idx = np.searchsorted(tr, te_gh)
            idx[idx == len(tr)] = 0
            hit = (tr[idx] == te_gh).astype(np.int64)
        else:
            hit = np.zeros(len(te_gh), np.int64)
        t = pa.table({'doc_id': pa.array(te_doc, pa.int64()),
                      'hit': pa.array(hit, pa.int64())})
        g = t.group_by('doc_id').aggregate([('hit', 'sum'),
                                            ([], 'count_all')])
        return pa.table({'doc_id': g.column('doc_id'),
                         'n_grams': g.column('count_all').cast(pa.int64()),
                         'n_hit': g.column('hit_sum').cast(pa.int64())})

    def zero_totals(batch: pa.Table) -> pa.Table:
        """Test docs with < k tokens (no grams) — vectorized token
        count, no md5, so the extra read is cheap."""
        ids = batch.column('doc_id').to_numpy(zero_copy_only=False)
        is_train = (hash63_keys(ids) % train_mod) < train_lt
        n_tok = pc.count_substring_regex(
            batch.column('text'), pattern=r'\S+'
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (~is_train) & (n_tok < k)
        ids = ids[keep]
        return pa.table({'doc_id': pa.array(ids, pa.int64()),
                         'n_grams': pa.array(np.zeros(len(ids), np.int64)),
                         'n_hit': pa.array(np.zeros(len(ids), np.int64))})

    def doc_fold(group: pa.Table) -> pa.Table:
        g = group.group_by('doc_id').aggregate([('n_grams', 'sum'),
                                                ('n_hit', 'sum')])
        n_hit = g.column('n_hit_sum').cast(pa.int64())
        return pa.table({
            'doc_id': g.column('doc_id'),
            'n_grams': g.column('n_grams_sum').cast(pa.int64()),
            'n_hit': n_hit,
            'contaminated': pc.greater(n_hit, pa.scalar(0)),
        })

    _, width = pool()
    partials = read_table(sf_dir, 'documents', columns=['doc_id', 'text'],
                          min_blocks=width) \
        .map_batches(emit_grams, batch_format='pyarrow',
                     zero_copy_batch=True) \
        .groupby('bucket').map_groups(bucket_fold, batch_format='pyarrow')
    zeros = read_table(sf_dir, 'documents', columns=['doc_id', 'text']) \
        .map_batches(zero_totals, batch_format='pyarrow',
                     zero_copy_batch=True)

    def attach_dbucket(batch: pa.Table) -> pa.Table:
        cols = [c for c in batch.column_names if c != 'bucket']
        t = batch.select(cols)
        ids = t.column('doc_id').to_numpy(zero_copy_only=False)
        return t.append_column('dbucket', pa.array(ids & (nb - 1),
                                                   pa.int64()))

    return partials.union(zeros) \
        .map_batches(attach_dbucket, batch_format='pyarrow') \
        .groupby('dbucket').map_groups(doc_fold, batch_format='pyarrow')


def decontam_oracle_sql(k=K, train_mod=TRAIN_MOD, train_lt=TRAIN_LT):
    """Independent DuckDB recomputation: same md5 split, same md5 gram
    join (md5_number_lower = the hash63 byte rule)."""
    return """
WITH s AS (
  SELECT doc_id, text,
         ((md5_number_lower(doc_id::VARCHAR) & 9223372036854775807)
          % {mod}) < {lt} AS is_train
  FROM documents
), toks AS (
  SELECT doc_id, is_train, regexp_extract_all(text, '\\S+') AS tk FROM s
), g AS (
  SELECT doc_id, is_train,
         unnest(list_distinct(list_transform(
             generate_series(1, greatest(len(tk) - {km1}, 0)),
             i -> array_to_string(tk[i:i+{km1}], ' ')))) AS gram
  FROM toks
), gh AS (
  SELECT doc_id, is_train,
         (md5_number_lower(gram) & 9223372036854775807)::BIGINT AS gh
  FROM g
), tr AS (SELECT DISTINCT gh FROM gh WHERE is_train),
te AS (SELECT doc_id, gh FROM gh WHERE NOT is_train),
tot AS (SELECT doc_id, count(*)::BIGINT AS n_grams FROM te GROUP BY doc_id),
hits AS (SELECT te.doc_id, count(*)::BIGINT AS n_hit
         FROM te JOIN tr USING (gh) GROUP BY te.doc_id)
SELECT s.doc_id,
       coalesce(tot.n_grams, 0)::BIGINT AS n_grams,
       coalesce(hits.n_hit, 0)::BIGINT AS n_hit,
       coalesce(hits.n_hit, 0) > 0 AS contaminated
FROM s LEFT JOIN tot USING (doc_id) LEFT JOIN hits USING (doc_id)
WHERE NOT s.is_train
""".format(mod=train_mod, lt=train_lt, km1=k - 1)


def doc_ngram_novelty(sf_dir, k=5, num_buckets=64):
    """FIRST-OCCURRENCE ATTRIBUTION — per document: what fraction of
    its distinct k-grams appear for the FIRST time in the corpus (first
    = smallest doc_id)?  The novelty curve a dedup owner reads to find
    where a crawl stops contributing new text (novelty → 0 means the
    tail is re-crawl).  Output: (doc_id, n_grams, n_novel, novelty r6)
    for every doc with ≥ 1 gram.

    Shape (the decontaminate_split machinery with a MIN attribution
    instead of a split semi-join): distinct (doc, gram) rows route by
    gram hash; a gram's global min-doc resolves INSIDE its bucket
    (Arrow group_by on the gram string — the hash only routes, identity
    is the string); per-doc partials co-partition once by doc bucket.
    novelty is one division of int64-exact operands."""
    import re as _re

    from .common import round_half_up

    nb = num_buckets
    token_re = _TOKEN_RE

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch.column('doc_id').to_numpy(zero_copy_only=False)
        out_g, out_d = [], []
        for i, txt in enumerate(batch.column('text').to_pylist()):
            toks = token_re.findall(txt)
            grams = list({' '.join(toks[j:j + k])
                          for j in range(len(toks) - k + 1)})
            if not grams:
                continue
            out_g.extend(grams)
            out_d.append(np.full(len(grams), ids[i], np.int64))
        if not out_g:
            return pa.table({'gram': pa.array([], pa.string()),
                             'doc_id': pa.array([], pa.int64()),
                             'bucket': pa.array([], pa.int64())})
        gh = hash63_strings(out_g)
        return pa.table({
            'gram': pa.array(out_g, pa.string()),
            'doc_id': pa.array(np.concatenate(out_d), pa.int64()),
            'bucket': pa.array(gh & (nb - 1), pa.int64()),
        })

    def gram_fold(group: pa.Table) -> pa.Table:
        m = group.group_by('gram').aggregate([('doc_id', 'min')])
        m = m.rename_columns(['gram', 'first_doc'])
        j = group.select(['gram', 'doc_id']).join(m, keys='gram',
                                                  join_type='inner')
        novel = pc.cast(pc.equal(j.column('doc_id'),
                                 j.column('first_doc')), pa.int64())
        t = pa.table({'doc_id': j.column('doc_id'), 'novel': novel})
        g = t.group_by('doc_id').aggregate([('novel', 'sum'),
                                            ([], 'count_all')])
        g = g.rename_columns(['doc_id', 'n_novel', 'n_grams'])
        ids = g.column('doc_id').to_numpy(zero_copy_only=False)
        return g.append_column('dbucket',
                               pa.array(hash63_keys(ids) & (nb - 1),
                                        pa.int64()))

    def doc_fold(group: pa.Table) -> pa.Table:
        g = group.group_by('doc_id').aggregate([('n_novel', 'sum'),
                                                ('n_grams', 'sum')])
        nv = g.column('n_novel_sum').to_numpy(zero_copy_only=False) \
              .astype(np.int64)
        ng = g.column('n_grams_sum').to_numpy(zero_copy_only=False) \
              .astype(np.int64)
        return pa.table({
            'doc_id': g.column('doc_id'),
            'n_grams': pa.array(ng, pa.int64()),
            'n_novel': pa.array(nv, pa.int64()),
            'novelty': pa.array(
                round_half_up(nv.astype(np.float64)
                              / ng.astype(np.float64), 6), pa.float64()),
        })

    _, width = pool()
    return read_table(sf_dir, 'documents', columns=['doc_id', 'text'],
                      min_blocks=width) \
        .map_batches(emit, batch_format='pyarrow', zero_copy_batch=True) \
        .groupby('bucket').map_groups(gram_fold, batch_format='pyarrow') \
        .groupby('dbucket').map_groups(doc_fold, batch_format='pyarrow')


def novelty_oracle_sql(k=5):
    return r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS tk FROM documents
), g AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             generate_series(1, greatest(len(tk) - {km1}, 0)),
             i -> array_to_string(tk[i:i+{km1}], ' ')))) AS gram
  FROM toks
), m AS (
  SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram
), s AS (
  SELECT g.doc_id, count(*)::BIGINT AS n_grams,
         count(*) FILTER (m.first_doc = g.doc_id)::BIGINT AS n_novel
  FROM g JOIN m USING (gram) GROUP BY g.doc_id
)
SELECT doc_id, n_grams, n_novel,
       floor(CAST(n_novel AS DOUBLE) / CAST(n_grams AS DOUBLE)
             * 1000000 + 0.5) / 1000000 AS novelty
FROM s
""".format(km1=k - 1)
