"""Deduplication over the ``documents`` table.

Four families, each with its own scale shape:

- ``dedup_exact``       — per-batch PARTIAL group-by (Arrow ``Table.group_by``
                          combiner) → one small hash-keyed groupby shuffle.
- ``ngram_jaccard_pairs``— exact word-3-gram Jaccard within blocking key
                          (``lang``): the oracle-verifiable baseline.  O(n²)
                          per block — at 100 TB this is the verification tier
                          for candidates, not the discovery tier.
- ``minhash_near_dup``  — the discovery tier that scales (Broder 1997,
                          'On the resemblance and containment of documents'):
                          128-perm MinHash →
                          32×4 LSH bands → band-key groupby → pair sides
                          union doc text, one groupby(doc_id) attach
                          (dedup folded in) → pair-key groupby exact-
                          Jaccard verify (fully distributed; no driver
                          drain).
- ``simhash_near_dup``  — 64-bit SimHash (Charikar 2002, STOC similarity
                          estimation), 4×16-bit chunk blocking, Hamming
                          distance verify.

Jaccard here is over DISTINCT word-3-gram sets, integer |∩|/|∪| arithmetic —
bit-identical to the DuckDB oracle's list_intersect/list_distinct math.
"""

import hashlib
import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .common import round_half_up, table_path, read_table, pool

__all__ = ['dedup_exact', 'dedup_exact_payloads', 'ngram_jaccard_pairs', 'ngram_containment_pairs',
           'minhash_near_dup', 'simhash_near_dup', 'shingle_set',
           'shared_span_pairs', 'dedup_normalized', 'source_dup_rate']

_TOKEN_RE = re.compile(r'\S+')

NUM_PERM = 128
BANDS = 32          # 32 bands × 4 rows: P(catch | j=0.8) ≈ 1 - (1-0.8^4)^32 ≈ 1.0
ROWS_PER_BAND = NUM_PERM // BANDS
_MERSENNE = (1 << 61) - 1


def _perm_params():
    rng = np.random.RandomState(12345)
    a = rng.randint(1, 1 << 31, size=NUM_PERM).astype(np.uint64)
    b = rng.randint(0, 1 << 31, size=NUM_PERM).astype(np.uint64)
    return a, b


def shingle_set(text, k=3):
    """Distinct word k-gram strings (the exact-Jaccard universe)."""
    toks = _TOKEN_RE.findall(text)
    return {' '.join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def _gram_hash32(gram):
    """32-bit k-gram hash shared with the DuckDB oracle: low 32 bits of
    ``md5_number_lower`` (last 8 md5 digest bytes little-endian).  32-bit
    so the permutation math a*h+b stays < 2^63 in uint64."""
    d = hashlib.md5(gram.encode('utf-8')).digest()
    return int.from_bytes(d[8:16], 'little') & 0xFFFFFFFF


def _shingle_hashes(text, k=3):
    """Hash of each distinct word k-gram (the MinHash universe)."""
    s = shingle_set(text, k)
    if not s:
        return np.empty(0, dtype=np.uint64)
    return np.fromiter((_gram_hash32(x) for x in s),
                       dtype=np.uint64, count=len(s))


def _jaccard(sa, sb):
    inter = len(sa & sb)
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


# ---------------------------------------------------------------- exact dedup

def dedup_exact(sf_dir, num_buckets=64):
    """Survivor (min doc_id) + copy count per distinct text.

    Partial aggregation inside map_batches (Arrow group_by combiner) keeps
    the shuffle payload at one row per distinct hash per block — at 100 TB
    the keyed groupby moves combiner output, never raw text.  The exchange
    is BUCKETED on the hash (``md5 & (nb-1)``), not the raw fp: grouping
    by raw fp would pay the ~50µs map_groups tax per DISTINCT DOCUMENT
    (billions of groups); per bucket one C++ ``group_by(fp)`` folds all
    its fps at once.
    """
    import hashlib
    nb = num_buckets

    def partial(batch: pa.Table) -> pa.Table:
        digs = [hashlib.md5(t.encode('utf-8')).digest()
                for t in batch.column('text').to_pylist()]
        fps = pa.array([d.hex() for d in digs], pa.string())
        # two digest bytes: a single byte silently caps effective buckets at
        # 256 (empty buckets above that — skewed exchange at cluster scale)
        bks = pa.array([int.from_bytes(d[:2], 'little') & (nb - 1)
                        for d in digs], pa.int64())
        t = pa.table({'fp': fps, 'bucket': bks, 'doc_id': batch.column('doc_id')})
        g = t.group_by(['fp', 'bucket']).aggregate(
            [('doc_id', 'min'), ('doc_id', 'count')])
        return g.rename_columns(['fp', 'bucket', 'doc_id_min', 'cnt'])

    def final(group: pa.Table) -> pa.Table:
        g = group.group_by('fp').aggregate(
            [('doc_id_min', 'min'), ('cnt', 'sum')])
        return pa.table({
            'doc_id': g.column('doc_id_min_min').cast(pa.int64()),
            'n_copies': g.column('cnt_sum').cast(pa.int64()),
        })

    ds = read_table(sf_dir, 'documents', columns=['doc_id', 'text'],
                    min_blocks=pool()[1])
    return (ds.map_batches(partial, batch_format='pyarrow', zero_copy_batch=True)
              .groupby('bucket').map_groups(final, batch_format='pyarrow'))


def dedup_exact_payloads(corpus_dir, num_buckets=64):
    """Exact dedup over the TRANSCRIPTS corpus payloads (corpus hygiene on
    the flagship input): distinct payload fingerprints + copy counts +
    first (conv_id, turn_idx) survivor.  Same bucketed combiner-then-
    groupby shape as :func:`dedup_exact`, keyed on md5 of the PDF payload
    — at 10^12 turns this is the stage that caps re-extraction of
    repeated payloads, and the per-fp fold runs inside each bucket's C++
    ``group_by``, never as a per-fp Python group.
    """
    import hashlib
    nb = num_buckets

    def partial(batch: pa.Table) -> pa.Table:
        digs = [hashlib.md5(t.encode('utf-8')).digest()
                for t in batch.column('text').to_pylist()]
        fps = pa.array([d.hex() for d in digs], pa.string())
        bks = pa.array([int.from_bytes(d[:2], 'little') & (nb - 1)
                        for d in digs], pa.int64())
        t = pa.table({'fp': fps, 'bucket': bks,
                      'conv_id': batch.column('conv_id'),
                      'turn_idx': batch.column('turn_idx')})
        g = t.sort_by([('fp', 'ascending'), ('conv_id', 'ascending'),
                       ('turn_idx', 'ascending')]) \
             .group_by(['fp', 'bucket'], use_threads=False) \
             .aggregate([('conv_id', 'first'), ('turn_idx', 'first'),
                         ('fp', 'count')])
        return g.rename_columns(['fp', 'bucket', 'conv_id', 'turn_idx',
                                 'n_copies'])

    def final(group: pa.Table) -> pa.Table:
        g = group.sort_by([('fp', 'ascending'), ('conv_id', 'ascending'),
                           ('turn_idx', 'ascending')]) \
                 .group_by('fp', use_threads=False) \
                 .aggregate([('conv_id', 'first'), ('turn_idx', 'first'),
                             ('n_copies', 'sum')])
        return pa.table({
            'fp': g.column('fp'),
            'conv_id': g.column('conv_id_first'),
            'turn_idx': g.column('turn_idx_first'),
            'n_copies': g.column('n_copies_sum').cast(pa.int64()),
        })

    ds = ray.data.read_parquet(corpus_dir, columns=['conv_id', 'turn_idx', 'text'])
    return (ds.map_batches(partial, batch_format='pyarrow', zero_copy_batch=True)
              .groupby('bucket').map_groups(final, batch_format='pyarrow'))


# ------------------------------------------------------- exact n-gram Jaccard

def ngram_jaccard_pairs(sf_dir, threshold=0.8, k=3, block_col='lang',
                        max_block_rows=200_000):
    """All pairs within a blocking key with word-k-gram Jaccard ≥ threshold.

    Exact (no approximation) → DuckDB-oracle-verifiable.  The per-group
    O(n²) loop is the documented partitioning assumption: blocks must fit a
    worker (true for per-language blocks only at test scale; the scale path
    is minhash_near_dup).  That contract is ENFORCED, not assumed: a block
    over ``max_block_rows`` raises loudly (no silent cap, no silent OOM)
    and names the discovery-tier alternative.
    """
    def pairs(group: pa.Table) -> pa.Table:
        if group.num_rows > max_block_rows:
            key = group.column(block_col)[0].as_py()
            raise ValueError(
                "ngram_jaccard_pairs: block %s=%r has %d rows "
                "(> max_block_rows=%d); the exact O(n^2) verify tier only "
                "handles worker-sized blocks — use minhash_near_dup as the "
                "discovery tier for blocks this large, or raise "
                "max_block_rows explicitly."
                % (block_col, key, group.num_rows, max_block_rows))
        ids = group.column('doc_id').to_pylist()
        texts = group.column('text').to_pylist()
        sets = [shingle_set(t, k) for t in texts]
        order = sorted(range(len(ids)), key=lambda i: ids[i])
        out_a, out_b, out_j = [], [], []
        for ii in range(len(order)):
            i = order[ii]
            if not sets[i]:
                continue
            for jj in range(ii + 1, len(order)):
                j = order[jj]
                if not sets[j]:
                    continue
                jac = _jaccard(sets[i], sets[j])
                if jac >= threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_j.append(jac)
        return pa.table({
            'doc_id_a': pa.array(out_a, pa.int64()),
            'doc_id_b': pa.array(out_b, pa.int64()),
            'jac': pa.array(round_half_up(out_j, 6) if out_j else [], pa.float64()),
        })

    ds = read_table(sf_dir, 'documents', columns=['doc_id', 'text', block_col],
                    min_blocks=pool()[1])
    return ds.groupby(block_col).map_groups(pairs, batch_format='pyarrow')


def ngram_containment_pairs(sf_dir, threshold=0.5, k=3, block_col='lang',
                            max_block_rows=200_000):
    """Ordered pairs where doc A's word-k-gram set is ≥ ``threshold``
    CONTAINED in doc B's (Broder containment |A∩B| / |A|) — the asymmetric
    sibling of ngram_jaccard_pairs that catches SUB-document duplication:
    a snippet pasted into a larger page has low Jaccard (the union is
    dominated by B) but high containment, so symmetric dedup misses it.

    Same enforced block contract as the Jaccard tier (this is the exact
    VERIFY tier; discovery at scale goes through minhash/simhash): a block
    over ``max_block_rows`` raises loudly rather than going quadratic.
    Emits both directions when both clear the threshold (containment is
    not symmetric).
    """
    def pairs(group: pa.Table) -> pa.Table:
        if group.num_rows > max_block_rows:
            key = group.column(block_col)[0].as_py()
            raise ValueError(
                "ngram_containment_pairs: block %s=%r has %d rows "
                "(> max_block_rows=%d); the exact O(n^2) verify tier only "
                "handles worker-sized blocks — use minhash_near_dup as the "
                "discovery tier for blocks this large, or raise "
                "max_block_rows explicitly."
                % (block_col, key, group.num_rows, max_block_rows))
        ids = group.column('doc_id').to_pylist()
        texts = group.column('text').to_pylist()
        sets = [shingle_set(t, k) for t in texts]
        order = sorted(range(len(ids)), key=lambda i: ids[i])
        out_a, out_b, out_c = [], [], []
        for ii in range(len(order)):
            i = order[ii]
            if not sets[i]:
                continue
            for jj in range(len(order)):
                j = order[jj]
                if jj == ii or not sets[j]:
                    continue
                cont = len(sets[i] & sets[j]) / len(sets[i])
                if cont >= threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_c.append(cont)
        return pa.table({
            'doc_id_a': pa.array(out_a, pa.int64()),
            'doc_id_b': pa.array(out_b, pa.int64()),
            'containment': pa.array(
                round_half_up(out_c, 6) if out_c else [], pa.float64()),
        })

    ds = read_table(sf_dir, 'documents', columns=['doc_id', 'text', block_col],
                    min_blocks=pool()[1])
    return ds.groupby(block_col).map_groups(pairs, batch_format='pyarrow')


# ------------------------------------------------------------- MinHash + LSH

_PERM_CACHE = {}


def _perms():
    """Per-process lazy perm params (derivation is µs-cheap and seeded, so
    a plain-function TASK stage works — no actor pool to spawn; the warm
    Ray worker pool from the read stage is reused, saving ~3-5 s of
    per-query actor startup)."""
    if 'p' not in _PERM_CACHE:
        _PERM_CACHE['p'] = _perm_params()
    return _PERM_CACHE['p']


def _make_signatures(k, nb):
    def signatures(batch: pa.Table) -> pa.Table:
        """Emits one row per (band, doc) with the band key — the LSH
        'explode' — plus the band-hash bucket for the pair groupby."""
        a, b = _perms()
        band_keys, doc_ids = [], []
        ids = batch.column('doc_id').to_pylist()
        for did, text in zip(ids, batch.column('text').to_pylist()):
            h = _shingle_hashes(text, k)
            if h.size == 0:
                continue
            # (P, n) permuted hashes; a < 2^31, h < 2^32 → a*h+b < 2^63: no overflow
            sig = ((a[:, None] * h[None, :] + b[:, None]) % _MERSENNE).min(axis=1)
            bands = sig.reshape(BANDS, ROWS_PER_BAND)
            for bi in range(BANDS):
                key = (bi << 32) | zlib.crc32(bands[bi].tobytes())
                band_keys.append(key)
                doc_ids.append(did)
        keys = np.asarray(band_keys, dtype=np.int64)
        return pa.table({'band_key': pa.array(keys, pa.int64()),
                         'doc_id': pa.array(doc_ids, pa.int64()),
                         'bucket': pa.array(keys & (nb - 1), pa.int64())})
    return signatures


_PAIRS_EMPTY = pa.table({'doc_id_a': pa.array([], pa.int64()),
                         'doc_id_b': pa.array([], pa.int64())})

_ATTACHED_EMPTY = pa.table({
    'doc_id_a': pa.array([], pa.int64()),
    'doc_id_b': pa.array([], pa.int64()),
    'side': pa.array([], pa.int64()),
    'text': pa.array([], pa.string()),
    'vbucket': pa.array([], pa.int64()),
})

_VERIFIED_EMPTY = pa.table({
    'doc_id_a': pa.array([], pa.int64()),
    'doc_id_b': pa.array([], pa.int64()),
    'jac': pa.array([], pa.float64()),
})


def _make_emit_pairs_bucket(max_band_docs=None):
    """One call per HASH BUCKET of band keys (NOT per band — per-band
    map_groups costs ~50µs of Python/Arrow per group, and bands are
    near-singleton, so 160k groups burned 8 s at sf0.1 where this sweep
    takes milliseconds).  Sort by band_key (C++), find group boundaries
    with numpy, emit pairs only for multi-doc bands, dedupe (a, b) within
    the bucket via Arrow group_by (cross-bucket duplicates of a pair are
    folded later, in the attach stage's distinct).

    Band-size telemetry makes the documented O(m²)-per-band corner
    OBSERVABLE: the max band size per bucket is logged, and with
    ``max_band_docs`` set, bands beyond it are skipped with a loud
    logged drop count (never a silent cap — default None drops nothing,
    preserving oracle parity)."""
    def emit(group: pa.Table) -> pa.Table:
        import logging
        log = logging.getLogger('engine.ops.dedup')
        t = group.sort_by([('band_key', 'ascending'), ('doc_id', 'ascending')])
        keys = t.column('band_key').to_numpy()
        ids = t.column('doc_id').to_numpy()
        if keys.size == 0:
            return _PAIRS_EMPTY
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        ends = np.r_[starts[1:], keys.size]
        sizes = ends - starts
        max_band = int(sizes.max())
        if max_band >= 1000:
            log.warning('minhash band telemetry: bucket max band size %d '
                        '(%d bands >= 1000) — O(m^2) pair emission; run '
                        'exact dedup first to cap m', max_band,
                        int((sizes >= 1000).sum()))
        hot = np.flatnonzero(sizes >= 2)
        if max_band_docs is not None:
            over = hot[sizes[hot] > max_band_docs]
            if over.size:
                dropped = int((sizes[over] * (sizes[over] - 1) // 2).sum())
                log.error('minhash: SKIPPING %d bands over max_band_docs=%d '
                          '(~%d candidate pairs dropped; near-dups may be '
                          'missed — run exact dedup first or raise the cap)',
                          over.size, max_band_docs, dropped)
                hot = hot[sizes[hot] <= max_band_docs]
        out_a, out_b = [], []
        for gi in hot:
            d = ids[starts[gi]:ends[gi]]      # sorted, unique within a band
            ia, ib = np.triu_indices(d.size, k=1)
            out_a.append(d[ia])
            out_b.append(d[ib])
        if not out_a:
            return _PAIRS_EMPTY
        tbl = pa.table({'doc_id_a': pa.array(np.concatenate(out_a), pa.int64()),
                        'doc_id_b': pa.array(np.concatenate(out_b), pa.int64())})
        return tbl.group_by(['doc_id_a', 'doc_id_b']).aggregate([])
    return emit


def _make_explode_pair_sides(nb):
    def explode(batch: pa.Table) -> pa.Table:
        """Candidate pair → two keyed side rows (key = one member doc,
        other = the counterpart).  side 0: key is doc_id_a; side 1: key is
        doc_id_b.  bucket = key & (nb-1) co-partitions with the doc rows."""
        a = batch.column('doc_id_a')
        b = batch.column('doc_id_b')
        n = batch.num_rows
        key = pa.chunked_array(list(a.chunks) + list(b.chunks), pa.int64())
        return pa.table({
            'key': key,
            'other': pa.chunked_array(list(b.chunks) + list(a.chunks),
                                      pa.int64()),
            'side': pa.array([0] * n + [1] * n, pa.int64()),
            'text': pa.nulls(2 * n, pa.string()),
            'bucket': pa.array(key.to_numpy() & (nb - 1), pa.int64()),
        })
    return explode


def _make_doc_side_rows(nb):
    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            'key': batch.column('doc_id'),
            'other': pa.nulls(n, pa.int64()),
            'side': pa.nulls(n, pa.int64()),
            'text': batch.column('text'),
            'bucket': pa.array(batch.column('doc_id').to_numpy() & (nb - 1),
                               pa.int64()),
        })
    return fn


def _make_attach_bucket(nb):
    def attach(group: pa.Table) -> pa.Table:
        """Per doc-hash bucket of the unioned (doc-text ∪ pair-side) rows:
        attach each doc's text to its DISTINCT (other, side) rows — the
        distinct fold is also the candidate dedup (the same pair surfaces
        once per matching LSH band) — via a local C++ hash join.  Emits a
        pair-hash ``vbucket`` so verification is likewise one call per
        bucket."""
        import pyarrow.compute as pc
        is_doc = pc.is_null(group.column('side'))
        docs = group.filter(is_doc).select(['key', 'text'])
        sides = group.filter(pc.invert(is_doc)).select(['key', 'other', 'side'])
        if sides.num_rows == 0 or docs.num_rows == 0:
            return _ATTACHED_EMPTY
        distinct = sides.group_by(['key', 'other', 'side']).aggregate([])
        joined = distinct.join(docs, keys='key', join_type='inner') \
                         .combine_chunks()
        side_c = joined.column('side')
        is_a = pc.equal(side_c, 0)
        a = pc.if_else(is_a, joined.column('key'), joined.column('other'))
        b = pc.if_else(is_a, joined.column('other'), joined.column('key'))
        an = a.to_numpy().astype(np.uint64)
        bn = b.to_numpy().astype(np.uint64)
        vbucket = ((an * np.uint64(0x9E3779B97F4A7C15)) ^ bn) & np.uint64(nb - 1)
        return pa.table({
            'doc_id_a': a,
            'doc_id_b': b,
            'side': side_c,
            'text': joined.column('text'),
            'vbucket': pa.array(vbucket.astype(np.int64), pa.int64()),
        })
    return attach


def _make_bucket_verifier(threshold, k):
    def verify(group: pa.Table) -> pa.Table:
        """Per pair-hash bucket: sort so each candidate pair is two
        consecutive rows (side 0 carrying text_a, side 1 text_b), then
        exact word-k-gram Jaccard per candidate.  Per-candidate Python is
        irreducible here (set intersection over shingle strings), but the
        batch/table overhead is once per bucket."""
        t = group.sort_by([('doc_id_a', 'ascending'),
                           ('doc_id_b', 'ascending'),
                           ('side', 'ascending')])
        a = t.column('doc_id_a').to_numpy()
        b = t.column('doc_id_b').to_numpy()
        texts = t.column('text').to_pylist()
        n = t.num_rows
        if n % 2:
            raise ValueError('unpaired candidate side row')
        cache = {}

        def sset(doc_id, text):
            s = cache.get(doc_id)
            if s is None:
                s = shingle_set(text, k)
                cache[doc_id] = s
            return s

        out_a, out_b, out_j = [], [], []
        for i in range(0, n, 2):
            if a[i] != a[i + 1] or b[i] != b[i + 1]:
                raise ValueError('unpaired candidate side row')
            jac = _jaccard(sset(a[i], texts[i]), sset(b[i], texts[i + 1]))
            if jac >= threshold:
                out_a.append(int(a[i]))
                out_b.append(int(b[i]))
                out_j.append(jac)
        if not out_a:
            return _VERIFIED_EMPTY
        return pa.table({
            'doc_id_a': pa.array(out_a, pa.int64()),
            'doc_id_b': pa.array(out_b, pa.int64()),
            'jac': pa.array(round_half_up(out_j, 6), pa.float64()),
        })
    return verify


def minhash_near_dup(sf_dir, threshold=0.8, k=3, num_buckets=64,
                     max_band_docs=None):
    """MinHash+LSH near-dup discovery, exact-verified — FULLY DISTRIBUTED.

    Shuffle accounting (three groupby exchanges, no driver-side candidate
    drain, no broadcast shingle lookup — on a boilerplate-heavy corpus the
    candidate set is O(corpus) and must stay distributed).  Every exchange
    is HASH-BUCKETED (key & (num_buckets-1)) rather than keyed on the raw
    band/doc/pair value: map_groups pays ~50µs of Python+Arrow per group,
    so grouping by the raw key (160k near-singleton bands at sf0.1) costs
    8 s where num_buckets vectorized bucket sweeps cost milliseconds.
    ``num_buckets`` (power of two) scales with the cluster, not the data.

    1. bucketed band groupby: per bucket, a C++ sort + numpy boundary
       sweep emits pairs for multi-doc bands only, locally deduped;
    2. pairs explode into two keyed side rows and union with the
       (doc_id, text) rows; ONE bucketed groupby co-partitions them and a
       local C++ hash join attaches each doc's text to its pair sides —
       the distinct fold inside doubles as global candidate dedup
       (co-partition pattern, cf. relational.events_asof_orders);
    3. pair-hash-bucketed groupby brings the two attached sides together;
       exact word-k-gram Jaccard verifies each candidate once.

    Earlier designs: driver-side candidate drain + broadcast shingle sets
    (round 1 — O(corpus) driver state on dup-heavy corpora), then two
    ``Dataset.join``s (each with ~2.5 s fixed aggregator-pool startup
    per query at small scale).  The bucketed co-partition moves the same
    bytes with one fewer exchange and no per-group Python tax.

    Known O(n²) corner, documented AND observable: a band holding m docs
    emits m(m-1)/2 candidate pairs (exact-duplicate clusters land in the
    same band for all 32 bands).  Run exact dedup first — its survivors
    cap m at the near-dup (not exact-dup) cluster size.  The pair-emit
    stage logs max-band-size telemetry, and ``max_band_docs`` optionally
    skips oversized bands with a loud logged drop count (default None:
    nothing dropped).
    """
    if num_buckets & (num_buckets - 1):
        raise ValueError('num_buckets must be a power of two')
    import os

    from .spill_exchange import bucketed_group_map

    docs = read_table(sf_dir, 'documents', columns=['doc_id', 'text'],
                      min_blocks=pool()[1])
    band_rows = docs.map_batches(_make_signatures(k, num_buckets),
                                 batch_format='pyarrow',
                                 zero_copy_batch=True)
    # band exchange rides the external-spill path once it's big enough:
    # band rows are 24 B × BANDS per doc ≈ 0.75× the compressed corpus
    # file size (~1 KB/doc), so the file size is the approx_bytes proxy;
    # below the threshold Ray's in-memory groupby keeps its lower fixed
    # cost (GRAFT_OPS_SPILL=1/0 force-overrides for A/B)
    try:
        approx = os.path.getsize(table_path(sf_dir, 'documents'))
    except OSError:
        approx = None
    cand = bucketed_group_map(band_rows,
                              _make_emit_pairs_bucket(max_band_docs),
                              num_buckets, approx_bytes=approx)
    sides = cand.map_batches(_make_explode_pair_sides(num_buckets),
                             batch_format='pyarrow', zero_copy_batch=True)
    doc_side = docs.map_batches(_make_doc_side_rows(num_buckets),
                                batch_format='pyarrow', zero_copy_batch=True)
    attached = bucketed_group_map(sides.union(doc_side),
                                  _make_attach_bucket(num_buckets),
                                  num_buckets, approx_bytes=approx)
    return attached.groupby('vbucket').map_groups(
        _make_bucket_verifier(threshold, k), batch_format='pyarrow')


# ------------------------------------------------------------------- SimHash

_SIM_CHUNKS = 4  # 4 × 16-bit chunks: catches all pairs with Hamming ≤ 3·16/... (pigeonhole: any pair with ≤3 differing bits shares ≥1 chunk)


def _simhash64(text):
    toks = _TOKEN_RE.findall(text)
    if not toks:
        return 0
    # 64-bit token hash = md5_number_lower (oracle-shared; duplicates kept)
    hs = np.fromiter(
        (int.from_bytes(hashlib.md5(t.encode('utf-8')).digest()[8:16], 'little')
         for t in toks), dtype=np.uint64, count=len(toks))
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def _simhash_rows(batch: pa.Table) -> pa.Table:
    keys, ids, sigs = [], [], []
    for did, text in zip(batch.column('doc_id').to_pylist(),
                         batch.column('text').to_pylist()):
        sh = _simhash64(text)
        for c in range(_SIM_CHUNKS):
            chunk = (sh >> (16 * c)) & 0xFFFF
            keys.append((c << 16) | chunk)
            ids.append(did)
            sigs.append(sh - (1 << 63))  # store as signed int64
    return pa.table({'chunk_key': pa.array(keys, pa.int64()),
                     'doc_id': pa.array(ids, pa.int64()),
                     'sig': pa.array(sigs, pa.int64())})


_POP8 = np.array([bin(i).count('1') for i in range(256)], dtype=np.uint8)

_SIMPAIRS_EMPTY = pa.table({'doc_id_a': pa.array([], pa.int64()),
                            'doc_id_b': pa.array([], pa.int64()),
                            'hamming': pa.array([], pa.int64())})


def _popcount64(x):
    """Vectorized 64-bit popcount (numpy<2 has no bitwise_count): byte
    view + 256-entry lookup table."""
    b = np.ascontiguousarray(x, dtype=np.uint64).view(np.uint8)
    return _POP8[b].reshape(len(x), 8).sum(axis=1).astype(np.int64)


def simhash_near_dup(sf_dir, max_hamming=3, num_buckets=64):
    """SimHash near-dup: pairs sharing a 16-bit chunk, Hamming ≤ max_hamming.

    Pigeonhole guarantee: any pair within Hamming ≤ 3 over 64 bits agrees on
    at least one of the 4 chunks → exact recall for the advertised radius.

    Both exchanges are hash-BUCKETED (cf. minhash_near_dup): grouping on
    raw chunk_key (up to 4·2^16 near-singleton groups) or on the raw pair
    (one group per candidate) pays the ~50µs map_groups tax per group;
    per bucket the chunk sweep is a C++ sort + numpy boundary scan with a
    LUT popcount over the XOR matrix, and pair dedup is one Arrow
    ``group_by``.
    """
    nb = num_buckets
    docs = read_table(sf_dir, 'documents', columns=['doc_id', 'text'],
                      min_blocks=pool()[1])
    rows = docs.map_batches(_simhash_rows, batch_format='pyarrow',
                            zero_copy_batch=True)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = batch.column('chunk_key').to_numpy(zero_copy_only=False) & (nb - 1)
        return batch.append_column('bucket', pa.array(b, pa.int64()))

    def pairs_bucket(group: pa.Table) -> pa.Table:
        t = group.sort_by([('chunk_key', 'ascending'), ('doc_id', 'ascending')])
        keys = t.column('chunk_key').to_numpy()
        ids = t.column('doc_id').to_numpy()
        # signed storage is sig - 2^63: the int64 BIT PATTERN equals the
        # raw uint64 signature with the top bit flipped, and the flip
        # cancels under XOR — so XOR of the views is XOR of signatures
        sigs = t.column('sig').to_numpy().view(np.uint64)
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        ends = np.r_[starts[1:], keys.size]
        hot = np.flatnonzero(ends - starts >= 2)
        out_a, out_b, out_h = [], [], []
        for gi in hot:
            d = ids[starts[gi]:ends[gi]]
            sg = sigs[starts[gi]:ends[gi]]
            ia, ib = np.triu_indices(d.size, k=1)
            h = _popcount64(sg[ia] ^ sg[ib])
            m = h <= max_hamming
            out_a.append(d[ia][m])
            out_b.append(d[ib][m])
            out_h.append(h[m])
        if not out_a:
            return _SIMPAIRS_EMPTY
        tbl = pa.table({'doc_id_a': pa.array(np.concatenate(out_a), pa.int64()),
                        'doc_id_b': pa.array(np.concatenate(out_b), pa.int64()),
                        'hamming': pa.array(np.concatenate(out_h), pa.int64())})
        g = tbl.group_by(['doc_id_a', 'doc_id_b']).aggregate([('hamming', 'min')])
        return g.rename_columns(['doc_id_a', 'doc_id_b', 'hamming'])

    def add_pair_bucket(batch: pa.Table) -> pa.Table:
        a = batch.column('doc_id_a').to_numpy(zero_copy_only=False)
        b = batch.column('doc_id_b').to_numpy(zero_copy_only=False)
        pb = ((a * 1000003) ^ b) & (nb - 1)
        return batch.append_column('pbucket', pa.array(pb, pa.int64()))

    def dedupe_bucket(group: pa.Table) -> pa.Table:
        g = group.group_by(['doc_id_a', 'doc_id_b']).aggregate(
            [('hamming', 'min')])
        return g.rename_columns(['doc_id_a', 'doc_id_b', 'hamming'])

    cand = rows.map_batches(add_bucket, batch_format='pyarrow',
                            zero_copy_batch=True) \
        .groupby('bucket').map_groups(pairs_bucket, batch_format='pyarrow')
    return cand.map_batches(add_pair_bucket, batch_format='pyarrow',
                            zero_copy_batch=True) \
        .groupby('pbucket').map_groups(dedupe_bucket, batch_format='pyarrow')


def shared_span_pairs(sf_dir, k=20, w=8, min_shared=2, num_buckets=64):
    """SUBSTRING-LEVEL near-dup discovery (the "dedup exact substrings"
    tier of training-data cleaning): document pairs sharing at least
    ``min_shared`` winnowing fingerprints of ``k``-code-point spans —
    catches copied PASSAGES that whole-document minhash dilutes away.
    Long grams (k=20) make collisions mean real shared spans, not shared
    vocabulary.

    Shape: per-doc winnow set (the SIGMOD'03 kernel shared with
    fingerprint_winnow and its oracle) → (fp, doc) rows → ONE fp-bucketed
    exchange; per bucket, per-fp doc runs expand to canonical (a<b) pairs
    (runs are short for long grams — boilerplate-heavy corpora should
    pre-dedup exact copies first, the same contract as minhash's band
    corner) → per-block pair-count combiner → ONE pair-bucketed exchange
    sums counts and applies the threshold."""
    nb = num_buckets

    def explode(batch: pa.Table) -> pa.Table:
        from .textstats import winnow_fingerprints
        ids, fps = [], []
        for did, text in zip(batch.column('doc_id').to_pylist(),
                             batch.column('text').to_pylist()):
            s = winnow_fingerprints(text, k, w)
            ids.extend([did] * len(s))
            fps.extend(s)
        fp_arr = np.array(fps, np.int64) if fps else np.empty(0, np.int64)
        return pa.table({
            'fp': pa.array(fp_arr, pa.int64()),
            'doc_id': pa.array(np.array(ids, np.int64) if ids
                               else np.empty(0, np.int64), pa.int64()),
            'bucket': pa.array(fp_arr & (nb - 1), pa.int64()),
        })

    def fp_pairs(group: pa.Table) -> pa.Table:
        t = group.sort_by([('fp', 'ascending'), ('doc_id', 'ascending')])
        fp = t.column('fp').to_numpy(zero_copy_only=False)
        doc = t.column('doc_id').to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, fp[1:] != fp[:-1]])
        ends = np.r_[starts[1:], len(fp)]
        a_parts, b_parts = [], []
        for s, e in zip(starts, ends):          # runs are short (long grams)
            c = e - s
            if c > 1:
                iu, ju = np.triu_indices(c, 1)
                a_parts.append(doc[s + iu])
                b_parts.append(doc[s + ju])
        if not a_parts:
            return pa.table({'doc_id_a': pa.array([], pa.int64()),
                             'doc_id_b': pa.array([], pa.int64()),
                             'n': pa.array([], pa.int64()),
                             'pbucket': pa.array([], pa.int64())})
        a = np.concatenate(a_parts)
        b = np.concatenate(b_parts)
        tt = pa.table({'doc_id_a': pa.array(a, pa.int64()),
                       'doc_id_b': pa.array(b, pa.int64())})
        g = tt.group_by(['doc_id_a', 'doc_id_b']).aggregate([([], 'count_all')])
        g = g.rename_columns(['doc_id_a', 'doc_id_b', 'n'])
        av = g.column('doc_id_a').to_numpy(zero_copy_only=False)
        bv = g.column('doc_id_b').to_numpy(zero_copy_only=False)
        return pa.table({
            'doc_id_a': g.column('doc_id_a'),
            'doc_id_b': g.column('doc_id_b'),
            'n': g.column('n').cast(pa.int64()),
            'pbucket': pa.array((av * 1_000_003 + bv) & (nb - 1), pa.int64()),
        })

    def pair_fold(group: pa.Table) -> pa.Table:
        g = group.group_by(['doc_id_a', 'doc_id_b']).aggregate([('n', 'sum')])
        g = g.rename_columns(['doc_id_a', 'doc_id_b', 'n_shared'])
        g = g.filter(pc.greater_equal(g.column('n_shared'),
                                      pa.scalar(min_shared, pa.int64())))
        return pa.table({
            'doc_id_a': g.column('doc_id_a'),
            'doc_id_b': g.column('doc_id_b'),
            'n_shared': g.column('n_shared').cast(pa.int64()),
        })

    docs = read_table(sf_dir, 'documents', columns=['doc_id', 'text'],
                      min_blocks=pool()[1])
    return docs.map_batches(explode, batch_format='pyarrow',
                            zero_copy_batch=True) \
        .groupby('bucket').map_groups(fp_pairs, batch_format='pyarrow') \
        .groupby('pbucket').map_groups(pair_fold, batch_format='pyarrow')


def dedup_normalized(sf_dir, num_buckets=64):
    """CANONICALIZED exact dedup — the tier between byte-exact dedup and
    minhash: documents identical after Unicode lowercase + whitespace-run
    collapse + edge trim fold into one group, catching re-cased and
    re-wrapped copies that byte-exact dedup misses at exact-dedup cost
    (no shingling, no banding).  Survivor = min doc_id per normalized
    fingerprint; output (doc_id, n_copies), same shape as
    :func:`dedup_exact`.

    Normalization is RE2 + utf8proc kernels on BOTH sides (pyarrow
    ``utf8_lower`` / ``replace_substring_regex`` here, DuckDB ``lower`` /
    ``regexp_replace`` in the oracle — both utf8proc/RE2 underneath);
    edge trim strips plain spaces only (after the collapse that is the
    only whitespace left), matching DuckDB ``trim``.  Same bucketed
    combiner-then-fold exchange as dedup_exact: shuffle payload is one
    row per distinct normalized hash per block, never text."""
    import hashlib
    nb = num_buckets

    def partial(batch: pa.Table) -> pa.Table:
        norm = pc.utf8_trim(
            pc.replace_substring_regex(
                pc.utf8_lower(batch.column('text')),
                pattern=r'\s+', replacement=' '),
            characters=' ')
        digs = [hashlib.md5(t.encode('utf-8')).digest()
                for t in norm.to_pylist()]
        fps = pa.array([d.hex() for d in digs], pa.string())
        bks = pa.array([int.from_bytes(d[:2], 'little') & (nb - 1)
                        for d in digs], pa.int64())
        t = pa.table({'fp': fps, 'bucket': bks,
                      'doc_id': batch.column('doc_id')})
        g = t.group_by(['fp', 'bucket']).aggregate(
            [('doc_id', 'min'), ('doc_id', 'count')])
        return g.rename_columns(['fp', 'bucket', 'doc_id_min', 'cnt'])

    def final(group: pa.Table) -> pa.Table:
        g = group.group_by('fp').aggregate(
            [('doc_id_min', 'min'), ('cnt', 'sum')])
        return pa.table({
            'doc_id': g.column('doc_id_min_min').cast(pa.int64()),
            'n_copies': g.column('cnt_sum').cast(pa.int64()),
        })

    ds = read_table(sf_dir, 'documents', columns=['doc_id', 'text'],
                    min_blocks=pool()[1])
    return (ds.map_batches(partial, batch_format='pyarrow',
                           zero_copy_batch=True)
              .groupby('bucket').map_groups(final, batch_format='pyarrow'))


DEDUP_NORMALIZED_SQL = r"""
WITH t AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
  FROM documents
)
SELECT min(doc_id) AS doc_id, count(*)::BIGINT AS n_copies
FROM t GROUP BY md5(norm)
"""


def source_dup_rate(sf_dir, num_buckets=64):
    """PER-SOURCE duplication audit: for each source, how much of its
    document volume is exact-duplicate mass (1 − distinct/total) — the
    crawl-health number that decides which source gets a deeper dedup
    pass before mixing.  Output: (source, n_docs, n_distinct,
    dup_rate r6).

    Shape: dedup_exact's bucketed combiner keyed on (source, md5):
    per-block partials fold one row per distinct (source, fp) per
    block, the fp-bucketed exchange resolves distinct-ness exactly (a
    fp lives in one bucket), and per-bucket (source, distinct, total)
    partials fold in one tiny final groupby — nothing scales with the
    corpus past the combiner.  A text duplicated ACROSS sources counts
    as distinct in each (the per-source rate isolates intra-source
    crawl redundancy; cross-source overlap is dedup_exact's job)."""
    import hashlib
    nb = num_buckets

    def partial(batch: pa.Table) -> pa.Table:
        digs = [hashlib.md5(t.encode('utf-8')).digest()
                for t in batch.column('text').to_pylist()]
        fps = pa.array([d.hex() for d in digs], pa.string())
        bks = pa.array([int.from_bytes(d[:2], 'little') & (nb - 1)
                        for d in digs], pa.int64())
        t = pa.table({'source': batch.column('source'), 'fp': fps,
                      'bucket': bks})
        g = t.group_by(['source', 'fp', 'bucket']).aggregate(
            [([], 'count_all')])
        return g.rename_columns(['source', 'fp', 'bucket', 'cnt'])

    def bucket_fold(group: pa.Table) -> pa.Table:
        g = group.group_by(['source', 'fp']).aggregate([('cnt', 'sum')])
        s = g.group_by('source').aggregate([('cnt_sum', 'sum'),
                                            ([], 'count_all')])
        return s.rename_columns(['source', 'n_docs', 'n_distinct'])

    def final(group: pa.Table) -> pa.Table:
        from .common import round_half_up
        g = group.group_by('source').aggregate([('n_docs', 'sum'),
                                                ('n_distinct', 'sum')])
        nd = g.column('n_docs_sum').to_numpy(zero_copy_only=False) \
              .astype(np.int64)
        nu = g.column('n_distinct_sum').to_numpy(zero_copy_only=False) \
              .astype(np.int64)
        return pa.table({
            'source': g.column('source'),
            'n_docs': pa.array(nd, pa.int64()),
            'n_distinct': pa.array(nu, pa.int64()),
            'dup_rate': pa.array(round_half_up(
                (nd - nu).astype(np.float64) / nd.astype(np.float64), 6),
                pa.float64()),
        })

    ds = read_table(sf_dir, 'documents', columns=['source', 'text'],
                    min_blocks=pool()[1])
    return ds.map_batches(partial, batch_format='pyarrow',
                          zero_copy_batch=True) \
        .groupby('bucket').map_groups(bucket_fold,
                                      batch_format='pyarrow') \
        .groupby('source').map_groups(final, batch_format='pyarrow')


SOURCE_DUP_RATE_SQL = """
WITH t AS (
  SELECT source, md5(text) AS fp FROM documents
), s AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         count(DISTINCT fp)::BIGINT AS n_distinct
  FROM t GROUP BY source
)
SELECT source, n_docs, n_distinct,
       floor((n_docs - n_distinct)::DOUBLE / n_docs::DOUBLE
             * 1000000 + 0.5) / 1000000 AS dup_rate
FROM s
"""
