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
                          32×4 LSH bands → band-key groupby →
                          pair-dedupe groupby → two hash-partition joins
                          attach doc text to pairs → exact-Jaccard verify
                          map stage (fully distributed; no driver drain).
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

import ray
import ray.data

from .common import round_half_up, table_path, pool

__all__ = ['dedup_exact', 'dedup_exact_payloads', 'ngram_jaccard_pairs',
           'minhash_near_dup', 'simhash_near_dup', 'shingle_set']

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

def dedup_exact(sf_dir):
    """Survivor (min doc_id) + copy count per distinct text.

    Partial aggregation inside map_batches (Arrow group_by combiner) keeps
    the shuffle payload at one row per distinct hash per block — at 100 TB
    the md5-keyed groupby moves combiner output, never raw text.
    """
    import hashlib

    def partial(batch: pa.Table) -> pa.Table:
        fps = pa.array([hashlib.md5(t.encode('utf-8')).hexdigest()
                        for t in batch.column('text').to_pylist()], pa.string())
        t = pa.table({'fp': fps, 'doc_id': batch.column('doc_id')})
        g = t.group_by('fp').aggregate([('doc_id', 'min'), ('doc_id', 'count')])
        return g.rename_columns(['fp', 'doc_id_min', 'cnt'])

    def final(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            'doc_id': pa.array([pc.min(group.column('doc_id_min')).as_py()], pa.int64()),
            'n_copies': pa.array([pc.sum(group.column('cnt')).as_py()], pa.int64()),
        })

    ds = ray.data.read_parquet(table_path(sf_dir, 'documents'),
                               columns=['doc_id', 'text'])
    return (ds.map_batches(partial, batch_format='pyarrow', zero_copy_batch=True)
              .groupby('fp').map_groups(final, batch_format='pyarrow'))


def dedup_exact_payloads(corpus_dir):
    """Exact dedup over the TRANSCRIPTS corpus payloads (corpus hygiene on
    the flagship input): distinct payload fingerprints + copy counts +
    first (conv_id, turn_idx) survivor.  Same combiner-then-groupby shape
    as :func:`dedup_exact`, keyed on md5 of the PDF payload — at 10^12
    turns this is the stage that caps re-extraction of repeated payloads.
    """
    import hashlib

    def partial(batch: pa.Table) -> pa.Table:
        fps = pa.array([hashlib.md5(t.encode('utf-8')).hexdigest()
                        for t in batch.column('text').to_pylist()], pa.string())
        t = pa.table({'fp': fps,
                      'conv_id': batch.column('conv_id'),
                      'turn_idx': batch.column('turn_idx')})
        g = t.sort_by([('fp', 'ascending'), ('conv_id', 'ascending'),
                       ('turn_idx', 'ascending')]) \
             .group_by('fp', use_threads=False) \
             .aggregate([('conv_id', 'first'), ('turn_idx', 'first'),
                         ('fp', 'count')])
        return g.rename_columns(['fp', 'conv_id', 'turn_idx', 'n_copies'])

    def final(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ordered = group.sort_by([('conv_id', 'ascending'), ('turn_idx', 'ascending')])
        return pa.table({
            'fp': ordered.column('fp').slice(0, 1),
            'conv_id': ordered.column('conv_id').slice(0, 1),
            'turn_idx': ordered.column('turn_idx').slice(0, 1),
            'n_copies': pa.array([pc.sum(group.column('n_copies')).as_py()],
                                 pa.int64()),
        })

    ds = ray.data.read_parquet(corpus_dir, columns=['conv_id', 'turn_idx', 'text'])
    return (ds.map_batches(partial, batch_format='pyarrow', zero_copy_batch=True)
              .groupby('fp').map_groups(final, batch_format='pyarrow'))


# ------------------------------------------------------- exact n-gram Jaccard

def ngram_jaccard_pairs(sf_dir, threshold=0.8, k=3, block_col='lang'):
    """All pairs within a blocking key with word-k-gram Jaccard ≥ threshold.

    Exact (no approximation) → DuckDB-oracle-verifiable.  The per-group
    O(n²) loop is the documented partitioning assumption: blocks must fit a
    worker (true for per-language blocks only at test scale; the scale path
    is minhash_near_dup).
    """
    def pairs(group: pa.Table) -> pa.Table:
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

    ds = ray.data.read_parquet(table_path(sf_dir, 'documents'),
                               columns=['doc_id', 'text', block_col])
    return ds.groupby(block_col).map_groups(pairs, batch_format='pyarrow')


# ------------------------------------------------------------- MinHash + LSH

class _Signatures:
    """Actor stage: perm params built once per actor; emits one row per
    (band, doc) with the band key — the LSH 'explode'."""

    def __init__(self, k):
        self.k = k
        self.a, self.b = _perm_params()

    def __call__(self, batch: pa.Table) -> pa.Table:
        a, b = self.a, self.b
        band_keys, doc_ids = [], []
        ids = batch.column('doc_id').to_pylist()
        for did, text in zip(ids, batch.column('text').to_pylist()):
            h = _shingle_hashes(text, self.k)
            if h.size == 0:
                continue
            # (P, n) permuted hashes; a < 2^31, h < 2^32 → a*h+b < 2^63: no overflow
            sig = ((a[:, None] * h[None, :] + b[:, None]) % _MERSENNE).min(axis=1)
            bands = sig.reshape(BANDS, ROWS_PER_BAND)
            for bi in range(BANDS):
                key = (bi << 32) | zlib.crc32(bands[bi].tobytes())
                band_keys.append(key)
                doc_ids.append(did)
        return pa.table({'band_key': pa.array(band_keys, pa.int64()),
                         'doc_id': pa.array(doc_ids, pa.int64())})


def _emit_pairs(group: pa.Table) -> pa.Table:
    ids = sorted(set(group.column('doc_id').to_pylist()))
    out_a, out_b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            out_a.append(ids[i])
            out_b.append(ids[j])
    return pa.table({'doc_id_a': pa.array(out_a, pa.int64()),
                     'doc_id_b': pa.array(out_b, pa.int64())})


def _dedupe_pairs(group: pa.Table) -> pa.Table:
    return group.slice(0, 1)


def _make_pair_verifier(threshold, k):
    def verify(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_j = [], [], []
        for a_, b_, ta, tb in zip(batch.column('doc_id_a').to_pylist(),
                                  batch.column('doc_id_b').to_pylist(),
                                  batch.column('text_a').to_pylist(),
                                  batch.column('text_b').to_pylist()):
            jac = _jaccard(shingle_set(ta, k), shingle_set(tb, k))
            if jac >= threshold:
                out_a.append(a_)
                out_b.append(b_)
                out_j.append(jac)
        return pa.table({
            'doc_id_a': pa.array(out_a, pa.int64()),
            'doc_id_b': pa.array(out_b, pa.int64()),
            'jac': pa.array(round_half_up(out_j, 6) if out_j else [], pa.float64()),
        })
    return verify


def minhash_near_dup(sf_dir, threshold=0.8, k=3, num_partitions=8):
    """MinHash+LSH near-dup discovery, exact-verified — FULLY DISTRIBUTED.

    Shuffle accounting: band-key groupby (uniform crc32 keys — no skew), a
    pair-key groupby to dedupe candidates, then candidate pairs are joined
    back to document text with two hash-partitioned ``Dataset.join``s on
    doc_id (no driver-side candidate drain, no broadcast shingle lookup —
    on a boilerplate-heavy corpus the candidate set is O(corpus) and must
    stay distributed).  Exact-Jaccard verification runs as a map stage over
    the joined (pair, text_a, text_b) rows.
    """
    docs = ray.data.read_parquet(table_path(sf_dir, 'documents'),
                                 columns=['doc_id', 'text'])
    band_rows = docs.map_batches(_Signatures, fn_constructor_args=(k,),
                                 batch_format='pyarrow', concurrency=pool(),
                                 zero_copy_batch=True)
    cand = band_rows.groupby('band_key').map_groups(_emit_pairs,
                                                    batch_format='pyarrow')
    cand = cand.groupby(['doc_id_a', 'doc_id_b']).map_groups(
        _dedupe_pairs, batch_format='pyarrow')

    def _keyed(key_col, text_col):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({key_col: batch.column('doc_id'),
                             text_col: batch.column('text')})
        return fn

    docs_a = docs.map_batches(_keyed('doc_id_a', 'text_a'),
                              batch_format='pyarrow', zero_copy_batch=True)
    docs_b = docs.map_batches(_keyed('doc_id_b', 'text_b'),
                              batch_format='pyarrow', zero_copy_batch=True)
    joined = cand.join(docs_a, 'inner', num_partitions, on=('doc_id_a',)) \
                 .join(docs_b, 'inner', num_partitions, on=('doc_id_b',))
    return joined.map_batches(_make_pair_verifier(threshold, k),
                              batch_format='pyarrow', zero_copy_batch=True)


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


class _SimhashStage:
    def __init__(self):
        pass

    def __call__(self, batch: pa.Table) -> pa.Table:
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


def simhash_near_dup(sf_dir, max_hamming=3):
    """SimHash near-dup: pairs sharing a 16-bit chunk, Hamming ≤ max_hamming.

    Pigeonhole guarantee: any pair within Hamming ≤ 3 over 64 bits agrees on
    at least one of the 4 chunks → exact recall for the advertised radius.
    """
    docs = ray.data.read_parquet(table_path(sf_dir, 'documents'),
                                 columns=['doc_id', 'text'])
    rows = docs.map_batches(_SimhashStage, batch_format='pyarrow',
                            concurrency=pool(), zero_copy_batch=True)

    def pairs(group: pa.Table) -> pa.Table:
        seen = {}
        for did, sig in zip(group.column('doc_id').to_pylist(),
                            group.column('sig').to_pylist()):
            seen[did] = sig
        ids = sorted(seen)
        out_a, out_b, out_h = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                x = (seen[ids[i]] ^ seen[ids[j]]) & ((1 << 64) - 1)
                h = bin(x).count('1')
                if h <= max_hamming:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_h.append(h)
        return pa.table({'doc_id_a': pa.array(out_a, pa.int64()),
                         'doc_id_b': pa.array(out_b, pa.int64()),
                         'hamming': pa.array(out_h, pa.int64())})

    cand = rows.groupby('chunk_key').map_groups(pairs, batch_format='pyarrow')
    return cand.groupby(['doc_id_a', 'doc_id_b']).map_groups(
        _dedupe_pairs, batch_format='pyarrow')
