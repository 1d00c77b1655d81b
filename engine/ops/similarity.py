"""Embedding similarity over the ``embeddings`` table
(vec_id:int64, embedding:list<float>[64], label:int32).

- ``embedding_dup_pairs`` — cosine near-dup pairs: each batch does ONE
  float64 matmul against a broadcast (ray.put once) corpus matrix.  The
  broadcast side is the documented scale assumption: a 10^9×64-float32
  matrix is 256 GB — beyond that, use ``embedding_dup_pairs_blocked``.
- ``embedding_dup_pairs_blocked`` — the same exact pairs with no
  broadcast and no driver-side read: bucket-pair blocking (block-nested
  cross product) over one bucketed groupby.
- ``ann_topk``            — brute-force cosine top-k: per-batch partial
  top-k (numpy argpartition) → per-query groupby merges partials.  This is
  the exact baseline the approximate variants are judged against.
- ``ann_topk_lsh``        — random-hyperplane LSH bucketing (Charikar 2002): queries probe
  only their own bucket(s) — the scale path (approximate; rows-only check).

All distances are computed in float64 from float32 inputs; emitted scores
use the shared half-up rounding so the DuckDB oracle hashes identically.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .common import round_half_up, table_path, read_table, pool

__all__ = ['embedding_dup_pairs', 'embedding_dup_pairs_blocked',
           'embedding_dup_lsh', 'ann_topk', 'ann_topk_lsh', 'ann_topk_ivf',
           'ann_topk_pq', 'embedding_norms', 'EMBEDDING_NORMS_SQL',
           'embedding_norm_stats', 'EMBEDDING_NORM_STATS_SQL',
           'embedding_project2d', 'project2d_oracle_sql',
           'embedding_kmeans', 'kmeans_oracle_sql',
           'embedding_label_centroids', 'label_centroids_oracle_sql',
           'embedding_label_outliers', 'label_outliers_oracle_sql']


def _read_embeddings(sf_dir):
    return read_table(sf_dir, 'embeddings',
                      columns=['vec_id', 'embedding'], min_blocks=pool()[1])


def _raw_matrix(batch):
    """(ids:int64[n], float64 (n,d) matrix) from an Arrow batch — no
    normalization.  ONE home for the chunk/flatten/reshape dance."""
    ids = batch.column('vec_id').to_numpy(zero_copy_only=False)
    emb = batch.column('embedding')
    if emb.num_chunks == 1:
        arr = emb.chunk(0)
    else:
        arr = emb.combine_chunks()
    mat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return ids, mat.reshape(len(ids), -1)


def _batch_matrix(batch):
    """(ids:int64[n], unit vectors float64 (n,d)) from an Arrow batch."""
    ids, mat = _raw_matrix(batch)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return ids, mat / norms[:, None]


def _corpus_matrix(sf_dir):
    """Driver-side load of the (small-side) corpus matrix for broadcast."""
    import pyarrow.parquet as pq
    tbl = pq.read_table(table_path(sf_dir, 'embeddings'),
                        columns=['vec_id', 'embedding'])
    return _batch_matrix(tbl)


_BCAST_CACHE = {}


def _fetch_broadcast(ref):
    """Per-worker-process cache of a ``ray.put`` broadcast value.

    The broadcast stages here hold NO mutable state, so a plain TASK pool
    (which fuses with the read and skips the ~2 s actor-pool spin-up) is
    the right compute strategy — each worker fetches the object from its
    node's plasma store once and reuses it across tasks.  Bounded: one
    entry per live broadcast; dropped with the worker."""
    hit = _BCAST_CACHE.get(ref)
    if hit is None:
        hit = _BCAST_CACHE[ref] = ray.get(ref)
        if len(_BCAST_CACHE) > 8:                     # stale refs from past jobs
            for k in list(_BCAST_CACHE)[:-4]:
                del _BCAST_CACHE[k]
    return hit


def _dup_pairs_fn(ref, threshold):
    def fn(batch: pa.Table) -> pa.Table:
        ids, mat = _fetch_broadcast(ref)
        bids, bmat = _batch_matrix(batch)
        sims = bmat @ mat.T                           # (nb, N) one matmul
        rows, cols = np.nonzero(sims >= threshold)
        a = bids[rows]
        b = ids[cols]
        keep = a < b                                  # each pair once, a < b
        a, b = a[keep], b[keep]
        cos = sims[rows[keep], cols[keep]]
        return pa.table({
            'vec_id_a': pa.array(a, pa.int64()),
            'vec_id_b': pa.array(b, pa.int64()),
            'cos': pa.array(round_half_up(cos, 4), pa.float64()),
        })
    return fn


def embedding_dup_pairs(sf_dir, threshold=0.42):
    """All embedding pairs with cosine ≥ threshold (exact, oracle-checked)."""
    ref = ray.put(_corpus_matrix(sf_dir))
    return _read_embeddings(sf_dir).map_batches(
        _dup_pairs_fn(ref, threshold),
        batch_format='pyarrow', zero_copy_batch=True)


def _pair_block_rows(K):
    """Replicate each vector to its K bucket-pair groups.  Bucket =
    ``vec_id & (K-1)``; a vector in bucket i joins every group
    ``(min(i,j), max(i,j))`` — so any unordered pair of vectors meets in
    exactly ONE group (the one keyed by their two buckets), and the
    diagonal group (i,i) holds bucket i once for the within-bucket pairs."""
    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch.column('vec_id').to_numpy(zero_copy_only=False)
        own = ids & (K - 1)
        idx = np.repeat(np.arange(n), K)
        partner = np.tile(np.arange(K, dtype=np.int64), n)
        o = own[idx]
        lo = np.minimum(o, partner)
        hi = np.maximum(o, partner)
        out = batch.take(pa.array(idx, pa.int64()))
        out = out.append_column('pkey', pa.array(lo * K + hi, pa.int64()))
        return out.append_column('side', pa.array(o, pa.int64()))
    return fn


def _block_cross(threshold, K):
    """Per bucket-pair group: ONE float64 cross matmul, threshold filter,
    canonical (a < b) pair order.  Same float math as the broadcast
    :class:`_DupPairs` kernel, so the emitted cosines are bit-identical.

    Diagonal-vs-cross is decided from the group KEY (``pkey = i*K + j``),
    never from which sides happen to be present: a cross group whose
    partner bucket is empty must emit NOTHING — inferring "diagonal" from
    a single observed side would re-emit bucket i's within-bucket pairs
    (already produced by the true (i,i) group) whenever any bucket is
    empty, likelier the larger K gets."""
    _empty = pa.table({'vec_id_a': pa.array([], pa.int64()),
                       'vec_id_b': pa.array([], pa.int64()),
                       'cos': pa.array([], pa.float64())})

    def fn(group: pa.Table) -> pa.Table:
        pkey = group.column('pkey')[0].as_py()
        i, j = divmod(pkey, K)
        side = group.column('side').to_numpy(zero_copy_only=False)
        ids, mat = _batch_matrix(group)
        if i == j:                             # diagonal: within-bucket pairs
            sims = mat @ mat.T
            iu, ju = np.nonzero(sims >= threshold)
            keep = ids[iu] < ids[ju]           # each pair once, no self-match
            a = ids[iu[keep]]
            b = ids[ju[keep]]
            cos = sims[iu[keep], ju[keep]]
        else:                                  # cross-bucket pairs
            m0 = side == i
            m1 = side == j
            if not m0.any() or not m1.any():   # partner bucket empty
                return _empty
            sims = mat[m0] @ mat[m1].T
            r, c = np.nonzero(sims >= threshold)
            a0 = ids[m0][r]
            b0 = ids[m1][c]
            a = np.minimum(a0, b0)
            b = np.maximum(a0, b0)
            cos = sims[r, c]
        return pa.table({
            'vec_id_a': pa.array(a, pa.int64()),
            'vec_id_b': pa.array(b, pa.int64()),
            'cos': pa.array(round_half_up(cos, 4), pa.float64()),
        })
    return fn


def embedding_dup_pairs_blocked(sf_dir, threshold=0.42, num_buckets=4):
    """Exact cosine near-dup pairs with NO broadcast and NO driver-side
    corpus read — the scale path for exact all-pairs (same output and
    oracle as :func:`embedding_dup_pairs`).

    Block-nested cross product: each vector is replicated to its
    ``K = num_buckets`` bucket-pair groups (``K`` rows per vector), one
    bucketed groupby co-partitions every pair's two buckets, and each of
    the ``K(K+1)/2`` groups runs one vectorized cross matmul.  Memory per
    task is two bucket slices (≈ 2·n/K rows), not the corpus: at 10⁹×64
    float32 (256 GB — the broadcast variant's documented ceiling) a
    K=1024 blocking holds ~500 MB per group and shuffles K·n rows of
    (id, vector) ≈ 2 TB across the cluster, which streams.  Total compute
    is still O(n²) — inherent to *exact* all-pairs; the subquadratic
    paths remain :func:`ann_topk_lsh` / :func:`ann_topk_ivf`."""
    rows = _read_embeddings(sf_dir).map_batches(
        _pair_block_rows(num_buckets), batch_format='pyarrow',
        zero_copy_batch=True)
    return rows.groupby('pkey').map_groups(_block_cross(threshold, num_buckets),
                                           batch_format='pyarrow')


def _topk_ties(scores, ids, k):
    """Indices of the k best rows under the GLOBAL merge order
    (score desc, id asc).  A plain argpartition on score alone picks an
    arbitrary id among score ties at the k-boundary, so a partial stage
    could drop the neighbor the global ORDER BY sc DESC, nid ASC keeps —
    making results depend on batch partitioning (exact-duplicate
    embeddings produce bit-identical cosines).  Here: k-th-largest score
    threshold → ALL tied rows in → lexsort by (-score, id) → first k."""
    n = len(scores)
    if k >= n:
        cand = np.arange(n)
    else:
        kth = np.partition(scores, n - k)[n - k]
        cand = np.nonzero(scores >= kth)[0]
    order = np.lexsort((ids[cand], -scores[cand]))
    return cand[order[:k]]


def _partial_topk_fn(ref, k0):
    """Per-batch candidates: for each query, the batch's k best corpus rows
    — the combiner that keeps the per-query groupby shuffle tiny."""
    def fn(batch: pa.Table) -> pa.Table:
        qids, qmat = _fetch_broadcast(ref)
        bids, bmat = _batch_matrix(batch)
        sims = qmat @ bmat.T                          # (Q, nb)
        # take k+1 so dropping a self-match can never evict a true top-k row
        k = min(k0 + 1, sims.shape[1])
        out_q, out_n, out_s = [], [], []
        for qi in range(sims.shape[0]):
            cand = _topk_ties(sims[qi], bids, k)
            mask = bids[cand] != qids[qi]             # exclude self-match
            out_q.extend([qids[qi]] * int(mask.sum()))
            out_n.extend(bids[cand][mask].tolist())
            out_s.extend(sims[qi, cand][mask].tolist())
        return pa.table({
            'query_id': pa.array(out_q, pa.int64()),
            'neighbor_id': pa.array(out_n, pa.int64()),
            'score_raw': pa.array(out_s, pa.float64()),
        })
    return fn


def _final_topk(k):
    def fin(group: pa.Table) -> pa.Table:
        ordered = group.sort_by([('score_raw', 'descending'),
                                 ('neighbor_id', 'ascending')]).slice(0, k)
        n = ordered.num_rows
        return pa.table({
            'query_id': ordered.column('query_id'),
            'neighbor_id': ordered.column('neighbor_id'),
            'score': pa.array(round_half_up(
                ordered.column('score_raw').to_numpy(zero_copy_only=False), 4),
                pa.float64()),
            'rank': pa.array(np.arange(1, n + 1), pa.int64()),
        })
    return fin


def _query_matrix(sf_dir, n_queries):
    """Driver-side load of the (tiny) query matrix.  The vec_id filter is
    pushed into the parquet scan (``pyarrow.dataset`` row-group pruning via
    min/max stats) — O(matching row groups), never a full-table read."""
    import pyarrow.dataset as pads
    dset = pads.dataset(table_path(sf_dir, 'embeddings'), format='parquet')
    tbl = dset.to_table(columns=['vec_id', 'embedding'],
                        filter=pads.field('vec_id') < n_queries)
    return _batch_matrix(tbl.sort_by('vec_id'))


def ann_topk(sf_dir, n_queries=16, k=5):
    """Exact cosine top-k of queries (vec_id < n_queries) over the corpus."""
    ref = ray.put(_query_matrix(sf_dir, n_queries))
    partial = _read_embeddings(sf_dir).map_batches(
        _partial_topk_fn(ref, k),
        batch_format='pyarrow', zero_copy_batch=True)
    return partial.groupby('query_id').map_groups(_final_topk(k),
                                                  batch_format='pyarrow')


_LSH_PLANES = 4  # 2^4 buckets; multi-probe widens recall


def _lsh_planes(dim):
    rng = np.random.RandomState(777)
    return rng.standard_normal((dim, _LSH_PLANES))


def _bucket_of(mat, planes):
    bits = (mat @ planes) > 0
    return (bits.astype(np.int64) * (1 << np.arange(_LSH_PLANES))).sum(axis=1)


def _lsh_partial_fn(ref, k0):
    """Approximate partial top-k: only corpus rows in a query's LSH
    bucket(s) compete.  Multi-probe (own bucket + all 1-bit flips) trades a
    constant factor of extra candidates for much better recall — the probe
    set covers (1+planes)/2^planes of the corpus instead of 1/2^planes.
    Planes and probe sets are derived DRIVER-side and ride the broadcast."""
    def fn(batch: pa.Table) -> pa.Table:
        qids, qmat, planes, qprobes = _fetch_broadcast(ref)
        bids, bmat = _batch_matrix(batch)
        bbuckets = _bucket_of(bmat, planes)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids)):
            mask = np.isin(bbuckets, list(qprobes[qi])) & (bids != qids[qi])
            if not mask.any():
                continue
            cids = bids[mask]
            sims = bmat[mask] @ qmat[qi]
            k = min(k0, len(cids))
            top = _topk_ties(sims, cids, k)
            out_q.extend([qids[qi]] * k)
            out_n.extend(cids[top].tolist())
            out_s.extend(sims[top].tolist())
        return pa.table({
            'query_id': pa.array(out_q, pa.int64()),
            'neighbor_id': pa.array(out_n, pa.int64()),
            'score_raw': pa.array(out_s, pa.float64()),
        })
    return fn


def ann_topk_lsh(sf_dir, n_queries=16, k=5):
    """LSH-bucketed approximate top-k (scale path; rows-only check)."""
    qids, qmat = _query_matrix(sf_dir, n_queries)
    planes = _lsh_planes(qmat.shape[1])
    qb = _bucket_of(qmat, planes)
    qprobes = [{int(b)} | {int(b) ^ (1 << p) for p in range(_LSH_PLANES)}
               for b in qb]
    ref = ray.put((qids, qmat, planes, qprobes))
    partial = _read_embeddings(sf_dir).map_batches(
        _lsh_partial_fn(ref, k),
        batch_format='pyarrow', zero_copy_batch=True)
    return partial.groupby('query_id').map_groups(_final_topk(k),
                                                  batch_format='pyarrow')


_MASK63 = (1 << 63) - 1


def _sample_keys(ids):
    """63-bit md5 sample key per vec_id (common.hash63_keys — the
    oracle-shared convention; the oracle builder imports THIS name so
    both sides pick the same rows)."""
    from .common import hash63_keys
    return hash63_keys(ids)


def _train_matrix(sf_dir, max_train=65536, raw=False):
    """Bounded, ORDER-INDEPENDENT training sample for the IVF coarse
    quantizer: the ``max_train`` corpus rows with the smallest seeded
    md5(vec_id) key.  Unlike a head sample this is unbiased under any
    time/label file ordering, and unlike ``Dataset.take_batch`` it does not
    depend on block completion order — the same rows in the same order come
    back no matter how the input is partitioned.  Distributed shape:
    per-block partial top-``max_train`` combiner → sort/limit over the
    reduced rows → one driver-side re-sort of ≤ max_train rows."""
    def partial(batch: pa.Table) -> pa.Table:
        keys = _sample_keys(batch.column('vec_id').to_numpy(zero_copy_only=False))
        t = batch.append_column('skey', pa.array(keys, pa.int64()))
        if t.num_rows > max_train:
            t = t.sort_by([('skey', 'ascending'),
                           ('vec_id', 'ascending')]).slice(0, max_train)
        return t

    reduced = _read_embeddings(sf_dir).map_batches(
        partial, batch_format='pyarrow', zero_copy_batch=True)
    tbl = reduced.sort(['skey', 'vec_id']).limit(max_train) \
                 .take_batch(max_train, batch_format='pyarrow')
    # take_batch does not guarantee block order — one tiny deterministic sort
    tbl = tbl.sort_by([('skey', 'ascending'), ('vec_id', 'ascending')])
    return _raw_matrix(tbl) if raw else _batch_matrix(tbl)


def _kmeans(mat, nlist, iters=10, seed=0):
    """Tiny deterministic k-means (numpy, fixed seed/iters) for the IVF
    coarse quantizer, trained on the bounded :func:`_train_matrix` sample."""
    rng = np.random.RandomState(seed)
    cent = mat[rng.choice(len(mat), size=nlist, replace=False)].copy()
    for _ in range(iters):
        sims = mat @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(nlist):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def _ivf_partial_fn(ref, k0):
    """IVF probe: batch rows compete only when their nearest centroid is in
    the query's nprobe-centroid list — per batch work O(N·nlist) assignment
    plus O(candidates) scoring.  Centroids and probe lists are derived
    DRIVER-side and ride the broadcast."""
    def fn(batch: pa.Table) -> pa.Table:
        qids, qmat, cent, qprobes = _fetch_broadcast(ref)
        bids, bmat = _batch_matrix(batch)
        assign = (bmat @ cent.T).argmax(axis=1)                 # (nb,)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids)):
            mask = np.isin(assign, qprobes[qi]) & (bids != qids[qi])
            if not mask.any():
                continue
            cids = bids[mask]
            sims = bmat[mask] @ qmat[qi]
            k = min(k0, len(cids))
            top = _topk_ties(sims, cids, k)
            out_q.extend([qids[qi]] * k)
            out_n.extend(cids[top].tolist())
            out_s.extend(sims[top].tolist())
        return pa.table({
            'query_id': pa.array(out_q, pa.int64()),
            'neighbor_id': pa.array(out_n, pa.int64()),
            'score_raw': pa.array(out_s, pa.float64()),
        })
    return fn


def ann_topk_ivf(sf_dir, n_queries=16, k=5, nlist=16, nprobe=4):
    """IVF approximate top-k (inverted-file index à la FAISS IVF-Flat):
    deterministic k-means coarse quantizer trained on a BOUNDED,
    order-independent md5-keyed sample (``_train_matrix`` — unbiased under
    any file ordering), nprobe-cell probing (the scale path alongside LSH)."""
    qids, qmat = _query_matrix(sf_dir, n_queries)
    _, train = _train_matrix(sf_dir)
    cent = _kmeans(train, nlist)
    qsims = qmat @ cent.T                                       # (Q, nlist)
    # stable: ties keep ascending centroid index (= oracle's ci ASC)
    qprobes = np.argsort(-qsims, axis=1, kind='stable')[:, :nprobe]
    ref = ray.put((qids, qmat, cent, qprobes))
    partial = _read_embeddings(sf_dir).map_batches(
        _ivf_partial_fn(ref, k),
        batch_format='pyarrow', zero_copy_batch=True)
    return partial.groupby('query_id').map_groups(_final_topk(k),
                                                  batch_format='pyarrow')


_DUP_LSH_SEED = 888


def _dup_lsh_planes(dim, n_bands, n_planes):
    """Seeded hyperplanes for the near-dup LSH: band ``b`` uses columns
    ``[b·P, (b+1)·P)``.  Data-independent → inlined as literals in the
    generated DuckDB oracle (oracles.dup_lsh_oracle_sql)."""
    rng = np.random.RandomState(_DUP_LSH_SEED)
    return rng.standard_normal((dim, n_bands * n_planes))


def embedding_dup_lsh(sf_dir, threshold=0.42, n_bands=8, n_planes=4,
                      num_buckets=64):
    """SUBQUADRATIC cosine near-dup discovery: random-hyperplane LSH
    banding (Charikar 2002 — the cosine analog of minhash banding)
    generates candidate pairs, exact cosine verifies them.  Approximate
    by construction: a true pair is found iff the two vectors agree on
    all ``n_planes`` sign bits of at least one band (recall at cos=τ is
    ``1-(1-p^P)^B`` with ``p = 1-θ/π``; the defaults give ~0.77 at 0.42,
    rising steeply for tighter thresholds).  The ORACLE recomputes the
    identical bands in SQL, so correctness is exact over the candidate
    set — recall is a parameter choice, not an accuracy bug.

    Distributed shape (the 100 TB path — compare
    :func:`embedding_dup_pairs_blocked`, which is exact but O(n²)):

      1. map: each vector emits ``n_bands`` rows keyed by
         ``band·2^P + bucket`` (bucket = the band's sign bits) — shuffle
         volume is n_bands × corpus, the standard LSH banding cost;
      2. ONE groupby co-partitions each band bucket; within a group one
         float64 matmul scores all pairs and the threshold filter +
         canonical (a<b) order emit verified pairs.  Bucket size is
         ~n/2^P per band — size ``n_planes`` as log2(n/target_bucket)
         so groups fit a worker (larger P also sharpens precision);
      3. pairs found by several bands dedupe with ONE pair-hash-bucketed
         exchange and a C++ distinct fold (minhash's verify shape)."""
    planes_all = None
    nb = num_buckets
    P = n_planes

    def band_rows(batch: pa.Table) -> pa.Table:
        nonlocal planes_all
        ids, mat = _batch_matrix(batch)
        if planes_all is None:
            planes_all = _dup_lsh_planes(mat.shape[1], n_bands, P)
        bits = (mat @ planes_all) > 0                       # (n, B·P)
        weights = (1 << np.arange(P, dtype=np.int64))
        parts = []
        for b in range(n_bands):
            bucket = bits[:, b * P:(b + 1) * P].astype(np.int64) @ weights
            parts.append(batch.append_column(
                'gkey', pa.array(b * (1 << P) + bucket, pa.int64())))
        return pa.concat_tables(parts)

    def group_pairs(group: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(group)
        sims = mat @ mat.T
        iu, ju = np.nonzero(sims >= threshold)
        keep = ids[iu] < ids[ju]
        a, b = ids[iu[keep]], ids[ju[keep]]
        cos = sims[iu[keep], ju[keep]]
        pb = (a * 1000003 + b) & (nb - 1)
        return pa.table({
            'vec_id_a': pa.array(a, pa.int64()),
            'vec_id_b': pa.array(b, pa.int64()),
            'cos': pa.array(round_half_up(cos, 4), pa.float64()),
            'pbucket': pa.array(pb, pa.int64()),
        })

    def distinct_fold(group: pa.Table) -> pa.Table:
        g = group.group_by(['vec_id_a', 'vec_id_b', 'cos']).aggregate([])
        return g.select(['vec_id_a', 'vec_id_b', 'cos'])

    rows = _read_embeddings(sf_dir).map_batches(
        band_rows, batch_format='pyarrow', zero_copy_batch=True)
    pairs = rows.groupby('gkey').map_groups(group_pairs,
                                            batch_format='pyarrow')
    return pairs.groupby('pbucket').map_groups(distinct_fold,
                                               batch_format='pyarrow')


def embedding_norms(sf_dir):
    """Per-vector L2 norm (the embedding hygiene check before cosine
    math: zero / denormal vectors poison similarity scores).  Pure map,
    no shuffle.

    Float parity note: the squared terms sum STRICTLY SEQUENTIALLY
    left-to-right across dims (a per-dim accumulator loop, vectorized
    across rows) to match DuckDB's list_sum fold order bit-for-bit —
    ``np.sum(axis=1)`` would use 8-way unrolled partial accumulators
    whose last-ulp drift only survives the r6 half-up rounding by
    luck.  d is small (64) so the loop is d vectorized adds, not a
    per-row loop."""
    import numpy as np

    from .common import round_half_up

    def norms(batch: pa.Table) -> pa.Table:
        emb = batch.column('embedding')
        arr = emb.chunk(0) if emb.num_chunks == 1 else emb.combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False)                   .astype(np.float64)
        mat = flat.reshape(batch.num_rows, -1)
        acc = mat[:, 0] * mat[:, 0]
        for j in range(1, mat.shape[1]):
            acc = acc + mat[:, j] * mat[:, j]
        nrm = np.sqrt(acc)
        return pa.table({
            'vec_id': batch.column('vec_id'),
            'label': batch.column('label').cast(pa.int64()),
            'norm': pa.array(round_half_up(nrm, 6), pa.float64()),
        })

    return read_table(sf_dir, 'embeddings',
                      columns=['vec_id', 'embedding', 'label'],
                      min_blocks=pool()[1]).map_batches(
        norms, batch_format='pyarrow', zero_copy_batch=True)


EMBEDDING_NORMS_SQL = """
SELECT vec_id, label::BIGINT AS label,
       floor(sqrt(list_sum(list_transform(embedding,
                                          x -> x::DOUBLE * x::DOUBLE)))
             * 1000000 + 0.5) / 1000000 AS norm
FROM embeddings
"""


def embedding_norm_stats(sf_dir):
    """Per-label norm statistics — the QUANTIZE-THEN-AGGREGATE pattern
    for float stats at scale: each vector's r6 norm is carried as its
    integer micro-unit numerator (floor(norm·10⁶ + 0.5), exactly the
    :func:`embedding_norms` quantity before the final /10⁶), so the
    group sums are ORDER-FREE int64 arithmetic — no float summation
    tree to drift between the engine's block order and the oracle's
    scan order.  mean_norm is one division of int64-exact operands,
    half-up r6.

    100 TB shape: per-block combiner folds to one row per (block,
    label); the exchange never carries vectors."""
    from .common import round_half_up, pool, read_table

    def partial(batch: pa.Table) -> pa.Table:
        emb = batch.column('embedding')
        arr = emb.chunk(0) if emb.num_chunks == 1 else emb.combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False) \
                  .astype(np.float64)
        mat = flat.reshape(batch.num_rows, -1)
        acc = mat[:, 0] * mat[:, 0]
        for j in range(1, mat.shape[1]):
            acc = acc + mat[:, j] * mat[:, j]
        micro = np.floor(np.sqrt(acc) * 1e6 + 0.5).astype(np.int64)
        t = pa.table({
            'label': batch.column('label').cast(pa.int64()),
            'micro': pa.array(micro, pa.int64()),
        })
        g = t.group_by('label').aggregate(
            [('micro', 'sum'), ('micro', 'min'), ('micro', 'max'),
             ([], 'count_all')])
        return g.rename_columns(['label', 'sum_micro', 'min_micro',
                                 'max_micro', 'n'])

    def final(group: pa.Table) -> pa.Table:
        g = group.group_by('label').aggregate(
            [('sum_micro', 'sum'), ('min_micro', 'min'),
             ('max_micro', 'max'), ('n', 'sum')])
        sm = g.column('sum_micro_sum').to_numpy(zero_copy_only=False) \
              .astype(np.int64)
        n = g.column('n_sum').to_numpy(zero_copy_only=False) \
             .astype(np.int64)
        return pa.table({
            'label': g.column('label'),
            'n': pa.array(n, pa.int64()),
            'sum_micro': pa.array(sm, pa.int64()),
            'min_micro': g.column('min_micro_min').cast(pa.int64()),
            'max_micro': g.column('max_micro_max').cast(pa.int64()),
            'mean_norm': pa.array(
                round_half_up(sm.astype(np.float64)
                              / (n.astype(np.float64) * 1e6), 6),
                pa.float64()),
        })

    return read_table(sf_dir, 'embeddings', columns=['embedding', 'label'],
                      min_blocks=pool()[1]) \
        .map_batches(partial, batch_format='pyarrow',
                     zero_copy_batch=True) \
        .groupby('label').map_groups(final, batch_format='pyarrow')


EMBEDDING_NORM_STATS_SQL = """
WITH m AS (
  SELECT label::BIGINT AS label,
         CAST(floor(sqrt(list_sum(list_transform(
                  embedding, x -> x::DOUBLE * x::DOUBLE)))
              * 1000000 + 0.5) AS BIGINT) AS micro
  FROM embeddings
)
SELECT label, count(*)::BIGINT AS n, sum(micro)::BIGINT AS sum_micro,
       min(micro) AS min_micro, max(micro) AS max_micro,
       floor((CAST(sum(micro) AS DOUBLE)
              / CAST(count(*) * 1000000 AS DOUBLE)) * 1000000 + 0.5)
         / 1000000 AS mean_norm
FROM m GROUP BY label
"""


# ---------------------------------------------------------------------------
# Product quantization ANN (the memory-bounded 100 TB tier)


_PQ_M = 16          # subspaces (dim must divide evenly)
_PQ_K = 64          # codes per subspace → 6 bits; stored as one byte
_PQ_LUT_SCALE = 1 << 20
_PQ_ITERS = 10


def _seq_dot(mat, vec):
    """Dot product folded STRICTLY SEQUENTIALLY across dims while staying
    vectorized across rows — the embedding_norms parity rule: numpy's
    BLAS dot reorders partial sums, DuckDB's ``list_dot_product`` folds
    left-to-right, and PQ's code assignment compares these floats
    directly, so both sides must run the identical IEEE op sequence."""
    acc = mat[:, 0] * vec[0]
    for d in range(1, mat.shape[1]):
        acc = acc + mat[:, d] * vec[d]
    return acc


def _kmeans_l2(mat, k, iters=_PQ_ITERS, seed=0):
    """Deterministic L2 k-means for one PQ subspace (seeded init, fixed
    iters).  Training internals need NO SQL parity — only the resulting
    codebook constants are shared with the oracle (ivf precedent)."""
    rng = np.random.RandomState(seed)
    cent = mat[rng.choice(len(mat), size=min(k, len(mat)),
                          replace=False)].copy()
    for _ in range(iters):
        d2 = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def _pq_fit(train, m=_PQ_M, k=_PQ_K):
    """Per-subspace codebooks off the bounded md5-keyed training sample.
    RAW (un-normalized) vectors throughout: PQ here approximates the
    dot-product (MIPS) score — the corpus embeddings are unit-norm by
    construction, so dot ≈ cosine without a per-batch normalize that the
    oracle would have to replicate."""
    dsub = train.shape[1] // m
    return [_kmeans_l2(train[:, s * dsub:(s + 1) * dsub], k, seed=s)
            for s in range(m)]


def _pq_encode(mat, books):
    """Nearest-code assignment per subspace: argmin over
    ``c·c − 2·x·c`` (the ‖x‖² term is constant per row), ties → lowest
    code — the EXACT expression and tie order the oracle's row_number
    reproduces, built from _seq_dot folds."""
    m = len(books)
    dsub = mat.shape[1] // m
    codes = np.empty((len(mat), m), np.int64)
    for s in range(m):
        sub = mat[:, s * dsub:(s + 1) * dsub]
        cb = books[s]
        dists = np.empty((len(mat), len(cb)))
        for j in range(len(cb)):
            c2 = _seq_dot(cb[j:j + 1], cb[j])[0]
            dists[:, j] = c2 - 2.0 * _seq_dot(sub, cb[j])
        codes[:, s] = dists.argmin(axis=1)
    return codes


def _pq_lut(qmat, books):
    """INTEGER ADC lookup tables: lut[q, s, j] = half-up-rounded
    ``dot(q_s, c_{s,j}) · 2^20``.  Quantizing the LUT (fast-scan PQ
    practice) makes every score an int64 SUM — order-independent, so the
    distributed fold and DuckDB's aggregate agree exactly, with no float
    accumulation to chase."""
    m = len(books)
    dsub = qmat.shape[1] // m
    lut = np.empty((len(qmat), m, len(books[0])), np.int64)
    for qi in range(len(qmat)):
        for s in range(m):
            dots = _seq_dot(books[s], qmat[qi, s * dsub:(s + 1) * dsub])
            lut[qi, s, :] = np.floor(
                dots * _PQ_LUT_SCALE + 0.5).astype(np.int64)
    return lut


def _pq_partial_fn(ref, k0):
    def fn(batch: pa.Table) -> pa.Table:
        qids, lut, books = _fetch_broadcast(ref)
        bids, bmat = _raw_matrix(batch)
        codes = _pq_encode(bmat, books)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids)):
            sc = np.zeros(len(bids), np.int64)
            for s in range(len(books)):
                sc += lut[qi, s, codes[:, s]]
            mask = bids != qids[qi]
            cids, csc = bids[mask], sc[mask]
            k = min(k0, len(cids))
            top = np.lexsort((cids, -csc))[:k]
            out_q.extend([qids[qi]] * k)
            out_n.extend(cids[top].tolist())
            out_s.extend(csc[top].tolist())
        return pa.table({
            'query_id': pa.array(out_q, pa.int64()),
            'neighbor_id': pa.array(out_n, pa.int64()),
            'score_int': pa.array(out_s, pa.int64()),
        })
    return fn


def _final_topk_int(k):
    def fin(group: pa.Table) -> pa.Table:
        ordered = group.sort_by([('score_int', 'descending'),
                                 ('neighbor_id', 'ascending')]).slice(0, k)
        n = ordered.num_rows
        return pa.table({
            'query_id': ordered.column('query_id'),
            'neighbor_id': ordered.column('neighbor_id'),
            'score_int': ordered.column('score_int'),
            'rank': pa.array(np.arange(1, n + 1), pa.int64()),
        })
    return fin


def ann_topk_pq(sf_dir, n_queries=16, k=5, m=_PQ_M, n_codes=_PQ_K):
    """Product-quantization approximate top-k (à la FAISS PQ/ADC): the
    MEMORY-bounded ANN tier — each corpus vector compresses to ``m``
    byte codes (16 bytes vs 256 bytes of float32 at dim 64), so a
    100 TB embedding store scans as ~6 TB of codes with the float
    corpus left in cold storage; LSH and IVF bound COMPUTE, PQ bounds
    RESIDENT BYTES.  Codebooks train driver-side on the bounded
    order-independent md5-keyed sample (``_train_matrix`` precedent),
    ride one ``ray.put`` broadcast with the integer LUTs; each batch
    encodes and scores via int64 LUT sums — the whole approximate score
    is integer arithmetic end-to-end (no float drift; see _pq_lut).
    Returns (query_id, neighbor_id, score_int, rank)."""
    _, train = _train_matrix(sf_dir, raw=True)
    books = _pq_fit(train, m, n_codes)

    import pyarrow.dataset as pads
    dset = pads.dataset(table_path(sf_dir, 'embeddings'), format='parquet')
    qtbl = dset.to_table(columns=['vec_id', 'embedding'],
                         filter=pads.field('vec_id') < n_queries)
    qids, qmat = _raw_matrix(qtbl.sort_by('vec_id'))
    lut = _pq_lut(qmat, books)
    ref = ray.put((qids, lut, books))
    partial = _read_embeddings(sf_dir).map_batches(
        _pq_partial_fn(ref, k),
        batch_format='pyarrow', zero_copy_batch=True)
    return partial.groupby('query_id').map_groups(_final_topk_int(k),
                                                  batch_format='pyarrow')


def _proj_planes(dim):
    """Two deterministic projection directions (seeded, data-independent
    — the LSH plane convention, distinct seed)."""
    rng = np.random.RandomState(778)
    return rng.standard_normal((dim, 2))


def embedding_project2d(sf_dir):
    """2-D PROJECTION EXPORT — the embedding-map shape: every vector
    dotted against two fixed seeded directions → (vec_id, label, x, y),
    the table a viz/UMAP-precursor or drift dashboard ingests.  Pure
    map, no shuffle.

    Float parity: each coordinate is ONE sequential-fold dot product
    (the `_seq_dot` rule — DuckDB's list_dot_product folds
    left-to-right), half-up r6; the planes inline into the generated
    oracle as literals."""
    from .common import round_half_up, pool, read_table

    def project(batch: pa.Table) -> pa.Table:
        emb = batch.column('embedding')
        arr = emb.chunk(0) if emb.num_chunks == 1 else emb.combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False) \
                  .astype(np.float64)
        mat = flat.reshape(batch.num_rows, -1)
        planes = _proj_planes(mat.shape[1])
        x = _seq_dot(mat, planes[:, 0])
        y = _seq_dot(mat, planes[:, 1])
        return pa.table({
            'vec_id': batch.column('vec_id'),
            'label': batch.column('label').cast(pa.int64()),
            'x': pa.array(round_half_up(x, 6), pa.float64()),
            'y': pa.array(round_half_up(y, 6), pa.float64()),
        })

    return read_table(sf_dir, 'embeddings',
                      columns=['vec_id', 'embedding', 'label'],
                      min_blocks=pool()[1]) \
        .map_batches(project, batch_format='pyarrow', zero_copy_batch=True)


def project2d_oracle_sql(dim):
    from .oracles import _dlist as dlist
    planes = _proj_planes(dim)
    return """
SELECT vec_id, label::BIGINT AS label,
       floor(list_dot_product(embedding::DOUBLE[], {p0}) * 1000000 + 0.5)
         / 1000000 AS x,
       floor(list_dot_product(embedding::DOUBLE[], {p1}) * 1000000 + 0.5)
         / 1000000 AS y
FROM embeddings
""".format(p0=dlist(planes[:, 0]), p1=dlist(planes[:, 1]))


def embedding_kmeans(sf_dir, nlist=16):
    """SEMANTIC SHARDING assignment: every vector labeled with its
    nearest k-means centroid — the clustering pass a training-data
    pipeline runs to shard a corpus by topic (route each cluster to its
    own mixture weight / dedup domain).  Output: (vec_id, cluster,
    dot r6) — one row per vector.

    Training reuses the IVF coarse quantizer EXACTLY (the bounded,
    order-independent md5-keyed sample + deterministic seeded k-means,
    :func:`_train_matrix` / :func:`_kmeans`) so the oracle can retrain
    the identical centroids at build time and inline them as literals.
    ASSIGNMENT is exactly reproducible: centroids are unit vectors, so
    argmax of the RAW dot (no normalization of x — a positive common
    factor cannot change the argmax) with ties → lowest cluster; dots
    are :func:`_seq_dot` sequential folds matching DuckDB's
    ``list_dot_product`` left-to-right order IEEE-exactly.  Shape: pure
    map — centroids ride ONE ray.put broadcast, no shuffle at all."""
    from .common import round_half_up

    _, train = _train_matrix(sf_dir)
    cent = _kmeans(train, nlist)
    ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = _fetch_broadcast(ref)
        ids, mat = _raw_matrix(batch)
        dots = np.empty((len(ids), len(c)), np.float64)
        for ci in range(len(c)):
            dots[:, ci] = _seq_dot(mat, c[ci])
        best = dots.argmax(axis=1)          # first max == lowest cluster
        sim = dots[np.arange(len(ids)), best]
        return pa.table({
            'vec_id': pa.array(ids, pa.int64()),
            'cluster': pa.array(best, pa.int64()),
            'dot': pa.array(round_half_up(sim, 6), pa.float64()),
        })

    return _read_embeddings(sf_dir).map_batches(
        assign, batch_format='pyarrow', zero_copy_batch=True)


def kmeans_oracle_sql(sf_dir=None, nlist=16, max_train=65536):
    """Oracle for :func:`embedding_kmeans`: retrains the SAME
    deterministic k-means on the SAME bounded md5-keyed sample at build
    time (ivf_oracle_sql precedent) and inlines the centroids;
    assignment is row_number() OVER (ORDER BY list_dot_product DESC,
    cluster ASC) = 1 — DuckDB's left-to-right list fold matches
    _seq_dot IEEE-exactly."""
    import os as _os

    from .oracles import _dlist, _oracle_sf_dir, _sample_matrix
    sf_dir = sf_dir or _oracle_sf_dir()
    path = _os.path.join(sf_dir, 'embeddings.parquet')
    _, train = _sample_matrix(path, max_train)
    cent = _kmeans(train, nlist)
    cent_rows = ',\n    '.join('(%d, %s)' % (ci, _dlist(cent[ci]))
                               for ci in range(nlist))
    return """
WITH cent(ci, cv) AS (VALUES
    {cent_rows}
), d AS (
  SELECT e.vec_id, cent.ci,
         list_dot_product(e.embedding::DOUBLE[], cent.cv) AS dot,
         row_number() OVER (PARTITION BY e.vec_id
           ORDER BY list_dot_product(e.embedding::DOUBLE[], cent.cv) DESC,
                    cent.ci ASC) AS rn
  FROM embeddings e, cent
)
SELECT vec_id, ci::BIGINT AS cluster,
       floor(dot * 1000000 + 0.5) / 1000000 AS dot
FROM d WHERE rn = 1
""".format(cent_rows=cent_rows)


def embedding_label_centroids(sf_dir, num_buckets=None):
    """Per-label CLASS CENTROID, long format (label, dim, n, centroid)
    — the embedding-space QC read behind classifier drift checks and
    cluster sanity (is each label's mass where it was last export?).

    Same QUANTIZE-THEN-AGGREGATE float discipline as
    :func:`embedding_norm_stats`: every COMPONENT is carried as its
    integer micro-unit numerator floor(v·10⁶ + 0.5) (float32→float64 is
    exact, and the oracle quantizes the identical double), so the group
    sums are order-free int64 arithmetic and the centroid is ONE
    division of int64-exact operands, half-up r6.

    100 TB shape: per-block combiner folds to labels × d rows
    (np.add.at over label codes — no per-row Python); the exchange
    never carries vectors; output is labels × d."""
    from .common import round_half_up, pool, read_table

    def partial(batch: pa.Table) -> pa.Table:
        emb = batch.column('embedding')
        arr = emb.chunk(0) if emb.num_chunks == 1 else emb.combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False) \
                  .astype(np.float64)
        mat = flat.reshape(batch.num_rows, -1)
        d = mat.shape[1]
        micro = np.floor(mat * 1e6 + 0.5).astype(np.int64)
        lab = batch.column('label').to_numpy(zero_copy_only=False) \
                   .astype(np.int64)
        codes, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(codes), d), np.int64)
        np.add.at(sums, inv, micro)
        cnt = np.bincount(inv, minlength=len(codes)).astype(np.int64)
        return pa.table({
            'label': pa.array(np.repeat(codes, d), pa.int64()),
            'dim': pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                    len(codes)), pa.int64()),
            'sum_micro': pa.array(sums.ravel(), pa.int64()),
            'n': pa.array(np.repeat(cnt, d), pa.int64()),
        })

    def final(group: pa.Table) -> pa.Table:
        g = group.group_by(['label', 'dim']).aggregate(
            [('sum_micro', 'sum'), ('n', 'sum')])
        sm = g.column('sum_micro_sum').to_numpy(zero_copy_only=False) \
              .astype(np.int64)
        n = g.column('n_sum').to_numpy(zero_copy_only=False) \
             .astype(np.int64)
        return pa.table({
            'label': g.column('label'),
            'dim': g.column('dim'),
            'n': pa.array(n, pa.int64()),
            'centroid': pa.array(
                round_half_up(sm.astype(np.float64)
                              / (n.astype(np.float64) * 1e6), 6),
                pa.float64()),
        })

    return read_table(sf_dir, 'embeddings', columns=['embedding', 'label'],
                      min_blocks=pool()[1]) \
        .map_batches(partial, batch_format='pyarrow',
                     zero_copy_batch=True) \
        .groupby('label').map_groups(final, batch_format='pyarrow')


def label_centroids_oracle_sql(dim=None):
    """Oracle generated from the DATA's embedding dim (the
    project2d_oracle_sql discipline) — a hardcoded series bound would
    silently check a truncated/padded centroid if the fixture dim ever
    changed."""
    if dim is None:
        from . import oracles
        dim = oracles.embedding_dim()
    return """
WITH m AS (
  SELECT label::BIGINT AS label, i AS dim,
         CAST(floor(embedding[i]::DOUBLE * 1000000 + 0.5) AS BIGINT)
           AS micro
  FROM embeddings, generate_series(1, {dim}) t(i)
)
SELECT label, dim, count(*)::BIGINT AS n,
       floor(sum(micro)::DOUBLE / (count(*) * 1000000)::DOUBLE
             * 1000000 + 0.5) / 1000000 AS centroid
FROM m GROUP BY label, dim
""".format(dim=int(dim))


def embedding_label_outliers(sf_dir, k=5):
    """LABEL-OUTLIER screen: per label, the k vectors with the LOWEST
    dot against their own label's centroid — the mislabel/anomaly QC
    read over a labeled embedding export (a vector far from its class
    mass is a labeling error or an embedding-version straggler).
    Output: (vec_id, label, dot r6, rank 1..k).

    Exactness: the centroid is the r6 micro-unit mean per dim (the
    :func:`embedding_label_centroids` quantity — order-free integer
    sums, one exact division), so both sides hold bit-identical
    centroid floats; the score is a :func:`_seq_dot` sequential fold
    = DuckDB's ``list_dot_product`` left-to-right order; ranking uses
    the RAW dot (ties → vec_id), rounding applies only to the output.

    Shape: pass 1 is the centroid combiner folded through a
    label-keyed exchange (per-block partials → one row per label), so
    the driver materializes O(labels × d) — NOT labels × blocks × d
    (the r4 take_all carried every block's partial to the driver;
    unbounded for wide clusters); pass 2 is a pure map with per-block
    bottom-k-per-label combiners, so the final exchange carries
    ≤ blocks × labels × k rows into one tiny fold."""
    from .common import round_half_up, pool, read_table

    # ---- pass 1: exact centroids (bounded: labels × d) --------------
    def cent_partial(batch: pa.Table) -> pa.Table:
        emb = batch.column('embedding')
        arr = emb.chunk(0) if emb.num_chunks == 1 else emb.combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False) \
                  .astype(np.float64)
        mat = flat.reshape(batch.num_rows, -1)
        micro = np.floor(mat * 1e6 + 0.5).astype(np.int64)
        lab = batch.column('label').to_numpy(zero_copy_only=False) \
                   .astype(np.int64)
        codes, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(codes), mat.shape[1]), np.int64)
        np.add.at(sums, inv, micro)
        cnt = np.bincount(inv, minlength=len(codes)).astype(np.int64)
        return pa.table({
            'label': pa.array(codes, pa.int64()),
            'n': pa.array(cnt, pa.int64()),
            'sums': pa.array(list(sums), pa.list_(pa.int64())),
        })

    def cent_fold(group: pa.Table) -> pa.Table:
        # per-label fold of the block partials: runs distributed, so
        # only labels rows (each d wide) ever reach the driver
        arr = group.column('sums')
        a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        flat = a.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        sums = flat.reshape(group.num_rows, -1).sum(axis=0)
        n = int(pc.sum(group.column('n')).as_py())
        return pa.table({
            'label': group.column('label')[:1],
            'n': pa.array([n], pa.int64()),
            'sums': pa.array([sums], pa.list_(pa.int64())),
        })

    parts = read_table(sf_dir, 'embeddings',
                       columns=['embedding', 'label'],
                       min_blocks=pool()[1]) \
        .map_batches(cent_partial, batch_format='pyarrow',
                     zero_copy_batch=True) \
        .groupby('label').map_groups(cent_fold, batch_format='pyarrow') \
        .take_all()
    agg = {int(row['label']): (int(row['n']),
                               np.asarray(row['sums'], np.int64))
           for row in parts}
    labels = sorted(agg)
    cents = np.stack([
        round_half_up(agg[l][1].astype(np.float64)
                      / (float(agg[l][0]) * 1e6), 6) for l in labels])
    lab_pos = {l: i for i, l in enumerate(labels)}
    ref = ray.put((labels, lab_pos, cents))

    # ---- pass 2: score + per-block bottom-k combiner ----------------
    def score(batch: pa.Table) -> pa.Table:
        labs, pos, c = _fetch_broadcast(ref)
        ids, mat = _raw_matrix(batch)
        lab = batch.column('label').to_numpy(zero_copy_only=False) \
                   .astype(np.int64)
        dots = np.empty(len(ids), np.float64)
        for l in labs:
            sel = lab == l
            if sel.any():
                dots[sel] = _seq_dot(mat[sel], c[pos[l]])
        order = np.lexsort((ids, dots, lab))
        lab_s, ids_s, dots_s = lab[order], ids[order], dots[order]
        starts = np.flatnonzero(np.r_[True, lab_s[1:] != lab_s[:-1]])
        lens = np.diff(np.r_[starts, len(lab_s)])
        within = np.arange(len(lab_s)) - np.repeat(starts, lens)
        keep = within < k
        return pa.table({
            'vec_id': pa.array(ids_s[keep], pa.int64()),
            'label': pa.array(lab_s[keep], pa.int64()),
            'dot_raw': pa.array(dots_s[keep], pa.float64()),
            'fbucket': pa.array(np.zeros(int(keep.sum()), np.int64)),
        })

    def fold(group: pa.Table) -> pa.Table:
        lab = group.column('label').to_numpy(zero_copy_only=False)
        ids = group.column('vec_id').to_numpy(zero_copy_only=False)
        dots = group.column('dot_raw').to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, dots, lab))
        lab, ids, dots = lab[order], ids[order], dots[order]
        starts = np.flatnonzero(np.r_[True, lab[1:] != lab[:-1]])
        lens = np.diff(np.r_[starts, len(lab)])
        within = np.arange(len(lab)) - np.repeat(starts, lens)
        keep = within < k
        return pa.table({
            'vec_id': pa.array(ids[keep], pa.int64()),
            'label': pa.array(lab[keep], pa.int64()),
            'dot': pa.array(round_half_up(dots[keep], 6), pa.float64()),
            'rank': pa.array(within[keep] + 1, pa.int64()),
        })

    return read_table(sf_dir, 'embeddings',
                      columns=['vec_id', 'embedding', 'label'],
                      min_blocks=pool()[1]) \
        .map_batches(score, batch_format='pyarrow', zero_copy_batch=True) \
        .groupby('fbucket').map_groups(fold, batch_format='pyarrow')


def label_outliers_oracle_sql(dim=None):
    """Dim-derived like :func:`label_centroids_oracle_sql`."""
    if dim is None:
        from . import oracles
        dim = oracles.embedding_dim()
    return """
WITH m AS (
  SELECT label::BIGINT AS label, i AS dim,
         CAST(floor(embedding[i]::DOUBLE * 1000000 + 0.5) AS BIGINT)
           AS micro
  FROM embeddings, generate_series(1, {dim}) t(i)
), c AS (
  SELECT label, dim,
         floor(sum(micro)::DOUBLE / (count(*) * 1000000)::DOUBLE
               * 1000000 + 0.5) / 1000000 AS cv
  FROM m GROUP BY label, dim
), cl AS (
  SELECT label, list(cv ORDER BY dim) AS cvec FROM c GROUP BY label
), d AS (
  SELECT e.vec_id, e.label::BIGINT AS label,
         list_dot_product(list_transform(e.embedding, x -> x::DOUBLE),
                          cl.cvec) AS dot
  FROM embeddings e JOIN cl ON cl.label = e.label::BIGINT
), r AS (
  SELECT vec_id, label, dot,
         row_number() OVER (PARTITION BY label
                            ORDER BY dot ASC, vec_id ASC)::BIGINT AS rank
  FROM d
)
SELECT vec_id, label, floor(dot * 1000000 + 0.5) / 1000000 AS dot, rank
FROM r WHERE rank <= 5
""".format(dim=int(dim))
