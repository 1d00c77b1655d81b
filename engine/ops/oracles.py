"""DuckDB oracle SQL builders for queries whose semantics are
SQL-expressible but need generated constants (hash constants, the seeded
LSH hyperplanes, trained IVF centroids).

Rules shared with the engine side:
- rounding is always the half-up formula ``floor(x*10^d + 0.5)/10^d``;
- k-gram hashes are ``md5_number_lower`` & 63-bit mask
  (= :func:`engine.ops.textstats._gram_hash`);
- LSH planes come from the same ``np.random.RandomState(777)`` stream the
  Ray stage uses, inlined as DOUBLE[] literals (%.17g round-trips float64
  exactly);
- IVF centroids are data-dependent: they are trained at oracle-build time
  on the SAME bounded head sample (first ``max_train`` rows in file order)
  the Ray pipeline trains on, from the sf dir the driver compares at
  (``$GRAFT_ORACLE_SF_DIR``, default /root/testdata/sf0.01).
"""

import os

import numpy as np

def _oracle_sf_dir():
    # read at CALL time so tools can point the oracle at another sf dir
    return os.environ.get('GRAFT_ORACLE_SF_DIR', '/root/testdata/sf0.01')


def _winnow_d_cte(k, w):
    """The shared winnow-set CTE chain (pos → g → wm → sel → d): one
    home for the winnowing contract both winnow_oracle_sql and
    shared_span_oracle_sql certify (k-gram md5 hash, window min, the
    n <= w single-min corner).  ``d`` = DISTINCT (doc_id, wmin)."""
    return r"""
WITH pos AS (
  SELECT doc_id, text, length(text) - {km1} AS n,
         unnest(generate_series(1, greatest(length(text) - {km1}, 0))) AS i
  FROM documents
), g AS (
  SELECT doc_id, i, n,
         (md5_number_lower(substr(text, i, {k})) & 9223372036854775807)::BIGINT AS h
  FROM pos
), wm AS (
  SELECT doc_id, i, n,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND {wm1} FOLLOWING) AS wmin
  FROM g
), sel AS (
  SELECT doc_id, wmin FROM wm WHERE n > {w} AND i <= n - {wm1}
  UNION ALL
  SELECT doc_id, min(h) AS wmin FROM g WHERE n <= {w} GROUP BY doc_id
), d AS (
  SELECT DISTINCT doc_id, wmin FROM sel
)""".format(k=k, km1=k - 1, w=w, wm1=w - 1)


def winnow_oracle_sql(k=5, w=4):
    """Winnowing fingerprint summary (textstats.fingerprint_winnow):
    code-point k-grams → 63-bit md5 hash → windowed min → distinct set."""
    return _winnow_d_cte(k, w) + """, agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_fingerprints,
         min(wmin) AS min_fp, max(wmin) AS max_fp
  FROM d GROUP BY doc_id
)
SELECT doc_id, coalesce(n_fingerprints, 0)::BIGINT AS n_fingerprints,
       coalesce(min_fp, 0)::BIGINT AS min_fp,
       coalesce(max_fp, 0)::BIGINT AS max_fp
FROM documents LEFT JOIN agg USING (doc_id)
"""


def shared_span_oracle_sql(k=20, w=8, min_shared=2):
    """Cross-doc shared winnow fingerprints (dedup.shared_span_pairs):
    the SAME winnow-set CTE as winnow_oracle_sql at (k, w), self-joined
    on the fingerprint with canonical doc_id_a < doc_id_b order."""
    return _winnow_d_cte(k, w) + """
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       count(*)::BIGINT AS n_shared
FROM d a JOIN d b ON b.wmin = a.wmin AND b.doc_id > a.doc_id
GROUP BY 1, 2
HAVING count(*) >= {m}
""".format(m=min_shared)


def multimodal_features_oracle_sql():
    """Recompute decode_media_features over the deterministic MMV1 fake
    payloads: dims from doc_id arithmetic, body mean from the tiled
    (code point % 256) sequence — (full_repeats·sum_all + sum_rem)/need."""
    return r"""
WITH base AS (
  SELECT doc_id, text,
         (8 + (doc_id % 24))::INTEGER AS w,
         (8 + ((doc_id // 7) % 16))::INTEGER AS h,
         (1 + (doc_id % 3))::INTEGER AS ch,
         greatest(length(text), 1) AS m,
         (8 + (doc_id % 24)) * (8 + ((doc_id // 7) % 16)) * (1 + (doc_id % 3)) AS need
  FROM documents
), cps AS (
  SELECT doc_id, need, m, text,
         unnest(generate_series(1, m)) AS i
  FROM base
), sums AS (
  SELECT doc_id,
         sum(CASE WHEN length(text) > 0
                  THEN ascii(substr(text, i, 1)) % 256 ELSE 0 END)::BIGINT AS s_all,
         sum(CASE WHEN i <= need % m AND length(text) > 0
                  THEN ascii(substr(text, i, 1)) % 256 ELSE 0 END)::BIGINT AS s_rem
  FROM cps GROUP BY doc_id
)
SELECT b.doc_id AS media_id,
       CASE b.doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       (16 + b.need)::BIGINT AS byte_len,
       b.w AS width, b.h AS height, b.ch AS channels,
       floor(((b.need // b.m) * s.s_all + s.s_rem)::DOUBLE / b.need * 10000 + 0.5)
         / 10000 AS mean_value,
       true AS decode_ok
FROM base b JOIN sums s USING (doc_id)
"""


def multimodal_resized_oracle_sql(tw=16, th=16):
    """Recompute resized_features: the nearest-neighbor resample picks
    source pixel (y·h//th, x·w//tw, c), whose byte is the tiled codepoint
    sequence at (row·w·ch + col·ch + c) % m — pure index arithmetic over
    the documents text, summed per doc."""
    return r"""
WITH base AS (
  SELECT doc_id, text,
         8 + (doc_id % 24) AS w,
         8 + ((doc_id // 7) % 16) AS h,
         1 + (doc_id % 3) AS ch,
         greatest(length(text), 1) AS m
  FROM documents
), ys AS (SELECT *, unnest(generate_series(0, {thm1})) AS y FROM base),
xs AS (SELECT *, unnest(generate_series(0, {twm1})) AS x FROM ys),
cs AS (SELECT *, unnest(generate_series(0, ch - 1)) AS c FROM xs),
px AS (
  SELECT doc_id, text,
         ((y * h // {th}) * w * ch + (x * w // {tw}) * ch + c) % m AS i
  FROM cs
), sums AS (
  SELECT doc_id,
         sum(CASE WHEN length(text) > 0
                  THEN ascii(substr(text, i + 1, 1)) % 256 ELSE 0 END)::BIGINT AS s,
         count(*)::BIGINT AS need
  FROM px GROUP BY doc_id
)
SELECT b.doc_id AS media_id,
       CASE b.doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       (16 + {tw} * {th} * b.ch)::BIGINT AS byte_len,
       {tw}::INTEGER AS width, {th}::INTEGER AS height, b.ch::INTEGER AS channels,
       floor(s.s::DOUBLE / s.need * 10000 + 0.5) / 10000 AS mean_value,
       true AS decode_ok
FROM base b JOIN sums s USING (doc_id)
""".format(tw=tw, th=th, twm1=tw - 1, thm1=th - 1)


def multimodal_frames_oracle_sql(stride=4):
    """Recompute frame_features: frame f of a 'video' payload is body row
    f, i.e. bytes (f·w·ch + j) % m for j in [0, w·ch) of the tiled
    codepoint sequence; frames sampled every ``stride`` rows."""
    return r"""
WITH base AS (
  SELECT doc_id, text,
         8 + (doc_id % 24) AS w,
         8 + ((doc_id // 7) % 16) AS h,
         1 + (doc_id % 3) AS ch,
         greatest(length(text), 1) AS m
  FROM documents
  WHERE doc_id % 3 = 2
), fs AS (
  SELECT *, unnest(generate_series(0, h - 1)) AS f FROM base
), js AS (
  SELECT *, unnest(generate_series(0, w * ch - 1)) AS jj
  FROM fs WHERE f % {stride} = 0
), px AS (
  SELECT doc_id, f, w, ch, text, (f * w * ch + jj) % m AS i FROM js
)
SELECT doc_id AS media_id, f::INTEGER AS frame_idx,
       (16 + any_value(w) * any_value(ch))::BIGINT AS byte_len,
       floor(sum(CASE WHEN length(text) > 0
                      THEN ascii(substr(text, i + 1, 1)) % 256 ELSE 0 END)::DOUBLE
             / count(*) * 10000 + 0.5) / 10000 AS mean_value
FROM px GROUP BY doc_id, f
""".format(stride=stride)


def _dlist(vec):
    return '[%s]::DOUBLE[]' % ', '.join('%.17g' % v for v in vec)


def _bucket_expr(col, plane_lists):
    terms = ['(CASE WHEN list_dot_product(%s, %s) > 0 THEN %d ELSE 0 END)'
             % (col, pl, 1 << p) for p, pl in enumerate(plane_lists)]
    return '(' + ' + '.join(terms) + ')::BIGINT'


def lsh_oracle_sql(dim, n_queries=16, k=5):
    """Full SQL re-derivation of ann_topk_lsh: the seeded hyperplanes are
    data-independent, so they inline as literals; bucket bits are sign
    tests of raw dot products (sign is normalization-invariant), probes =
    own bucket + all 1-bit flips (xor in {0,1,2,4,8}), global top-k by
    (cosine desc, nid asc)."""
    from .similarity import _lsh_planes, _LSH_PLANES
    planes = _lsh_planes(dim)                        # (dim, P)
    plane_lists = [_dlist(planes[:, p]) for p in range(_LSH_PLANES)]
    xor_ok = ', '.join(str(v) for v in
                       [0] + [1 << p for p in range(_LSH_PLANES)])
    return """
WITH q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings
  WHERE vec_id < {nq}
), qb AS (
  SELECT qid, qe, {qbucket} AS b FROM q
), eb AS (
  SELECT vec_id AS nid, embedding::DOUBLE[] AS ee, {ebucket} AS b
  FROM embeddings
), s AS (
  SELECT qb.qid, eb.nid, list_cosine_similarity(qb.qe, eb.ee) AS sc
  FROM qb JOIN eb ON xor(qb.b, eb.b) IN ({xor_ok}) AND eb.nid <> qb.qid
), r AS (
  SELECT qid, nid, sc,
         row_number() OVER (PARTITION BY qid ORDER BY sc DESC, nid ASC)::BIGINT AS rank
  FROM s
)
SELECT qid AS query_id, nid AS neighbor_id,
       floor(sc * 10000 + 0.5) / 10000 AS score, rank
FROM r WHERE rank <= {k}
""".format(nq=n_queries, k=k, xor_ok=xor_ok,
           qbucket=_bucket_expr('qe', plane_lists),
           ebucket=_bucket_expr('ee', plane_lists))


def _sample_matrix(path, max_train, raw=False):
    """The ``max_train`` rows with the smallest md5(vec_id) sample key, in
    (skey, vec_id) order — the pq twin of similarity._train_matrix's
    distributed hash-order sample (same key function, same tie-break, so
    the training matrix is row-for-row identical).  ``raw=True`` skips
    normalization (the PQ tier trains on raw vectors)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from .similarity import _batch_matrix, _raw_matrix, _sample_keys
    tbl = pq.read_table(path, columns=['vec_id', 'embedding'])
    keys = _sample_keys(tbl.column('vec_id').to_numpy(zero_copy_only=False))
    tbl = tbl.append_column('skey', pa.array(keys, pa.int64()))
    tbl = tbl.sort_by([('skey', 'ascending'),
                       ('vec_id', 'ascending')]).slice(0, max_train)
    return _raw_matrix(tbl) if raw else _batch_matrix(tbl)


def ivf_oracle_sql(sf_dir=None, n_queries=16, k=5, nlist=16, nprobe=4,
                   max_train=65536):
    """Full SQL re-derivation of ann_topk_ivf.  The coarse quantizer is
    data-dependent, so the oracle trains the SAME deterministic k-means on
    the SAME bounded md5-keyed sample at build time and inlines the
    centroids as literals — valid for the sf dir the driver compares at."""
    from .similarity import _kmeans
    sf_dir = sf_dir or _oracle_sf_dir()
    path = os.path.join(sf_dir, 'embeddings.parquet')
    _, train = _sample_matrix(path, max_train)
    cent = _kmeans(train, nlist)
    cent_rows = ',\n    '.join('(%d, %s)' % (ci, _dlist(cent[ci]))
                               for ci in range(nlist))
    return """
WITH cent(ci, cv) AS (VALUES
    {cent_rows}
), q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings
  WHERE vec_id < {nq}
), e AS (
  SELECT vec_id AS nid, embedding::DOUBLE[] AS ee FROM embeddings
), easn AS (
  SELECT nid, ee, ci AS cell FROM (
    SELECT e.nid, e.ee, cent.ci,
           row_number() OVER (PARTITION BY e.nid
             ORDER BY list_cosine_similarity(e.ee, cent.cv) DESC, cent.ci ASC) AS rn
    FROM e, cent) WHERE rn = 1
), qpr AS (
  SELECT qid, qe, ci FROM (
    SELECT q.qid, q.qe, cent.ci,
           row_number() OVER (PARTITION BY q.qid
             ORDER BY list_cosine_similarity(q.qe, cent.cv) DESC, cent.ci ASC) AS rn
    FROM q, cent) WHERE rn <= {nprobe}
), s AS (
  SELECT qpr.qid, easn.nid, list_cosine_similarity(qpr.qe, easn.ee) AS sc
  FROM qpr JOIN easn ON easn.cell = qpr.ci AND easn.nid <> qpr.qid
), r AS (
  SELECT qid, nid, sc,
         row_number() OVER (PARTITION BY qid ORDER BY sc DESC, nid ASC)::BIGINT AS rank
  FROM s
)
SELECT qid AS query_id, nid AS neighbor_id,
       floor(sc * 10000 + 0.5) / 10000 AS score, rank
FROM r WHERE rank <= {k}
""".format(cent_rows=cent_rows, nq=n_queries, k=k, nprobe=nprobe)


def minhash_oracle_sql(threshold=0.8, k=3):
    """Full SQL re-derivation of minhash_near_dup: 32-bit md5 shingle
    hashes, the SAME 128 seeded permutations inlined as VALUES rows,
    (a*h+b) % (2^61-1) in HUGEINT (exact — the engine's uint64 math never
    overflows either), per-(doc, perm) minima, banding by equality of the
    4-minimum list (the engine keys buckets by crc32 of those 4 minima —
    equality of the lists IS equality of the keys, modulo crc collisions
    the engine itself would also suffer), then the exact-Jaccard verify
    with the shared integer |∩|/|∪| math and half-up rounding."""
    from .dedup import _perm_params, NUM_PERM, ROWS_PER_BAND, _MERSENNE
    a, b = _perm_params()
    perm_rows = ',\n    '.join('(%d, %d, %d)' % (p, int(a[p]), int(b[p]))
                               for p in range(NUM_PERM))
    return r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS tk FROM documents
), g AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, greatest(len(tk) - {km1}, 0)),
                                      i -> array_to_string(tk[i:i+{km1}], ' '))) AS s
  FROM toks
), sh AS (
  SELECT doc_id, unnest(s) AS gram FROM g WHERE len(s) > 0
), hs AS (
  SELECT doc_id, (md5_number_lower(gram) & 4294967295)::HUGEINT AS h FROM sh
), perms(p, a, b) AS (VALUES
    {perm_rows}
), pm AS (
  SELECT doc_id, p, min((a::HUGEINT * h + b) % {mersenne})::BIGINT AS m
  FROM hs CROSS JOIN perms GROUP BY doc_id, p
), band AS (
  SELECT doc_id, p // {rpb} AS bi, list(m ORDER BY p) AS mins
  FROM pm GROUP BY doc_id, p // {rpb}
), cand AS (
  SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
  FROM band a JOIN band b
    ON a.bi = b.bi AND a.mins = b.mins AND a.doc_id < b.doc_id
), j AS (
  SELECT c.ida, c.idb,
         len(list_intersect(ga.s, gb.s)) AS inter,
         len(list_distinct(list_concat(ga.s, gb.s))) AS uni
  FROM cand c JOIN g ga ON ga.doc_id = c.ida JOIN g gb ON gb.doc_id = c.idb
)
SELECT ida AS doc_id_a, idb AS doc_id_b,
       floor(inter::DOUBLE / uni * 1000000 + 0.5) / 1000000 AS jac
FROM j WHERE uni > 0 AND inter::DOUBLE / uni >= {threshold}
""".format(km1=k - 1, perm_rows=perm_rows, mersenne=_MERSENNE,
           rpb=ROWS_PER_BAND, threshold=repr(threshold))


def simhash_oracle_sql(max_hamming=3):
    """Full SQL re-derivation of simhash_near_dup: 64-bit md5 token hashes
    (duplicates kept, as in the engine), ±1 bit votes, sign → 64-bit
    signature (UBIGINT; bit 63 via a literal — DuckDB's << overflows into
    BIGINT), 4×16-bit chunk blocking, Hamming ≤ max_hamming verify.
    Docs with zero tokens carry signature 0, exactly like the engine."""
    return r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok FROM documents
), th AS (
  SELECT doc_id, md5_number_lower(tok) AS h FROM toks
), bits AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM th CROSS JOIN generate_series(0, 63) t(b)
  GROUP BY doc_id, b
), sig AS (
  SELECT doc_id,
         sum(CASE WHEN v > 0 THEN
               CASE WHEN b = 63 THEN 9223372036854775808::UBIGINT
                    ELSE 1::UBIGINT << b END
             ELSE 0::UBIGINT END)::UBIGINT AS s
  FROM bits GROUP BY doc_id
), allsig AS (
  SELECT d.doc_id, coalesce(sig.s, 0::UBIGINT) AS s
  FROM documents d LEFT JOIN sig USING (doc_id)
), chunks AS (
  SELECT doc_id, s, c, (s >> (16 * c)) & 65535 AS chunk
  FROM allsig CROSS JOIN generate_series(0, 3) t(c)
), cand AS (
  SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb, a.s AS sa, b.s AS sb
  FROM chunks a JOIN chunks b
    ON a.c = b.c AND a.chunk = b.chunk AND a.doc_id < b.doc_id
)
SELECT ida AS doc_id_a, idb AS doc_id_b,
       bit_count(xor(sa, sb))::BIGINT AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {maxh}
""".format(maxh=max_hamming)


def clusters_oracle_sql(threshold=0.8, k=3):
    """Connected components over the minhash near-dup pairs (the full
    minhash oracle runs as a subquery), via a recursive transitive-closure
    CTE: cluster_id = min reachable doc_id; docs in no pair are
    singletons."""
    pairs_sql = minhash_oracle_sql(threshold=threshold, k=k)
    return _components_cte(pairs_sql, 'doc_id_a', 'doc_id_b',
                           'documents', 'doc_id')


def _components_cte(pairs_sql, col_a, col_b, entity_table, entity_col):
    """Recursive transitive-closure CTE shared by the minhash and
    embedding cluster oracles: cluster_id = min reachable entity id;
    entities in no pair are singletons."""
    return """
WITH RECURSIVE pairs AS (
  SELECT {a} AS pa, {b} AS pb FROM ({pairs_sql}) src
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
SELECT d.{ec},
       coalesce(cl.cluster_id, d.{ec}) AS cluster_id,
       (coalesce(cl.cluster_id, d.{ec}) = d.{ec}) AS is_survivor
FROM {et} d LEFT JOIN cl ON cl.eid = d.{ec}
""".format(pairs_sql=pairs_sql, a=col_a, b=col_b,
           et=entity_table, ec=entity_col)


def keep_best_oracle_sql(threshold=0.8, k=3):
    """Oracle for :func:`engine.ops.clusters.dedup_keep_best`: the full
    clusters oracle (recursive CTE over the minhash pair subquery) runs
    as a subquery; the keep decision is row_number() OVER (PARTITION BY
    cluster_id ORDER BY n_tokens DESC, doc_id) = 1 — the exact policy the
    engine's in-bucket argmax + min-id tie-break implements."""
    cl = clusters_oracle_sql(threshold=threshold, k=k)
    return r"""
WITH cl AS ({cl}
), tok AS (
  SELECT doc_id, len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens
  FROM documents
), j AS (
  SELECT cl.cluster_id, cl.doc_id, tok.n_tokens
  FROM cl JOIN tok USING (doc_id)
), r AS (
  SELECT cluster_id, doc_id, n_tokens,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n_tokens DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY cluster_id) AS cluster_size
  FROM j
)
SELECT cluster_id, doc_id, n_tokens, cluster_size::BIGINT AS cluster_size
FROM r WHERE rn = 1
""".format(cl=cl.strip())


def embedding_pairs_sql(threshold=0.42):
    """The exact embedding-cosine pair predicate (same as the
    embedding_dup_pairs oracle's WHERE clause), with the threshold
    threaded through — callers verifying a non-default engine threshold
    get a matching oracle, not a silently-0.42 one."""
    return """
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                             b.embedding::DOUBLE[]) >= {t}
""".format(t=repr(float(threshold)))


def embedding_clusters_oracle_sql(threshold=0.42):
    """Connected components over the exact embedding-cosine pairs (the
    same pair predicate as the embedding_dup_pairs oracle), for
    :func:`engine.ops.clusters.embedding_dedup_clusters`."""
    return _components_cte(embedding_pairs_sql(threshold),
                           'vec_id_a', 'vec_id_b', 'embeddings', 'vec_id')


def payload_dedup_oracle_sql(sf_dir=None):
    """dedup_exact_payloads over the TRANSCRIPTS corpus: the corpus is a
    deterministic synthesized parquet dir, so the oracle reads it by path
    (ensure_corpus builds it if the Ray side hasn't yet).  Survivor = first
    (conv_id, turn_idx) per md5(text); DuckDB md5 hex == hashlib hexdigest."""
    from .common import sf_from_dir
    from engine.rayjob.transcripts import ensure_corpus
    sf_dir = sf_dir or _oracle_sf_dir()
    corpus = ensure_corpus(sf_from_dir(sf_dir))
    return """
WITH t AS (
  SELECT conv_id, turn_idx, md5(text) AS fp
  FROM read_parquet('{corpus}/*.parquet')
), r AS (
  SELECT fp, conv_id, turn_idx,
         row_number() OVER (PARTITION BY fp
                            ORDER BY conv_id, turn_idx) AS rn,
         count(*) OVER (PARTITION BY fp) AS n_copies
  FROM t
)
SELECT fp, conv_id, turn_idx, n_copies::BIGINT AS n_copies
FROM r WHERE rn = 1
""".format(corpus=corpus)


def _mm_expected_tables(sf_dir, tw, th, stride):
    """Fixture-time INDEPENDENT recompute of the multimodal blob bytes →
    md5 side tables.  Pure-Python loops straight off the documented MMV1
    payload convention (multimodal.py module docstring) — no numpy, no
    engine classes — so a bug in the engine's vectorized resample/frame
    slicing cannot cancel out here.  Cached per (sf dir, params)."""
    import hashlib
    import pyarrow as pa
    import pyarrow.parquet as pq
    tag = os.path.basename(os.path.normpath(sf_dir))
    out_dir = '/tmp/graft_mm_expected/%s-tw%dth%ds%d-v1' % (tag, tw, th, stride)
    rp = os.path.join(out_dir, 'expected_resize_md5.parquet')
    fp = os.path.join(out_dir, 'expected_frame_md5.parquet')
    marker = os.path.join(out_dir, '_COMPLETE')
    if os.path.exists(marker):
        return rp, fp
    tbl = pq.read_table(os.path.join(sf_dir, 'documents.parquet'),
                        columns=['doc_id', 'text'])
    r_id, r_md5 = [], []
    f_id, f_idx, f_md5 = [], [], []
    magic = b'MMV1'

    def u32(*vals):
        return b''.join(v.to_bytes(4, 'little') for v in vals)

    for doc_id, text in zip(tbl.column('doc_id').to_pylist(),
                            tbl.column('text').to_pylist()):
        w = 8 + (doc_id % 24)
        h = 8 + ((doc_id // 7) % 16)
        ch = 1 + (doc_id % 3)
        cps = [ord(c) % 256 for c in text] or [0]
        m = len(cps)
        need = w * h * ch
        body = bytes(cps[i % m] for i in range(need))
        resized = bytes(
            body[(y * h // th) * w * ch + (x * w // tw) * ch + c]
            for y in range(th) for x in range(tw) for c in range(ch))
        r_id.append(doc_id)
        r_md5.append(hashlib.md5(magic + u32(tw, th, ch) + resized).hexdigest())
        if doc_id % 3 == 2:                       # 'video' rows only
            for f in range(0, h, stride):
                row = body[f * w * ch:(f + 1) * w * ch]
                f_id.append(doc_id)
                f_idx.append(f)
                f_md5.append(hashlib.md5(magic + u32(w, 1, ch) + row).hexdigest())

    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(pa.table({
        'media_id': pa.array(r_id, pa.int64()),
        'payload_md5': pa.array(r_md5, pa.string()),
    }), rp)
    pq.write_table(pa.table({
        'media_id': pa.array(f_id, pa.int64()),
        'frame_idx': pa.array(f_idx, pa.int32()),
        'frame_md5': pa.array(f_md5, pa.string()),
    }), fp)
    with open(marker, 'w') as f:
        f.write('ok\n')
    return rp, fp


def mm_blob_oracle_sqls(sf_dir=None, tw=16, th=16, stride=4):
    """Blob-level oracles for multimodal_resize_blobs / frame_blobs: the
    emitted bytes' md5s vs the fixture-time independent recompute, with the
    row inventory (which media, which frames, dims, byte lengths) derived
    in SQL from doc_id arithmetic."""
    sf_dir = sf_dir or _oracle_sf_dir()
    rp, fp = _mm_expected_tables(sf_dir, tw, th, stride)
    return {
        'multimodal_resize_blobs': """
WITH base AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         (1 + doc_id % 3)::INTEGER AS ch
  FROM documents
)
SELECT b.doc_id AS media_id, b.kind,
       {tw}::INTEGER AS width, {th}::INTEGER AS height, b.ch AS channels,
       e.payload_md5
FROM base b JOIN read_parquet('{rp}') e ON e.media_id = b.doc_id
""".format(tw=tw, th=th, rp=rp),
        'multimodal_frame_blobs': """
WITH v AS (
  SELECT doc_id, 8 + (doc_id % 24) AS w, 8 + ((doc_id // 7) % 16) AS h,
         1 + (doc_id % 3) AS ch
  FROM documents WHERE doc_id % 3 = 2
), f AS (
  SELECT doc_id, w, ch, unnest(generate_series(0, h - 1)) AS fi FROM v
)
SELECT f.doc_id AS media_id, f.fi::INTEGER AS frame_idx,
       (16 + f.w * f.ch)::BIGINT AS byte_len, e.frame_md5
FROM f JOIN read_parquet('{fp}') e
  ON e.media_id = f.doc_id AND e.frame_idx = f.fi
WHERE f.fi % {stride} = 0
""".format(fp=fp, stride=stride),
    }


def extract_oracle_sqls(sf_dir=None):
    """INDEPENDENT driver oracles for the flagship extraction queries.

    The corpus draws every payload from the deterministic variant pool, and
    ``ensure_expected`` ships reference-derived expected tables beside it
    (built from tests/golden/pdf_text — the unmodified reference library's
    own GetFullText pages and 'glyph draw' events, generated by
    tests/gen_golden.py; never from this engine).  Each flagship query is
    then a pure SQL join on ``md5(payload)``:

    - extract_fulltext: per-turn text / span / page counts / decode_ok
      (reference __init__.py:548-620 semantics);
    - extract_spans: one row per glyph draw with exact float64 positions
      (reference __init__.py:524 callback surface);
    - extract_metrics: the corpus-level aggregate of the same.
    """
    from .common import sf_from_dir
    from engine.rayjob.transcripts import ensure_corpus, ensure_expected
    sf_dir = sf_dir or _oracle_sf_dir()
    corpus = ensure_corpus(sf_from_dir(sf_dir))
    exp = ensure_expected(corpus)
    t = ("(SELECT conv_id, turn_idx, md5(text) AS fp "
         "FROM read_parquet('%s/*.parquet'))" % corpus)
    turns = "read_parquet('%s/expected_turns.parquet')" % exp
    spans = "read_parquet('%s/expected_spans.parquet')" % exp
    return {
        'extract_fulltext': """
SELECT t.conv_id, t.turn_idx, e.text, e.n_spans, e.n_pages, e.decode_ok
FROM {t} t JOIN {turns} e USING (fp)
""".format(t=t, turns=turns),
        'extract_spans': """
SELECT t.conv_id, t.turn_idx, s.page, s.x, s.y, s."unicode", s.cid, s.width
FROM {t} t JOIN {spans} s USING (fp)
""".format(t=t, spans=spans),
        'extract_metrics': """
SELECT count(*)::BIGINT AS n_turns,
       sum(CASE WHEN e.decode_ok THEN 0 ELSE 1 END)::BIGINT AS decode_failures,
       sum(e.n_spans)::BIGINT AS total_spans,
       sum(e.n_pages)::BIGINT AS total_pages
FROM {t} t JOIN {turns} e USING (fp)
""".format(t=t, turns=turns),
    }


def embedding_dim(sf_dir=None):
    """Embedding dimensionality from the oracle sf dir's parquet (one
    batch peeked; no full read)."""
    import pyarrow.parquet as pq
    sf_dir = sf_dir or _oracle_sf_dir()
    path = os.path.join(sf_dir, 'embeddings.parquet')
    pf = pq.ParquetFile(path)
    b = next(pf.iter_batches(batch_size=1, columns=['embedding']))
    return len(b.column('embedding')[0])


def dup_lsh_oracle_sql(dim=None, threshold=0.42, n_bands=8, n_planes=4):
    """Full SQL re-derivation of embedding_dup_lsh: the seeded band
    hyperplanes inline as literals, candidate pairs = DISTINCT pairs
    agreeing on all sign bits of at least one band, verified with exact
    list_cosine_similarity ≥ threshold (same float math + half-up r4 as
    the engine's matmul kernel)."""
    from .similarity import _dup_lsh_planes
    dim = dim or embedding_dim()
    planes = _dup_lsh_planes(dim, n_bands, n_planes)     # (dim, B·P)
    band_selects = []
    for b in range(n_bands):
        pls = [_dlist(planes[:, b * n_planes + p]) for p in range(n_planes)]
        band_selects.append(
            'SELECT vec_id, ee, %d AS band, %s AS bk FROM e'
            % (b, _bucket_expr('ee', pls)))
    bands_sql = '\n  UNION ALL '.join(band_selects)
    return """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS ee FROM embeddings
), bands AS (
  {bands_sql}
), cand AS (
  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bk = b.bk AND a.vec_id < b.vec_id
)
SELECT c.va AS vec_id_a, c.vb AS vec_id_b,
       floor(list_cosine_similarity(ea.ee, eb.ee) * 10000 + 0.5) / 10000 AS cos
FROM cand c JOIN e ea ON ea.vec_id = c.va JOIN e eb ON eb.vec_id = c.vb
WHERE list_cosine_similarity(ea.ee, eb.ee) >= {threshold}
""".format(bands_sql=bands_sql, threshold=repr(threshold))


def corpus_clean_oracle_sql(threshold=0.8, k=3):
    """corpus_clean = dedup_clusters survivors ∩ doc_quality keepers; the
    full clusters oracle (recursive CTE over the minhash pair subquery)
    runs as a subquery, the quality gate replicates the doc_quality
    oracle's integer/half-up math."""
    cl = clusters_oracle_sql(threshold=threshold, k=k)
    return r"""
WITH cl AS ({cl}
), q0 AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens,
         len(regexp_extract_all(text, '\b(the|a|of|to|and|in|is|it|that|for|on|as|with|by)\b'))::BIGINT AS n_stop
  FROM documents
), q AS (
  SELECT doc_id, lang, n_tokens,
         CASE WHEN n_tokens > 0
              THEN floor(n_stop::DOUBLE / n_tokens * 1000000 + 0.5) / 1000000
              ELSE 0.0 END AS stopword_ratio
  FROM q0
)
SELECT q.doc_id, q.lang, q.n_tokens, q.stopword_ratio
FROM q JOIN cl ON cl.doc_id = q.doc_id
WHERE cl.is_survivor
  AND q.n_tokens >= 5 AND q.n_tokens <= 2000 AND q.stopword_ratio > 0.01
""".format(cl=cl)


def tdigest_oracle_sql(sf_dir=None, k=2048, delta=64, qs=(0.5, 0.9, 0.99),
                       eps=0.05):
    """Oracle for :func:`engine.ops.relational.events_value_tdigest` —
    two independent checks fused into one hash-compared result:

    1. DETERMINISM: the per-type md5-bottom-k sample is re-derived in
       pure SQL (``md5_number_lower(event_id) & 2^63-1``, ORDER BY hk,
       value, LIMIT k — the exact convention the engine's combiner
       implements), the sample values are fed through the same
       :class:`TDigest` code at oracle-BUILD time, and the resulting
       estimates are inlined as literals.  Any drift in the engine's
       sampling, sorting, digest construction or rounding breaks hash
       parity.
    2. BRACKETING INVARIANT: the SQL independently computes, per type,
       the EXACT values at ranks ceil((q-eps)·n) and ceil((q+eps)·n)
       over the RAW data (no sampling), and poisons any inlined
       estimate that falls outside its bracket to -1e18 — so parity
       also certifies the sketch's accuracy claim, not just its
       reproducibility.  n_sample is checked in SQL as least(n, k);
       n_centroids is an inlined build-time constant (pinned further by
       the pytest property suite)."""
    import duckdb

    from .common import round_half_up
    from .sketches import TDigest

    sf_dir = sf_dir or _oracle_sf_dir()
    path = os.path.join(sf_dir, 'events.parquet')
    con = duckdb.connect()
    samples = con.execute("""
        SELECT event_type, value FROM (
          SELECT event_type, value,
                 row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY (md5_number_lower(event_id::VARCHAR)
                             & 9223372036854775807)::BIGINT, value) AS rn
          FROM read_parquet(?)
        ) WHERE rn <= ? ORDER BY event_type, value
    """, [path, k]).fetch_arrow_table()
    con.close()
    types = samples.column('event_type').to_numpy(zero_copy_only=False)
    vals = samples.column('value').to_numpy(zero_copy_only=False) \
                  .astype(np.float64)
    rows = []
    starts = np.flatnonzero(np.r_[True, types[1:] != types[:-1]])
    bounds = np.r_[starts, len(types)]
    for s, e in zip(bounds[:-1], bounds[1:]):
        dig = TDigest.from_sorted(vals[s:e], delta)
        ests = ', '.join('%.17g' % round_half_up([dig.quantile(q)], 6)[0]
                         for q in qs)
        rows.append("('%s', %s, %d)" % (types[s], ests, dig.means.size))
    qcols = ['p%02d_est' % int(round(q * 100)) for q in qs]
    bracket_sql = []
    est_sql = []
    for q, col in zip(qs, qcols):
        bracket_sql.append(
            "max(CASE WHEN rn = greatest(1, ceil(({q} - {eps}) * n)::BIGINT)"
            " THEN value END) AS lo_{col},\n"
            "       max(CASE WHEN rn = least(n, ceil(({q} + {eps}) * n)::BIGINT)"
            " THEN value END) AS hi_{col}".format(q=repr(q), eps=repr(eps),
                                                  col=col))
        est_sql.append(
            "CASE WHEN v.{col} BETWEEN br.lo_{col} AND br.hi_{col}"
            " THEN v.{col} ELSE -1e18 END AS {col}".format(col=col))
    return """
WITH v(event_type, {qcols}, n_centroids) AS (VALUES
    {rows}
), ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
), br AS (
  SELECT event_type, any_value(n)::BIGINT AS n_events,
       {brackets}
  FROM ranked GROUP BY event_type
)
SELECT v.event_type,
       {ests},
       br.n_events,
       least(br.n_events, {k})::BIGINT AS n_sample,
       v.n_centroids::BIGINT AS n_centroids
FROM v JOIN br ON br.event_type = v.event_type
""".format(qcols=', '.join(qcols), rows=',\n    '.join(rows),
           brackets=',\n       '.join(bracket_sql),
           ests=',\n       '.join(est_sql), k=k)


def pq_oracle_sql(sf_dir=None, n_queries=16, k=5, max_train=65536):
    """Full SQL re-derivation of ann_topk_pq.  The per-subspace codebooks
    are data-dependent, so the oracle trains the SAME deterministic
    k-means on the SAME bounded raw md5-keyed sample at build time and
    inlines them as literals (ivf precedent).  Assignment parity: the
    engine's ``c·c − 2·x·c`` argmin (ties → lowest code, _seq_dot
    sequential folds) is exactly DuckDB's sequential
    ``list_dot_product``; score parity: integer LUT sums — DuckDB's
    BIGINT SUM and the engine's int64 adds are both exact."""
    from .similarity import _PQ_K, _PQ_LUT_SCALE, _PQ_M, _pq_fit
    sf_dir = sf_dir or _oracle_sf_dir()
    path = os.path.join(sf_dir, 'embeddings.parquet')
    _, train = _sample_matrix(path, max_train, raw=True)
    books = _pq_fit(train, _PQ_M, _PQ_K)
    dsub = train.shape[1] // _PQ_M
    book_rows = ',\n  '.join(
        '(%d, %d, %s)' % (s, j, _dlist(books[s][j]))
        for s in range(_PQ_M) for j in range(len(books[s])))
    sub_cases = ' '.join(
        'WHEN %d THEN ee[%d:%d]' % (s, s * dsub + 1, (s + 1) * dsub)
        for s in range(_PQ_M))
    qsub_cases = ' '.join(
        'WHEN %d THEN qe[%d:%d]' % (s, s * dsub + 1, (s + 1) * dsub)
        for s in range(_PQ_M))
    return """
WITH book(s, j, cv) AS (VALUES
  {book_rows}
), e AS (
  SELECT vec_id AS nid, embedding::DOUBLE[] AS ee FROM embeddings
), sub AS (
  SELECT nid, s, CASE s {sub_cases} END AS sv
  FROM e, (SELECT DISTINCT s FROM book) b
), asn AS (
  SELECT nid, s, j AS code FROM (
    SELECT sub.nid, sub.s, book.j,
           row_number() OVER (PARTITION BY sub.nid, sub.s
             ORDER BY list_dot_product(book.cv, book.cv)
                      - 2 * list_dot_product(sub.sv, book.cv) ASC,
                      book.j ASC) AS rn
    FROM sub JOIN book ON book.s = sub.s) WHERE rn = 1
), q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings
  WHERE vec_id < {nq}
), lut AS (
  SELECT q.qid, book.s, book.j,
         CAST(floor(list_dot_product(CASE book.s {qsub_cases} END, book.cv)
                    * {scale} + 0.5) AS BIGINT) AS v
  FROM q, book
), sc AS (
  SELECT lut.qid, asn.nid, SUM(lut.v)::BIGINT AS score_int
  FROM asn JOIN lut ON lut.s = asn.s AND lut.j = asn.code
  WHERE asn.nid <> lut.qid
  GROUP BY lut.qid, asn.nid
), r AS (
  SELECT qid, nid, score_int,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score_int DESC, nid ASC)::BIGINT AS rank
  FROM sc
)
SELECT qid AS query_id, nid AS neighbor_id, score_int, rank
FROM r WHERE rank <= {k}
""".format(book_rows=book_rows, sub_cases=sub_cases,
           qsub_cases=qsub_cases, nq=n_queries,
           scale=_PQ_LUT_SCALE, k=k)


def training_manifest_oracle_sql(threshold=0.8, k=3, train_mod=10,
                                 train_lt=8, val_eq=8, n_shards=4):
    """Oracle for :func:`engine.ops.clusters.training_manifest`: the
    full corpus_clean oracle (recursive-CTE cluster solve + quality
    gate) as a CTE, then the shared md5 split rule and the independent
    shard digit of the same 63-bit key."""
    clean = corpus_clean_oracle_sql(threshold=threshold, k=k)
    return """
WITH clean AS ({clean}
), d AS (
  SELECT ((md5_number_lower(doc_id::VARCHAR)
           & 9223372036854775807) % {mod}) AS m,
         (((md5_number_lower(doc_id::VARCHAR)
            & 9223372036854775807) // {mod}) % {ns})::BIGINT AS shard,
         n_tokens
  FROM clean
)
SELECT CASE WHEN m < {lt} THEN 'train'
            WHEN m = {veq} THEN 'val' ELSE 'test' END AS split,
       shard, count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS n_tokens
FROM d GROUP BY 1, 2
""".format(clean=clean, mod=train_mod, lt=train_lt, veq=val_eq,
           ns=n_shards)


def source_funnel_oracle_sql(threshold=0.8, k=3):
    """Oracle for :func:`engine.ops.clusters.source_quality_funnel`:
    the clusters oracle as a CTE (one row per doc, is_survivor flag),
    the doc_quality gate replicated with the identical integer/half-up
    math, folded per source."""
    cl = clusters_oracle_sql(threshold=threshold, k=k)
    return r"""
WITH cl AS ({cl}
), q0 AS (
  SELECT doc_id, source,
         len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens,
         len(regexp_extract_all(text, '\b(the|a|of|to|and|in|is|it|that|for|on|as|with|by)\b'))::BIGINT AS n_stop
  FROM documents
), q AS (
  SELECT doc_id, source,
         (n_tokens >= 5 AND n_tokens <= 2000 AND
          CASE WHEN n_tokens > 0
               THEN floor(n_stop::DOUBLE / n_tokens * 1000000 + 0.5)
                    / 1000000
               ELSE 0.0 END > 0.01) AS is_q
  FROM q0
), j AS (
  SELECT q.source, q.is_q, (q.is_q AND cl.is_survivor) AS is_clean
  FROM q JOIN cl ON cl.doc_id = q.doc_id
)
SELECT source, count(*)::BIGINT AS n_docs,
       count(*) FILTER (WHERE is_q)::BIGINT AS n_quality,
       count(*) FILTER (WHERE is_clean)::BIGINT AS n_clean,
       floor(count(*) FILTER (WHERE is_clean)::DOUBLE
             / count(*)::DOUBLE * 1000000 + 0.5) / 1000000 AS keep_rate
FROM j GROUP BY source
""".format(cl=cl)
