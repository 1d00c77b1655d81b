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

__all__ = ['distinct_users_kmv', 'distinct_users_hll', 'TDigest']

_MASK63 = (1 << 63) - 1
_M63F = float(_MASK63)


def _hash63(ids):
    """md5(str(v)) → 63-bit int64 keys (common.hash63_keys — the
    oracle-shared convention)."""
    return hash63_keys(ids)


class TDigest:
    """Mergeable rank sketch for CONTINUOUS values (Dunning & Ertl's
    merging t-digest, k1 scale function) — the approximate-quantile tier
    for unbounded value ranges, beside the exact tier
    (``relational.events_value_quantiles``, O(distinct values) state)
    and the fixed-universe histogram tier
    (``relational.events_value_hist_quantiles``, needs a known range).

    State is O(delta) centroids regardless of row count; ``merge`` is
    the combiner (union centroids, sort, recompress), so a 100 TB group
    exchanges ~delta rows per block.  Accuracy: the k1 scale bounds each
    centroid's q-width by 4·sin(pi/delta)·sqrt(q(1-q)) + interpolation,
    so rank error is ~q(1-q)·(2pi/delta) near the middle and tighter at
    the tails — property-tested in tests/test_ops.py.

    DETERMINISM CONTRACT: given the same sorted input, construction is a
    fixed sequential fold (no randomness); ``merge(a, b) == merge(b, a)``
    exactly (centroids sort by (mean, weight) before recompression), but
    merge is NOT associative bit-for-bit — estimates from different
    merge TREES agree only within the error bound.  Oracle-checked
    surfaces therefore build ONE canonical digest from an
    order-independent md5-sampled value set (see
    ``relational.events_value_tdigest``) instead of hash-comparing a
    merge-tree-dependent digest."""

    __slots__ = ('delta', 'means', 'weights', 'vmin', 'vmax')

    def __init__(self, delta=64, means=None, weights=None,
                 vmin=np.inf, vmax=-np.inf):
        self.delta = int(delta)
        self.means = (np.empty(0, np.float64) if means is None
                      else np.asarray(means, np.float64))
        self.weights = (np.empty(0, np.float64) if weights is None
                        else np.asarray(weights, np.float64))
        self.vmin = float(vmin)
        self.vmax = float(vmax)

    # -- scale function (k1) ------------------------------------------
    def _k(self, q):
        return self.delta / (2.0 * np.pi) * np.arcsin(2.0 * q - 1.0)

    def _k_inv(self, k):
        return (np.sin(k * 2.0 * np.pi / self.delta) + 1.0) / 2.0

    @classmethod
    def from_sorted(cls, values, delta=64):
        """Canonical digest of a SORTED float64 array: one sequential
        greedy pass — extend the open centroid while its weight stays
        under the k1 q-capacity, else seal it and open the next.  The
        only Python loop runs over the (bounded) sample, never a raw
        corpus — at scale the raw data folds through per-block digests +
        ``merge``, or through the md5-sample path."""
        v = np.asarray(values, np.float64)
        d = cls(delta)
        n = v.size
        if n == 0:
            return d
        W = float(n)
        means, weights = [], []
        cum = 0.0                       # weight sealed so far
        qlim = d._k_inv(d._k(0.0) + 1.0) * W
        cm, cw = float(v[0]), 1.0
        for i in range(1, n):
            if cum + cw + 1.0 <= qlim:
                cw += 1.0
                cm += (float(v[i]) - cm) / cw
            else:
                means.append(cm)
                weights.append(cw)
                cum += cw
                qlim = d._k_inv(d._k(min(cum / W, 1.0)) + 1.0) * W
                cm, cw = float(v[i]), 1.0
        means.append(cm)
        weights.append(cw)
        d.means = np.asarray(means, np.float64)
        d.weights = np.asarray(weights, np.float64)
        d.vmin, d.vmax = float(v[0]), float(v[-1])
        return d

    def merge(self, other):
        """Combiner: union the two centroid sets, canonical sort by
        (mean, weight), recompress with the same greedy pass over
        CENTROIDS (weighted).  Commutative by construction."""
        if other.means.size == 0:
            return self._copy()
        if self.means.size == 0:
            return other._copy()
        m = np.r_[self.means, other.means]
        w = np.r_[self.weights, other.weights]
        order = np.lexsort((w, m))
        m, w = m[order], w[order]
        d = TDigest(self.delta)
        W = float(w.sum())
        means, weights = [], []
        cum = 0.0
        qlim = d._k_inv(d._k(0.0) + 1.0) * W
        cm, cw = float(m[0]), float(w[0])
        for i in range(1, m.size):
            wi = float(w[i])
            if cum + cw + wi <= qlim:
                cw += wi
                cm += (float(m[i]) - cm) * wi / cw
            else:
                means.append(cm)
                weights.append(cw)
                cum += cw
                qlim = d._k_inv(d._k(min(cum / W, 1.0)) + 1.0) * W
                cm, cw = float(m[i]), wi
        means.append(cm)
        weights.append(cw)
        d.means = np.asarray(means, np.float64)
        d.weights = np.asarray(weights, np.float64)
        d.vmin = min(self.vmin, other.vmin)
        d.vmax = max(self.vmax, other.vmax)
        return d

    def _copy(self):
        return TDigest(self.delta, self.means.copy(), self.weights.copy(),
                       self.vmin, self.vmax)

    def quantile(self, q):
        """Estimate the q-quantile: each centroid i sits at cumulative
        weight C_i = sum(w[:i]) + w[i]/2; linear interpolation between
        adjacent centroid means, clamped to the tracked [vmin, vmax]."""
        n = self.means.size
        if n == 0:
            return float('nan')
        if n == 1:
            return float(self.means[0])
        W = float(self.weights.sum())
        target = q * W
        centers = np.cumsum(self.weights) - self.weights / 2.0
        if target <= centers[0]:
            # interpolate from vmin at rank 0 to the first centroid
            t = max(target, 0.0) / centers[0] if centers[0] > 0 else 1.0
            return float(self.vmin + t * (self.means[0] - self.vmin))
        if target >= centers[-1]:
            span = W - centers[-1]
            t = (target - centers[-1]) / span if span > 0 else 1.0
            return float(self.means[-1]
                         + min(t, 1.0) * (self.vmax - self.means[-1]))
        j = int(np.searchsorted(centers, target, side='right'))
        lo_c, hi_c = centers[j - 1], centers[j]
        t = (target - lo_c) / (hi_c - lo_c)
        return float(self.means[j - 1] + t * (self.means[j]
                                              - self.means[j - 1]))


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


# -- HyperLogLog ------------------------------------------------------
#
# The O(m)-state cardinality tier beside KMV: a KMV sketch needs its k
# hashes exchanged per (group, block) and its accuracy is ~1/sqrt(k);
# HLL (Flajolet et al. 2007) holds m = 2^P 6-bit registers per group
# (fixed 4 KiB at P=12 for ~1.04/sqrt(m) = 1.6% error) and merges by
# element-wise register MAX — the canonical mergeable-distinct sketch a
# 100 TB pipeline keeps per partition and folds up a tree.
#
# Register rule over the oracle-shared 63-bit md5 key (hash63_keys):
# top P bits select the register, the remaining W = 63-P bits w give
# rho = (leading zeros of w within W bits) + 1 = W+1-floor(log2 w)
# (w == 0 → W+1).  All estimate arithmetic is EXACT-RATIONAL until the
# final division: sum(2^-M_j) is computed as the integer
# S = sum_j 2^(Mmax - M_j) over all m registers (Python int / DuckDB
# HUGEINT — order-independent, no float-accumulation drift), and the
# raw estimate is the single float expression
# (alpha * m^2) * 2^Mmax / float(S) with the identical parenthesization
# on both sides.  Small-range correction (raw <= 2.5m and empty
# registers exist): m * ln(m / V) — linear counting.  The large-range
# correction is irrelevant in a 63-bit hash space and omitted.

_HLL_P = 12
_HLL_M = 1 << _HLL_P            # 4096 registers
_HLL_W = 63 - _HLL_P            # 51 value bits
_HLL_WMASK = (1 << _HLL_W) - 1


def distinct_users_hll(sf_dir, table='events'):
    """Approximate distinct ``user_id`` per event type via HyperLogLog.

    Scale shape: per block — distinct (type, user) via Arrow group_by,
    hash, vectorized register/rho extraction (EXACT integer bit-length
    on both sides: np.frexp's exponent here — w < 2^51 is exactly
    representable in float64 and frexp is a bit-level op, no
    transcendental — and ``length(bin(w))`` in the oracle, so parity
    never rests on log2 rounding at power-of-two boundaries), then a
    per-(type, register) MAX combiner — the
    exchange carries ≤ m rows per (type, block), never users; per
    group — element-wise register max, then the exact-rational fold
    described in the module comment.  Deterministic (md5, no seeds), so
    the DuckDB oracle re-derives the identical estimate."""
    import math

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(['event_type', 'user_id']).aggregate([])
        hk = _hash63(g.column('user_id').to_numpy(zero_copy_only=False))
        reg = hk >> _HLL_W
        w = hk & _HLL_WMASK
        # rho: leading-zero count within the 51 value bits, plus one =
        # W + 1 - bit_length(w); bit_length = frexp exponent (exact)
        rho = np.full(len(hk), _HLL_W + 1, np.int64)
        nz = w > 0
        rho[nz] = _HLL_W + 1 - np.frexp(
            w[nz].astype(np.float64))[1].astype(np.int64)
        t = pa.table({
            'event_type': g.column('event_type'),
            'reg': pa.array(reg, pa.int64()),
            'rho': pa.array(rho, pa.int64()),
        })
        g2 = t.group_by(['event_type', 'reg']).aggregate([('rho', 'max')])
        return g2.rename_columns(['event_type', 'reg', 'm_j'])

    m = _HLL_M

    def fold(group: pa.Table) -> pa.Table:
        g = group.group_by('reg').aggregate([('m_j', 'max')])
        mj = g.column('m_j_max').to_numpy(zero_copy_only=False)
        n_present = len(mj)
        v_zero = m - n_present          # registers still at 0
        mmax = int(mj.max()) if n_present else 0
        # exact-rational sum(2^-M_j) = S / 2^mmax, S a Python int
        s_int = int(sum(1 << (mmax - int(x)) for x in mj)) \
            + v_zero * (1 << mmax)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        raw = (alpha * (float(m) * float(m))) * (2.0 ** mmax) / float(s_int)
        if raw <= 2.5 * m and v_zero > 0:
            est = m * math.log(m / v_zero)
        else:
            est = raw
        return pa.table({
            'event_type': group.column('event_type').slice(0, 1),
            'est_distinct': pa.array(round_half_up([est], 4), pa.float64()),
            'n_zero_regs': pa.array([v_zero], pa.int64()),
            'max_rho': pa.array([mmax], pa.int64()),
        })

    ds = read_table(sf_dir, table, columns=['event_type', 'user_id'])
    return ds.map_batches(partial, batch_format='pyarrow',
                          zero_copy_batch=True) \
             .groupby('event_type').map_groups(fold, batch_format='pyarrow')


def hll_oracle_sql():
    """DuckDB re-derivation of :func:`distinct_users_hll` — identical
    register rule, exact-rational HUGEINT fold and float expression
    (see the module comment; ``1::BIGINT << x`` is exact for
    x <= mmax <= 52, and the empties term is widened to HUGEINT before
    the multiply)."""
    return """
WITH h AS (
  SELECT DISTINCT event_type,
         (md5_number_lower(user_id::VARCHAR) & 9223372036854775807)::BIGINT AS hk
  FROM events
), rr AS (
  SELECT event_type, hk >> {W} AS reg,
         CASE WHEN (hk & {WMASK}) = 0 THEN {W1}
              ELSE {W1} - length(bin(hk & {WMASK}))
         END AS rho
  FROM h
), regs AS (
  SELECT event_type, reg, max(rho) AS m_j FROM rr GROUP BY event_type, reg
), wm AS (
  SELECT event_type, m_j,
         max(m_j) OVER (PARTITION BY event_type) AS mmax
  FROM regs
), agg AS (
  SELECT event_type, max(mmax) AS mmax,
         ({m} - count(*))::BIGINT AS v_zero,
         (sum(((1::BIGINT) << (mmax - m_j))::HUGEINT)
          + ({m} - count(*))::HUGEINT
            * ((1::BIGINT) << max(mmax))::HUGEINT) AS s_int
  FROM wm GROUP BY event_type
), est AS (
  SELECT event_type, v_zero, mmax,
         ((0.7213 / (1.0 + 1.079 / {m}.0)) * ({m}.0 * {m}.0))
           * power(2.0, mmax) / s_int::DOUBLE AS raw
  FROM agg
)
SELECT event_type,
       floor(CASE WHEN raw <= 2.5 * {m} AND v_zero > 0
                  THEN {m} * ln({m} / v_zero)
                  ELSE raw END * 10000 + 0.5) / 10000 AS est_distinct,
       v_zero AS n_zero_regs,
       mmax AS max_rho
FROM est
""".format(W=_HLL_W, W1=_HLL_W + 1, WMASK=_HLL_WMASK, m=_HLL_M)
