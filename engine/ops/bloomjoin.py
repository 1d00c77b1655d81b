"""Bloom-filtered shuffle semi-join — the runtime-filter pattern every
warehouse engine uses for selective fact⋈dim joins: build a Bloom filter
over the build side's join keys, broadcast it, and drop probe-side rows
BEFORE the exchange so the shuffle carries only (candidate ∪ false
positive) rows instead of the whole fact table.  The exact bucketed
co-partition join afterwards kills the false positives, so the result is
EXACT — the bloom only narrows the exchange.

Scale shape (100 TB): the filter is built with a tree-reduce of
per-block partial bitmaps (raw ray tasks — a shared mutable bitmap is
the one thing the Dataset API can't express), so no per-key data ever
folds through the driver; the finished bitmap lives in the object store
once per node (``BroadcastLookup``) and the probe-side test is a
vectorized numpy double-hash.  At 3×10⁸ build keys × 16 bits the bitmap
is ~600 MB — per-NODE memory, shared zero-copy by all workers on it.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .common import BroadcastLookup, pool, read_table

__all__ = ['urgent_order_lineitems', 'bloom_positions', 'build_bloom']


def bloom_positions(keys, m_bits, k):
    """k bit positions per int64 key: one 64-bit avalanche mix
    (splitmix64 finalizer) split into (h1, odd h2) double hashing —
    vectorized, no per-key Python.  ``m_bits`` must be a power of two."""
    x = keys.astype(np.uint64)
    x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    x = (x ^ (x >> np.uint64(33))) * np.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> np.uint64(33)
    mask = np.uint64(m_bits - 1)
    h1 = x & mask
    h2 = (x >> np.uint64(32)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return (h1[None, :] + i * h2[None, :]) & mask      # (k, n)


def _bitmap_of(keys, m_bits, k):
    bits = np.zeros(m_bits // 64, np.uint64)
    pos = bloom_positions(keys, m_bits, k)
    np.bitwise_or.at(bits, pos >> np.uint64(6),
                     np.uint64(1) << (pos & np.uint64(63)))
    return bits


def _bloom_test(bits, keys, m_bits, k):
    pos = bloom_positions(keys, m_bits, k)
    hit = (bits[pos >> np.uint64(6)]
           >> (pos & np.uint64(63))) & np.uint64(1)
    return hit.all(axis=0)


@ray.remote
def _partial_bloom(tbl, m_bits, k):
    return _bitmap_of(tbl.column('key').to_numpy(zero_copy_only=False),
                      m_bits, k)


@ray.remote
def _or_fold(*bitmaps):
    out = bitmaps[0].copy()
    for b in bitmaps[1:]:
        np.bitwise_or(out, b, out=out)
    return out


def build_bloom(key_tbl_refs, n_keys, bits_per_key=16, k=4, fan_in=8):
    """Tree-reduce per-block partial bitmaps into one Bloom bitmap ref.
    Returns ``(bitmap_ref, m_bits)``; the bitmap never touches the
    driver."""
    m_bits = 1 << max(10, int(np.ceil(np.log2(
        bits_per_key * max(int(n_keys), 1)))))
    level = [_partial_bloom.remote(r, m_bits, k) for r in key_tbl_refs]
    if not level:
        level = [_partial_bloom.remote(
            pa.table({'key': pa.array([], pa.int64())}), m_bits, k)]
    while len(level) > 1:
        level = [_or_fold.remote(*level[i:i + fan_in])
                 for i in range(0, len(level), fan_in)]
    return level[0], m_bits


class _BloomPrefilter(BroadcastLookup):
    """Probe-side stage: test l_orderkey against the broadcast bitmap,
    then fold survivors to per-(block, orderkey) combiner rows so the
    exchange moves partial aggregates, not line items."""

    def __init__(self, state_ref, m_bits, k, nb):
        super().__init__(state_ref)
        self.m_bits, self.k, self.nb = m_bits, k, nb

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column('l_orderkey').to_numpy(zero_copy_only=False)
        keep = _bloom_test(self.state, keys, self.m_bits, self.k)
        sel = batch.filter(pa.array(keep))
        qty = np.floor(sel.column('l_quantity').to_numpy(
            zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
        t = pa.table({'key': sel.column('l_orderkey'),
                      'n_items': pa.array(np.ones(sel.num_rows, np.int64)),
                      'qty_cents': pa.array(qty, pa.int64())})
        g = t.group_by('key').aggregate(
            [('n_items', 'sum'), ('qty_cents', 'sum')])
        kk = g.column('key')
        return pa.table({
            'key': kk,
            'n_items': g.column('n_items_sum').cast(pa.int64()),
            'qty_cents': g.column('qty_cents_sum').cast(pa.int64()),
            'bucket': pa.array(
                kk.to_numpy(zero_copy_only=False) & (self.nb - 1),
                pa.int64()),
        })


def urgent_order_lineitems(sf_dir, num_buckets=64, bits_per_key=16, k=4):
    """Per-urgent-order line-item count and quantity total, computed as a
    bloom-filtered shuffle semi-join: URGENT orderkeys → tree-reduced
    Bloom bitmap → broadcast probe filter on lineitem (the ~80%
    non-urgent fact rows never enter the exchange) → one bucketed
    ``key & (nb-1)`` co-partition where the EXACT key join removes bloom
    false positives."""
    nb = num_buckets

    def urgent_keys(batch: pa.Table) -> pa.Table:
        sel = batch.filter(pc.equal(batch.column('o_orderpriority'),
                                    '1-URGENT'))
        return pa.table({'key': sel.column('o_orderkey')})

    orders = read_table(sf_dir, 'orders',
                        columns=['o_orderkey', 'o_orderpriority'])
    key_refs = orders.map_batches(
        urgent_keys, batch_format='pyarrow',
        zero_copy_batch=True).to_arrow_refs()
    counts = ray.get([_nrows.remote(r) for r in key_refs])
    bloom_ref, m_bits = build_bloom(key_refs, sum(counts),
                                    bits_per_key=bits_per_key, k=k)

    def key_rows(tbl: pa.Table) -> pa.Table:
        kk = tbl.column('key')
        return pa.table({
            'key': kk,
            'n_items': pa.nulls(len(kk), pa.int64()),
            'qty_cents': pa.nulls(len(kk), pa.int64()),
            'bucket': pa.array(
                kk.to_numpy(zero_copy_only=False) & (nb - 1), pa.int64()),
        })

    def bucket_fold(group: pa.Table) -> pa.Table:
        is_key = pc.is_null(group.column('n_items'))
        truth = group.filter(is_key).select(['key'])
        parts = group.filter(pc.invert(is_key)) \
                     .select(['key', 'n_items', 'qty_cents'])
        if truth.num_rows == 0 or parts.num_rows == 0:
            return pa.table({'o_orderkey': pa.array([], pa.int64()),
                             'n_items': pa.array([], pa.int64()),
                             'qty_cents': pa.array([], pa.int64())})
        j = parts.join(truth, keys='key', join_type='inner')
        g = j.group_by('key').aggregate(
            [('n_items', 'sum'), ('qty_cents', 'sum')])
        return pa.table({
            'o_orderkey': g.column('key'),
            'n_items': g.column('n_items_sum').cast(pa.int64()),
            'qty_cents': g.column('qty_cents_sum').cast(pa.int64()),
        })

    lines = read_table(sf_dir, 'lineitem',
                       columns=['l_orderkey', 'l_quantity'])
    truth_ds = ray.data.from_arrow_refs(key_refs).map_batches(
        key_rows, batch_format='pyarrow', zero_copy_batch=True)
    probed = lines.map_batches(
        _BloomPrefilter, fn_constructor_args=(bloom_ref, m_bits, k, nb),
        concurrency=pool(), batch_format='pyarrow', zero_copy_batch=True)
    return probed.union(truth_ds) \
        .groupby('bucket').map_groups(bucket_fold, batch_format='pyarrow')


@ray.remote
def _nrows(tbl):
    return tbl.num_rows
