"""Order-independent TABLE CHECKSUM — the validation primitive of a data
migration: after moving 100 TB between stores/engines, both sides
compute (row count, XOR of per-row fingerprints) and compare two
numbers.  XOR is commutative/associative, so the fold is
partition-order-independent and streams with zero shuffle: each block
emits one (n, xor) partial, the driver folds ≤ blocks rows.

The per-row fingerprint is the repo's oracle-shared md5 convention
(common.hash63_strings = DuckDB ``md5_number_lower(s) & (2^63-1)``) over
a canonical '|'-joined key+payload string, so DuckDB can recompute the
identical checksum independently."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .common import hash63_strings, read_table

__all__ = ['lineitem_checksum', 'CHECKSUM_COLS']

# canonical column serialization order (part of the checksum contract)
CHECKSUM_COLS = ('l_orderkey', 'l_linenumber')


def _row_strings(batch, value_cents):
    parts = [pc.cast(batch.column(c), pa.string()) for c in CHECKSUM_COLS]
    parts.append(pc.cast(pa.array(value_cents, pa.int64()), pa.string()))
    sep = [pa.scalar('|')] * (len(parts) - 1)
    joined = parts[0]
    for i, p in enumerate(parts[1:]):
        joined = pc.binary_join_element_wise(joined, p, sep[i])
    return joined


def lineitem_checksum(sf_dir):
    """(n_rows, xor_fp) over lineitem's (orderkey, linenumber,
    quantity-cents) rows."""
    def partial(batch: pa.Table) -> pa.Table:
        cents = np.floor(batch.column('l_quantity').to_numpy(
            zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
        s = _row_strings(batch, cents).to_pylist()
        fps = hash63_strings(s)
        return pa.table({
            'n_rows': pa.array([len(fps)], pa.int64()),
            'xor_fp': pa.array([int(np.bitwise_xor.reduce(fps))
                                if len(fps) else 0], pa.int64()),
        })

    ds = read_table(sf_dir, 'lineitem',
                    columns=['l_orderkey', 'l_linenumber', 'l_quantity'])
    parts = ray.get(ds.map_batches(partial, batch_format='pyarrow',
                                   zero_copy_batch=True).to_arrow_refs())
    n, x = 0, 0
    for t in parts:
        for i in range(t.num_rows):      # a block may hold several partials
            n += t.column('n_rows')[i].as_py()
            x ^= t.column('xor_fp')[i].as_py()
    return pa.table({'n_rows': pa.array([n], pa.int64()),
                     'xor_fp': pa.array([x], pa.int64())})


CHECKSUM_SQL = """
WITH r AS (
  SELECT (md5_number_lower(
            l_orderkey::VARCHAR || '|' || l_linenumber::VARCHAR || '|'
            || CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)::VARCHAR)
          & 9223372036854775807)::BIGINT AS fp
  FROM lineitem
)
SELECT count(*)::BIGINT AS n_rows,
       coalesce(bit_xor(fp), 0)::BIGINT AS xor_fp
FROM r
"""
