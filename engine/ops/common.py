"""Shared helpers for the ops layer.

Rounding: the driver hash-compares values between the Ray pipelines and
their DuckDB oracles.  Python's ``round`` is banker's rounding while
DuckDB's ``round`` is half-away-from-zero, so both sides instead use the
same explicit half-up formula ``floor(x*10^d + 0.5) / 10^d`` — identical
IEEE ops on both sides give identical doubles even at boundaries.
"""

import os

import numpy as np
import pyarrow as pa

__all__ = ['round_half_up', 'sql_round', 'sf_from_dir', 'table_path',
           'read_small_table', 'read_table', 'BroadcastLookup', 'pool',
           'hash63_keys', 'hash63_strings', 'run_pairs',
           'concat_tables_or_empty']


def concat_tables_or_empty(parts, schema):
    """``pa.concat_tables`` that tolerates an all-empty part list
    (plain ``concat_tables([])`` raises ValueError): returns an empty
    table of ``schema``.  Driver-side folds of per-bucket partials hit
    the empty case on degenerate inputs — a corpus with zero tool
    turns, a graph with zero edges — and must degrade to an empty
    result of the documented schema, not a crash."""
    parts = [t for t in parts if t.num_rows]
    return pa.concat_tables(parts) if parts else schema.empty_table()


def pool(frac=0.75, floor=2):
    """Actor-pool ``concurrency`` bounds sized to the CLUSTER, not a
    hard-coded cap: ``(1, max(floor, frac·cluster_cpus))``.  A fixed
    ``(1, 8)`` starves a 256-node cluster; a fixed lower bound of 1 keeps
    small test sessions (4 cpus) from over-reserving."""
    try:
        import ray
        cpus = int(ray.cluster_resources().get('CPU', 4))
    except Exception:
        cpus = 4
    return (1, max(floor, int(cpus * frac)))


def hash63_keys(ids):
    """63-bit md5 key per integer id — the ORACLE-SHARED hashing
    convention (= DuckDB ``md5_number_lower(v::VARCHAR) & (2^63 - 1)``:
    last 8 digest bytes little-endian, 63-bit mask).  The SINGLE home
    for the convention: the oracle parity of uniform/stratified
    sampling, the IVF training sample and the KMV sketch all hang on
    this exact byte rule, so it must not fork per module."""
    import hashlib
    return np.fromiter(
        (int.from_bytes(hashlib.md5(str(int(v)).encode()).digest()[8:16],
                        'little') & 0x7FFFFFFFFFFFFFFF for v in ids),
        dtype=np.int64, count=len(ids))


def hash63_strings(strs):
    """63-bit md5 key per STRING — the same byte rule as
    :func:`hash63_keys` (last 8 digest bytes little-endian, 63-bit mask
    = DuckDB ``md5_number_lower(s) & (2^63 - 1)``), for pre-built
    composite key strings."""
    import hashlib
    return np.fromiter(
        (int.from_bytes(hashlib.md5(s.encode('utf-8')).digest()[8:16],
                        'little') & 0x7FFFFFFFFFFFFFFF for s in strs),
        dtype=np.int64, count=len(strs))


def round_half_up(x, digits):
    """Vectorized half-up rounding; mirrors :func:`sql_round` exactly."""
    scale = 10.0 ** digits
    return np.floor(np.asarray(x, dtype=np.float64) * scale + 0.5) / scale


def sql_round(expr, digits):
    """DuckDB expression computing the same half-up rounding as
    :func:`round_half_up` (do NOT use DuckDB's ``round``)."""
    scale = 10 ** digits
    return 'floor((%s) * %d + 0.5) / %d' % (expr, scale, scale)


def sf_from_dir(sf_dir):
    """'/root/testdata/sf0.01' → '0.01' (used to key synthesized corpora)."""
    base = os.path.basename(os.path.normpath(sf_dir))
    return base[2:] if base.startswith('sf') else base


def table_path(sf_dir, name):
    return os.path.join(sf_dir, name + '.parquet')


_TARGET_READ_BLOCK_BYTES = 32 << 20


def read_table(sf_dir, name, columns=None, min_blocks=None):
    """Distributed read of a fact table with BYTE-SIZED blocks.

    Ray's default read parallelism targets ~2×cpus blocks regardless of
    input size, so a 10 MB table splits into 64 near-empty blocks — and
    every downstream sort/groupby exchange then pays per-BLOCK task
    overhead (~200 scheduled sort subtasks per exchange; measured 7.4 s →
    0.8 s on top_orders_revenue at sf0.1 by fixing this).  Sizing blocks
    by bytes (≈32 MB of file, ≈100–200 MB decoded) is the scale-correct
    rule: at 100 TB it yields ~3M blocks (≫ any cluster width, streaming
    executor backpressures), at test scale it yields a handful, and
    exchange task counts track DATA, not the host's cpu count.

    ``min_blocks``: floor for reads feeding a COMPUTE-heavy stage (e.g.
    minhash shingling), where fewer blocks than the actor pool would
    leave workers idle — pass the pool width; exchange-bound relational
    reads omit it."""
    path = table_path(sf_dir, name)
    try:
        blocks = max(1, os.path.getsize(path) // _TARGET_READ_BLOCK_BYTES)
        if min_blocks:
            blocks = max(blocks, min_blocks)
    except OSError:
        blocks = None
    import ray.data
    return ray.data.read_parquet(path, columns=columns,
                                 override_num_blocks=blocks)


def read_small_table(sf_dir, name, columns=None):
    """Driver-side read of a dimension table (region/nation/etc.) that is
    small by schema design — the broadcast side of a broadcast join."""
    import pyarrow.parquet as pq
    return pq.read_table(table_path(sf_dir, name), columns=columns)


class BroadcastLookup:
    """map_batches actor base: resolves a ``ray.put`` object ref ONCE per
    actor in ``__init__`` (not per batch).  At cluster scale the payload
    ships to each node's object store once and is shared zero-copy by all
    actors on that node.

    Subclasses set ``self.state = ...`` from the fetched value and
    implement ``__call__(batch) -> pa.Table``.
    """

    def __init__(self, state_ref):
        import ray
        pa.set_cpu_count(1)       # 1-CPU actor: don't spawn core-count pools
        pa.set_io_thread_count(1)
        self.state = ray.get(state_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:  # pragma: no cover
        raise NotImplementedError


def run_pairs(lens, upper=False):
    """Global index pairs for ALL within-run pairs of a run-length-encoded
    sorted array — fully vectorized (no per-run Python loop; the per-run
    meshgrid loop this replaces was the pairgen hot path at 150k+ runs).

    Given runs of sizes ``lens`` over a lexsorted array, returns
    ``(a_idx, b_idx)`` global element indices: every ordered pair of
    DISTINCT elements within each run (``upper=False``, l·(l−1) per
    run), or every unordered pair ``a_idx < b_idx`` (``upper=True``,
    l·(l−1)/2 per run).  Output size is Σ l² — the caller's documented
    skew contract (a giant run expands quadratically)."""
    lens = np.asarray(lens, dtype=np.int64)
    n = int(lens.sum())
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    per_elem = np.repeat(lens, lens)          # partner count per element
    total = int(per_elem.sum())
    if total == 0:
        z = np.empty(0, np.int64)
        return z, z
    a_idx = np.repeat(np.arange(n, dtype=np.int64), per_elem)
    csum = np.cumsum(per_elem)
    pos = np.arange(total, dtype=np.int64) \
        - np.repeat(csum - per_elem, per_elem)
    b_idx = np.repeat(np.repeat(starts, lens), per_elem) + pos
    keep = b_idx > a_idx if upper else a_idx != b_idx
    return a_idx[keep], b_idx[keep]
