"""Reusable EXTERNAL (map-only) shuffle for bucketed group-map stages.

The flagship replaced Ray's AllToAll with a filesystem spill exchange
(engine/rayjob/pipeline.py Stage A/B — measured 2-5× on the extraction
shuffle): stage 1 is a plain map that sorts each block by bucket and
appends per-shard parquet spill files; stage 2 is one task per non-empty
bucket that predicate-reads its rows (row-group pruning via parquet
min/max stats on the bucket column) and applies the group function.  No
AllToAll barrier operator, the object store never holds the shuffled
payload, and both stages are embarrassingly parallel — the same trade
Spark/MapReduce external shuffles make.

:func:`bucketed_group_map` promotes that pattern to an ops-layer
primitive so any ``groupby(bucket).map_groups(fn)`` exchange can ride it
behind a size threshold:

- mode='auto' (default): spill when ``approx_bytes`` (caller's estimate,
  typically the input parquet file size) ≥ GRAFT_OPS_SPILL_BYTES
  (default 1 GiB).  GRAFT_OPS_SPILL=1/0 force-overrides for A/B.

MEASURED HONESTLY (BASELINE.md round 4): on this 32-cpu / 37 GiB-object-
store host, exchanges up to ~200 MB (minhash band + attach at a 48×
corpus) run at PARITY or faster on Ray's in-memory groupby — the spill
barrier forfeits cross-stage overlap, and the object store is nowhere
near pressure.  The spill path's demonstrated win (flagship, 2-5×) comes
when the shuffled payload is large relative to the object store or the
exchange feeds a file-writing stage anyway.  Hence the high default
threshold: below it this function IS groupby; above it — where Ray would
otherwise push the exchange into its own unmanaged object spilling — the
controlled external shuffle takes over.
- SEMANTICS parity with groupby().map_groups(): ``fn`` is called once
  per non-empty bucket with all of the bucket's rows as one Arrow table
  (bucket column included); row order within the bucket is NOT
  guaranteed by either path — group functions must be (and in this
  engine are) order-insensitive.
- Retry idempotence: spill file names are (task_id, within-task batch
  seq) — a retried Ray task re-derives the same names and atomically
  overwrites its own prior files (tmp + os.replace), the flagship's
  contract.  ``.tmp`` leftovers from mid-write deaths are never listed.
- STAGE 1 IS EAGER: the filesystem is the barrier, so calling this
  executes the upstream pipeline (the flagship works the same way); the
  returned Dataset lazily runs only stage 2.

100 TB shape: stage 1 exchange volume = the data, written once and read
once through the shared store (vs twice through the object store + a
barrier for AllToAll); skew is capped per bucket exactly as in the
groupby path; shard count keeps per-bucket footer scans at
O(files/num_shards).
"""

import atexit
import os
import shutil
import time
import uuid

import numpy as np
import pyarrow as pa

import ray
import ray.data

__all__ = ['bucketed_group_map']

_SPILL_ROOT = os.environ.get('GRAFT_OPS_SPILL_ROOT', '/tmp/graft_ops_spill')
_STALE_S = 4 * 3600
_MY_DIRS = []


def _cleanup_mine():
    for d in _MY_DIRS:
        shutil.rmtree(d, ignore_errors=True)


atexit.register(_cleanup_mine)


def _sweep_stale(root):
    """Drop spill dirs from crashed runs (no lineage survives them)."""
    try:
        now = time.time()
        for name in os.listdir(root):
            p = os.path.join(root, name)
            if now - os.path.getmtime(p) > _STALE_S:
                shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass


def _use_spill(mode, approx_bytes):
    force = os.environ.get('GRAFT_OPS_SPILL')
    if force == '1':
        return True
    if force == '0':
        return False
    if mode == 'spill':
        return True
    if mode == 'groupby':
        return False
    threshold = int(os.environ.get('GRAFT_OPS_SPILL_BYTES',
                                   str(1 << 30)))
    return bool(approx_bytes) and approx_bytes >= threshold


def _make_spill_writer(spill_dir, bucket_col, num_buckets, num_shards):
    from engine.rayjob.extract_stage import shard_of

    state = {'tid': None, 'seq': 0}   # per-task (deserialized per task)

    def write(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq
        tid = ray.get_runtime_context().get_task_id() or uuid.uuid4().hex
        if state['tid'] != tid:
            state['tid'], state['seq'] = tid, 0
        seq = state['seq']
        state['seq'] += 1
        ordered = batch.sort_by([(bucket_col, 'ascending')])
        bkt = ordered.column(bucket_col).to_numpy(zero_copy_only=False) \
                     .astype(np.int64)
        buckets_per_shard = max(1, num_buckets // num_shards)
        shards = shard_of(bkt, num_buckets, num_shards)
        present, starts = np.unique(shards, return_index=True)
        bounds = np.append(starts, len(shards))
        for i, s in enumerate(present):
            part = ordered.slice(bounds[i], bounds[i + 1] - bounds[i])
            rg = max(32, part.num_rows // buckets_per_shard)
            sdir = os.path.join(spill_dir, 'shard-%03d' % s)
            os.makedirs(sdir, exist_ok=True)
            fname = os.path.join(sdir, 'spill-%s-%04d.parquet' % (tid, seq))
            tmp = fname + '.tmp'
            pq.write_table(part, tmp, row_group_size=rg)
            os.replace(tmp, fname)
        # per-(block, bucket) row counts: lets the driver enumerate only
        # NON-EMPTY buckets for stage 2 (groupby parity: absent groups
        # never call fn) at the cost of ≤ num_buckets tiny rows per block
        ub, cnt = np.unique(bkt, return_counts=True)
        return pa.table({'bucket': pa.array(ub, pa.int64()),
                         'rows': pa.array(cnt, pa.int64())})

    return write


def _make_bucket_runner(spill_dir, bucket_col, num_buckets, num_shards, fn):
    from engine.rayjob.extract_stage import shard_of

    def run(batch: pa.Table) -> pa.Table:
        import glob
        import pyarrow.compute as pc
        import pyarrow.dataset as pads
        # 1-CPU task: pin Arrow pools (cf. pipeline._make_bucket_compactor
        # — unpinned, Stage-2 width × core-count threads thrash the node)
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
        outs = []
        dsets = {}
        for b in batch.column('bucket').to_pylist():
            s = shard_of(b, num_buckets, num_shards)
            sdir = os.path.join(spill_dir, 'shard-%03d' % s)
            if sdir not in dsets:
                files = sorted(glob.glob(os.path.join(sdir,
                                                      'spill-*.parquet')))
                dsets[sdir] = pads.dataset(files, format='parquet') \
                    if files else None
            d = dsets[sdir]
            if d is None:
                continue
            rows = d.to_table(filter=pc.field(bucket_col) == b)
            if rows.num_rows:
                outs.append(fn(rows))
        if not outs:
            return None   # filtered out by the caller wrapper
        return pa.concat_tables(outs) if len(outs) > 1 else outs[0]

    return run


def bucketed_group_map(ds, fn, num_buckets, bucket_col='bucket',
                       approx_bytes=None, mode='auto', num_shards=None):
    """``ds.groupby(bucket_col).map_groups(fn)`` with an automatic
    external-spill fast path for large exchanges (module docstring)."""
    if not _use_spill(mode, approx_bytes):
        return ds.groupby(bucket_col).map_groups(fn, batch_format='pyarrow')

    if num_shards is None:
        num_shards = int(os.environ.get('GRAFT_SPILL_SHARDS', '4'))
    num_shards = max(1, min(num_shards, num_buckets))
    os.makedirs(_SPILL_ROOT, exist_ok=True)
    _sweep_stale(_SPILL_ROOT)
    spill_dir = os.path.join(_SPILL_ROOT, uuid.uuid4().hex)
    os.makedirs(spill_dir)
    _MY_DIRS.append(spill_dir)

    writer = _make_spill_writer(spill_dir, bucket_col, num_buckets,
                                num_shards)
    stats = ds.map_batches(writer, batch_format='pyarrow',
                           zero_copy_batch=True)
    per_bucket = {}
    for r in stats.take_all():            # tiny (block × bucket) stat rows
        per_bucket[r['bucket']] = per_bucket.get(r['bucket'], 0) + r['rows']
    todo = sorted(b for b, n in per_bucket.items() if n)
    if not todo:
        shutil.rmtree(spill_dir, ignore_errors=True)
        return ray.data.from_items([])
    items = ray.data.from_items([{'bucket': b} for b in todo],
                                override_num_blocks=len(todo))
    runner = _make_bucket_runner(spill_dir, bucket_col, num_buckets,
                                 num_shards, fn)
    # every listed bucket has rows (stage-1 stats), so runner never
    # returns None here; _require_table guards the invariant loudly
    return items.map_batches(_require_table(runner), batch_format='pyarrow',
                             batch_size=None)


def _require_table(runner):
    def run(batch: pa.Table) -> pa.Table:
        out = runner(batch)
        if out is None:
            raise RuntimeError(
                'spill exchange: bucket listed as non-empty had no spill '
                'rows — spill dir was deleted mid-run or stats are stale')
        return out
    return run
