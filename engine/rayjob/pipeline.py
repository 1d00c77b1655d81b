"""The flagship pipeline: transcripts → per-turn extraction → ordered,
resumable, partitioned output (north star / north rule).

Dataflow (all Ray Data, streaming executor, no driver-side row loops):

  read_parquet(columns=conv_id,turn_idx,text)      # prune at the read
    → map_batches(assign_bucket)                   # cheap crc32 bucketing
    → [resume filter: drop finished buckets]       # BEFORE the heavy stage
    → map_batches(ExtractTurns, actor pool)        # stateful, zero-copy
    → groupby(bucket).map_groups(write_bucket)     # THE ordering shuffle:
         sort by (conv_id, turn_idx) in-bucket, tmp+rename parquet,
         emit one lineage row per bucket

Shuffle accounting: exactly ONE all-to-all exchange (the bucket groupby),
keyed on a uniform crc32 hash — a single skewed conversation cannot skew a
partition beyond its own size, and ``num_buckets`` scales the shuffle
fan-out independently of input file layout.  At 100 TB: pick num_buckets so
each bucket ≈ a few hundred MB; everything upstream is embarrassingly
parallel per block.
"""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from .extract_stage import ExtractTurns, assign_bucket, make_done_filter
from . import checkpoint

__all__ = ['build_extract_dataset', 'run_extraction', 'default_concurrency']


def default_concurrency():
    """Actor-pool size: leave headroom so the read and shuffle stages are
    never starved by the (long-lived) extraction actors — an actor pool
    sized to ALL CPUs deadlocks the downstream AllToAll sort."""
    try:
        cpus = int(ray.cluster_resources().get('CPU', 4))
    except Exception:
        cpus = 4
    return max(1, cpus - 2)


def build_extract_dataset(input_path, batch_size=64, concurrency=None,
                          with_bucket=False, num_buckets=64):
    """Lazy Dataset of turns_out rows (no write, no ordering shuffle)."""
    if concurrency is None:
        concurrency = default_concurrency()
    ds = ray.data.read_parquet(input_path, columns=['conv_id', 'turn_idx', 'text'])
    if with_bucket:
        ds = ds.map_batches(assign_bucket(num_buckets), batch_format='pyarrow',
                            zero_copy_batch=True)
    ds = ds.map_batches(ExtractTurns, batch_format='pyarrow',
                        batch_size=batch_size, concurrency=concurrency,
                        zero_copy_batch=True)
    return ds


def _make_bucket_writer(out_dir):
    def write_bucket(group: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        bucket = group.column('bucket')[0].as_py()
        ordered = group.sort_by([('conv_id', 'ascending'), ('turn_idx', 'ascending')])
        ordered = ordered.drop_columns(['bucket'])
        fname = 'part-%05d.parquet' % bucket
        tmp = os.path.join(out_dir, '_tmp-%s' % fname)
        final = os.path.join(out_dir, fname)
        pq.write_table(ordered, tmp)
        os.replace(tmp, final)  # atomic publish
        import pyarrow.compute as pc
        failures = pc.sum(pc.cast(pc.invert(ordered.column('decode_ok')),
                                  pa.int64())).as_py() or 0
        spans = pc.sum(ordered.column('n_spans')).as_py() or 0
        return pa.table({
            'bucket': pa.array([bucket], pa.int32()),
            'rows': pa.array([ordered.num_rows], pa.int64()),
            'decode_failures': pa.array([failures], pa.int64()),
            'span_count': pa.array([spans], pa.int64()),
            'wall_s': pa.array([time.perf_counter() - t0], pa.float64()),
            'file': pa.array([fname], pa.string()),
        })
    return write_bucket


def run_extraction(input_path, out_dir, num_buckets=64, batch_size=64,
                   concurrency=None, resume=True):
    """Run the full pipeline; returns a summary dict (job metrics)."""
    os.makedirs(out_dir, exist_ok=True)
    if not resume:
        checkpoint.reset_output(out_dir)
    done = checkpoint.load_done_buckets(out_dir) if resume else {}

    t0 = time.perf_counter()
    if concurrency is None:
        concurrency = default_concurrency()

    ds = ray.data.read_parquet(input_path, columns=['conv_id', 'turn_idx', 'text'])
    ds = ds.map_batches(assign_bucket(num_buckets), batch_format='pyarrow',
                        zero_copy_batch=True)
    if done:
        ds = ds.map_batches(make_done_filter(done.keys()), batch_format='pyarrow',
                            zero_copy_batch=True)
    ds = ds.map_batches(ExtractTurns, batch_format='pyarrow',
                        batch_size=batch_size, concurrency=concurrency,
                        zero_copy_batch=True)
    manifest_ds = ds.groupby('bucket').map_groups(
        _make_bucket_writer(out_dir), batch_format='pyarrow')
    new_rows = manifest_ds.take_all()  # tiny: one row per bucket

    checkpoint.append_manifest_rows(out_dir, new_rows)
    wall = time.perf_counter() - t0

    all_rows = list(done.values()) + new_rows
    total = sum(r['rows'] for r in all_rows)
    fresh = sum(r['rows'] for r in new_rows)
    return {
        'rows_out': total,
        'rows_this_run': fresh,
        'decode_failures': sum(r['decode_failures'] for r in all_rows),
        'span_count': sum(r['span_count'] for r in all_rows),
        'buckets': len(all_rows),
        'buckets_this_run': len(new_rows),
        'wall_s': wall,
        'turns_per_sec': (fresh / wall) if wall > 0 else 0.0,
        'out_dir': out_dir,
    }
