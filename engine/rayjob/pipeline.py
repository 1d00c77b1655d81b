"""The flagship pipeline: transcripts → per-turn extraction → ordered,
resumable, partitioned output (north star / north rule).

Dataflow (all Ray Data, streaming executor, no driver-side row loops):

  Stage A (map-only, streaming):
    read_parquet(columns=conv_id,turn_idx,text)    # prune at the read
      → map_batches(assign_bucket)                 # cheap crc32 bucketing
      → [resume filter: drop finished buckets]     # BEFORE the heavy stage
      → map_batches(ExtractAndSpill, actor pool)   # stateful, zero-copy;
           each block is extracted, sorted by bucket, and SPILLED to
           shared storage with per-bucket row groups; only tiny stat
           rows flow downstream
  Stage B (map-only, one task per bucket):
    from_items(buckets) → map_batches(compact)     # parquet predicate
           read of one bucket across ITS SHARD's spill files (spill dir
           is sharded by contiguous bucket range; row-group pruning via
           bucket min/max stats within the shard) → in-bucket
           (conv_id, turn_idx) sort → atomic tmp+rename part file →
           one lineage row

Shuffle accounting: the all-to-all exchange is EXTERNAL — through the
shared filesystem, like Spark's shuffle files — so no Ray AllToAll
barrier operator sits between extraction and write, the object store
never holds the shuffled payload, and both stages are embarrassingly
parallel (Stage A per block, Stage B per bucket).  Bucket keys are
uniform crc32 hashes: a single skewed conversation cannot skew a
partition beyond its own size.  At 100 TB: pick num_buckets so each
bucket ≈ a few hundred MB and Stage B parallelism ≥ cluster cores;
spill locality is whatever the cluster's shared store gives (the same
trade Spark/MapReduce external shuffles make).

Skew (the north rule's long-conversation concern): the COMPUTE stage is
per-row — extraction never groups by conv_id — so a million-turn
conversation parallelizes exactly like a million one-turn conversations
and no salting is needed where it matters most.  The only key-grouped
stage is per-bucket compaction, where a conversation's rows all land in
one crc32 bucket: skew there is capped at the size of the single largest
conversation.  If a bucket exceeds ``GRAFT_COMPACT_MAX_ROWS`` (a single
conversation bigger than a healthy bucket, or many medium ones),
compaction switches to the IMPLEMENTED escape hatch ``_compact_chunked``:
a narrow key-column probe, then sorted (conv_id, turn_idx) key-range
windows streamed through one ParquetWriter — byte-identical output with
per-task memory O(window), equivalent to splitting the spill key by
``(conv_id, turn_idx // window)`` without touching the spill format.
"""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from .extract_stage import (ExtractTurns, ExtractAndSpill, ExtractSpans,
                            extract_distinct_rows, assign_bucket,
                            make_done_filter, _payload_key)
from . import checkpoint

__all__ = ['build_extract_dataset', 'build_spans_dataset', 'run_extraction',
           'default_concurrency', 'distinct_payload_map']


def default_concurrency():
    """Actor-pool size: 7/8 of the cluster's CPUs, proportionally at every
    cluster size (a fixed ``cpus - k`` skews small-vs-large scaling runs),
    leaving headroom for the read tasks feeding the pool."""
    try:
        cpus = int(ray.cluster_resources().get('CPU', 4))
    except Exception:
        cpus = 4
    return max(1, cpus * 7 // 8)


def distinct_payload_map(input_path, batch_size=64, concurrency=None,
                         num_buckets=64, cap=None):
    """Distinct-payload pre-pass (the opt-in boilerplate-dedup mode,
    GRAFT_PAYLOAD_DEDUP=1): extract each DISTINCT payload exactly once
    corpus-wide and return ``ray.put({md5 → result tuple})`` for the
    Stage A actors to consult before their per-actor LRUs.

    Shape: per-block Arrow-side distinct (md5 the payloads, np.unique)
    → ONE md5-bucketed groupby whose exchange carries one row per
    distinct payload per block (never the raw corpus) → per-bucket
    distinct fold → extraction actor pool over globally-unique
    payloads.  The per-actor LRU catches repeats within an actor's
    stream; this pass catches repeats ACROSS actors/blocks, which the
    LRU structurally cannot (a payload duplicated k times costs up to
    min(k, pool_width) extractions without it).

    100 TB contract: broadcast-join mode — the RESULT map must fit a
    worker heap, i.e. the corpus is boilerplate-heavy (distinct ≪
    total).  ``cap`` (GRAFT_DISTINCT_CAP, default 500k entries) guards
    that assumption LOUDLY: exceeding it raises with the remedy (raise
    the cap, or run the default per-actor-LRU mode) rather than
    silently OOMing; the map ships through the object store once
    (ray.put) and is fetched once per actor, never per batch."""
    if concurrency is None:
        concurrency = default_concurrency()
    if cap is None:
        cap = int(os.environ.get('GRAFT_DISTINCT_CAP', '500000'))
    nb = num_buckets

    def _first_occurrence(keys):
        # exact bytes-keyed distinct (numpy 'S' dtypes strip trailing
        # nulls, which would alias digests); the md5 loop upstream
        # dominates this dict pass anyway
        seen = {}
        for i, kk in enumerate(keys):
            if kk not in seen:
                seen[kk] = i
        return sorted(seen.values())

    def block_distinct(batch: pa.Table) -> pa.Table:
        texts = batch.column('text').to_pylist()
        keys = [_payload_key(t) for t in texts]
        idx = _first_occurrence(keys)
        kept = [keys[i] for i in idx]
        pb = [int.from_bytes(kk[:8], 'little') % nb for kk in kept]
        return pa.table({
            'pkey': pa.array(kept, pa.binary()),
            'text': pa.array([texts[i] for i in idx], pa.string()),
            'pbucket': pa.array(pb, pa.int64()),
        })

    def bucket_distinct_extract(group: pa.Table) -> pa.Table:
        # distinct fold + extraction FUSED into one plain task per
        # bucket: workers are already warm from the distinct stage and
        # font state is a process-level singleton (~90 ms once per
        # worker), so a tiny distinct set costs no actor-pool spawn
        # while a distinct-heavy corpus still runs one task per bucket
        # across the cluster (parallelism = num_buckets ≥ cores).
        keys = group.column('pkey').to_pylist()
        take = pa.array(_first_occurrence(keys), pa.int64())
        return extract_distinct_rows(pa.table({
            'pkey': group.column('pkey').take(take),
            'text': group.column('text').take(take),
        }))

    ds = ray.data.read_parquet(input_path, columns=['text'])
    results = ds.map_batches(block_distinct, batch_format='pyarrow',
                             zero_copy_batch=True) \
                .groupby('pbucket').map_groups(bucket_distinct_extract,
                                               batch_format='pyarrow')
    rows = results.take(cap + 1)
    if len(rows) > cap:
        raise RuntimeError(
            'distinct_payload_map: > %d distinct payloads — the corpus is '
            'not boilerplate-heavy enough for broadcast-join dedup mode. '
            'Raise GRAFT_DISTINCT_CAP if the map still fits worker heap, '
            'or unset GRAFT_PAYLOAD_DEDUP to run the per-actor-LRU path.'
            % cap)
    table = {r['pkey']: (r['text'], r['n_spans'], r['n_pages'],
                         r['decode_ok'], r['error']) for r in rows}
    return ray.put(table), len(table)


def _resolve_payload_dedup(payload_dedup):
    if payload_dedup is None:
        return os.environ.get('GRAFT_PAYLOAD_DEDUP', '0') == '1'
    return bool(payload_dedup)


def build_extract_dataset(input_path, batch_size=64, concurrency=None,
                          with_bucket=False, num_buckets=64,
                          payload_dedup=None):
    """Lazy Dataset of turns_out rows (no write, no ordering shuffle)."""
    if concurrency is None:
        concurrency = default_concurrency()
    ctor = {}
    if _resolve_payload_dedup(payload_dedup):
        ref, _ = distinct_payload_map(input_path, batch_size=batch_size,
                                      concurrency=concurrency)
        ctor['fn_constructor_kwargs'] = {'results_ref': ref}
    ds = ray.data.read_parquet(input_path, columns=['conv_id', 'turn_idx', 'text'])
    if with_bucket:
        ds = ds.map_batches(assign_bucket(num_buckets), batch_format='pyarrow',
                            zero_copy_batch=True)
    ds = ds.map_batches(ExtractTurns, batch_format='pyarrow',
                        batch_size=batch_size, concurrency=concurrency,
                        zero_copy_batch=True, **ctor)
    return ds


def build_spans_dataset(input_path, batch_size=64, concurrency=None):
    """Lazy Dataset of positioned spans, one row per drawn glyph."""
    if concurrency is None:
        concurrency = default_concurrency()
    ds = ray.data.read_parquet(input_path, columns=['conv_id', 'turn_idx', 'text'])
    return ds.map_batches(ExtractSpans, batch_format='pyarrow',
                          batch_size=batch_size, concurrency=concurrency,
                          zero_copy_batch=True)


def _compact_chunked(dset, base_filter, keys, tmp_path, max_rows):
    """External merge compaction for a bucket whose rows exceed
    ``max_rows`` (single giant conversation, or many medium ones): sort
    the narrow key table, cut it into ~max_rows windows ALONG the sorted
    order, and stream each window — a half-open (conv_id, turn_idx)
    key-range predicate read ([window start key, next window's start
    key), last window unbounded above), sorted in memory — through one
    ParquetWriter.  Window boundaries may split a conversation mid-run
    and always fall on a key change, so every row (including duplicate
    keys) lands in exactly one window and the concatenation of sorted
    windows along sorted boundaries IS the fully sorted bucket —
    byte-identical output to the in-memory path, with per-task memory
    O(max_rows + largest duplicate-key run) regardless of conversation
    size.  (This implements the giant-conversation escape hatch: the
    spill format is untouched, the split key is effectively
    (conv_id, turn_idx // window).)
    """
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    skeys = keys.sort_by([('conv_id', 'ascending'), ('turn_idx', 'ascending')])
    convs = skeys.column('conv_id')
    turns = skeys.column('turn_idx')
    n = skeys.num_rows
    rows = failures = spans = 0
    writer = None
    try:
        start = 0
        while start < n:
            lo_c, lo_t = convs[start].as_py(), turns[start].as_py()
            end = min(start + max_rows, n)
            # HALF-OPEN windows [key[start], key[end]): a boundary must
            # fall on a key CHANGE so duplicate (conv_id, turn_idx) keys
            # (unique for turns today, but not for e.g. a spans dataset)
            # land in exactly one window — advance past any run of the
            # boundary key (memory stays O(max_rows + largest key run)).
            while end < n and convs[end] == convs[end - 1] \
                    and turns[end] == turns[end - 1]:
                end += 1
            f_lo = (pads.field('conv_id') > lo_c) | (
                (pads.field('conv_id') == lo_c) & (pads.field('turn_idx') >= lo_t))
            if end < n:
                hi_c, hi_t = convs[end].as_py(), turns[end].as_py()
                f_hi = (pads.field('conv_id') < hi_c) | (
                    (pads.field('conv_id') == hi_c) &
                    (pads.field('turn_idx') < hi_t))
                window = base_filter & f_lo & f_hi
            else:
                window = base_filter & f_lo
            start = end
            chunk = dset.to_table(filter=window)
            ordered = chunk.sort_by([('conv_id', 'ascending'),
                                     ('turn_idx', 'ascending')])
            ordered = ordered.drop_columns(['bucket'])
            if writer is None:
                writer = pq.ParquetWriter(tmp_path, ordered.schema)
            writer.write_table(ordered)
            rows += ordered.num_rows
            failures += pc.sum(pc.cast(pc.invert(ordered.column('decode_ok')),
                                       pa.int64())).as_py() or 0
            spans += pc.sum(ordered.column('n_spans')).as_py() or 0
    finally:
        if writer is not None:
            writer.close()
    return rows, failures, spans


def _make_bucket_compactor(spill_dir, out_dir, num_buckets=None, num_shards=1):
    """Stage B UDF: compact one bucket from the spill files — per-shard
    file listing, predicate read with row-group pruning, in-bucket sort,
    atomic publish.  ``num_buckets=None`` keeps the legacy unsharded
    layout (all spill files at the dir root)."""
    from .extract_stage import shard_of

    def compact(batch: pa.Table) -> pa.Table:
        import glob
        import pyarrow.compute as pc
        import pyarrow.dataset as pads
        # 1-CPU task: pyarrow defaults BOTH pools to the machine core count
        # PER PROCESS — 32 concurrent compact tasks × 32 threads thrash the
        # box and make Stage B scale INVERSELY with cluster width (measured
        # 4.8s at 8 cpus vs 10.5s at 32 on the same input).
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
        out = {'bucket': [], 'rows': [], 'decode_failures': [],
               'span_count': [], 'wall_s': [], 'file': []}
        # Enumerate PUBLISHED spill files only: an actor that died mid
        # pq.write_table leaves a 'spill-*.parquet.tmp' that directory
        # discovery would pick up and fail on (ArrowInvalid for every
        # compact task).  The retried task re-publishes under the same
        # deterministic name, so .tmp leftovers are always superseded.
        # Only the BUCKET'S OWN SHARD is listed — the whole point of the
        # sharded layout: footer scans are O(files/num_shards) per task.
        dsets = {}

        def shard_dset(bucket):
            if num_buckets is None:
                sdir = spill_dir
            else:
                s = shard_of(bucket, num_buckets, num_shards)
                sdir = os.path.join(spill_dir, 'shard-%03d' % s)
            if sdir not in dsets:
                files = sorted(glob.glob(os.path.join(sdir, 'spill-*.parquet')))
                if files:
                    d = pads.dataset(files, format='parquet')
                    # metadata-only shard row count (footer num_rows, no
                    # data read): gates the skew probe so ordinary shards
                    # keep the single-read fast path
                    dsets[sdir] = (d, d.count_rows())
                else:
                    dsets[sdir] = (None, 0)
            return dsets[sdir]

        max_rows = int(os.environ.get('GRAFT_COMPACT_MAX_ROWS', '2000000'))
        for bucket in batch.column('bucket').to_pylist():
            t0 = time.perf_counter()
            dset, shard_rows = shard_dset(bucket)
            if dset is None:
                out['bucket'].append(bucket)
                out['rows'].append(0)
                out['decode_failures'].append(0)
                out['span_count'].append(0)
                out['wall_s'].append(time.perf_counter() - t0)
                out['file'].append('')
                continue
            # Skew escape hatch (the north rule's giant-conversation case).
            # Whole SHARD under max_rows (metadata-only check, the common
            # case): single-read in-memory sort, as always.  Otherwise
            # probe the bucket's KEY columns (two narrow columns — cheap
            # even when the payload column is huge) and, above max_rows,
            # _compact_chunked streams sorted (conv_id, turn_idx) windows
            # through one ParquetWriter: per-task memory O(max_rows), not
            # O(largest conversation).
            flt = pads.field('bucket') == bucket
            chunked = False
            if shard_rows > max_rows:
                keys = dset.to_table(filter=flt,
                                     columns=['conv_id', 'turn_idx'])
                chunked = keys.num_rows > max_rows
            fname = 'part-%05d.parquet' % bucket
            tmp = os.path.join(out_dir, '_tmp-%s' % fname)
            if chunked:
                rows, failures, spans = _compact_chunked(
                    dset, flt, keys, tmp, max_rows)
                os.replace(tmp, os.path.join(out_dir, fname))
            else:
                tbl = dset.to_table(filter=flt)
                ordered = tbl.sort_by([('conv_id', 'ascending'),
                                       ('turn_idx', 'ascending')])
                ordered = ordered.drop_columns(['bucket'])
                rows = ordered.num_rows
                if rows:
                    pq.write_table(ordered, tmp)
                    os.replace(tmp, os.path.join(out_dir, fname))
                else:
                    fname = ''
                failures = pc.sum(pc.cast(
                    pc.invert(ordered.column('decode_ok')),
                    pa.int64())).as_py() or 0
                spans = pc.sum(ordered.column('n_spans')).as_py() or 0
            out['bucket'].append(bucket)
            out['rows'].append(rows)
            out['decode_failures'].append(failures)
            out['span_count'].append(spans)
            out['wall_s'].append(time.perf_counter() - t0)
            out['file'].append(fname)
        return pa.table({
            'bucket': pa.array(out['bucket'], pa.int32()),
            'rows': pa.array(out['rows'], pa.int64()),
            'decode_failures': pa.array(out['decode_failures'], pa.int64()),
            'span_count': pa.array(out['span_count'], pa.int64()),
            'wall_s': pa.array(out['wall_s'], pa.float64()),
            'file': pa.array(out['file'], pa.string()),
        })
    return compact


def run_extraction(input_path, out_dir, num_buckets=64, batch_size=None,
                   concurrency=None, resume=True, payload_lru=None,
                   num_shards=None, payload_dedup=None):
    """Run the full pipeline; returns a summary dict (job metrics).

    ``payload_dedup`` (GRAFT_PAYLOAD_DEDUP=1): run the distinct-payload
    pre-pass and broadcast its result map to the Stage A actors —
    byte-identical output (extraction is a pure function of the
    payload; tested in test_pipeline.py), each distinct payload
    extracted once corpus-wide instead of once per (actor, LRU window)."""
    import glob
    import shutil
    import uuid

    os.makedirs(out_dir, exist_ok=True)
    if not resume:
        checkpoint.reset_output(out_dir)
    # stale spill dirs from crashed runs hold no lineage — drop them
    for stale in glob.glob(os.path.join(out_dir, '_spill-*')):
        shutil.rmtree(stale, ignore_errors=True)
    done = checkpoint.load_done_buckets(out_dir) if resume else {}

    t0 = time.perf_counter()
    if concurrency is None:
        concurrency = default_concurrency()
    results_ref, n_distinct = None, 0
    if _resolve_payload_dedup(payload_dedup):
        results_ref, n_distinct = distinct_payload_map(
            input_path, batch_size=batch_size or 64, concurrency=concurrency)
        # the consumed pre-pass Dataset's executor tears down lazily via
        # cyclic GC; left to chance, Stage A/B tasks contend with it
        # (same effect measured between bench queries: 18.2s vs 2.4s)
        import gc
        gc.collect()
    dedup_s = time.perf_counter() - t0
    spill_dir = os.path.join(out_dir, '_spill-%s' % uuid.uuid4().hex)
    os.makedirs(spill_dir)

    # Stage A: map-only extract + external-shuffle spill
    ds = ray.data.read_parquet(input_path, columns=['conv_id', 'turn_idx', 'text'])
    ds = ds.map_batches(assign_bucket(num_buckets), batch_format='pyarrow',
                        zero_copy_batch=True)
    if done:
        ds = ds.map_batches(make_done_filter(done.keys()), batch_format='pyarrow',
                            zero_copy_batch=True)
    # Stage-A-only worker knob (DEFAULT ON): RAY_num_server_call_thread=1
    # trims each EXTRACT actor's gRPC server-call thread pool without
    # touching read-task / driver workers.  Globally this knob measurably
    # hurt the read/dispatch path (r1: -8% e2e); scoped via runtime_env to
    # the compute actors it removes idle-thread context-switch pressure:
    # measured +27% at 8 cpus (7.7k→9.77k turns/s, reproducible to 0.2%,
    # = the single-process kernel rate per actor) and within-noise-or-
    # better at 32 cpus.  GRAFT_STAGEA_SCT=0 disables for A/B.
    extra = {}
    sct = os.environ.get('GRAFT_STAGEA_SCT', '1')
    if sct and sct != '0':
        extra['runtime_env'] = {
            'env_vars': {'RAY_num_server_call_thread': sct}}
    # resolve the LRU size DRIVER-SIDE and ship it in the ctor args: env
    # vars set after ray.init never reach the (raylet-spawned) actors
    if payload_lru is None:
        payload_lru = int(os.environ.get('GRAFT_PAYLOAD_LRU', '4096'))
    if num_shards is None:
        num_shards = int(os.environ.get('GRAFT_SPILL_SHARDS', '4'))
    num_shards = max(1, min(num_shards, num_buckets))
    stats = ds.map_batches(ExtractAndSpill,
                           fn_constructor_args=(spill_dir, num_buckets,
                                                payload_lru, num_shards,
                                                results_ref),
                           batch_format='pyarrow', batch_size=batch_size,
                           concurrency=concurrency, zero_copy_batch=True,
                           **extra)
    extracted = sum(r['rows'] for r in stats.take_all())   # tiny stat rows
    stage_a_s = time.perf_counter() - t0 - dedup_s

    # Stage B: one compaction task per (not-yet-done) bucket
    new_rows = []
    if extracted:
        todo = [b for b in range(num_buckets) if b not in done]
        items = ray.data.from_items([{'bucket': b} for b in todo],
                                    override_num_blocks=len(todo))
        manifest_ds = items.map_batches(
            _make_bucket_compactor(spill_dir, out_dir, num_buckets, num_shards),
            batch_format='pyarrow', batch_size=None)
        new_rows = manifest_ds.take_all()      # one row per bucket

    stage_b_s = time.perf_counter() - t0 - dedup_s - stage_a_s
    shutil.rmtree(spill_dir, ignore_errors=True)
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
        'stage_a_s': stage_a_s,
        'stage_b_s': stage_b_s,
        'dedup_s': dedup_s,          # distinct-payload pre-pass (0 if off)
        'n_distinct_payloads': n_distinct,
        'turns_per_sec': (fresh / wall) if wall > 0 else 0.0,
        'out_dir': out_dir,
    }
