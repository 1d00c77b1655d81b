"""Pipeline-level tests (FIXTURES.md §4): per-turn equality vs the direct
kernel, stable ordering after the shuffle, and resume-from-manifest
equivalence."""

import json
import os
import glob
import shutil

import pyarrow.parquet as pq
import pytest

from engine.rayjob.transcripts import generate_transcripts
from engine.rayjob import checkpoint


@pytest.fixture(scope='module')
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp('transcripts'))
    n, files = generate_transcripts(d, n_convs=40, seed=7, rows_per_file=100)
    assert files > 1  # multiple blocks even at small scale
    return d, n


@pytest.fixture(scope='module')
def extracted(ray_session, corpus, tmp_path_factory):
    from engine.rayjob.pipeline import run_extraction
    d, n = corpus
    out = str(tmp_path_factory.mktemp('out'))
    summary = run_extraction(d, out, num_buckets=4, batch_size=32,
                             concurrency=2, resume=False)
    return d, n, out, summary


def _read_all(out_dir):
    parts = sorted(glob.glob(os.path.join(out_dir, 'part-*.parquet')))
    return parts, [pq.read_table(p) for p in parts]


def test_row_counts_and_metrics(extracted):
    d, n, out, summary = extracted
    assert summary['rows_out'] == n
    parts, tables = _read_all(out)
    assert sum(t.num_rows for t in tables) == n
    assert summary['decode_failures'] >= 1  # corpus embeds ~2% corrupt rows
    assert summary['span_count'] > 0


def test_output_sorted_within_bucket(extracted):
    _, _, out, _ = extracted
    parts, tables = _read_all(out)
    for t in tables:
        keys = list(zip(t.column('conv_id').to_pylist(),
                        t.column('turn_idx').to_pylist()))
        assert keys == sorted(keys)


def test_per_turn_text_matches_direct_kernel(extracted, shared_fonts):
    from engine.pdfcore.extract import extract_turn
    d, n, out, _ = extracted
    # Build input lookup
    payload = {}
    for p in glob.glob(os.path.join(d, '*.parquet')):
        t = pq.read_table(p)
        for cid, ti, tx in zip(t.column('conv_id').to_pylist(),
                               t.column('turn_idx').to_pylist(),
                               t.column('text').to_pylist()):
            payload[(cid, ti)] = tx
    _, tables = _read_all(out)
    checked = 0
    for t in tables:
        for cid, ti, tx, ok in zip(t.column('conv_id').to_pylist(),
                                   t.column('turn_idx').to_pylist(),
                                   t.column('text').to_pylist(),
                                   t.column('decode_ok').to_pylist()):
            r = extract_turn(payload[(cid, ti)], shared_fonts)
            assert tx == r['text']
            assert ok == r['decode_ok']
            checked += 1
    assert checked == n


def test_resume_skips_done_and_rebuilds_missing(ray_session, extracted):
    from engine.rayjob.pipeline import run_extraction
    d, n, out, _ = extracted
    parts, tables = _read_all(out)
    original = {os.path.basename(p): pq.read_table(p) for p in parts}

    # Remove one bucket's file and its manifest row
    victim = os.path.basename(parts[0])
    victim_bucket = int(victim.split('-')[1].split('.')[0])
    os.unlink(parts[0])
    mpath = checkpoint.manifest_path(out)
    rows = [json.loads(l) for l in open(mpath) if l.strip()]
    with open(mpath, 'w') as f:
        for r in rows:
            if r['bucket'] != victim_bucket:
                f.write(json.dumps(r) + '\n')

    summary = run_extraction(d, out, num_buckets=4, batch_size=32,
                             concurrency=2, resume=True)
    assert summary['buckets_this_run'] == 1
    assert summary['rows_out'] == n

    # Rebuilt output identical to the single-run output
    parts2, _ = _read_all(out)
    assert sorted(os.path.basename(p) for p in parts2) == sorted(original)
    rebuilt = pq.read_table(os.path.join(out, victim))
    assert rebuilt.equals(original[victim])


def test_stale_spill_cleaned_and_ignored(ray_session, corpus, tmp_path_factory):
    """A crashed run's _spill-* leftovers must be deleted on the next run
    and never pollute compaction output."""
    from engine.rayjob.pipeline import run_extraction
    d, n = corpus
    out = str(tmp_path_factory.mktemp('out_stale'))
    os.makedirs(out, exist_ok=True)
    stale = os.path.join(out, '_spill-deadbeef')
    os.makedirs(stale)
    # poison: a plausible-looking spill file that would corrupt bucket 0
    import pyarrow as pa
    pq.write_table(pa.table({
        'conv_id': pa.array(['conv-zzz'], pa.string()),
        'turn_idx': pa.array([0], pa.int32()),
        'text': pa.array(['POISON'], pa.string()),
        'n_spans': pa.array([0], pa.int32()),
        'n_pages': pa.array([0], pa.int32()),
        'decode_ok': pa.array([True], pa.bool_()),
        'error': pa.array([''], pa.string()),
        'bucket': pa.array([0], pa.int32()),
    }), os.path.join(stale, 'spill-junk.parquet'))

    summary = run_extraction(d, out, num_buckets=4, batch_size=32,
                             concurrency=2, resume=True)
    assert not os.path.exists(stale)
    assert summary['rows_out'] == n
    for p in glob.glob(os.path.join(out, 'part-*.parquet')):
        t = pq.read_table(p, columns=['text'])
        assert 'POISON' not in set(t.column('text').to_pylist())


def test_giant_conversation_skew(ray_session, tmp_path_factory):
    """One conversation holding ~40% of all turns (the north rule's skew
    concern): extraction is per-row so the job completes with every bucket
    bounded by that single conversation, ordering intact."""
    from engine.rayjob.pipeline import run_extraction
    from engine.rayjob.transcripts import generate_transcripts
    d = str(tmp_path_factory.mktemp('skewed'))
    generate_transcripts(d, n_convs=30, seed=11, rows_per_file=200,
                         long_conv_frac=0.0)
    # append one giant conversation as an extra file
    import pyarrow as pa
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gen_pdf import build_variant
    payload = build_variant('V01').decode('latin-1')
    giant = 120
    pq.write_table(pa.table({
        'conv_id': pa.array(['conv-giant'] * giant, pa.string()),
        'turn_idx': pa.array(list(range(giant)), pa.int32()),
        'role': pa.array(['user'] * giant, pa.string()),
        'text': pa.array([payload] * giant, pa.string()),
        'tool': pa.array([''] * giant, pa.string()),
        'ts': pa.array([1735689600000000 + i for i in range(giant)],
                       pa.timestamp('us')),
    }), os.path.join(d, 'part-giant.parquet'))

    out = str(tmp_path_factory.mktemp('out_skew'))
    summary = run_extraction(d, out, num_buckets=4, batch_size=32,
                             concurrency=2, resume=False)
    # the giant conversation landed whole in exactly one bucket, ordered
    rows = [json.loads(l) for l in open(checkpoint.manifest_path(out))]
    assert sum(r['rows'] for r in rows) == summary['rows_out']
    found = 0
    for p in glob.glob(os.path.join(out, 'part-*.parquet')):
        t = pq.read_table(p, columns=['conv_id', 'turn_idx'])
        ids = t.column('conv_id').to_pylist()
        if 'conv-giant' in ids:
            found += 1
            idxs = [ti for ci, ti in zip(ids, t.column('turn_idx').to_pylist())
                    if ci == 'conv-giant']
            assert idxs == list(range(giant))
    assert found == 1


def test_corpus_generation_deterministic(tmp_path_factory):
    """Same (n_convs, seed) → byte-identical corpus, independent of dir."""
    import hashlib
    from engine.rayjob.transcripts import generate_transcripts
    hashes = []
    for name in ('deta', 'detb'):
        d = str(tmp_path_factory.mktemp(name))
        generate_transcripts(d, n_convs=15, seed=3, rows_per_file=100)
        h = hashlib.md5()
        for p in sorted(glob.glob(os.path.join(d, 'part-*.parquet'))):
            h.update(pq.read_table(p).to_pandas().to_csv().encode())
        hashes.append(h.hexdigest())
    assert hashes[0] == hashes[1]


def test_spill_retry_overwrites_not_duplicates(tmp_path):
    """A Ray-retried ExtractAndSpill task re-executes __call__ on the SAME
    batch after a possibly-successful earlier publish.  The deterministic
    content-hash spill name must make the retry overwrite its own file —
    never add a second copy of the rows (ADVICE r1: uuid4 names duplicated
    rows in the final output on retry)."""
    from engine.rayjob.extract_stage import ExtractAndSpill, assign_bucket

    d = str(tmp_path / 'corpus')
    generate_transcripts(d, n_convs=4, seed=11, rows_per_file=100)
    src = glob.glob(os.path.join(d, '*.parquet'))[0]
    batch = assign_bucket(4)(pq.read_table(
        src, columns=['conv_id', 'turn_idx', 'text']))

    spill = str(tmp_path / 'spill')
    os.makedirs(spill)
    stage = ExtractAndSpill(spill, 4)
    out1 = stage(batch)
    out2 = stage(batch)                 # the retry
    files = glob.glob(os.path.join(spill, 'shard-*', 'spill-*.parquet'))
    assert len(files) == 1              # overwritten, not duplicated
    assert pq.read_table(files[0]).num_rows == batch.num_rows
    assert out1.column('rows')[0].as_py() == out2.column('rows')[0].as_py()

    # a DIFFERENT batch must land in a different file
    stage(batch.slice(0, 10))
    assert len(glob.glob(os.path.join(spill, 'shard-*', 'spill-*.parquet'))) == 2


def test_sharded_spill_compacts_from_own_shard_only(tmp_path):
    """With num_shards > 1 every spill block splits into per-bucket-range
    shard dirs and a compaction task lists ONLY its bucket's shard — a
    corrupt file in ANOTHER shard must not be read at all (at 100 TB this
    is what keeps per-task footer scans at files/num_shards)."""
    import pyarrow as pa
    from engine.rayjob.extract_stage import ExtractAndSpill, assign_bucket, shard_of
    from engine.rayjob.pipeline import _make_bucket_compactor

    d = str(tmp_path / 'corpus')
    generate_transcripts(d, n_convs=8, seed=17, rows_per_file=200)
    src = glob.glob(os.path.join(d, '*.parquet'))[0]
    batch = assign_bucket(4)(pq.read_table(
        src, columns=['conv_id', 'turn_idx', 'text']))

    spill = str(tmp_path / 'spill')
    out = str(tmp_path / 'out')
    os.makedirs(spill)
    os.makedirs(out)
    stage = ExtractAndSpill(spill, 4, num_shards=2)
    stage(batch)

    # every shard file holds only its own bucket range
    for f in glob.glob(os.path.join(spill, 'shard-*', 'spill-*.parquet')):
        s = int(os.path.basename(os.path.dirname(f)).split('-')[1])
        for b in set(pq.read_table(f, columns=['bucket']).column('bucket').to_pylist()):
            assert shard_of(b, 4, 2) == s

    # poison the OTHER shard with a corrupt PUBLISHED file: compacting
    # buckets 0-1 (shard 0) must never open it
    with open(os.path.join(spill, 'shard-001', 'spill-poison.parquet'), 'wb') as f:
        f.write(b'PAR1 not parquet')
    compact = _make_bucket_compactor(spill, out, num_buckets=4, num_shards=2)
    manifest = compact(pa.table({'bucket': pa.array([0, 1], pa.int32())}))
    want = sum(1 for b in batch.column('bucket').to_pylist() if b in (0, 1))
    assert sum(manifest.column('rows').to_pylist()) == want


def test_compactor_ignores_tmp_files(tmp_path):
    """A worker killed mid-write leaves 'spill-*.parquet.tmp'; compaction
    must enumerate only PUBLISHED spill files (ADVICE r1: directory
    discovery made every compact task fail on the half-written file)."""
    import pyarrow as pa
    from engine.rayjob.pipeline import _make_bucket_compactor

    spill = str(tmp_path / 'spill')
    out = str(tmp_path / 'out')
    os.makedirs(spill)
    os.makedirs(out)
    good = pa.table({
        'conv_id': pa.array(['c1', 'c2'], pa.string()),
        'turn_idx': pa.array([0, 0], pa.int32()),
        'text': pa.array(['a', 'b'], pa.string()),
        'n_spans': pa.array([1, 1], pa.int32()),
        'n_pages': pa.array([1, 1], pa.int32()),
        'decode_ok': pa.array([True, True], pa.bool_()),
        'error': pa.array(['', ''], pa.string()),
        'bucket': pa.array([0, 1], pa.int32()),
    })
    pq.write_table(good, os.path.join(spill, 'spill-aaaa.parquet'))
    # half-written leftover: invalid parquet bytes
    with open(os.path.join(spill, 'spill-bbbb.parquet.tmp'), 'wb') as f:
        f.write(b'PAR1 garbage truncated')

    compact = _make_bucket_compactor(spill, out)
    manifest = compact(pa.table({'bucket': pa.array([0, 1], pa.int32())}))
    assert manifest.column('rows').to_pylist() == [1, 1]
    parts = sorted(glob.glob(os.path.join(out, 'part-*.parquet')))
    assert len(parts) == 2
    assert sum(pq.read_table(p).num_rows for p in parts) == 2


def test_payload_lru_identical_output_and_hits(tmp_path):
    """Repeated payloads must hit the per-actor LRU (one extraction per
    distinct payload) and produce byte-identical output to the uncached
    stage — extraction is a pure function of the payload."""
    from engine.rayjob.extract_stage import ExtractTurns
    import pyarrow as pa

    d = str(tmp_path / 'corpus')
    generate_transcripts(d, n_convs=4, seed=13, rows_per_file=200)
    src = glob.glob(os.path.join(d, '*.parquet'))[0]
    base = pq.read_table(src, columns=['conv_id', 'turn_idx', 'text'])
    # duplicate the batch so every payload appears at least twice
    batch = pa.concat_tables([base, base]).combine_chunks()

    cached = ExtractTurns(payload_lru=4096)
    plain = ExtractTurns(payload_lru=0)
    out_c = cached(batch)
    out_p = plain(batch)
    assert out_c.equals(out_p)
    assert cached.lru_hits >= base.num_rows        # second copy all hits


def test_expected_tables_match_engine_per_variant(tmp_path, shared_fonts):
    """The reference-derived expected tables (ensure_expected — built from
    the committed goldens, never from the engine) must agree with the
    engine kernel on every distinct payload: this is the bridge that makes
    the driver's extract_* oracle joins a REAL independent check."""
    import hashlib
    import sys
    import pyarrow.parquet as pq
    from engine.rayjob.transcripts import ensure_expected
    from engine.pdfcore.extract import extract_turn
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gen_pdf import VARIANTS, build_variant

    corpus = str(tmp_path / 'corpus')
    os.makedirs(corpus)
    exp_dir = ensure_expected(corpus)
    turns = pq.read_table(os.path.join(exp_dir, 'expected_turns.parquet'))
    spans = pq.read_table(os.path.join(exp_dir, 'expected_spans.parquet'))
    by_fp = {r['fp']: r for r in turns.to_pylist()}
    spans_by_fp = {}
    for r in spans.to_pylist():
        spans_by_fp.setdefault(r['fp'], []).append(r)

    assert len(by_fp) == len(VARIANTS)
    total_spans = 0
    for vid in sorted(VARIANTS):
        payload = build_variant(vid).decode('latin-1')
        fp = hashlib.md5(payload.encode('utf-8')).hexdigest()
        r = extract_turn(payload, shared_fonts, collect_spans=True)
        e = by_fp[fp]
        assert r['text'] == e['text'], vid
        assert r['n_spans'] == e['n_spans'], vid
        assert r['n_pages'] == e['n_pages'], vid
        assert r['decode_ok'] == e['decode_ok'], vid
        got = [(pg, x, y, u, cid, w) for (pg, x, y, u, cid, w) in r['spans']]
        want = [(s['page'], s['x'], s['y'], s['unicode'], s['cid'], s['width'])
                for s in spans_by_fp.get(fp, [])]
        assert got == want, vid          # exact float64, page, cid, width
        total_spans += len(want)
    assert total_spans == spans.num_rows


def test_chunked_compaction_identical_output(ray_session, tmp_path_factory,
                                             monkeypatch):
    """Skew escape hatch: with GRAFT_COMPACT_MAX_ROWS far below the bucket
    size (one conversation much larger than the chunk window), the external
    merge compaction must produce byte-identical parts, manifest counts and
    ordering to the in-memory path."""
    from engine.rayjob.pipeline import run_extraction
    from engine.rayjob.transcripts import generate_transcripts
    import pyarrow as pa
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gen_pdf import build_variant

    d = str(tmp_path_factory.mktemp('chunk_corpus'))
    generate_transcripts(d, n_convs=12, seed=23, rows_per_file=150,
                         long_conv_frac=0.0)
    payload = build_variant('V02').decode('latin-1')
    giant = 90                        # >> the 16-row window below
    pq.write_table(pa.table({
        'conv_id': pa.array(['conv-giant'] * giant, pa.string()),
        'turn_idx': pa.array(list(range(giant)), pa.int32()),
        'role': pa.array(['user'] * giant, pa.string()),
        'text': pa.array([payload] * giant, pa.string()),
        'tool': pa.array([''] * giant, pa.string()),
        'ts': pa.array([1735689600000000 + i for i in range(giant)],
                       pa.timestamp('us')),
    }), os.path.join(d, 'part-giant.parquet'))

    out_mem = str(tmp_path_factory.mktemp('out_mem'))
    s1 = run_extraction(d, out_mem, num_buckets=4, batch_size=32,
                        concurrency=2, resume=False)

    monkeypatch.setenv('GRAFT_COMPACT_MAX_ROWS', '16')
    out_chk = str(tmp_path_factory.mktemp('out_chk'))
    s2 = run_extraction(d, out_chk, num_buckets=4, batch_size=32,
                        concurrency=2, resume=False)

    assert s1['rows_out'] == s2['rows_out']
    assert s1['decode_failures'] == s2['decode_failures']
    assert s1['span_count'] == s2['span_count']
    p1 = sorted(os.path.basename(p)
                for p in glob.glob(os.path.join(out_mem, 'part-*.parquet')))
    p2 = sorted(os.path.basename(p)
                for p in glob.glob(os.path.join(out_chk, 'part-*.parquet')))
    assert p1 == p2
    for name in p1:
        a = pq.read_table(os.path.join(out_mem, name))
        b = pq.read_table(os.path.join(out_chk, name))
        assert a.equals(b), name       # same rows, same order, same schema


def test_compact_chunked_duplicate_keys(tmp_path):
    """Half-open window contract: rows whose (conv_id, turn_idx) key is
    DUPLICATED across a window boundary must land in exactly one window
    (the review found the old inclusive-both-ends predicates read them
    twice).  30 rows with every key appearing 3x, window of 4 → boundaries
    must advance past key runs; exactly-once output, fully sorted."""
    import pyarrow as pa
    import pyarrow.dataset as pads
    from engine.rayjob.pipeline import _compact_chunked

    n = 30
    convs = ['c%d' % (i % 2) for i in range(n)]
    turns = [(i // 2) // 3 for i in range(n)]     # each (conv, turn) 3x
    tbl = pa.table({
        'conv_id': pa.array(convs, pa.string()),
        'turn_idx': pa.array(turns, pa.int32()),
        'text': pa.array(['t%d' % i for i in range(n)], pa.string()),
        'n_spans': pa.array([1] * n, pa.int32()),
        'decode_ok': pa.array([True] * n, pa.bool_()),
        'bucket': pa.array([0] * n, pa.int64()),
    })
    f = os.path.join(str(tmp_path), 'spill.parquet')
    pq.write_table(tbl, f)
    dset = pads.dataset([f])
    keys = tbl.select(['conv_id', 'turn_idx'])
    out = os.path.join(str(tmp_path), 'out.parquet')
    rows, failures, spans = _compact_chunked(
        dset, pads.field('bucket') == 0, keys, out, max_rows=4)
    assert (rows, failures, spans) == (n, 0, n)
    got = pq.read_table(out)
    assert got.num_rows == n                      # exactly-once
    ks = list(zip(got.column('conv_id').to_pylist(),
                  got.column('turn_idx').to_pylist()))
    assert ks == sorted(ks)                       # fully sorted


def test_payload_dedup_mode_byte_identical(ray_session, corpus,
                                           tmp_path_factory):
    """Opt-in distinct-payload mode (GRAFT_PAYLOAD_DEDUP): the
    pre-extracted broadcast map must yield BYTE-identical part files to
    the default per-actor-LRU run (extraction is a pure function of the
    payload), identical manifests modulo timing, and every distinct
    payload extracted exactly once (global_hits covers the corpus)."""
    from engine.rayjob.pipeline import run_extraction, distinct_payload_map
    d, n = corpus
    out_a = str(tmp_path_factory.mktemp('out_default'))
    out_b = str(tmp_path_factory.mktemp('out_dedup'))
    sa = run_extraction(d, out_a, num_buckets=4, batch_size=32,
                        concurrency=2, resume=False)
    sb = run_extraction(d, out_b, num_buckets=4, batch_size=32,
                        concurrency=2, resume=False, payload_dedup=True)
    assert sb['n_distinct_payloads'] > 0
    assert sb['rows_out'] == sa['rows_out'] == n
    pa_files, a_tables = _read_all(out_a)
    pb_files, b_tables = _read_all(out_b)
    assert [os.path.basename(p) for p in pa_files] == \
           [os.path.basename(p) for p in pb_files]
    for fa, fb in zip(pa_files, pb_files):
        with open(fa, 'rb') as ha, open(fb, 'rb') as hb:
            assert ha.read() == hb.read()


def test_distinct_payload_cap_raises(ray_session, corpus):
    """The broadcast-size guard must fail LOUDLY (named env remedy), not
    OOM, when the distinct set exceeds the cap."""
    from engine.rayjob.pipeline import distinct_payload_map
    d, _ = corpus
    with pytest.raises(RuntimeError, match='GRAFT_DISTINCT_CAP'):
        distinct_payload_map(d, cap=3)
