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
