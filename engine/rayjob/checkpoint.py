"""Per-partition lineage manifest for checkpoint/resume (SURVEY.md §4.2).

Output layout: one parquet file per conv_id hash bucket with deterministic
names (``part-{bucket:05d}.parquet``), written tmp-then-rename, plus a
``_MANIFEST.jsonl`` with one lineage row per finished bucket:

    {"bucket": int, "rows": int, "decode_failures": int,
     "span_count": int, "wall_s": float, "file": str}

On resume, buckets present in the manifest are filtered out BEFORE the
expensive extraction stage, so a restarted job only pays for unfinished
partitions.  Never one giant file; every bucket is independently retryable.
"""

import json
import os

__all__ = ['manifest_path', 'load_done_buckets', 'append_manifest_rows',
           'reset_output']

MANIFEST_NAME = '_MANIFEST.jsonl'


def manifest_path(out_dir):
    return os.path.join(out_dir, MANIFEST_NAME)


def load_done_buckets(out_dir):
    """Buckets with a manifest row AND an existing output file."""
    path = manifest_path(out_dir)
    done = {}
    if not os.path.exists(path):
        return done
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            if row['rows'] == 0 and not row['file']:
                done[row['bucket']] = row       # empty bucket: done by fiat
                continue
            fpath = os.path.join(out_dir, row['file'])
            if os.path.exists(fpath):
                done[row['bucket']] = row
    return done


def append_manifest_rows(out_dir, rows):
    path = manifest_path(out_dir)
    with open(path, 'a') as f:
        for row in rows:
            f.write(json.dumps(row) + '\n')


def reset_output(out_dir):
    """Delete manifest + bucket files (fresh run)."""
    if not os.path.isdir(out_dir):
        return
    for name in os.listdir(out_dir):
        if name == MANIFEST_NAME or (name.startswith('part-') and name.endswith('.parquet')):
            os.unlink(os.path.join(out_dir, name))
