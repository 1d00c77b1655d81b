"""Ray-free multiprocessing control for the scaling measurement.

Replicates Stage A (read parquet row group → extract → spill sorted
parquet) with a plain multiprocessing.Pool — zero Ray — at two pool
widths, in the SAME session as the Ray runs.  If the per-process rate
shows the same 7→28 drop as Ray's per-actor rate, the width penalty is
host contention (shared-KVM memory bandwidth / steal), not Ray overhead;
if mp holds its rate where Ray drops, the penalty is Ray-side.

    python tools/mp_control.py --corpus /tmp/graft_transcripts/sf4.8-v3 \
        --widths 7,28 --reps 2
"""

import argparse
import glob
import json
import multiprocessing as mp
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SPILL = None


def _init(spill_dir):
    global _SPILL
    _SPILL = spill_dir
    import pyarrow as pa
    pa.set_cpu_count(1)
    pa.set_io_thread_count(1)


def _work(task):
    """One unit: read a parquet row group, extract every turn, spill a
    bucket-sorted parquet — the mp twin of ExtractAndSpill."""
    path, rg = task
    import pyarrow as pa
    import pyarrow.parquet as pq
    from engine.pdfcore.extract import SharedFontState, extract_turn
    from engine.rayjob.extract_stage import ExtractAndSpill

    global _STATE
    if '_STATE' not in globals():
        globals()['_STATE'] = ExtractAndSpill(_SPILL, 64)
    stage = globals()['_STATE']

    tbl = pq.ParquetFile(path).read_row_group(
        rg, columns=['conv_id', 'turn_idx', 'text'])
    from engine.rayjob.extract_stage import assign_bucket
    tbl = assign_bucket(64)(tbl)
    out = stage(tbl)
    return int(out.column('rows')[0].as_py())


def run_width(files_rgs, width, spill_root):
    spill = os.path.join(spill_root, 'mp-%s' % uuid.uuid4().hex)
    os.makedirs(spill)
    t0 = time.perf_counter()
    with mp.Pool(width, initializer=_init, initargs=(spill,)) as pool:
        rows = sum(pool.imap_unordered(_work, files_rgs, chunksize=1))
    wall = time.perf_counter() - t0
    shutil.rmtree(spill, ignore_errors=True)
    return {'width': width, 'rows': rows, 'wall_s': round(wall, 2),
            'rows_per_sec': round(rows / wall, 1),
            'rows_per_sec_per_proc': round(rows / wall / width, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--corpus', default='/tmp/graft_transcripts/sf4.8-v3')
    ap.add_argument('--widths', default='7,28')
    ap.add_argument('--reps', type=int, default=2)
    ap.add_argument('--spill-root', default='/tmp/graft_mp_control')
    args = ap.parse_args()
    widths = [int(w) for w in args.widths.split(',')]

    import pyarrow.parquet as pq
    tasks = []
    for path in sorted(glob.glob(os.path.join(args.corpus, '*.parquet'))):
        for rg in range(pq.ParquetFile(path).num_row_groups):
            tasks.append((path, rg))
    os.makedirs(args.spill_root, exist_ok=True)

    per = {w: [] for w in widths}
    for rep in range(args.reps):
        order = widths if rep % 2 == 0 else list(reversed(widths))
        for w in order:
            r = run_width(tasks, w, args.spill_root)
            per[w].append(r['rows_per_sec'])
            print(json.dumps({'rep': rep, **r}), flush=True)
    if len(widths) == 2:
        import statistics
        lo, hi = sorted(widths)
        tlo = statistics.median(per[lo])
        thi = statistics.median(per[hi])
        print(json.dumps({
            'control': 'multiprocessing (zero Ray)',
            'widths': [lo, hi],
            'rows_per_sec_medians': [tlo, thi],
            'per_proc': [round(tlo / lo, 1), round(thi / hi, 1)],
            'efficiency_of_medians': round((thi / tlo) / (hi / lo), 4),
        }))


if __name__ == '__main__':
    main()
