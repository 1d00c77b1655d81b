"""A/B the minhash band exchange: in-memory groupby vs external spill.

Builds a scaled documents corpus (mult× sf0.1) by word-suffix mutation —
replica i suffixes every token with ``_i``, so within-replica Jaccard
structure (and the near-dup rate) is preserved exactly while NO shingle
is shared across replicas (pure replication would put all replicas of a
doc in the same LSH bands and blow the pair stage up quadratically).

Usage: python tools/bench_spill_exchange.py [mult] [sf_dir]
Prints one JSON line per path.  GRAFT_OPS_SPILL is set per leg.
"""

import json
import os
import re
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ensure_scaled_docs(sf_dir, mult):
    out = '/tmp/graft_scaled_docs/%s-x%d' % (
        os.path.basename(os.path.normpath(sf_dir)), mult)
    marker = os.path.join(out, '_COMPLETE')
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    base = pq.read_table(os.path.join(sf_dir, 'documents.parquet'))
    n = base.num_rows
    texts = base.column('text').to_pylist()
    for i in range(mult):
        suf = '_%d' % i
        t = pa.table({
            'doc_id': pa.array([d + i * n for d in
                                base.column('doc_id').to_pylist()],
                               pa.int64()),
            'text': pa.array([re.sub(r'(\S+)', r'\1' + suf, s)
                              for s in texts], pa.string()),
        })
        pq.write_table(t, os.path.join(out, 'documents-%03d.parquet' % i))
    # single-file layout expected by table_path: concatenate
    files = sorted(os.path.join(out, f) for f in os.listdir(out)
                   if f.startswith('documents-'))
    pq.write_table(pa.concat_tables([pq.read_table(f) for f in files]),
                   os.path.join(out, 'documents.parquet'))
    for f in files:
        os.remove(f)
    with open(marker, 'w') as fh:
        fh.write('v1')
    return out


def main():
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.1'
    corpus = ensure_scaled_docs(sf_dir, mult)
    import ray
    ray.init(address='local',
             num_cpus=int(os.environ.get('RAY_GRAFT_CPUS', '32') or '32'),
             include_dashboard=False, logging_level='ERROR')
    from engine.ops import dedup
    results = {}
    for label, flag in (('spill', '1'), ('groupby', '0')):
        os.environ['GRAFT_OPS_SPILL'] = flag
        import gc
        gc.collect()
        t0 = time.perf_counter()
        n = dedup.minhash_near_dup(corpus).count()
        wall = time.perf_counter() - t0
        results[label] = {'wall_s': round(wall, 2), 'pairs': n}
        print(json.dumps({'path': label, 'mult': mult, **results[label]}),
              flush=True)
    if results['spill']['pairs'] != results['groupby']['pairs']:
        raise SystemExit('PAIR COUNT MISMATCH between paths')
    ray.shutdown()


if __name__ == '__main__':
    main()
