"""Steady-state microbenchmark for the extraction kernel.

Why this exists: single-shot before/after kernel timings on this host are
confounded by CPU-state drift (measured ±20-35% across 10 minutes on the
same payloads — a "regression" from a Tok refactor turned out to be ~0%
once re-measured after revert).  This tool prints PER-REP rates so drift
is visible, and supports long warm + many reps; compare distributions,
not single numbers, and interleave A/B runs of two checkouts back-to-back.

Usage: python tools/kernel_bench.py [n_payloads] [reps]
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_payloads=600, reps=10):
    import pyarrow.parquet as pq
    from engine.pdfcore.extract import SharedFontState, extract_turn

    files = sorted(glob.glob('/tmp/graft_transcripts/sf0.01-v3/*.parquet'))
    if not files:
        from engine.rayjob.transcripts import ensure_corpus
        files = sorted(glob.glob(ensure_corpus('0.01') + '/*.parquet'))
    texts = []
    for f in files:
        texts.extend(pq.read_table(f, columns=['text']).column('text').to_pylist())
        if len(texts) >= n_payloads:
            break
    texts = texts[:n_payloads]
    shared = SharedFontState()
    for p in texts[:50]:
        extract_turn(p, shared)

    rates = []
    for rep in range(reps):
        t0 = time.perf_counter()
        for p in texts:
            extract_turn(p, shared)
        dt = time.perf_counter() - t0
        rates.append(len(texts) / dt)
        print('rep %2d: %7.1f rows/s' % (rep, rates[-1]), flush=True)
    rates.sort()
    print('min %7.1f  median %7.1f  max %7.1f  (n=%d payloads, %d reps)'
          % (rates[0], rates[len(rates) // 2], rates[-1], len(texts), reps))


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 600,
         int(sys.argv[2]) if len(sys.argv) > 2 else 10)
