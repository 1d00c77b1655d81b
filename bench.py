"""Benchmark entry point (driver contract).

Default mode: one JSON line with the headline extraction pipeline's
wall-clock over the transcripts corpus derived from ``$GRAFT_SF_DIR``
(default /root/testdata/sf0.1) plus per-query timings, at
``ray.init(address='local', num_cpus=$RAY_GRAFT_CPUS)`` (default 32).

``--scaling``: runs the headline pipeline in TWO FRESH PROCESSES at
num_cpus=8 and num_cpus=32 on the same input (sandbox stand-in for N vs
4N nodes per BASELINE.json north_rule) and reports both throughputs plus
scaling efficiency = (T_32 / T_8) / 4.
"""

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get('GRAFT_SF_DIR', '/root/testdata/sf0.1')
NUM_CPUS = int(os.environ.get('RAY_GRAFT_CPUS', '32') or '32')

# Queries timed alongside the headline (representative of each op family).
BENCH_QUERIES = ['q1_pricing', 'events_by_type', 'dedup_exact',
                 'doc_token_stats', 'minhash_near_dup', 'embedding_dup_pairs',
                 'embedding_dup_pairs_blocked', 'top_orders_revenue',
                 'ann_topk', 'events_sessionize', 'extract_metrics',
                 # round-3 additions, one per new family
                 'shipping_priority', 'doc_tfidf_topk', 'bigram_pmi_topk',
                 'embedding_dup_lsh', 'distinct_users_kmv', 'corpus_clean',
                 'events_user_running',
                 # late round-3 additions, one per new family
                 'urgent_order_lineitems', 'conv_text_md5',
                 'shared_span_pairs', 'doc_chunks',
                 # round-4 additions
                 'events_value_tdigest', 'distinct_users_hll',
                 'token_heavy_hitters', 'token_postings',
                 'orders_cohort_retention', 'embedding_dedup_clusters',
                 # round-4b additions
                 'part_pagerank', 'token_cooccur_topk',
                 'user_decay_score', 'doc_model_score', 'ann_topk_pq',
                 # round-4c additions
                 'decontaminate_split', 'doc_shard_assign',
                 'conv_role_transitions', 'embedding_norm_stats',
                 # round-4d additions
                 'events_type_drift', 'doc_ngram_novelty',
                 # round-4e additions (one per new family)
                 'conv_near_dup', 'conv_near_dup_lsh', 'conv_pack_manifest',
                 'fk_integrity_audit', 'embedding_label_centroids',
                 # round-5 additions (one per new family: deep join chain,
                 # per-bucket top-k chain, row-vs-group-aggregate shuffle,
                 # boilerplate audit, histogram median/MAD)
                 'q5_local_supplier_volume', 'q18_large_volume_customer',
                 'q17_small_quantity_revenue', 'conv_boilerplate_turns',
                 'doc_length_outliers']


def _init_ray(num_cpus):
    import ray
    if not ray.is_initialized():
        # Prestarted idle workers (one per CPU) measurably steal scheduler
        # time from a full-width actor pool on a single node: 28 actors ran
        # 15% faster with prestart off (idle workers never help here — the
        # fused read+extract chain runs entirely inside the actor pool).
        os.environ.setdefault('RAY_enable_worker_prestart', 'false')
        # Tried and rejected: RAY_num_server_call_thread=1 (+17%/actor in a
        # pure in-memory kernel diagnostic at 28 actors, but -8% END-TO-END
        # on the real pipeline — one gRPC server-call thread serializes task
        # dispatch / block handoff; the thread census win doesn't survive
        # contact with the read+spill stages).
        kw = {}
        # bounded plasma for concurrent same-host sessions (the saturated
        # scaling 8-leg runs 4 at once; default sizing would ask for
        # 4 × ~40 GB of /dev/shm)
        obj_gb = os.environ.get('GRAFT_OBJ_STORE_GB')
        if obj_gb:
            kw['object_store_memory'] = int(float(obj_gb) * (1 << 30))
        ray.init(address='local', num_cpus=num_cpus, include_dashboard=False,
                 logging_level='ERROR', **kw)


def run_headline(num_cpus, sf_dir=SF_DIR, sf_mult=1, payload_lru=False,
                 payload_dedup=False):
    """Flagship extraction: transcripts → extract → ordered bucketed write.

    ``sf_mult`` scales the synthesized corpus relative to the sf_dir hint —
    the scaling benchmark uses 4× so the job carries ≥60 s of work at
    num_cpus=8 and fixed pipeline startup (~5 s) stops dominating.

    ``payload_lru``: the production default caches extraction results per
    distinct payload (engine/rayjob/extract_stage.py).  The SYNTHESIZED
    corpus has only ~24 distinct payloads (the golden variant pool), which
    makes the cache degenerate-good (hit rate ≈ 100%) — so the HEADLINE
    metric is measured with the cache OFF (raw per-turn extraction
    throughput, comparable to the kernel/baseline numbers), and the
    cache-on number is reported separately as ``turns_per_sec_lru``.
    """
    os.environ['GRAFT_PAYLOAD_LRU'] = '4096' if payload_lru else '0'
    from engine.ops.common import sf_from_dir
    from engine.rayjob.transcripts import ensure_corpus
    from engine.rayjob.pipeline import run_extraction

    sf = float(sf_from_dir(sf_dir)) * sf_mult
    corpus = ensure_corpus('%g' % sf)             # built before the clock
    _init_ray(num_cpus)
    # saturated-mode children run concurrently at the same width: the
    # pin offset keys each child's output (and its spill dirs beneath it)
    out_dir = '/tmp/graft_bench_out/cpus%d-off%s' % (
        num_cpus, os.environ.get('GRAFT_PIN_OFFSET', '0'))
    t0 = time.perf_counter()
    summary = run_extraction(corpus, out_dir, resume=False,
                             payload_dedup=payload_dedup)
    wall = time.perf_counter() - t0
    return {'wall_s': wall, 'rows': summary['rows_out'],
            'turns_per_sec': summary['rows_out'] / wall,
            'stage_a_s': round(summary['stage_a_s'], 3),
            'stage_b_s': round(summary['stage_b_s'], 3),
            'dedup_s': round(summary['dedup_s'], 3),
            'n_distinct_payloads': summary['n_distinct_payloads'],
            'decode_failures': summary['decode_failures'],
            'span_count': summary['span_count']}


def run_queries(sf_dir=SF_DIR):
    import __ray_entry__ as entrymod
    qs = entrymod.queries()
    out = {}
    import ray.data
    import gc
    for name in BENCH_QUERIES:
        # A consumed Dataset's streaming executor + actor pool are torn
        # down lazily via cyclic GC; left to chance, the NEXT query's pool
        # waits on the previous pool's CPUs (measured: 18.2s vs 2.4s for
        # the identical query).  Collect between queries so each timing
        # measures the query, not its predecessor's teardown.
        gc.collect()
        t0 = time.perf_counter()
        # Errors PROPAGATE: a timing for a failed query is a lie.
        res = qs[name](sf_dir)
        if isinstance(res, ray.data.Dataset):
            res.count()  # consume the stream
        out[name] = round(time.perf_counter() - t0, 3)
        del res
    return out


# Headline corpus = 4× the sf hint: 37k rows (sf0.1) is startup-dominated at
# 32 cpus; 150k rows keeps the run <20 s while measuring mostly steady state.
BENCH_SF_MULT = int(os.environ.get('GRAFT_BENCH_SF_MULT', '4'))


def main_default():
    _init_ray(NUM_CPUS)
    head = run_headline(NUM_CPUS, sf_mult=BENCH_SF_MULT)
    lru_head = run_headline(NUM_CPUS, sf_mult=BENCH_SF_MULT, payload_lru=True)
    # distinct-payload pre-pass mode, LRU OFF: isolates the global-dedup
    # win (each distinct payload extracted ONCE corpus-wide, results
    # broadcast-joined back) vs the raw headline on the same corpus
    dedup_head = run_headline(NUM_CPUS, sf_mult=BENCH_SF_MULT,
                              payload_dedup=True)
    os.environ.pop('GRAFT_PAYLOAD_LRU', None)   # queries use the default
    queries = run_queries()
    sf = os.path.basename(os.path.normpath(SF_DIR)).lstrip('sf')
    print(json.dumps({
        'metric': 'extraction_wall_s',
        'value': round(head['wall_s'], 3),
        'unit': 'sec',
        'turns_per_sec': round(head['turns_per_sec'], 1),
        # production config (payload LRU on): degenerate-good on the synth
        # corpus (24 distinct payloads) — reported separately, see
        # run_headline docstring
        'turns_per_sec_lru': round(lru_head['turns_per_sec'], 1),
        # opt-in distinct-payload mode (GRAFT_PAYLOAD_DEDUP=1): global
        # dedup pre-pass + broadcast join, LRU off, byte-identical output
        'turns_per_sec_dedup': round(dedup_head['turns_per_sec'], 1),
        'n_distinct_payloads': dedup_head['n_distinct_payloads'],
        'rows': head['rows'],
        'decode_failures': head['decode_failures'],
        'span_count': head['span_count'],
        'queries': queries,
        'sf': sf,
        # the headline corpus is sf × sf_mult — report the multiplier so the
        # wall-clock is attributed to the corpus actually measured
        'sf_mult': BENCH_SF_MULT,
        'sf_effective': '%g' % (float(sf) * BENCH_SF_MULT),
        'num_cpus': NUM_CPUS,
    }))
    import ray
    ray.shutdown()


# The scaling corpus must carry enough work that fixed pipeline startup
# (~5-8 s: actor-pool spawn + first-exec worker imports) stays ≪5% of the
# 32-cpu wall.  At mult=48 the 32-leg is only ~90 s and startup costs ~6
# efficiency points (measured 0.65 vs 0.78-0.90 at mult=192 in adjacent
# host windows); mult=192 (7.3M turns, 32-leg ≈ 280 s) is the canonical
# size recorded in BASELINE.md.
SCALING_SF_MULT = int(os.environ.get('GRAFT_SCALING_SF_MULT', '192'))


def _pin_cpus(n):
    """Pin the child process (inherited by raylet + all Ray workers) to the
    first ``n`` cores.  The north rule compares fixed-size clusters of N vs
    4N NODES: on a real cluster every node's cores are fully owned by its
    share of the job.  Unpinned on a 32-core host, the 8-cpu run borrows
    the other 24 cores for its ~500 auxiliary Ray/gRPC threads and enjoys
    lower per-core contention — slack a real 8-core node never has — which
    deflates measured efficiency.  Affinity-aware thread pools (glibc
    nprocs) also size to n, matching what an n-core node would spawn.
    ON by default since round 4: across pair sets the pinned 8-leg is
    reproducible within 0.1% (9,857 vs 9,863 turns/s) while the
    unpinned 8-leg swings with idle-host turbo/thread slack a real
    8-core node never has — pinning measures the node-faithful
    denominator.  Disable with GRAFT_PIN_CPUS=0 to study the unpinned
    behavior (BASELINE.md round-4 records both)."""
    if os.environ.get('GRAFT_PIN_CPUS', '1') != '1':
        return False
    try:
        off = int(os.environ.get('GRAFT_PIN_OFFSET', '0'))
        cpus = sorted(os.sched_getaffinity(0))[off:off + n]
        os.sched_setaffinity(0, set(cpus))
        return True
    except (AttributeError, OSError):
        return False


def main_child(num_cpus):
    pinned = _pin_cpus(num_cpus)
    head = run_headline(num_cpus, sf_mult=SCALING_SF_MULT)
    print('CHILD_RESULT ' + json.dumps({'num_cpus': num_cpus,
                                        'pinned': pinned, **head}))
    import ray
    ray.shutdown()


# Shared-tenancy host noise swings a SINGLE 8-vs-32 pair by ±20% in
# window lengths of minutes-to-hours (identical code measured 0.44-0.90
# across a day).  GRAFT_SCALING_PAIRS>1 runs interleaved pairs and
# reports the MEDIAN with every sample — use for evidence sessions;
# default 1 keeps the standard run at one mult=192 pair (~20 min).
SCALING_PAIRS = int(os.environ.get('GRAFT_SCALING_PAIRS', '1'))


def _parse_child(stdout, stderr, cpus):
    line = [l for l in stdout.splitlines() if l.startswith('CHILD_RESULT ')]
    if not line:
        sys.stderr.write(stdout + stderr)
        raise RuntimeError('child run at %d cpus produced no result' % cpus)
    return json.loads(line[-1][len('CHILD_RESULT '):])


def _run_child(cpus):
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), '--child', str(cpus)],
        capture_output=True, text=True, timeout=3600,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    return _parse_child(proc.stdout, proc.stderr, cpus)


def _run_saturated_8(groups=4, n=8):
    """The SATURATED 8-leg: ``groups`` concurrent 8-cpu children, each
    pinned to its own core slice, together filling the host — so BOTH
    legs of the ratio run at identical host utilization (all cores
    busy, no per-package turbo or bandwidth slack for the narrow leg to
    borrow).  This isolates the engine's parallelization loss from the
    hardware's all-cores-busy frequency drop, which the zero-Ray
    control measured at ~0.73 on the idle-8-leg basis.  Efficiency on
    this basis = T32 / Σ T8ᵢ — 'does one 32-wide job beat four 8-wide
    jobs?', the per-node throughput-retention question the north rule's
    N-vs-4N-node comparison actually asks.  Each child gets a bounded
    object store (4 concurrent sessions must fit the host's /dev/shm;
    the flagship's spill shuffle needs little plasma)."""
    procs = []
    for i in range(groups):
        env = dict(os.environ)
        env['GRAFT_PIN_OFFSET'] = str(i * n)
        env['GRAFT_OBJ_STORE_GB'] = env.get('GRAFT_OBJ_STORE_GB', '8')
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), '--child', str(n)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=os.path.dirname(os.path.abspath(__file__))))
    results = []
    for p in procs:
        out, err = p.communicate(timeout=3600)
        results.append(_parse_child(out, err, n))
    return results


def main_scaling():
    saturate = os.environ.get('GRAFT_SCALING_SATURATE', '0') == '1'
    pairs = []
    for _ in range(max(1, SCALING_PAIRS)):
        if saturate:
            r8s = _run_saturated_8()
            agg = sum(r['turns_per_sec'] for r in r8s)
            r8 = dict(r8s[0])
            r8['turns_per_sec'] = agg / 4.0     # per-group mean
            r8['each_turns_per_sec'] = [round(r['turns_per_sec'], 1)
                                        for r in r8s]
        else:
            r8 = _run_child(8)
        r32 = _run_child(32)
        pairs.append((r8, r32))
    effs = sorted((r32['turns_per_sec'] / r8['turns_per_sec']) / 4.0
                  for r8, r32 in pairs)
    # report the throughput legs of the MEDIAN pair alongside all samples
    by_eff = sorted(pairs, key=lambda p:
                    (p[1]['turns_per_sec'] / p[0]['turns_per_sec']))
    r8, r32 = by_eff[len(by_eff) // 2]
    sf = os.path.basename(os.path.normpath(SF_DIR)).lstrip('sf')
    print(json.dumps({
        'metric': 'scaling_efficiency',
        'value': round(effs[len(effs) // 2], 4),
        'unit': 'ratio',
        'samples': [round(e, 4) for e in effs],
        'pairs': len(pairs),
        'turns_per_sec_8': round(r8['turns_per_sec'], 1),
        'turns_per_sec_32': round(r32['turns_per_sec'], 1),
        'wall_s_8': round(r8['wall_s'], 3),
        'wall_s_32': round(r32['wall_s'], 3),
        'stage_a_s': {'8': r8['stage_a_s'], '32': r32['stage_a_s']},
        'stage_b_s': {'8': r8['stage_b_s'], '32': r32['stage_b_s']},
        'rows': r8['rows'],
        'sf': sf,
        'sf_mult': SCALING_SF_MULT,
        'sf_effective': '%g' % (float(sf) * SCALING_SF_MULT),
        'num_cpus': [8, 32],
        'pinned': [r8.get('pinned'), r32.get('pinned')],
        'mode': 'saturated' if saturate else 'idle-8-leg',
        **({'turns_per_sec_8_each': r8.get('each_turns_per_sec')}
           if saturate else {}),
    }))


if __name__ == '__main__':
    if '--scaling' in sys.argv:
        main_scaling()
    elif '--child' in sys.argv:
        main_child(int(sys.argv[sys.argv.index('--child') + 1]))
    else:
        main_default()
