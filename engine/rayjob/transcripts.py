"""Deterministic synthetic transcripts corpus (FIXTURES.md §1).

Exactly the BASELINE.json ``input_hint`` shape: (conv_id, turn_idx, role,
text, tool, ts) where ``text`` carries a complete synthetic PDF document
latin-1-decoded to string.  Conversation lengths are skewed (a small
fraction are very long) so the salting/skew paths get exercised; rows are
written in shuffled order so stable-ordering logic is actually tested.

Pure function of (n_convs, seed): no wall clock, no external data.
"""

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ['generate_transcripts', 'ensure_corpus', 'corpus_dir_for_sf']

# Bump when gen_pdf's variant pool or the generator's drawing logic changes:
# cached corpora under /tmp are keyed by (sf, POOL_VERSION) so stale caches
# can never mix generations.
POOL_VERSION = 3

_ROLES = ('user', 'assistant', 'tool')
_TS_BASE_US = 1735689600000000  # 2025-01-01T00:00:00Z, fixed epoch base


def _payloads():
    """Build the PDF payload pool once: (good_payloads, corrupt_payloads)."""
    import sys
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    tdir = os.path.join(here, 'tests')
    if tdir not in sys.path:
        sys.path.insert(0, tdir)
    from gen_pdf import VARIANTS, CORRUPT, build_variant
    good, bad = [], []
    for vid in sorted(VARIANTS):
        payload = build_variant(vid).decode('latin-1')
        (bad if vid in CORRUPT else good).append((vid, payload))
    return good, bad


def generate_transcripts(out_dir, n_convs, seed=42, rows_per_file=None,
                         corrupt_frac=0.02, long_conv_frac=0.02):
    """Write a deterministic transcripts corpus to ``out_dir``.

    ``rows_per_file=None`` auto-sizes to ~256 files (big corpora must not
    explode into thousands of tiny parquet files — read-task count tracks
    file count).  Returns (n_rows, n_files).
    """
    rng = random.Random(seed)
    good, bad = _payloads()

    conv_ids = []
    turn_idxs = []
    roles = []
    texts = []
    tools = []
    tss = []

    for i in range(n_convs):
        conv_id = "conv-%08d" % i
        if rng.random() < long_conv_frac:
            length = rng.randint(50, 120)   # skew: a few very long convs
        else:
            length = rng.randint(2, 10)
        for t in range(length):
            conv_ids.append(conv_id)
            turn_idxs.append(t)
            role = _ROLES[t % 3]
            roles.append(role)
            if rng.random() < corrupt_frac:
                vid, payload = bad[rng.randrange(len(bad))]
            else:
                vid, payload = good[rng.randrange(len(good))]
            texts.append(payload)
            tools.append("tool-%s" % vid if role == 'tool' else "")
            tss.append(_TS_BASE_US + i * 60_000_000 + t * 1_000_000)

    n = len(conv_ids)
    if rows_per_file is None:
        # ~512 files: enough read→extract task granularity that the actor
        # pool's tail stays balanced, without exploding into tiny files
        rows_per_file = max(1000, -(-n // 512))
    order = list(range(n))
    rng.shuffle(order)  # shuffled row order within the corpus

    os.makedirs(out_dir, exist_ok=True)
    n_files = 0
    for start in range(0, n, rows_per_file):
        idx = order[start:start + rows_per_file]
        tbl = pa.table({
            'conv_id': pa.array([conv_ids[j] for j in idx], pa.string()),
            'turn_idx': pa.array([turn_idxs[j] for j in idx], pa.int32()),
            'role': pa.array([roles[j] for j in idx], pa.string()),
            'text': pa.array([texts[j] for j in idx], pa.string()),
            'tool': pa.array([tools[j] for j in idx], pa.string()),
            'ts': pa.array([tss[j] for j in idx], pa.timestamp('us')),
        })
        pq.write_table(tbl, os.path.join(out_dir, 'part-%05d.parquet' % n_files))
        n_files += 1
    return n, n_files


def corpus_dir_for_sf(sf, base='/tmp/graft_transcripts'):
    """Deterministic corpus location for a scale factor."""
    return os.path.join(base, 'sf%s-v%d' % (sf, POOL_VERSION))


def ensure_corpus(sf, base='/tmp/graft_transcripts', seed=42):
    """Generate (once) and return the transcripts dir for scale factor ``sf``.

    n_convs scales linearly: sf 0.001 → 50 convs (~380 turns),
    sf 0.01 → 500, sf 0.1 → 5000 (~38k turns).

    Generation runs in a SUBPROCESS so the hundreds of MB of intermediate
    Python lists never pollute the caller's heap (the driver process goes
    on to schedule the benchmark — GC pressure there skews timings).
    """
    import subprocess
    import sys
    n_convs = max(20, int(float(sf) * 50000))
    out_dir = corpus_dir_for_sf(sf, base)
    marker = os.path.join(out_dir, '_COMPLETE')
    if not os.path.exists(marker):
        repo_root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        code = ('from engine.rayjob.transcripts import generate_transcripts; '
                'generate_transcripts(%r, %d, seed=%d)' % (out_dir, n_convs, seed))
        subprocess.run([sys.executable, '-c', code], cwd=repo_root, check=True,
                       timeout=1800)
        with open(marker, 'w') as f:
            f.write('%d\n' % n_convs)
    return out_dir
