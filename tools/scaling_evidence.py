"""THE scaling-evidence session: interleaved Ray vs zero-Ray legs.

Runs, in one session on one host, repeated interleaved legs of:
  ray8  — bench.py --child 8   (7 extract actors,  fresh Ray, fresh proc)
  ray32 — bench.py --child 32  (28 extract actors, fresh Ray, fresh proc)
  mp7   — mp_control.py 7-wide  (zero Ray, same read→extract→spill work)
  mp28  — mp_control.py 28-wide

and reports medians, per-worker rates, the Ray scaling efficiency, the
multiprocessing scaling efficiency, and their ratio.  If mp shows the
same 7→28 per-worker drop as Ray, the width penalty is the host
(shared-KVM contention), measured — not argued.

    python tools/scaling_evidence.py --reps 3 --mult 48
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def ray_leg(cpus, mult):
    env = dict(os.environ)
    env['GRAFT_SCALING_SF_MULT'] = str(mult)
    env.setdefault('GRAFT_PIN_CPUS', '0')
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, 'bench.py'), '--child', str(cpus)],
        capture_output=True, text=True, timeout=3600, env=env, cwd=ROOT)
    lines = [l for l in proc.stdout.splitlines()
             if l.startswith('CHILD_RESULT ')]
    if not lines:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
        raise RuntimeError('ray leg %d failed' % cpus)
    r = json.loads(lines[-1][len('CHILD_RESULT '):])
    actors = cpus * 7 // 8
    return {'leg': 'ray%d' % cpus, 'rows_per_sec': r['turns_per_sec'],
            'stage_a_s': r['stage_a_s'], 'stage_b_s': r['stage_b_s'],
            'rows': r['rows'],
            'stage_a_rows_per_sec_per_actor':
                round(r['rows'] / r['stage_a_s'] / actors, 1)}


def mp_leg(width, corpus):
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, 'mp_control.py'),
         '--corpus', corpus, '--widths', str(width), '--reps', '1'],
        capture_output=True, text=True, timeout=3600, cwd=ROOT)
    lines = [l for l in proc.stdout.splitlines() if l.startswith('{"rep"')]
    if not lines:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
        raise RuntimeError('mp leg %d failed' % width)
    r = json.loads(lines[-1])
    return {'leg': 'mp%d' % width, 'rows_per_sec': r['rows_per_sec'],
            'rows_per_sec_per_proc': r['rows_per_sec_per_proc']}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reps', type=int, default=3)
    ap.add_argument('--mult', type=int, default=48)
    ap.add_argument('--corpus', default=None)
    args = ap.parse_args()
    corpus = args.corpus or '/tmp/graft_transcripts/sf%g-v3' % (0.1 * args.mult)

    legs = [('ray8', lambda: ray_leg(8, args.mult)),
            ('ray32', lambda: ray_leg(32, args.mult)),
            ('mp7', lambda: mp_leg(7, corpus)),
            ('mp28', lambda: mp_leg(28, corpus))]
    res = {name: [] for name, _ in legs}
    t_start = time.time()
    for rep in range(args.reps):
        order = legs if rep % 2 == 0 else list(reversed(legs))
        for name, fn in order:
            r = fn()
            res[name].append(r)
            print(json.dumps({'rep': rep, 't': round(time.time() - t_start),
                              **r}), flush=True)

    med = {name: statistics.median(r['rows_per_sec'] for r in rs)
           for name, rs in res.items()}
    ray_eff = (med['ray32'] / med['ray8']) / 4.0
    mp_eff = (med['mp28'] / med['mp7']) / 4.0
    ray_pa = [statistics.median(r['stage_a_rows_per_sec_per_actor']
                                for r in res[k]) for k in ('ray8', 'ray32')]
    mp_pp = [statistics.median(r['rows_per_sec_per_proc']
                               for r in res[k]) for k in ('mp7', 'mp28')]
    print('--- summary ---')
    print(json.dumps({
        'medians_rows_per_sec': med,
        'ray_scaling_efficiency': round(ray_eff, 4),
        'mp_scaling_efficiency_zero_ray': round(mp_eff, 4),
        'ray_per_actor_stage_a': ray_pa,
        'ray_per_actor_width_retention': round(ray_pa[1] / ray_pa[0], 4),
        'mp_per_proc': mp_pp,
        'mp_per_proc_width_retention': round(mp_pp[1] / mp_pp[0], 4),
        'session_minutes': round((time.time() - t_start) / 60, 1),
    }))


if __name__ == '__main__':
    main()
