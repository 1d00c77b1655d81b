"""Interleaved scaling A/B harness.

Host throughput drifts ±15-20% over minutes (shared KVM), so single
8-vs-32 pairs are meaningless.  This tool runs fresh-process bench.py
children in an INTERLEAVED order (config × cpus), repeats, and reports
per-config median throughput per leg plus the efficiency of medians.

    python tools/scaling_ab.py --reps 2 --mult 48 --configs base,sct1

Configs:
  base   — current defaults (prestart off, arrow pinned, Stage B pinned)
  sct1   — base + GRAFT_STAGEA_SCT=1 (Stage-A-only server-call thread trim)
  pin    — base + GRAFT_PIN_CPUS=1 (children pinned to num_cpus cores)
"""

import argparse
import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
BENCH = os.path.join(os.path.dirname(HERE), 'bench.py')

CONFIG_ENVS = {
    'base': {'GRAFT_PIN_CPUS': '0'},
    'sct1': {'GRAFT_PIN_CPUS': '0', 'GRAFT_STAGEA_SCT': '1'},
    'pin': {'GRAFT_PIN_CPUS': '1'},
    'pin_sct1': {'GRAFT_PIN_CPUS': '1', 'GRAFT_STAGEA_SCT': '1'},
}


def run_child(cpus, cfg_env, mult):
    env = dict(os.environ)
    env.update(cfg_env)
    env['GRAFT_SCALING_SF_MULT'] = str(mult)
    proc = subprocess.run(
        [sys.executable, BENCH, '--child', str(cpus)],
        capture_output=True, text=True, timeout=3600, env=env,
        cwd=os.path.dirname(BENCH))
    lines = [l for l in proc.stdout.splitlines()
             if l.startswith('CHILD_RESULT ')]
    if not lines:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
        raise RuntimeError('no child result (cpus=%d)' % cpus)
    return json.loads(lines[-1][len('CHILD_RESULT '):])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--reps', type=int, default=2)
    ap.add_argument('--mult', type=int, default=48)
    ap.add_argument('--configs', default='base,sct1')
    args = ap.parse_args()
    configs = args.configs.split(',')

    results = {c: {8: [], 32: []} for c in configs}
    # interleave: rep0 forward, rep1 reversed — first-order drift cancels
    legs = [(c, n) for c in configs for n in (8, 32)]
    for rep in range(args.reps):
        order = legs if rep % 2 == 0 else list(reversed(legs))
        for cfg, cpus in order:
            r = run_child(cpus, CONFIG_ENVS[cfg], args.mult)
            tps = r['turns_per_sec']
            results[cfg][cpus].append(round(tps, 1))
            print(json.dumps({'rep': rep, 'config': cfg, 'cpus': cpus,
                              'turns_per_sec': round(tps, 1),
                              'stage_a_s': r['stage_a_s'],
                              'stage_b_s': r['stage_b_s'],
                              'wall_s': round(r['wall_s'], 1)}), flush=True)

    print('--- summary ---')
    for cfg in configs:
        t8 = statistics.median(results[cfg][8])
        t32 = statistics.median(results[cfg][32])
        print(json.dumps({
            'config': cfg,
            't8_med': t8, 't8_all': results[cfg][8],
            't32_med': t32, 't32_all': results[cfg][32],
            'efficiency_of_medians': round((t32 / t8) / 4.0, 4),
        }))


if __name__ == '__main__':
    main()
