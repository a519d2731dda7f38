"""Reduction-factor quality sweep: overfit-train one small Tacotron-2 per
``n_frames_per_step = r`` on the real reference utterance, measure
DTW-aligned MCD / mel-SNR / mel-MAE against the ground-truth mel, and apply
the ``choose_reduction_factor`` gate (VERDICT r2 next-round #8).

r > 1 decodes r frames per sequential step (decode latency ÷ r — the
reference declares the hparam but its r>1 path is broken); the gate keeps
the trade honest: a larger r is accepted only when its MCD penalty vs the
r=1 baseline stays under the threshold.

Each r runs in its OWN subprocess (fresh jax, CPU-pinned — the demo is
CPU-friendly) so singleton model state and compile caches can't leak
between configurations.

Usage: python benchmarks/r_quality_sweep.py [--epochs 50] [--rs 1,2,3]
       [--max-penalty-db 0.5]
"""

import os
import sys
import json
import argparse
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO = os.path.join(REPO, 'examples', 'overfit_single_utterance.py')


def run_one(r, epochs, out_root):
    env = dict(os.environ, JAX_PLATFORMS = 'cpu')
    env.pop('PALLAS_AXON_POOL_IPS', None)
    proc = subprocess.run(
        [sys.executable, DEMO, str(epochs),
         os.path.join(out_root, 'r{}'.format(r)), str(r)],
        capture_output = True, text = True, env = env, timeout = 1800,
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith('METRICS '):
            return json.loads(line[len('METRICS '):])
    raise RuntimeError('r={} run produced no METRICS line:\n{}\n{}'.format(
        r, proc.stdout[-2000:], proc.stderr[-2000:]))


def main(argv = None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--epochs', type = int, default = 50)
    parser.add_argument('--rs', default = '1,2,3')
    parser.add_argument('--max-penalty-db', type = float, default = 0.5)
    parser.add_argument('--out', default = '/tmp/r_quality_sweep')
    args = parser.parse_args(argv)

    rs = [int(r) for r in args.rs.split(',')]
    results = {}
    for r in rs:
        print('== r = {} ({} epochs) =='.format(r, args.epochs), flush = True)
        results[r] = run_one(r, args.epochs, args.out)
        print('   MCD {:.2f} dB | mel SNR {:.1f} dB | MAE {:.3f} | '
              '{} frames ({} sequential steps)'.format(
                  results[r]['mcd_db'], results[r]['mel_snr_db'],
                  results[r]['mel_mae'], results[r]['frames'],
                  -(-results[r]['frames'] // r)), flush = True)

    sys.path.insert(0, REPO)
    chosen = None
    if 1 in results:
        from text_to_speech_tpu.train.metrics import choose_reduction_factor
        chosen = choose_reduction_factor(
            results, max_mcd_penalty_db = args.max_penalty_db)

    print('\n| r | MCD (dB) | penalty | mel SNR (dB) | mel MAE | seq steps |')
    print('|---|---|---|---|---|---|')
    base = results[rs[0]]['mcd_db'] if 1 not in results else results[1]['mcd_db']
    for r in rs:
        m = results[r]
        print('| {} | {:.2f} | {:+.2f} | {:.1f} | {:.3f} | {} |'.format(
            r, m['mcd_db'], m['mcd_db'] - base, m['mel_snr_db'],
            m['mel_mae'], -(-m['frames'] // r)))
    print('\ngate (max MCD penalty {} dB) selects r = {}'.format(
        args.max_penalty_db, chosen))
    print(json.dumps({'results': results, 'chosen_r': chosen}))
    return results, chosen


if __name__ == '__main__':
    main()
