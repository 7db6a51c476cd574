"""Round 4: per-iteration cost of early stopping over the TPU tunnel
(VERDICT r3 item 4's recorded before/after).

MovieLens-class dense masked fit (6144×4096, 1M observed, k=40) with
validation early stopping, three scorer variants:

- ``none``        — no early stopping (the sweep-rate floor);
- ``device``      — the new transfer-free path: device-side snapshots +
                    a ``device_ok`` scorer (O(q·k) on device, one scalar
                    host readback per iteration);
- ``host``        — a plain callable: the driver gathers W and T to host
                    per iteration (the reference contract). The OLD code
                    additionally gathered a W/T snapshot pair per
                    iteration, so its cost is ``none + 2·(host − none)``
                    to first order.

Writes benchmarks/results_round4_es_transfer.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from rri_nmf_tpu.nmf import nmf
    from run_baselines import _synth_ratings

    n, d, k, n_obs = 6144, 4096, 40, 1_000_000
    X = _synth_ratings(n, d, n_obs, 8)
    M = (X > 0).astype(float)
    iters = 12

    # validation triples (5%) for the scorers
    I, J = X.nonzero()
    rng = np.random.RandomState(0)
    val = rng.rand(I.shape[0]) < 0.05
    Iv, Jv, Rv = I[val], J[val], X[I[val], J[val]]
    Iv_d, Jv_d = jnp.asarray(Iv), jnp.asarray(Jv)
    Rv_d = jnp.asarray(Rv, dtype=jnp.float32)

    state = {'n': 0}

    def dev_scorer(X_, W, T):
        state['n'] += 1
        pred = jnp.clip(jnp.sum(W[Iv_d] * T[:, Jv_d].T, axis=1), 1.0, 5.0)
        rmse = float(jnp.sqrt(jnp.mean((pred - Rv_d) ** 2)))
        del rmse
        return -float(state['n'])   # strictly decreasing: never stops

    dev_scorer.device_ok = True

    def host_scorer(X_, W, T):
        state['n'] += 1
        pred = np.clip(np.einsum('qk,kq->q', np.asarray(W)[Iv],
                                 np.asarray(T)[:, Jv]), 1.0, 5.0)
        rmse = float(np.sqrt(np.mean((pred - Rv) ** 2)))
        del rmse
        return -float(state['n'])

    common = dict(W_mat=M, random_state=0, reset_topic_method=None,
                  t_row_sum=5.0, init='random', dtype='float32',
                  max_iter=iters)

    results = {}
    for label, es in (('none', False), ('device', dev_scorer),
                      ('host', host_scorer)):
        state['n'] = 0
        nmf(X, k, early_stop=es, **common)              # warm compile
        t0 = time.perf_counter()
        soln = nmf(X, k, early_stop=es, **common)
        wall = time.perf_counter() - t0
        stamps = soln['iter_cputime']
        per_iter = (stamps[-1] - stamps[1]) / (len(stamps) - 2)
        results[label] = {'wall_seconds': wall,
                          'per_iteration_seconds': per_iter,
                          'iterations': len(stamps)}
        print('%s: %.1fs wall, %.1f ms/iter' % (label, wall,
                                                1e3 * per_iter), flush=True)

    base = results['none']['per_iteration_seconds']
    dev_tax = results['device']['per_iteration_seconds'] - base
    host_tax = results['host']['per_iteration_seconds'] - base
    out = {
        'config': 'es_transfer_%dx%d_%dobs_k%d' % (n, d, n_obs, k),
        'note': 'per-iteration early-stopping cost over the tunnel; the '
                'pre-round-4 code paid the host-scorer gather PLUS an '
                'equal per-iteration snapshot gather pair '
                '(nmf.py:1172-1173,1343-1344 in VERDICT r3)',
        'device': str(jax.devices()[0]),
        'variants': results,
        'device_scorer_tax_seconds_per_iter': dev_tax,
        'host_scorer_tax_seconds_per_iter': host_tax,
        'old_path_estimated_tax_seconds_per_iter': 2 * host_tax,
        'tax_ratio_host_over_device': (host_tax / dev_tax
                                       if dev_tax > 0 else None),
    }
    path = os.path.join(os.path.dirname(__file__),
                        'results_round4_es_transfer.json')
    with open(path, 'w') as f:
        json.dump(out, f, indent=1)
    print('wrote', path, flush=True)


if __name__ == '__main__':
    main()
