"""Round 4: Gram-phase masked sweep on the beyond-HBM record shape.

Same problem as ``exp_masked_sparse_hbm.py`` (100k users x 50k items,
25M observed ratings, k=32 — dense f32 X is 20 GB vs 16 GB HBM), but
driven through ``update_order='phase'`` so the driver routes to the
MXU Gram-phase sweep (``ops/sweep_masked_gram.py``): all O(nnz) work
collapses into four chunked MXU contractions per sweep instead of the
interleaved sweep's 4k O(nnz) gather/segment-sum streams (measured
54.9 s/sweep — ``results_round4_masked_sparse_hbm.json``).

Writes benchmarks/results_round4_masked_gram.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np
import scipy.sparse as sp

from exp_masked_sparse_hbm import synth_rating_triples

INTERLEAVED_PER_SWEEP_S = 54.90  # results_round4_masked_sparse_hbm.json


def main():
    n, d, k = 100_000, 50_000, 32
    n_obs = 25_000_000

    import jax
    dev = jax.devices()[0]
    print('device:', dev, flush=True)

    from rri_nmf_tpu.nmf import nmf

    t0 = time.perf_counter()
    I, J, R = synth_rating_triples(n, d, n_obs)
    X = sp.coo_matrix((R, (I, J)), shape=(n, d)).tocsr()
    M = sp.coo_matrix((np.ones(n_obs), (I, J)), shape=(n, d)).tocsr()
    M.data[:] = 1.0
    gen_s = time.perf_counter() - t0
    print('generated triples + CSR in %.1fs, nnz=%d' % (gen_s, M.nnz),
          flush=True)

    common = dict(W_mat=M, random_state=0, reset_topic_method=None,
                  t_row_sum=5.0, init='random', dtype='float32',
                  early_stop=False, update_order='phase')

    # objective-tracked fit (Gram-identity objective: one C + one Theta
    # contraction per evaluation)
    t0 = time.perf_counter()
    soln = nmf(X, k, max_iter=10, compute_obj_each_iter=True, **common)
    fit_s = time.perf_counter() - t0
    oh = soln['obj_history']
    W, T = soln['W'], soln['T']
    print('fit: %.1fs, obj %.4g -> %.4g' % (fit_s, oh[0], oh[-1]),
          flush=True)

    # per-sweep rate without objective work, warm-started
    soln2 = nmf(X, k, max_iter=6, W_in=W, T_in=T, **common)
    stamps = soln2['iter_cputime']
    per_sweep = (stamps[-1] - stamps[0]) / (len(stamps) - 1)
    cold_s = float(stamps[0])
    print('per-sweep %.3fs (first-dispatch %.1fs)'
          % (per_sweep, cold_s), flush=True)

    # observed-entry RMSE, chunked gather on host
    W2 = np.asarray(soln2['W'])
    T2 = np.asarray(soln2['T'])
    pred = np.empty(n_obs)
    for lo in range(0, n_obs, 2_000_000):
        hi = min(lo + 2_000_000, n_obs)
        pred[lo:hi] = np.einsum('qk,kq->q', W2[I[lo:hi]], T2[:, J[lo:hi]])
    rmse = float(np.sqrt(np.mean((np.clip(pred, 1, 5) - R) ** 2)))
    print('train RMSE %.4f' % rmse, flush=True)

    out = {
        'config': 'masked_gram_%dx%d_%dobs_k%d' % (n, d, n_obs, k),
        'note': 'Gram-phase masked sweep (MXU chunk contractions) on the '
                'beyond-HBM recommender shape; same data/settings as '
                'results_round4_masked_sparse_hbm.json apart from the '
                'update order (phase vs interleaved).',
        'device': str(dev),
        'nnz': int(M.nnz),
        'gen_seconds': gen_s,
        'fit_10_sweeps_with_objective_seconds': fit_s,
        'obj_history': [float(v) for v in oh],
        'monotone': bool(np.all(np.diff(oh) <= 0)),
        'per_sweep_seconds': per_sweep,
        'cold_start_seconds': cold_s,
        'train_rmse_clipped': rmse,
        'interleaved_per_sweep_seconds': INTERLEAVED_PER_SWEEP_S,
        'speedup_vs_interleaved': INTERLEAVED_PER_SWEEP_S / per_sweep,
    }
    path = os.path.join(os.path.dirname(__file__),
                        'results_round4_masked_gram.json')
    with open(path, 'w') as f:
        json.dump(out, f, indent=1)
    print('wrote', path, flush=True)


if __name__ == '__main__':
    main()
