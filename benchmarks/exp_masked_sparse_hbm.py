"""Round 4: beyond-HBM sparse-mask WRRI fit record (VERDICT r3 item 1
done-criterion: "a fit at a shape whose dense n×d exceeds HBM").

Shape: 100k users × 50k items — the dense float32 X alone is 20 GB
against the chip's 16 GB HBM, and the dense masked path needs X + mask +
residual (60 GB). The O(nnz) path holds ~6×nnz floats: at 25M observed
ratings that is ~600 MB.

Writes benchmarks/results_round4_masked_sparse_hbm.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np
import scipy.sparse as sp


def synth_rating_triples(n, d, n_obs, k_true=8, seed=0):
    """MovieLens-like triples without ever materializing (n, d): low-rank
    preference scores gathered at sampled coordinates (sampling WITH
    replacement — see CLAUDE.md; scipy CSR canonicalization sums the few
    duplicates, same as the dense scatter)."""
    rng = np.random.RandomState(seed)
    U = rng.rand(n, k_true)
    V = rng.rand(k_true, d)
    I = rng.randint(0, n, n_obs)
    J = rng.randint(0, d, n_obs)
    s = np.einsum('qk,kq->q', U[I], V[:, J])
    s = 1 + 4 * (s - s.min()) / (s.max() - s.min())
    R = np.clip(np.round(s + 0.5 * rng.randn(n_obs)), 1, 5)
    return I, J, R


def main():
    n, d, k = 100_000, 50_000, 32
    n_obs = 25_000_000

    import jax
    import jax.numpy as jnp
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
                  early_stop=False)

    # objective-tracked fit (per-sweep O(nnz k) objective included)
    t0 = time.perf_counter()
    soln = nmf(X, k, max_iter=10, compute_obj_each_iter=True, **common)
    fit_s = time.perf_counter() - t0
    oh = soln['obj_history']
    W, T = soln['W'], soln['T']
    print('fit: %.1fs, obj %.4g -> %.4g' % (fit_s, oh[0], oh[-1]),
          flush=True)

    # per-sweep rate without objective work: per-iteration dispatch
    # stamps from a warm-started short fit (ONE extra program — the
    # earlier grouped-dispatch differencing compiled three, which
    # tripped a TPU-worker crash at this scale)
    soln2 = nmf(X, k, max_iter=6, W_in=W, T_in=T, **common)
    stamps = soln2['iter_cputime']
    per_sweep = (stamps[-1] - stamps[0]) / (len(stamps) - 1)
    cold_s = float(stamps[0])
    print('per-sweep %.3fs (first-dispatch %.1fs)'
          % (per_sweep, cold_s), flush=True)

    # observed-entry RMSE, gathered host-side in chunks (never n×d)
    W2 = np.asarray(soln2['W'])
    T2 = np.asarray(soln2['T'])
    pred = np.empty(n_obs)
    for lo in range(0, n_obs, 2_000_000):
        hi = min(lo + 2_000_000, n_obs)
        pred[lo:hi] = np.einsum('qk,kq->q', W2[I[lo:hi]], T2[:, J[lo:hi]])
    rmse = float(np.sqrt(np.mean((np.clip(pred, 1, 5) - R) ** 2)))
    print('train RMSE %.4f' % rmse, flush=True)

    out = {
        'config': 'masked_sparse_hbm_%dx%d_%dobs_k%d' % (n, d, n_obs, k),
        'note': 'sparse-mask WRRI (O(nnz)) at a shape whose dense n*d '
                'exceeds single-chip HBM: dense f32 X alone is 20 GB vs '
                '16 GB HBM (TPU v5e); dense masked path needs X+mask+'
                'residual (~60 GB). Synthetic MovieLens-like ratings.',
        'device': str(dev),
        'dense_x_bytes': n * d * 4,
        'hbm_bytes': int(16e9),
        'nnz': int(M.nnz),
        'plan_bytes_approx': int(M.nnz * 16),
        'gen_seconds': gen_s,
        'fit_10_sweeps_with_objective_seconds': fit_s,
        'obj_history': [float(v) for v in oh],
        'monotone': bool(np.all(np.diff(oh) <= 0)),
        'per_sweep_seconds': per_sweep,
        'cold_start_seconds': cold_s,
        'train_rmse_clipped': rmse,
    }
    path = os.path.join(os.path.dirname(__file__),
                        'results_round4_masked_sparse_hbm.json')
    with open(path, 'w') as f:
        json.dump(out, f, indent=1)
    print('wrote', path, flush=True)


if __name__ == '__main__':
    main()
