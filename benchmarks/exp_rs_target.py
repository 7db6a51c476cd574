"""Round 4: BASELINE #3 at its TARGET shape (VERDICT r3 item 3).

MovieLens-1M-class: 6040 users × 3952 items, 1M observed ratings, k=40.
End-to-end ``NMF_RS_Estimator`` fits with the current fast paths (fused
masked Pallas sweep, device-side early stopping, gather predict), the
HER-accelerated variant, the fused fix_T transform, and the reference
NumPy loop's per-sweep wall-clock on the SAME data.

Writes benchmarks/results_round4_baseline_rs.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='results_round4_baseline_rs.json',
                    help='output JSON filename (under benchmarks/)')
    args = ap.parse_args()
    import jax
    from rri_nmf_tpu.sklearn_interface import NMF_RS_Estimator
    from run_baselines import _numpy_masked_sweep, _synth_ratings

    n, d, k, n_obs = 6040, 3952, 40, 1_000_000
    X = _synth_ratings(n, d, n_obs, 8)
    I, J = X.nonzero()
    R = X[I, J]
    pairs = np.stack([I, J], axis=1)
    # 90/10 train/test split over observations
    rng = np.random.RandomState(1)
    test = rng.rand(len(R)) < 0.1
    tr, te = ~test, test

    results = {'config': 'baseline3_movielens_class_%dx%d_%dobs_k%d'
                         % (n, d, n_obs, k),
               'note': 'synthetic MovieLens-1M stand-in at the TARGET '
                       'shape (BASELINE.md #3); real dataset unavailable '
                       '(zero egress)',
               'device': str(jax.devices()[0]),
               'n_train_obs': int(tr.sum()), 'n_test_obs': int(te.sum())}

    # ---- end-to-end estimator fit (early stopping on) -------------------
    # Run twice: the first fit pays every jit compile over the (slow) axon
    # tunnel; the second reuses the in-process jit cache and reflects the
    # steady-state cost a user's repeated fits see.
    fit_s = {}
    for tag in ('cold', 'warm'):
        est = NMF_RS_Estimator(n, d, k, random_state=0, max_iter=30)
        t0 = time.perf_counter()
        est.fit(pairs[tr], R[tr])
        fit_s[tag] = time.perf_counter() - t0
    iters = len(est.nmf_outputs['obj_history'])
    train_rmse = est.score(pairs[tr], R[tr])
    test_rmse = est.score(pairs[te], R[te])
    results['fit'] = {'seconds': fit_s['warm'],
                      'seconds_cold_compile': fit_s['cold'],
                      'iterations': iters,
                      'train_rmse': float(train_rmse),
                      'test_rmse': float(test_rmse)}
    print('fit: %.1fs warm (%.1fs cold) / %d iters, train %.4f test %.4f'
          % (fit_s['warm'], fit_s['cold'], iters, train_rmse, test_rmse),
          flush=True)

    # The validation early stopping above is reference semantics (stop at
    # the FIRST validation uptick, nmf.py:381-403) and fires within a
    # couple of sweeps on this synthetic class — faithful, but it leaves
    # the sweep machinery unmeasured. The fixed-sweep fits below carry
    # the wall-clock story.

    def timed_fit(label, **est_kw):
        e = NMF_RS_Estimator(n, d, k, random_state=0, max_iter=30,
                             use_validation_early_stopping=False,
                             **est_kw)
        t0 = time.perf_counter()
        e.fit(pairs[tr], R[tr])
        wall = time.perf_counter() - t0
        stamps = e.nmf_outputs['iter_cputime']
        per_sweep = (stamps[-1] - stamps[0]) / max(len(stamps) - 1, 1)
        out = {'seconds': wall,
               'iterations': len(stamps) - 1,
               'per_sweep_seconds': per_sweep,
               'train_rmse': float(e.score(pairs[tr], R[tr])),
               'test_rmse': float(e.score(pairs[te], R[te]))}
        print('%s: %.1fs (%.0f ms/sweep), train %.4f test %.4f'
              % (label, wall, 1e3 * per_sweep, out['train_rmse'],
                 out['test_rmse']), flush=True)
        return out

    results['fit_30_sweeps'] = timed_fit('fit_30')
    results['fit_30_her'] = timed_fit('fit_30_her',
                                      nmf_kwargs=dict(accel='her'))
    # the Gram-phase recipe (sparse_obs routes the observed set through
    # the MXU Gram sweep; phase order, exact same subproblems)
    results['fit_30_gram_phase'] = timed_fit(
        'fit_30_gram', sparse_obs=True,
        nmf_kwargs=dict(update_order='phase'))

    # ---- transform (fused fix_T masked inference) on the test slice -----
    Xte = np.zeros((n, d))
    Xte[I[te], J[te]] = R[te]
    est.transform(Xte[:512])                       # warm the 512-row jit
    t0 = time.perf_counter()
    W_new = est.transform(Xte[:512])
    tr_s = time.perf_counter() - t0
    results['transform_512_rows_seconds'] = tr_s
    assert np.isfinite(W_new).all()
    print('transform(512 rows): %.2fs' % tr_s, flush=True)

    # the VERDICT r5 done-criterion comparator: the equivalent 4-sweep
    # fixed-T fit a user would write themselves on the SAME 512 rows —
    # transform's exact preset (fresh masked init, 'random' resets, the
    # reference's transform kwargs) through nmf() directly, so the delta
    # is purely the estimator wrapper + indicator-mask build
    import scipy.sparse as _sp

    from rri_nmf_tpu.nmf import nmf as _nmf
    Xte_sp = _sp.csr_matrix(Xte[:512])
    Mte_sp = _sp.csr_matrix(
        (np.ones_like(Xte_sp.data), Xte_sp.indices, Xte_sp.indptr),
        shape=Xte_sp.shape)
    eq_kw = dict(W_mat=Mte_sp, fix_T=True, T_in=est.T, max_iter=4,
                 max_time=7200, t_row_sum=1.0,
                 reset_topic_method='random', random_state=0)
    _nmf(Xte[:512], k, **eq_kw)  # warm the jits
    t0 = time.perf_counter()
    _nmf(Xte[:512], k, **eq_kw)
    eq_s = time.perf_counter() - t0
    results['equiv_fixT_4sweep_fit_512_rows_seconds'] = eq_s
    results['transform_vs_equiv_fit_x'] = tr_s / eq_s
    print('equivalent 4-sweep fixed-T fit(512 rows): %.2fs -> '
          'transform is %.2fx it' % (eq_s, tr_s / eq_s), flush=True)

    # ---- reference NumPy loop on the same data ---------------------------
    Xtr = np.zeros((n, d))
    Xtr[I[tr], J[tr]] = R[tr]
    M = (Xtr > 0).astype(float)
    W0 = np.abs(np.random.RandomState(0).rand(n, k))
    T0 = np.abs(np.random.RandomState(1).rand(k, d))
    t0 = time.perf_counter()
    _numpy_masked_sweep(Xtr, M, W0.copy(), T0.copy(), t_row_sum=5.0)
    ref_sweep_s = time.perf_counter() - t0
    results['reference_numpy_per_sweep_seconds'] = ref_sweep_s
    results['reference_numpy_estimated_fit_seconds'] = ref_sweep_s * iters
    results['speedup_fit_wall'] = ref_sweep_s * iters / fit_s['warm']
    results['speedup_per_sweep_fixed_30'] = (
        ref_sweep_s / results['fit_30_sweeps']['per_sweep_seconds'])
    print('reference: %.1fs/sweep -> est. %.0fs for %d iters '
          '(%.0fx fit wall, %.0fx per sweep)'
          % (ref_sweep_s, ref_sweep_s * iters, iters,
             results['speedup_fit_wall'],
             results['speedup_per_sweep_fixed_30']), flush=True)

    path = os.path.join(os.path.dirname(__file__), args.out)
    with open(path, 'w') as f:
        json.dump(results, f, indent=1)
    print('wrote', path, flush=True)


if __name__ == '__main__':
    main()
