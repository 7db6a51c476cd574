"""Round 4: BASELINE #2 at its TARGET shape (VERDICT r3 item 3).

20-Newsgroups-class: 11314 docs × 26214 terms, k=50 (the real 20NG train
split's shape). End-to-end ``NMF_TM_Estimator`` fits on TPU — the
reference-exact default preset AND the fast-TM recipe (phase order +
fused kernels + inner_reps) — with reconstruction/coherence scores and
the reference NumPy loop's per-sweep wall-clock on the SAME data.

Writes benchmarks/results_round4_baseline_tm.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def _numpy_rri_sweep(X, W, T, t_row_sum=1.0):
    """Reference-semantics unweighted RRI sweep: the suite's pinned
    naive-GEMV oracle (tests/test_dense_oracle.py, verified against the
    jitted sweep at 1e-12), run with the TM preset's settings."""
    import importlib.util
    path = os.path.join(os.path.dirname(__file__), '..', 'tests',
                        'test_dense_oracle.py')
    spec = importlib.util.spec_from_file_location('dense_oracle', path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._numpy_dense_sweep(X, W, T, project_T_each_iter=True,
                                  t_row_sum=t_row_sum,
                                  w_row_sum=t_row_sum)


def main():
    import jax
    from rri_nmf_tpu.matrixops import normalize, tfidf
    from rri_nmf_tpu.sklearn_interface import NMF_TM_Estimator
    from run_baselines import _synth_text

    n, d, k = 11314, 26214, 50
    t0 = time.perf_counter()
    counts = _synth_text(n, d, 30, doc_len=120)
    X = np.asarray(normalize(tfidf(counts)), dtype=np.float32)
    gen_s = time.perf_counter() - t0
    print('corpus generated in %.1fs, density %.4f'
          % (gen_s, (X > 0).mean()), flush=True)

    results = {'config': 'baseline2_20ng_class_%dx%d_k%d' % (n, d, k),
               'note': 'synthetic Zipf/Dirichlet corpus at the 20NG train '
                       'split TARGET shape (BASELINE.md #2); real dataset '
                       'unavailable (zero egress)',
               'device': str(jax.devices()[0]),
               'gen_seconds': gen_s}

    def fit_and_score(label, max_iter, **nmf_kwargs):
        est = NMF_TM_Estimator(n, d, k, random_state=0, max_iter=max_iter,
                               nmf_kwargs=nmf_kwargs)
        t0 = time.perf_counter()
        est.fit(X)
        fit_s = time.perf_counter() - t0
        scores = est.score_all(X, X_counts=counts, top_n=8)
        results[label] = {'seconds': fit_s, 'max_iter': max_iter,
                          **{m: float(v) for m, v in scores.items()}}
        print('%s: %.1fs, rel_frob %.4f, coherence %.3f'
              % (label, fit_s, scores['rel_frobenius_error'],
                 scores['umass_coherence']), flush=True)
        return est

    # reference-exact default preset (interleaved + budgeted resets)
    fit_and_score('fit_reference_semantics', 30)
    # the fast-TM recipe (README): phase order, fused kernels, extra
    # exact GS passes per phase
    fit_and_score('fit_fast_recipe', 30, update_order='phase',
                  reset_topic_method=None, inner_reps=3)

    # ---- reference NumPy loop per-sweep on the same data -----------------
    Xd = X.astype(np.float64)
    W0 = np.abs(np.random.RandomState(0).rand(n, k))
    T0 = np.abs(np.random.RandomState(1).rand(k, d))
    T0 /= T0.sum(axis=1, keepdims=True)
    t0 = time.perf_counter()
    _numpy_rri_sweep(Xd, W0.copy(), T0.copy())
    ref_sweep_s = time.perf_counter() - t0
    results['reference_numpy_per_sweep_seconds'] = ref_sweep_s
    results['reference_numpy_estimated_30_iter_seconds'] = ref_sweep_s * 30
    results['speedup_fit_wall_reference_semantics'] = \
        ref_sweep_s * 30 / results['fit_reference_semantics']['seconds']
    results['speedup_fit_wall_fast_recipe'] = \
        ref_sweep_s * 30 / results['fit_fast_recipe']['seconds']
    print('reference: %.1fs/sweep (%.0fx / %.0fx)' % (
        ref_sweep_s, results['speedup_fit_wall_reference_semantics'],
        results['speedup_fit_wall_fast_recipe']), flush=True)

    path = os.path.join(os.path.dirname(__file__),
                        'results_round4_baseline_tm.json')
    with open(path, 'w') as f:
        json.dump(results, f, indent=1)
    print('wrote', path, flush=True)


if __name__ == '__main__':
    main()
