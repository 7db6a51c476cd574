"""Round 4: BASELINE #2 at its TARGET shape (VERDICT r3 item 3).

20-Newsgroups-class: 11,314 docs x 26,214 words (the real 20NG train
split's shape), k=50, synthetic Zipf/Dirichlet corpus (zero egress —
BASELINE.md "Dataset stand-ins"). End-to-end ``NMF_TM_Estimator`` fits
on the TPU with (a) the reference-faithful default preset and (b) the
fast-TM recipe (phase order + inner_reps, no resets), plus the
reference's per-topic NumPy loop (TM semantics: Duchi simplex projection
on each T row, reference nmf.py:442-452/633-747) timed on the SAME data
for the wall-clock comparison.

Writes benchmarks/results_round4_baseline_tm.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np

from run_baselines import _synth_text

EPS = float(np.spacing(10))


def _proj_simplex(v, s=1.0):
    u = np.sort(v)[::-1]
    css = np.cumsum(u)
    rho = np.nonzero(u * np.arange(1, v.size + 1) > (css - s))[0][-1]
    theta = (css[rho] - s) / (rho + 1.0)
    return np.clip(v - theta, 0, None)


def _numpy_tm_sweep(X, W, T):
    """Reference TM-preset sweep: interleaved per-topic GEMVs, T rows
    projected to the simplex (project_T_each_iter + t_row_sum=1), W
    update bounded by w_row_sum=1 (reference nmf.py:633-747)."""
    k = W.shape[1]
    for t in range(k):
        w = W[:, t]
        wX = w @ X
        wW = w @ W
        wW[t] = 0.0
        wR = wX - wW @ T
        nw = w @ w
        x = np.maximum(wR, 0.0) / (nw + EPS)
        T[t, :] = _proj_simplex(x, 1.0)
        trow = T[t]
        Xt = X @ trow
        Tt = T @ trow
        Tt[t] = 0.0
        Rt = Xt - W @ Tt
        nt = trow @ trow
        W[:, t] = np.minimum(np.maximum(Rt, 0.0) / (nt + EPS), 1.0)
    return W, T


def main():
    n_docs, n_words, k = 11_314, 26_214, 50

    import jax
    import jax.numpy as jnp
    dev = jax.devices()[0]
    print('device:', dev, flush=True)

    from rri_nmf_tpu.matrixops import normalize, tfidf
    from rri_nmf_tpu.metrics import (frobenius_relative_error,
                                     umass_coherence)
    from rri_nmf_tpu.sklearn_interface import NMF_TM_Estimator

    t0 = time.perf_counter()
    counts = _synth_text(n_docs, n_words, 30, doc_len=120)
    Xn = np.asarray(normalize(tfidf(counts)), np.float32)
    gen_s = time.perf_counter() - t0
    print('corpus gen + tfidf in %.1fs' % gen_s, flush=True)

    # one upload (~45 MB/s tunnel); both fits consume the device array
    t0 = time.perf_counter()
    Xd = jax.device_put(Xn)
    float(jnp.sum(Xd[0]))
    up_s = time.perf_counter() - t0
    print('upload %.1fs (%.0f MB)' % (up_s, Xn.nbytes / 1e6), flush=True)

    def fit(label, max_iter, **nmf_kwargs):
        est = NMF_TM_Estimator(n_docs, n_words, k, random_state=0,
                               max_iter=max_iter,
                               nmf_kwargs=dict(nmf_kwargs))
        t0 = time.perf_counter()
        est.fit(Xd)
        wall = time.perf_counter() - t0
        stamps = est.nmf_outputs['iter_cputime']
        per_sweep = (stamps[-1] - stamps[0]) / max(len(stamps) - 1, 1)
        W = np.asarray(est.W, np.float64)
        T = np.asarray(est.T, np.float64)
        err = float(frobenius_relative_error(Xn.astype(np.float64), W, T))
        coh = float(umass_coherence(counts, T, top_n=8))
        print('%s: wall %.1fs, %.1f ms/sweep, rel err %.4f, '
              'coherence %.3f' % (label, wall, 1e3 * per_sweep, err, coh),
              flush=True)
        return {'label': label, 'max_iter': max_iter,
                'wall_seconds': wall,
                'per_sweep_seconds': per_sweep,
                'cold_start_seconds': float(stamps[0]),
                'rel_frob_err': err, 'umass_coherence': coh,
                'nmf_kwargs': {k_: str(v) for k_, v in
                               nmf_kwargs.items()}}, W, T

    default_run, _, _ = fit('default_preset', 60)
    fast_run, _, _ = fit('fast_tm_recipe', 60, update_order='phase',
                         reset_topic_method=None, inner_reps=3)

    # reference NumPy loop on the same data (2 sweeps, extrapolated)
    from rri_nmf_tpu.initialization import initialize_nmf
    W0, T0 = (np.asarray(a, np.float64)
              for a in initialize_nmf(Xn.astype(np.float64), k, 'nndsvd',
                                      random_state=0))
    Wr, Tr = W0.copy(), T0.copy()
    n_ref = 2
    t0 = time.perf_counter()
    for _ in range(n_ref):
        Wr, Tr = _numpy_tm_sweep(Xn.astype(np.float64), Wr, Tr)
    ref_per_sweep = (time.perf_counter() - t0) / n_ref
    print('reference numpy TM sweep: %.1f s/sweep' % ref_per_sweep,
          flush=True)

    out = {
        'config': 'baseline_tm_target_%dx%d_k%d' % (n_docs, n_words, k),
        'note': 'BASELINE #2 at the real 20NG train-split shape; '
                'synthetic Zipf/Dirichlet corpus (no egress). '
                'Coherence characterizes the synthetic corpus only.',
        'device': str(dev),
        'gen_seconds': gen_s,
        'upload_seconds': up_s,
        'default_preset': default_run,
        'fast_tm_recipe': fast_run,
        'reference_numpy_per_sweep_seconds': ref_per_sweep,
        'speedup_default_per_sweep':
            ref_per_sweep / default_run['per_sweep_seconds'],
        'speedup_fast_per_sweep':
            ref_per_sweep / fast_run['per_sweep_seconds'],
    }
    path = os.path.join(os.path.dirname(__file__),
                        'results_round4_baseline_tm.json')
    with open(path, 'w') as f:
        json.dump(out, f, indent=1)
    print('wrote', path, flush=True)


if __name__ == '__main__':
    main()
