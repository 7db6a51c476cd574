"""Round-5 user-level record: a full `nmf()` WRRI fit at the record
shape, k=128, with live objective tracking.

Everything goes through the public driver — scipy X + scipy W_mat in,
`update_order='phase'`: the driver auto-picks the Gram path, the VMEM
row cap picks 10-topic panels, and `compute_obj_each_iter=True` runs
the panel-tiled Gram objective each sweep. This is the fit a user
writes, not a raw-kernel measurement (the raw numbers live in
results_round5_masked.json).

Writes benchmarks/results_round5_fit.json. Run on the real TPU:
    python benchmarks/exp_round5_fit.py
"""

import json
import time
from pathlib import Path

import numpy as np

from exp_round5_masked import build_problem


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument('--k', type=int, default=128)
    ap.add_argument('--sweeps', type=int, default=10)
    ap.add_argument('--out', default='results_round5_fit.json')
    args = ap.parse_args()

    import jax

    from rri_nmf_tpu.nmf import nmf

    assert jax.default_backend() == 'tpu', jax.default_backend()
    n, d, nnz = 100_000, 50_000, 25_000_000
    k, sweeps = args.k, args.sweeps
    out = Path(__file__).parent / args.out
    results = {'shape': [n, d], 'k': k, 'nnz': nnz, 'sweeps': sweeps}

    X, M = build_problem(n, d, nnz)
    t0 = time.perf_counter()
    soln = nmf(X, k, W_mat=M, update_order='phase',
               reset_topic_method=None, max_iter=sweeps,
               compute_obj_each_iter=True, early_stop=False,
               init='random', random_state=0, dtype=np.float32,
               max_time=7200)
    results['fit_wall_s'] = round(time.perf_counter() - t0, 1)
    oh = [float(v) for v in soln['obj_history']]
    results['obj_history'] = oh
    # tolerate f32 accumulation jitter near a plateau (~1 ulp of the
    # objective scale); strict <= 0 would flag true descent as broken
    results['monotone'] = bool(np.all(
        np.diff(oh) <= 1e-7 * abs(oh[0])))
    stamps = soln['iter_cputime']
    results['per_sweep_s'] = round(
        (stamps[-1] - stamps[0]) / max(len(stamps) - 1, 1), 3)
    # train RMSE over the observed set, computed on host in blocks
    W = np.asarray(soln['W'], np.float32)
    T = np.asarray(soln['T'], np.float32)
    Xc = X.tocoo()
    se = 0.0
    for lo in range(0, Xc.nnz, 5_000_000):
        hi = min(lo + 5_000_000, Xc.nnz)
        pred = np.einsum('ij,ij->i', W[Xc.row[lo:hi]],
                         T[:, Xc.col[lo:hi]].T)
        se += float(((Xc.data[lo:hi] - pred) ** 2).sum())
    results['train_rmse'] = round(float(np.sqrt(se / Xc.nnz)), 4)
    print(json.dumps(results, indent=1))
    out.write_text(json.dumps(results, indent=1))


if __name__ == '__main__':
    main()
