"""Round 4: X-storage-quantization floor probe (pure NumPy float64).

Question raised by the TRUE north-star run
(``results_round4_northstar_full.json``): the 100k x 50k k=256 bf16-X fit
stalls at 3.75e-2 relative error, ~34x the bf16 representation noise
(RMS 2^-9/sqrt(3) ~ 1.1e-3) -- while the identically-generated f32-X run
at the round-3 scaled shape converged to 9e-5. Is the stall caused by X
quantization NOISE deforming the landscape (a plateau tens of times
above the noise floor), or by something TPU/bf16-arithmetic-specific?

This probe removes every arithmetic confound: exact phase-order RRI
(same Gauss-Seidel subproblem semantics as the TPU phase sweep,
reference ``/root/reference/src/rri_nmf/nmf.py:633-734``) in float64
NumPy, on a small exactly-rank-k matrix from the SAME sparse-0.5 U[0,1]
factor class, where only the STORED X is quantized:

- none:   X exactly rank k          (control -- should go to ~1e-12)
- bf16:   X rounded to 8-bit mantissa (the single-chip beyond-HBM mode)
- 12bit:  4 extra mantissa bits     (noise / 16)
- int16:  per-column linear scale j: X ~ s_j * round(X/s_j),
          s_j = colmax/32767        (candidate 2-byte storage mode)

If the stall tracks the injected noise level (~tens of times RMS noise),
the TRUE-shape floor is a property of quantized-data RRI itself, and a
finer 2-byte representation (int16 per-column) buys the corresponding
factor -- motivating ``x_dtype='int16'`` on the TPU path.

Writes benchmarks/results_round4_quant_floor.json.
"""

import json
import os
import time

import numpy as np


def quantize_bits(X, mant_bits):
    """Round to `mant_bits` explicit mantissa bits (bf16 = 8 incl. the
    implicit leading 1 -> 7 stored; numpy trick via frexp)."""
    m, e = np.frexp(X)
    scale = 2.0 ** mant_bits
    return np.ldexp(np.round(m * scale) / scale, e)


def quantize_int16(X):
    s = X.max(axis=0) / 32767.0
    s[s == 0] = 1.0
    return np.round(X / s) * s


def phase_sweep(X, W, T, inner_reps=4):
    """Phase-order Gauss-Seidel RRI sweep (HALS), float64."""
    k = W.shape[1]
    # T phase
    A = W.T @ X                      # (k, d)
    G = W.T @ W
    diag = np.maximum(np.diag(G), 1e-300)
    for _ in range(inner_reps):
        for t in range(k):
            numer = A[t] - G[t] @ T + diag[t] * T[t]
            T[t] = np.maximum(numer, 0.0) / diag[t]
    # W phase
    B = X @ T.T                      # (n, k)
    H = T @ T.T
    diag2 = np.maximum(np.diag(H), 1e-300)
    for _ in range(inner_reps):
        for t in range(k):
            numer = B[:, t] - W @ H[:, t] + diag2[t] * W[:, t]
            W[:, t] = np.maximum(numer, 0.0) / diag2[t]
    return W, T


def run(Xq, W0, T0, label, max_sweeps=4000, plateau_window=400,
        plateau_frac=0.998, check=20):
    W, T = W0.copy(), T0.copy()
    xnorm = np.linalg.norm(Xq)
    best, best_at = np.inf, 0
    hist = []
    t0 = time.perf_counter()
    s = 0
    while s < max_sweeps:
        for _ in range(check):
            W, T = phase_sweep(Xq, W, T)
        s += check
        rel = np.linalg.norm(Xq - W @ T) / xnorm
        hist.append((s, rel))
        if rel < best * plateau_frac:
            best, best_at = min(best, rel), s
        elif s - best_at >= plateau_window:
            break
        if rel < 1e-11:
            break
    best = min(best, rel)
    print('%-8s final=%.3e best=%.3e sweeps=%d (%.0fs)'
          % (label, rel, best, s, time.perf_counter() - t0), flush=True)
    return {'label': label, 'final_rel_err': rel, 'best_rel_err': best,
            'sweeps': s,
            'trajectory': hist[:: max(1, len(hist) // 40)] + hist[-1:]}


def main():
    n, d, k = 3000, 1500, 64
    rng = np.random.RandomState(0)
    Wg = rng.rand(n, k) * (rng.rand(n, k) > 0.5)
    Tg = rng.rand(k, d) * (rng.rand(k, d) > 0.5)
    X = Wg @ Tg

    # NNDSVD-free init: same smart_random class for all runs so only the
    # X representation differs
    W0 = np.abs(rng.randn(n, k)) * np.sqrt(X.mean() / k)
    T0 = np.abs(rng.randn(k, d)) * np.sqrt(X.mean() / k)

    variants = [
        ('none', X, 0.0),
        ('bf16', quantize_bits(X, 8), None),
        ('12bit', quantize_bits(X, 12), None),
        ('int16', quantize_int16(X), None),
    ]
    out = {'shape': [n, d, k], 'factor_class': 'sparse0.5 U[0,1]',
           'note': __doc__.split('\n\n')[1], 'runs': []}
    for label, Xq, _ in variants:
        noise = np.linalg.norm(Xq - X) / np.linalg.norm(X)
        r = run(Xq, W0, T0, label)
        r['x_quant_rel_frob_noise'] = noise
        r['stall_over_noise'] = (r['best_rel_err'] / noise
                                 if noise > 0 else None)
        print('  noise=%.2e stall/noise=%s' % (noise, r['stall_over_noise']),
              flush=True)
        out['runs'].append(r)
        path = os.path.join(os.path.dirname(__file__),
                            'results_round4_quant_floor.json')
        with open(path, 'w') as f:
            json.dump(out, f, indent=1)
    print('wrote results_round4_quant_floor.json', flush=True)


if __name__ == '__main__':
    main()
