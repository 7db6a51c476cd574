"""TPU: confirm the WtX split-K win with interleaved ABAB repeats.

exp_splitk.py measured plain WtX at 1.31 ms vs split-K S=4 at 0.98 —
but single-shot timings on the tunnel-hosted chip drift ±10%, so this
re-times the candidates interleaved (A B A B ...) in one process.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

n, d, k = 16384, 8192, 128
REPS = 40


def build(fn):
    @jax.jit
    def run(key):
        k1, k2, k3 = jax.random.split(key, 3)
        X = jax.random.uniform(k1, (n, d), jnp.float32)
        W = jax.random.uniform(k2, (n, k), jnp.float32)
        T = jax.random.uniform(k3, (k, d), jnp.float32)

        def body(i, carry):
            W, T = carry
            return fn(X, W, T)

        W, T = lax.fori_loop(0, REPS, body, (W, T))
        return jnp.sum(W) + jnp.sum(T)
    return run


def wtx_plain(X, W, T):
    WX = lax.dot_general(W, X, (((0,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    return W, T * 0.999 + 1e-9 * WX


def make_wtx_split(S):
    def f(X, W, T):
        Xs = X.reshape(S, n // S, d)
        Ws = W.reshape(S, n // S, k)
        P = lax.dot_general(Ws, Xs, (((1,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
        return W, T * 0.999 + 1e-9 * jnp.sum(P, axis=0)
    return f


if __name__ == '__main__':
    cands = {'plain': build(wtx_plain),
             'split2': build(make_wtx_split(2)),
             'split4': build(make_wtx_split(4))}
    for name, run in cands.items():   # compile + warm
        assert np.isfinite(float(run(jax.random.PRNGKey(0)))), name
    acc = {name: [] for name in cands}
    for rep in range(4):
        for name, run in cands.items():
            t0 = time.perf_counter()
            float(run(jax.random.PRNGKey(rep + 1)))
            acc[name].append((time.perf_counter() - t0) / REPS * 1e3)
    out = {}
    for name, ts in acc.items():
        out[name] = {'ms_min': min(ts), 'ms_all': ts}
        print('%-8s min %.3f ms  all %s' %
              (name, min(ts), ['%.3f' % t for t in ts]), flush=True)
    print(json.dumps(out))
    Path('benchmarks/results_round3_splitk2.json').write_text(
        json.dumps(out, indent=1))
