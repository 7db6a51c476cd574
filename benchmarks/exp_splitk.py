"""TPU: split-K formulations of the sweep's two X GEMMs.

exp_hybrid_parts.py showed the hybrid sweep's cost is the two X GEMMs
themselves (~1.1 ms each = ~470 GB/s of X, well under the ~800 GB/s HBM
peak; the GS loops are 0.15 ms). Hypothesis: with only k=128 output
rows, the single long reduction (n or d = 8-16k) limits pipeline
parallelism. Split-K reshapes the contraction into S batched partials +
a final (k, d) sum, giving XLA S-way parallelism.

Writes benchmarks/results_round3_splitk.json.
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


def timed(label, fn, x_dt=jnp.float32):
    @jax.jit
    def run(key):
        k1, k2, k3 = jax.random.split(key, 3)
        X = jax.random.uniform(k1, (n, d), jnp.float32).astype(x_dt)
        W = jax.random.uniform(k2, (n, k), jnp.float32)
        T = jax.random.uniform(k3, (k, d), jnp.float32)

        def body(i, carry):
            W, T = carry
            return fn(X, W, T)

        W, T = lax.fori_loop(0, REPS, body, (W, T))
        return jnp.sum(W) + jnp.sum(T)

    s = float(run(jax.random.PRNGKey(0)))
    assert np.isfinite(s), label
    t0 = time.perf_counter()
    s = float(run(jax.random.PRNGKey(1)))
    dt = (time.perf_counter() - t0) / REPS
    print('%-46s %7.3f ms' % (label, dt * 1e3), flush=True)
    return dt * 1e3


def feed_t(WX, W, T):
    return W, T * 0.999 + 1e-9 * WX


def feed_w(XTt, W, T):
    return W * 0.999 + 1e-9 * XTt.T, T


def wtx_plain(X, W, T):
    WX = lax.dot_general(W, X, (((0,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    return feed_t(WX, W, T)


def make_wtx_split(S):
    def f(X, W, T):
        Xs = X.reshape(S, n // S, d)
        Ws = W.reshape(S, n // S, k)
        # batched (k, d) partials over the S chunks of the n-reduction
        P = lax.dot_general(Ws, Xs, (((1,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
        return feed_t(jnp.sum(P, axis=0), W, T)
    return f


def xtt_plain(X, W, T):
    XTt = lax.dot_general(T, X, (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32)
    return feed_w(XTt, W, T)


def make_xtt_split(S):
    def f(X, W, T):
        Xs = X.reshape(n, S, d // S)
        Ts = T.reshape(k, S, d // S)
        P = lax.dot_general(Ts, Xs, (((2,), (2,)), ((1,), (1,))),
                            preferred_element_type=jnp.float32)  # (S, k, n)
        return feed_w(jnp.sum(P, axis=0), W, T)
    return f


if __name__ == '__main__':
    out = {}
    out['wtx_plain'] = timed('WtX plain dot', wtx_plain)
    for S in (2, 4, 8, 16):
        out['wtx_split%d' % S] = timed('WtX split-K S=%d' % S,
                                       make_wtx_split(S))
    out['xtt_plain'] = timed('XTt plain dot', xtt_plain)
    for S in (2, 4, 8, 16):
        out['xtt_split%d' % S] = timed('XTt split-K S=%d' % S,
                                       make_xtt_split(S))
    # bf16-X variants of the best structure are checked in a second pass
    # once the f32 winner is known (kept cheap: one extra compile each)
    out['wtx_plain_xbf16'] = timed('WtX plain dot bf16-X',
                                   lambda X, W, T: feed_t(
                                       lax.dot_general(
                                           W.astype(X.dtype), X,
                                           (((0,), (0,)), ((), ())),
                                           preferred_element_type=jnp
                                           .float32), W, T),
                                   x_dt=jnp.bfloat16)
    out['xtt_plain_xbf16'] = timed('XTt plain dot bf16-X',
                                   lambda X, W, T: feed_w(
                                       lax.dot_general(
                                           T.astype(X.dtype), X,
                                           (((1,), (1,)), ((), ())),
                                           preferred_element_type=jnp
                                           .float32), W, T),
                                   x_dt=jnp.bfloat16)
    print(json.dumps(out))
    Path('benchmarks/results_round3_splitk.json').write_text(
        json.dumps(out, indent=1))
