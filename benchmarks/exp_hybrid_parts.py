"""TPU: decompose the hybrid dense sweep (XLA GEMMs + fused GS kernels).

Round-3 finding: at the headline shape the sweep measures ~2.1 ms while
the two-X-read HBM floor is ~1.25 ms (f32), and narrowing X to bf16
changes NOTHING (results_round3_mixed_x.json) — so ~1 ms is something
other than X traffic. This times each piece in isolation: the two X
GEMMs (f32 and bf16-X), the Grams, both GS kernels, and the W
transposes, at 16384x8192 k=128.
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


def timed(label, build):
    fn = jax.jit(build())
    s = float(fn(jax.random.PRNGKey(0)))
    assert np.isfinite(s), label
    t0 = time.perf_counter()
    s = float(fn(jax.random.PRNGKey(1)))
    dt = (time.perf_counter() - t0) / REPS
    print('%-36s %7.3f ms' % (label, dt * 1e3), flush=True)
    return dt * 1e3


def data(key, x_dt=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    X = jax.random.uniform(k1, (n, d), jnp.float32).astype(x_dt)
    W = jax.random.uniform(k2, (n, k), jnp.float32)
    T = jax.random.uniform(k3, (k, d), jnp.float32)
    return X, W, T


def loop(body_of, x_dt=jnp.float32):
    def f(key):
        X, W, T = data(key, x_dt)

        def body(i, carry):
            W, T = carry
            return body_of(X, W, T, i)

        W, T = lax.fori_loop(0, REPS, body, (W, T))
        return jnp.sum(W) + jnp.sum(T)
    return f


def wtx(x_dt, cast):
    def body(X, W, T, i):
        Wx = W.astype(X.dtype) if cast else W
        WX = lax.dot_general(Wx, X, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
        return W, T * 0.999 + 1e-3 * WX
    return lambda: loop(body, x_dt)


def xtt(x_dt, cast):
    def body(X, W, T, i):
        Tx = T.astype(X.dtype) if cast else T
        XTt = lax.dot_general(Tx, X, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
        return W * 0.999 + 1e-3 * XTt.T, T
    return lambda: loop(body, x_dt)


def grams():
    def body(X, W, T, i):
        G1 = jnp.dot(W.T, W, preferred_element_type=jnp.float32)
        G2 = jnp.dot(T, T.T, preferred_element_type=jnp.float32)
        return W * 0.999 + 1e-6 * jnp.sum(G2), \
            T * 0.999 + 1e-6 * jnp.sum(G1)
    return lambda: loop(body)


def transpose_only():
    def body(X, W, T, i):
        Wt = W.T * 0.999
        return Wt.T, T
    return lambda: loop(body)


def gs_t_kernel():
    from rri_nmf_tpu.ops.dense_pallas import _gs_call, _pick_block, BD

    def body(X, W, T, i):
        G = jnp.dot(W.T, W, preferred_element_type=jnp.float32)
        diag = jnp.diagonal(G).reshape(k, 1)
        WX = T * (1.0 + 1e-6 * i)       # stand-in numerator, no X read
        dpad, bd = _pick_block(d, BD, k=k)
        T2 = _gs_call(k, bd, dpad // bd, 0.0, 0.0, float('inf'),
                      jnp.float32, jnp.float32, G, diag, WX, T)
        return W, T2
    return lambda: loop(body)


def gs_w_kernel():
    from rri_nmf_tpu.ops.dense_pallas import _gs_call, _pick_block, BN

    def body(X, W, T, i):
        G2 = jnp.dot(T, T.T, preferred_element_type=jnp.float32)
        diag2 = jnp.diagonal(G2).reshape(k, 1)
        Wt = W.T
        XTt = Wt * (1.0 + 1e-6 * i)     # stand-in numerator, no X read
        npad, bn = _pick_block(n, BN, k=k)
        W2 = _gs_call(k, bn, npad // bn, 0.0, 0.0, float('inf'),
                      jnp.float32, jnp.float32, G2, diag2, XTt, Wt)
        return W2.T, T
    return lambda: loop(body)


def full_sweep():
    from rri_nmf_tpu.ops.dense_pallas import make_dense_phase_sweep_pallas
    from rri_nmf_tpu.ops.sweep_xla import SweepConfig
    cfg = SweepConfig(k=k, reset_topic_method=None, update_order='phase')
    sweep = make_dense_phase_sweep_pallas(cfg)
    rk = jax.random.PRNGKey(0)

    def body(X, W, T, i):
        W, T, _, _ = sweep(X, W, T, rk, jnp.asarray(0, jnp.int32), rk)
        return W, T
    return lambda: loop(body)


if __name__ == '__main__':
    out = {}
    out['full_hybrid_sweep'] = timed('full hybrid sweep', full_sweep())
    out['wtx_f32'] = timed('WtX GEMM f32', wtx(jnp.float32, False)())
    out['wtx_xbf16'] = timed('WtX GEMM bf16-X (cast W)',
                             wtx(jnp.bfloat16, True)())
    out['xtt_f32'] = timed('XTt GEMM f32', xtt(jnp.float32, False)())
    out['xtt_xbf16'] = timed('XTt GEMM bf16-X (cast T)',
                             xtt(jnp.bfloat16, True)())
    out['grams'] = timed('both Grams', grams()())
    out['w_transpose_pair'] = timed('W transpose there+back',
                                    transpose_only()())
    out['gs_t'] = timed('T-phase GS kernel (+Gram)', gs_t_kernel()())
    out['gs_w'] = timed('W-phase GS kernel (+Gram+2T)', gs_w_kernel()())
    print(json.dumps(out))
    Path('benchmarks/results_round3_hybrid_parts.json').write_text(
        json.dumps(out, indent=1))
