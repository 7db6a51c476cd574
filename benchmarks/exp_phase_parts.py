"""TPU experiment: where does the phase sweep's time go?

Times (a) the irreducible GEMM floor (WᵀX, XTᵀ, both Grams), (b) the
Gram-blocked phase sweep, (c) a T-phase-only and W-phase-only split, at the
headline bench config. One jitted fori_loop per measurement, scalar
readback sync (tunnel rules).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

n, d, k = 16384, 8192, 128
REPS = 8


def timed(make_fn, label):
    fn = jax.jit(make_fn())
    key = jax.random.PRNGKey(0)
    s = float(fn(key))            # compile + warm
    assert np.isfinite(s)
    t0 = time.perf_counter()
    s = float(fn(jax.random.PRNGKey(1)))
    dt = (time.perf_counter() - t0) / REPS
    print('%-28s %7.3f ms  (%6.1f GFLOP/s eff 4ndk)'
          % (label, dt * 1e3, 4.0 * n * d * k / dt / 1e9), flush=True)
    return dt


def data(key):
    k1, k2, k3 = jax.random.split(key, 3)
    X = jax.random.uniform(k1, (n, d), jnp.float32)
    W = jax.random.uniform(k2, (n, k), jnp.float32)
    T = jax.random.uniform(k3, (k, d), jnp.float32)
    return X, W, T


def gemm_floor():
    def f(key):
        X, W, T = data(key)

        def body(i, carry):
            W, T = carry
            WX = jnp.dot(W.T, X)            # (k, d)
            G1 = jnp.dot(W.T, W)
            T = jnp.maximum(WX - G1 @ T, 0.0) * 1e-3 + T * 0.999
            XT = jnp.dot(X, T.T)            # (n, k)
            G2 = jnp.dot(T, T.T)
            W = jnp.maximum(XT - W @ G2, 0.0) * 1e-3 + W * 0.999
            return W, T

        W, T = jax.lax.fori_loop(0, REPS, body, (data(key)[1:]))
        return jnp.sum(W) + jnp.sum(T)
    return f


def sweep_fn(order, fix=None):
    from rri_nmf_tpu.ops.sweep_xla import SweepConfig, make_sweep
    kw = {}
    if fix == 'T':
        kw['fix_T'] = True
    if fix == 'W':
        kw['fix_W'] = True
    cfg = SweepConfig(k=k, reset_topic_method=None, update_order=order, **kw)
    sweep = make_sweep(cfg)
    rk = jax.random.PRNGKey(0)

    def f(key):
        X, W, T = data(key)
        resets = jnp.asarray(0, jnp.int32)

        def body(i, carry):
            W, T, key, resets = carry
            return sweep(X, W, T, key, resets, rk)

        W, T, _, _ = jax.lax.fori_loop(0, REPS, body,
                                       (W, T, key, resets))
        return jnp.sum(W) + jnp.sum(T)
    return lambda: f


if __name__ == '__main__':
    timed(gemm_floor, 'GEMM floor (4 GEMMs/iter)')
    timed(sweep_fn('phase'), 'phase blocked (full)')
    timed(sweep_fn('phase', fix='W'), 'phase blocked T-phase only')
    timed(sweep_fn('phase', fix='T'), 'phase blocked W-phase only')
    timed(sweep_fn('interleaved'), 'interleaved (reference order)')
