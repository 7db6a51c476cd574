"""TPU: is 1e-4 relative Frobenius error reachable, and on what data?

RRI/HALS converges to the global minimum (0) on exactly-rank-k data, but
the RATE depends on the conditioning of the true factors. Dense U[0,1]
factors make X nearly rank-1-dominated (tail singular values tiny), and
the error stalls around 3e-3 after thousands of sweeps regardless of
solver. This probes sparser, better-conditioned true factors (each factor
entry zeroed w.p. p) at matmul_precision='float32', printing the error
trajectory.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

n, d, k = 8192, 4096, 64
BLOCK = 50


def probe(sparsity, max_sweeps=2000, tol=1e-4, init='nndsvd'):
    from rri_nmf_tpu.ops.sweep_xla import SweepConfig, make_sweep
    from rri_nmf_tpu.initialization import initialize_nmf

    cfg = SweepConfig(k=k, reset_topic_method=None, update_order='phase',
                      matmul_precision='float32')
    sweep = make_sweep(cfg)
    rk = jax.random.PRNGKey(0)

    @jax.jit
    def gen(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        Wg = jax.random.uniform(k1, (n, k), jnp.float32)
        Tg = jax.random.uniform(k2, (k, d), jnp.float32)
        Wg = Wg * (jax.random.uniform(k3, (n, k)) > sparsity)
        Tg = Tg * (jax.random.uniform(k4, (k, d)) > sparsity)
        with jax.default_matmul_precision('float32'):
            X = Wg @ Tg
        return X

    @jax.jit
    def run_block(X, W, T, key, resets):
        def body(i, c):
            W, T, key, resets = c
            return sweep(X, W, T, key, resets, rk)
        W, T, key, resets = jax.lax.fori_loop(0, BLOCK, body,
                                              (W, T, key, resets))
        B = 2048

        def err_blk(i, parts):
            Xb = jax.lax.dynamic_slice(X, (i * B, 0), (B, d))
            Wb = jax.lax.dynamic_slice(W, (i * B, 0), (B, k))
            with jax.default_matmul_precision('float32'):
                Rb = Xb - Wb @ T
            return parts.at[i].set(jnp.sum(jnp.sum(Rb * Rb, axis=1)))
        parts = jax.lax.fori_loop(0, n // B, err_blk,
                                  jnp.zeros((n // B,), jnp.float32))
        return W, T, key, resets, parts

    X = gen(jax.random.PRNGKey(0))
    xnorm = float(jnp.linalg.norm(X.astype(jnp.float32)))
    with jax.default_matmul_precision('float32'):
        W0, T0 = initialize_nmf(X, k, init, random_state=0,
                                svd_backend='jax')
    W = jnp.asarray(W0, jnp.float32)
    T = jnp.asarray(T0, jnp.float32)
    key = jax.random.PRNGKey(1)
    resets = jnp.asarray(0, jnp.int32)
    W, T, key, resets, parts = run_block(X, W, T, key, resets)  # compile
    t0 = time.perf_counter()
    sweeps = 0
    rel = np.inf
    while rel > tol and sweeps < max_sweeps:
        W, T, key, resets, parts = run_block(X, W, T, key, resets)
        rel = float(np.sqrt(np.sum(np.asarray(parts, np.float64)))) / xnorm
        sweeps += BLOCK
        if sweeps % 200 == 0 or rel <= tol:
            print('  sparsity=%.1f sweeps=%4d rel=%.2e (%.1fs)' %
                  (sparsity, sweeps, rel, time.perf_counter() - t0),
                  flush=True)
    print('sparsity=%.1f FINAL rel=%.3e sweeps=%d wall=%.1fs reached=%s' %
          (sparsity, rel, sweeps, time.perf_counter() - t0, rel <= tol),
          flush=True)


if __name__ == '__main__':
    for sp in (0.5, 0.7, 0.9):
        probe(sp)
