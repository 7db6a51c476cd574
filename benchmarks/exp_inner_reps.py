"""Measure inner_reps: sweep cost vs extra exact-BCD descent (real TPU).

A: per-sweep wall cost of reps=1/2/4 at the headline dense shape, hybrid
   GS kernels and XLA Gram-blocked sweep.
B: objective-vs-wall-clock on the north-star problem class (exactly
   rank-k X, NNDSVD init, matmul_precision='float32').
"""

import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')


def main():
    import jax
    import jax.numpy as jnp

    from rri_nmf_tpu.ops.sweep_xla import SweepConfig, make_sweep
    from rri_nmf_tpu.ops.dense_pallas import make_dense_phase_sweep_pallas

    # ---------------- A: sweep cost --------------------------------------
    n, d, k = 16384, 8192, 128
    reset_key = jax.random.PRNGKey(0)
    kernels = () if '--b-only' in sys.argv else ('pallas', 'xla')
    for kernel in kernels:
        for reps in (1, 2, 4):
            cfg = SweepConfig(k=k, reset_topic_method=None,
                              update_order='phase', inner_reps=reps)
            sweep = (make_dense_phase_sweep_pallas(cfg) if kernel == 'pallas'
                     else make_sweep(cfg))

            @jax.jit
            def run_n(key, n_timed=20):
                k1, k2, k3, k4 = jax.random.split(key, 4)
                X = jax.random.uniform(k1, (n, d), jnp.float32)
                W = jax.random.uniform(k2, (n, k), jnp.float32)
                T = jax.random.uniform(k3, (k, d), jnp.float32)
                r = jnp.asarray(0, jnp.int32)

                def body(i, c):
                    W, T, key, r = c
                    return sweep(X, W, T, key, r, reset_key)
                W, T, k4, r = jax.lax.fori_loop(0, n_timed, body,
                                                (W, T, k4, r))
                return jnp.sum(W) + jnp.sum(T)

            float(run_n(jax.random.PRNGKey(0)))      # compile+warm
            t0 = time.perf_counter()
            float(run_n(jax.random.PRNGKey(1)))
            dt = (time.perf_counter() - t0) / 20
            print('A kernel=%s reps=%d  %.3f ms/sweep' %
                  (kernel, reps, dt * 1e3), flush=True)

    # ---------------- B: convergence per wall-clock ----------------------
    n, d, k = 32768, 16384, 256
    B = 4096
    nb = n // B

    @jax.jit
    def gen(key):
        k1, k2, _, _ = jax.random.split(key, 4)
        Wg = jax.random.uniform(k1, (n, k), jnp.float32)
        Tg = jax.random.uniform(k2, (k, d), jnp.float32)
        with jax.default_matmul_precision('float32'):
            X = Wg @ Tg
        xsq = jnp.zeros((nb,), jnp.float32)

        def xb(i, xsq):
            Xb = jax.lax.dynamic_slice(X, (i * B, 0), (B, d))
            return xsq.at[i].set(jnp.sum(jnp.sum(Xb * Xb, axis=1)))
        return X, jax.lax.fori_loop(0, nb, xb, xsq)

    X, xsq = gen(jax.random.PRNGKey(0))
    xnorm = float(np.sqrt(np.sum(np.asarray(xsq, np.float64))))

    from rri_nmf_tpu.initialization import initialize_nmf
    with jax.default_matmul_precision('float32'):
        W0, T0 = initialize_nmf(X, k, 'nndsvd', random_state=0,
                                svd_backend='jax')
    W0 = jnp.asarray(W0, jnp.float32)
    T0 = jnp.asarray(T0, jnp.float32)

    for reps in (1, 2, 4):
        cfg = SweepConfig(k=k, reset_topic_method=None,
                          update_order='phase', inner_reps=reps,
                          matmul_precision='float32')
        sweep = make_dense_phase_sweep_pallas(cfg)
        BLOCK = 10

        @jax.jit
        def run_block(X, W, T, key, r):
            def body(i, c):
                W, T, key, r = c
                return sweep(X, W, T, key, r, reset_key)
            W, T, key, r = jax.lax.fori_loop(0, BLOCK, body, (W, T, key, r))

            def err_blk(i, parts):
                Xb = jax.lax.dynamic_slice(X, (i * B, 0), (B, d))
                Wb = jax.lax.dynamic_slice(W, (i * B, 0), (B, k))
                with jax.default_matmul_precision('float32'):
                    Rb = Xb - Wb @ T
                return parts.at[i].set(jnp.sum(jnp.sum(Rb * Rb, axis=1)))
            parts = jax.lax.fori_loop(0, nb, err_blk,
                                      jnp.zeros((nb,), jnp.float32))
            return W, T, key, r, parts

        key = jax.random.PRNGKey(1)
        r = jnp.asarray(0, jnp.int32)
        Wc, Tc, kc, rc, parts = run_block(X, W0, T0, key, r)   # compile
        float(parts[0])
        W, T = W0, T0
        t0 = time.perf_counter()
        sweeps = 0
        for blk in range(60):                       # 600 sweeps max
            W, T, key, r, parts = run_block(X, W, T, key, r)
            rel = float(np.sqrt(np.sum(np.asarray(parts, np.float64)))) \
                / xnorm
            sweeps += BLOCK
            wall = time.perf_counter() - t0
            if blk % 6 == 5 or rel <= 1e-4:
                print('B reps=%d sweeps=%4d wall=%6.2fs rel=%.3e' %
                      (reps, sweeps, wall, rel), flush=True)
            if rel <= 1e-4:
                break


if __name__ == '__main__':
    main()
