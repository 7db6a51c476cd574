"""TPU: tile-size sweep for the dense GS kernels (ROADMAP autotune item).

Times the full hybrid phase sweep at the headline shape for a grid of
(BN, BD) GS-kernel tile sizes by monkeypatching the module constants
(the kernels read them at build time; the builder cache is cleared
between configs).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import rri_nmf_tpu.ops.dense_pallas as dp
    from rri_nmf_tpu.ops.sweep_xla import SweepConfig

    n, d, k = 16384, 8192, 128
    cfg = SweepConfig(k=k, reset_topic_method=None, update_order='phase')
    reset_key = jax.random.PRNGKey(0)

    for BN in (256, 512, 1024):
        for BD in (512, 1024, 2048):
            dp.BN, dp.BD = BN, BD
            dp.make_dense_phase_sweep_pallas.cache_clear()
            sweep = dp.make_dense_phase_sweep_pallas(cfg)

            @jax.jit
            def run_n(key, n_timed=40):
                k1, k2, k3, k4 = jax.random.split(key, 4)
                X = jax.random.uniform(k1, (n, d), jnp.float32)
                W = jax.random.uniform(k2, (n, k), jnp.float32)
                T = jax.random.uniform(k3, (k, d), jnp.float32)
                r = jnp.asarray(0, jnp.int32)

                def body(i, c):
                    W, T, key, r = c
                    return sweep(X, W, T, key, r, reset_key)
                W, T, k4, r = lax.fori_loop(0, 40, body, (W, T, k4, r))
                return jnp.sum(W) + jnp.sum(T)

            try:
                float(run_n(jax.random.PRNGKey(0)))
                t0 = time.perf_counter()
                float(run_n(jax.random.PRNGKey(1)))
                dt = (time.perf_counter() - t0) / 40
                print('BN=%-5d BD=%-5d  %7.3f ms/sweep' % (BN, BD, dt * 1e3),
                      flush=True)
            except Exception as e:
                print('BN=%-5d BD=%-5d  FAILED %s' % (BN, BD, str(e)[:80]),
                      flush=True)


if __name__ == '__main__':
    main()
