"""TPU timing: fused dense phase Pallas sweep vs XLA Gram-blocked sweep."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

n, d, k = 16384, 8192, 128
REPS = 16


def timed(label, sweep):
    rk = jax.random.PRNGKey(0)

    @jax.jit
    def run(key):
        k1, k2, k3 = jax.random.split(key, 3)
        X = jax.random.uniform(k1, (n, d), jnp.float32)
        W = jax.random.uniform(k2, (n, k), jnp.float32)
        T = jax.random.uniform(k3, (k, d), jnp.float32)
        resets = jnp.asarray(0, jnp.int32)

        def body(i, carry):
            W, T, key, resets = carry
            return sweep(X, W, T, key, resets, rk)

        W, T, _, _ = jax.lax.fori_loop(0, REPS, body, (W, T, key, resets))
        return jnp.sum(W) + jnp.sum(T)

    s = float(run(jax.random.PRNGKey(0)))
    assert np.isfinite(s), label
    t0 = time.perf_counter()
    s = float(run(jax.random.PRNGKey(1)))
    dt = (time.perf_counter() - t0) / REPS
    print('%-30s %7.3f ms  %8.1f GFLOP/s (4ndk)' %
          (label, dt * 1e3, 4.0 * n * d * k / dt / 1e9), flush=True)


if __name__ == '__main__':
    from rri_nmf_tpu.ops.sweep_xla import SweepConfig, make_sweep
    from rri_nmf_tpu.ops.dense_pallas import make_dense_phase_sweep_pallas
    cfg = SweepConfig(k=k, reset_topic_method=None, update_order='phase')
    timed('dense Pallas fused phases', make_dense_phase_sweep_pallas(cfg))
    timed('XLA Gram-blocked phase', make_sweep(cfg))
