"""TPU: masked WRRI sweep in bfloat16 storage — Pallas vs XLA.

Round 1 recorded Mosaic's in-kernel bf16<->f32 conversions as a ~350x slow
path and excluded bf16 from the Pallas auto-selection. Round-2 dense-kernel
experiments could not reproduce that slowness (bf16 casts in-kernel were
free); this re-measures the masked kernels specifically, at MovieLens-1M
scale, so the driver gate can be based on current data.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

n, d, k = 6144, 4096, 40
REPS = 20


def timed(label, sweep, dtype):
    rk = jax.random.PRNGKey(0)

    @jax.jit
    def run(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        X = jax.random.uniform(k1, (n, d), jnp.float32).astype(dtype)
        M = (jax.random.uniform(k2, (n, d), jnp.float32)
             < 0.045).astype(dtype)
        W = jax.random.uniform(k3, (n, k), jnp.float32).astype(dtype)
        T = jax.random.uniform(k4, (k, d), jnp.float32).astype(dtype)
        resets = jnp.asarray(0, jnp.int32)

        def body(i, carry):
            W, T, key, resets = carry
            return sweep(X, W, T, key, resets, rk, M)

        W, T, _, _ = jax.lax.fori_loop(0, REPS, body, (W, T, key, resets))
        return jnp.sum(W.astype(jnp.float32)) + jnp.sum(
            T.astype(jnp.float32))

    s = float(run(jax.random.PRNGKey(0)))
    assert np.isfinite(s), label
    t0 = time.perf_counter()
    s = float(run(jax.random.PRNGKey(1)))
    dt = (time.perf_counter() - t0) / REPS
    print('%-36s %8.3f ms/sweep' % (label, dt * 1e3), flush=True)
    return dt


if __name__ == '__main__':
    from rri_nmf_tpu.ops.sweep_xla import SweepConfig, make_sweep
    from rri_nmf_tpu.ops.sweep_pallas import make_masked_sweep_pallas
    cfg = SweepConfig(k=k, masked=True, reset_topic_method=None,
                      t_row_sum=5.0)
    pls = make_masked_sweep_pallas(cfg)
    xla = make_sweep(cfg)
    timed('Pallas masked f32', pls, jnp.float32)
    timed('Pallas masked bf16', pls, jnp.bfloat16)
    timed('XLA masked f32', xla, jnp.float32)
    timed('XLA masked bf16', xla, jnp.bfloat16)
