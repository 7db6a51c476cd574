"""TPU: can the fused projected T-phase kernel cover k=256, d=16384?

The TM-projection kernel holds the whole (k, dpad) numerator + factor
panels VMEM-resident (no column blocking: the simplex threshold couples
all d columns of a row). The shipped budget (28 MB) excludes the scaled
north-star TM shape (32768x16384 k=256: 3 panels x 16 MB = 48 MB), which
therefore falls back to the XLA Gram-blocked sweep with its ~27 us/row
serialized projections. v5e VMEM is 128 MB and the GS kernels already run
with a 100 MB scoped limit — this measures whether the 48 MB-resident
kernel compiles and how it compares to the XLA fallback, to decide the
production budget.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

N, D, K = 32768, 16384, 256
SWEEPS = 20


def time_sweeps(sweep, X, W0, T0, n_sweeps=SWEEPS):
    rk = jax.random.PRNGKey(0)

    @jax.jit
    def run(X, W, T):
        def body(i, c):
            W, T, key, resets = c
            return sweep(X, W, T, key, resets, rk)
        W, T, _, _ = jax.lax.fori_loop(
            0, n_sweeps, body,
            (W, T, jax.random.PRNGKey(1), jnp.asarray(23, jnp.int32)))
        return jnp.sum(W) + jnp.sum(T)

    float(run(X, W0, T0))
    t0 = time.perf_counter()
    float(run(X, W0, T0))
    return (time.perf_counter() - t0) / n_sweeps


def main():
    import rri_nmf_tpu.ops.dense_pallas as dp
    from rri_nmf_tpu.ops.sweep_xla import SweepConfig, make_sweep

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    X = jnp.abs(jax.random.uniform(k1, (N, K), jnp.float32) @
                jax.random.uniform(k2, (K, D), jnp.float32))
    kw, kt = jax.random.split(k2)
    W0 = jax.random.uniform(kw, (N, K), jnp.float32)
    T0 = jax.random.uniform(kt, (K, D), jnp.float32)
    print('data ready', flush=True)

    cfg = SweepConfig(k=K, reset_topic_method=None, update_order='phase',
                      project_T_each_iter=True, t_row_sum=1.0,
                      w_row_sum=1.0, project_W_each_iter=True)
    flops = 4 * N * D * K
    out = {'shape': [N, D, K], 'results': []}

    dt = time_sweeps(make_sweep(cfg), X, W0, T0)
    print('XLA fallback: %.2f ms/sweep (%.0f GFLOP/s)'
          % (dt * 1e3, flops / dt / 1e9), flush=True)
    out['results'].append({'config': 'xla_fallback',
                           'ms_per_sweep': dt * 1e3,
                           'effective_gflops': flops / dt / 1e9})

    if not dp.tm_proj_fits(K, D):
        # the probe that originally set the production 64 MB budget
        dp.TM_PROJ_VMEM_BUDGET = 64 * 2**20
    assert dp.tm_proj_fits(K, D)
    try:
        dt = time_sweeps(dp.make_dense_phase_sweep_pallas(cfg), X, W0, T0)
        print('TM-proj kernel (64MB budget): %.2f ms/sweep (%.0f GFLOP/s)'
              % (dt * 1e3, flops / dt / 1e9), flush=True)
        out['results'].append({'config': 'tm_proj_64mb',
                               'ms_per_sweep': dt * 1e3,
                               'effective_gflops': flops / dt / 1e9})
    except Exception as e:
        print('TM-proj kernel FAILED: %s' % str(e)[:400], flush=True)
        out['results'].append({'config': 'tm_proj_64mb',
                               'error': str(e)[:400]})
    print(json.dumps(out))
    Path('benchmarks/results_round3_tm_k256.json').write_text(
        json.dumps(out, indent=1))


if __name__ == '__main__':
    main()
