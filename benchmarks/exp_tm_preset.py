"""TPU: ms/sweep for the PRODUCTION TM preset at the headline shape
(round-3 VERDICT item 3).

The headline dense number (BENCH_r02: 35.8 TFLOP/s) measures the
resets-off/projection-off phase sweep — a config no estimator runs. This
records what `NMF_TM_Estimator.fit` actually executes (reference preset
``sklearn_interface.py:269-276``: ``project_T_each_iter=True,
t_row_sum=1.0, w_row_sum=1.0``, topic resets on, interleaved order) and
the performance-tuned variants a production TM fit can opt into,
at the headline shape 16384x8192 k=128 f32.

Writes benchmarks/results_round3_tm_preset.json.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

N, D, K = 16384, 8192, 128
SWEEPS = 40


def time_sweeps(sweep, X, W0, T0, n_sweeps=SWEEPS):
    """One jitted fori_loop + a single scalar readback (tunnel-safe)."""
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

    float(run(X, W0, T0))                 # compile + warm
    t0 = time.perf_counter()
    float(run(X, W0, T0))                 # timed: sync via scalar readback
    dt = (time.perf_counter() - t0) / n_sweeps
    return dt


def main():
    from rri_nmf_tpu.ops.sweep_xla import SweepConfig, make_sweep
    from rri_nmf_tpu.ops.dense_pallas import (
        make_dense_phase_sweep_pallas, supports_dense_pallas)

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    X = jnp.abs(jax.random.uniform(k1, (N, K), jnp.float32) @
                jax.random.uniform(k2, (K, D), jnp.float32))
    kw, kt = jax.random.split(k2)
    W0 = jax.random.uniform(kw, (N, K), jnp.float32)
    W0 = W0 / jnp.sum(W0, axis=1, keepdims=True)
    T0 = jax.random.uniform(kt, (K, D), jnp.float32)
    T0 = T0 / jnp.sum(T0, axis=1, keepdims=True)
    float(jnp.sum(X))                     # materialize

    flops_per_sweep = 4.0 * N * D * K     # two GEMM-equivalent phases

    tm = dict(project_T_each_iter=True, t_row_sum=1.0, w_row_sum=1.0)
    configs = [
        ('tm_estimator_default_interleaved_resets',
         SweepConfig(k=K, update_order='interleaved',
                     reset_topic_method='max_resid_document',
                     reset_blockwise=True, **tm)),
        ('tm_phase_no_resets',
         SweepConfig(k=K, update_order='phase', reset_topic_method=None,
                     **tm)),
        ('tm_phase_no_resets_reps4',
         SweepConfig(k=K, update_order='phase', reset_topic_method=None,
                     inner_reps=4, **tm)),
        ('headline_phase_no_projection (context)',
         SweepConfig(k=K, update_order='phase',
                     reset_topic_method=None)),
    ]

    out = []
    for name, cfg in configs:
        if supports_dense_pallas(cfg, d=D):
            sweep = make_dense_phase_sweep_pallas(cfg)
            kernel = 'dense_pallas'
        else:
            sweep = make_sweep(cfg)
            kernel = 'xla'
        print('timing %s (%s kernel) ...' % (name, kernel), flush=True)
        dt = time_sweeps(sweep, X, W0, T0)
        rec = {'config': name, 'kernel': kernel,
               'ms_per_sweep': dt * 1e3,
               'effective_gflops': flops_per_sweep / dt / 1e9,
               'inner_reps': cfg.inner_reps}
        print('  %s' % rec, flush=True)
        out.append(rec)

    p = Path(__file__).parent / 'results_round3_tm_preset.json'
    p.write_text(json.dumps({
        'shape': [N, D, K], 'dtype': 'float32', 'sweeps_timed': SWEEPS,
        'note': ('production TM preset (reference '
                 'sklearn_interface.py:269-276 semantics) vs tuned '
                 'variants at the headline shape; one jitted fori_loop, '
                 'scalar-readback sync'),
        'results': out}, indent=1))
    print('wrote', p)


if __name__ == '__main__':
    main()
