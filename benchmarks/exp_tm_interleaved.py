"""TPU: decompose the interleaved TM preset's 145 ms/sweep (ROADMAP #3).

The production TM preset in reference order (interleaved, per-topic
simplex projections, topic resets) measured 145 ms/sweep at 16384x8192
k=128 (results_round3_tm_preset.json) — ~60x the phase-order fused
kernel. Before optimizing, decompose: how much is the reset CHECK
(untaken lax.cond branches / scheduling), how much the per-topic
W-phase GEMV X @ T[t] (inherent to interleaved Gauss-Seidel — T[t]
changes before each W column update), how much the projections?

Configs (all interleaved unless noted):
  A resets on, blockwise scan        (the 145 ms production config)
  B resets on, full-residual form    (reset_blockwise=False)
  C resets OFF                       (isolates the reset check)
  D resets OFF, no projections       (isolates the simplex projections)
  E phase order, resets on           (X-contraction hoisting w/ resets)

ABAB-interleaved min-of-R timing to control tunnel drift.
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
SWEEPS = 20
ROUNDS = 3


def make_runner(sweep, n_sweeps=SWEEPS):
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
    return run


def main():
    from rri_nmf_tpu.ops.sweep_xla import SweepConfig, make_sweep

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    X = jnp.abs(jax.random.uniform(k1, (N, K), jnp.float32) @
                jax.random.uniform(k2, (K, D), jnp.float32))
    kw, kt = jax.random.split(k2)
    W0 = jax.random.uniform(kw, (N, K), jnp.float32)
    W0 = W0 / jnp.sum(W0, axis=1, keepdims=True)
    T0 = jax.random.uniform(kt, (K, D), jnp.float32)
    T0 = T0 / jnp.sum(T0, axis=1, keepdims=True)
    float(jnp.sum(X))

    tm = dict(project_T_each_iter=True, t_row_sum=1.0, w_row_sum=1.0)
    configs = [
        ('A_interleaved_resets_blockwise',
         SweepConfig(k=K, update_order='interleaved',
                     reset_topic_method='max_resid_document',
                     reset_blockwise=True, **tm)),
        ('B_interleaved_resets_full',
         SweepConfig(k=K, update_order='interleaved',
                     reset_topic_method='max_resid_document',
                     reset_blockwise=False, **tm)),
        ('C_interleaved_no_resets',
         SweepConfig(k=K, update_order='interleaved',
                     reset_topic_method=None, **tm)),
        ('D_interleaved_no_resets_no_proj',
         SweepConfig(k=K, update_order='interleaved',
                     reset_topic_method=None)),
        ('E_phase_resets_blockwise',
         SweepConfig(k=K, update_order='phase',
                     reset_topic_method='max_resid_document',
                     reset_blockwise=True, **tm)),
    ]

    runners = []
    for name, cfg in configs:
        runners.append((name, make_runner(make_sweep(cfg))))

    results = {name: [] for name, _ in runners}
    for name, run in runners:              # compile + first timing
        float(run(X, W0, T0))
        t0 = time.perf_counter()
        float(run(X, W0, T0))
        results[name].append((time.perf_counter() - t0) / SWEEPS * 1e3)
        print('%s warm %.2f ms' % (name, results[name][-1]), flush=True)
    for _ in range(ROUNDS - 1):
        for name, run in runners:
            t0 = time.perf_counter()
            float(run(X, W0, T0))
            results[name].append((time.perf_counter() - t0) / SWEEPS * 1e3)

    out = []
    for name, _ in runners:
        ts = results[name]
        rec = {'config': name, 'ms_per_sweep_min': min(ts), 'runs_ms': ts}
        print('%-36s min %8.2f ms  %s'
              % (name, min(ts), ' '.join('%.1f' % t for t in ts)),
              flush=True)
        out.append(rec)

    p = Path(__file__).parent / 'results_round3_tm_interleaved.json'
    p.write_text(json.dumps({
        'shape': [N, D, K], 'dtype': 'float32', 'sweeps_timed': SWEEPS,
        'note': 'interleaved TM preset cost decomposition (ROADMAP #3)',
        'results': out}, indent=1))
    print('wrote', p)


if __name__ == '__main__':
    main()
