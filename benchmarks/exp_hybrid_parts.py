"""TPU: decompose the hybrid dense sweep (XLA GEMMs + fused GS kernels).

Round-3 finding: at the headline shape the sweep measures ~2.0 ms while
the two-X-read HBM floor is ~1.25 ms (f32), and narrowing X to bf16
changes NOTHING (results_round3_mixed_x.json) — so ~0.7 ms is something
other than X traffic. Isolated-GEMM timing proved misleading (an
isolated `WᵀX` loop measures MORE than the entire sweep — XLA layouts
differ), so this brackets the parts IN SITU:

- ``fix_W`` sweep  = WᵀX GEMM + Gram + T-phase GS kernel
- ``fix_T`` sweep  = XTᵀ GEMM + Gram + W-phase GS kernel + transposes
- ``inner_reps`` slope = one extra in-kernel GS pass over both phases
  (the GEMMs are paid once regardless), isolating the serialized
  topic-loop cost.

Writes benchmarks/results_round3_hybrid_parts.json.
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


def timed(label, sweep, x_dt=jnp.float32):
    rk = jax.random.PRNGKey(0)

    @jax.jit
    def run(key):
        k1, k2, k3 = jax.random.split(key, 3)
        X = jax.random.uniform(k1, (n, d), jnp.float32).astype(x_dt)
        W = jax.random.uniform(k2, (n, k), jnp.float32)
        T = jax.random.uniform(k3, (k, d), jnp.float32)

        def body(i, carry):
            W, T, key, resets = carry
            return sweep(X, W, T, key, resets, rk)

        W, T, _, _ = lax.fori_loop(
            0, REPS, body,
            (W, T, jax.random.PRNGKey(1), jnp.asarray(0, jnp.int32)))
        return jnp.sum(W) + jnp.sum(T)

    s = float(run(jax.random.PRNGKey(0)))
    assert np.isfinite(s), label
    t0 = time.perf_counter()
    s = float(run(jax.random.PRNGKey(1)))
    dt = (time.perf_counter() - t0) / REPS
    print('%-44s %7.3f ms' % (label, dt * 1e3), flush=True)
    return dt * 1e3


def make(reps=1, fix=None):
    from rri_nmf_tpu.ops.dense_pallas import make_dense_phase_sweep_pallas
    from rri_nmf_tpu.ops.sweep_xla import SweepConfig
    kw = {}
    if fix == 'T':
        kw['fix_T'] = True
    if fix == 'W':
        kw['fix_W'] = True
    cfg = SweepConfig(k=k, reset_topic_method=None, update_order='phase',
                      inner_reps=reps, **kw)
    return make_dense_phase_sweep_pallas(cfg)


if __name__ == '__main__':
    out = {}
    out['full_r1'] = timed('full hybrid sweep (reps=1)', make(1))
    out['full_r2'] = timed('full hybrid sweep (reps=2)', make(2))
    out['full_r3'] = timed('full hybrid sweep (reps=3)', make(3))
    out['t_phase_only'] = timed('T-phase only (fix_W): WtX+Gram+GS',
                                make(1, fix='W'))
    out['w_phase_only'] = timed('W-phase only (fix_T): XTt+Gram+GS+T',
                                make(1, fix='T'))
    out['gs_pass_ms'] = (out['full_r3'] - out['full_r1']) / 2
    out['gemm_rest_ms'] = out['full_r1'] - 2 * out['gs_pass_ms']
    print('  -> one extra GS pass (both phases): %.3f ms'
          % out['gs_pass_ms'])
    print('  -> GEMMs + fixed overhead: %.3f ms' % out['gemm_rest_ms'])
    print(json.dumps(out))
    Path('benchmarks/results_round3_hybrid_parts.json').write_text(
        json.dumps(out, indent=1))
