"""TPU: mixed storage (x_dtype='bfloat16', f32 factors) dense sweep.

The dense phase sweep's traffic floor is the two X GEMMs; storing X in
bf16 halves those bytes while the GS kernels keep full f32 factor tiles
(round 2 measured the ALL-bf16 mode slower: narrow factor tiles force an
f32 scratch + casts in the kernels). Records ms/sweep for f32, mixed,
and all-bf16 storage through both the hybrid Pallas path and the XLA
Gram-blocked sweep at the headline shape.

Writes benchmarks/results_round3_mixed_x.json.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

n, d, k = 16384, 8192, 128
REPS = 40


def timed(label, sweep, x_dt, f_dt):
    rk = jax.random.PRNGKey(0)

    @jax.jit
    def run(key):
        k1, k2, k3 = jax.random.split(key, 3)
        X = jax.random.uniform(k1, (n, d), jnp.float32).astype(x_dt)
        W = jax.random.uniform(k2, (n, k), jnp.float32).astype(f_dt)
        T = jax.random.uniform(k3, (k, d), jnp.float32).astype(f_dt)
        resets = jnp.asarray(0, jnp.int32)

        def body(i, carry):
            W, T, key, resets = carry
            return sweep(X, W, T, key, resets, rk)

        W, T, _, _ = jax.lax.fori_loop(
            0, REPS, body, (W, T, jax.random.PRNGKey(1), resets))
        return jnp.sum(W.astype(jnp.float32)) + jnp.sum(
            T.astype(jnp.float32))

    s = float(run(jax.random.PRNGKey(0)))
    assert np.isfinite(s), label
    t0 = time.perf_counter()
    s = float(run(jax.random.PRNGKey(1)))
    dt = (time.perf_counter() - t0) / REPS
    gfl = 4.0 * n * d * k / dt / 1e9
    print('%-40s %7.3f ms/sweep  (%8.0f GFLOP/s eff)' %
          (label, dt * 1e3, gfl), flush=True)
    return {'ms_per_sweep': dt * 1e3, 'gflops_effective': gfl}


if __name__ == '__main__':
    from rri_nmf_tpu.ops.dense_pallas import make_dense_phase_sweep_pallas
    from rri_nmf_tpu.ops.sweep_xla import SweepConfig, make_sweep

    cfg = SweepConfig(k=k, reset_topic_method=None, update_order='phase')
    pls = make_dense_phase_sweep_pallas(cfg)
    xla = make_sweep(cfg)
    out = {'shape': [n, d, k], 'sweeps_timed': REPS, 'results': {}}
    f32, bf16 = jnp.float32, jnp.bfloat16
    for name, sweep, x_dt, f_dt in [
            ('pallas_f32', pls, f32, f32),
            ('pallas_mixed_xbf16', pls, bf16, f32),
            ('pallas_all_bf16', pls, bf16, bf16),
            ('xla_f32', xla, f32, f32),
            ('xla_mixed_xbf16', xla, bf16, f32)]:
        out['results'][name] = timed(name, sweep, x_dt, f_dt)
    print(json.dumps(out))
    Path('benchmarks/results_round3_mixed_x.json').write_text(
        json.dumps(out, indent=1))
