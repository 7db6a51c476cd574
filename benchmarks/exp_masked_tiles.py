"""TPU: masked-kernel tile-size scan (ROADMAP #6's open note).

The masked streaming kernels shipped with fixed (512, 1024) tiles; the
dense GS kernels later measured large wins from growing tiles to the
largest divisor block within a VMEM budget (fewer Mosaic grid steps).
This scans (bn, bd) combinations at MovieLens-1M class scale so the
adaptive ``_pick_tiles`` policy in ``ops/sweep_pallas.py`` is grounded
in current hardware data rather than the round-1 coarse scan.
"""
import json
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
    from rri_nmf_tpu.ops.sweep_pallas import (
        _pick_tiles, make_masked_sweep_pallas)
    from rri_nmf_tpu.ops.sweep_xla import SweepConfig
    cfg = SweepConfig(k=k, masked=True, reset_topic_method=None,
                      t_row_sum=5.0)
    results = {}
    combos = [(512, 1024), (512, 2048), (512, 4096),
              (1024, 1024), (1024, 2048), (1024, 4096),
              (1536, 1024), (1536, 2048), (1536, 4096),
              (2048, 1024), (2048, 2048),
              (3072, 1024), (3072, 2048)]
    for bn, bd in combos:
        sweep = make_masked_sweep_pallas(cfg, tiles=(bn, bd))
        try:
            results['%dx%d' % (bn, bd)] = timed(
                'masked f32 tiles %dx%d' % (bn, bd), sweep, jnp.float32)
        except Exception as e:  # VMEM overflow etc. — record and move on
            print('tiles %dx%d FAILED: %s' % (bn, bd, str(e)[:120]),
                  flush=True)
    auto = _pick_tiles(n, d)
    print('adaptive picks:', auto, flush=True)
    results['auto'] = timed('masked f32 adaptive',
                            make_masked_sweep_pallas(cfg), jnp.float32)
    best = min(results, key=results.get)
    print('BEST: %s (%.3f ms)' % (best, results[best] * 1e3))
    print(json.dumps({k_: v * 1e3 for k_, v in results.items()}))
