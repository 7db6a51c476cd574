"""TPU: masked-inference (fix_T) fast path — fused Pallas vs XLA sweep.

`NMF_RS_Estimator.transform` runs fix_T masked sweeps (the production
masked-inference path, reference ``sklearn_interface.py:144-156``).
Round 3 extended the fused masked kernels with a W-phase-only variant
(one streaming pass per topic, including the transform preset's
``reset_topic_method='random'``); this records the before/after
ms/sweep at MovieLens-1M class scale (VERDICT round-2 item 8).

Writes benchmarks/results_round3_masked_inference.json.
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


def timed(label, sweep, with_resets):
    rk = jax.random.PRNGKey(0)

    @jax.jit
    def run(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        X = jax.random.uniform(k1, (n, d), jnp.float32)
        M = (jax.random.uniform(k2, (n, d), jnp.float32)
             < 0.045).astype(jnp.float32)
        W = jax.random.uniform(k3, (n, k), jnp.float32)
        T = jax.random.uniform(k4, (k, d), jnp.float32)
        T = T / jnp.sum(T, axis=1, keepdims=True)
        resets = jnp.asarray(23 if with_resets else 0, jnp.int32)

        def body(i, carry):
            W, key, resets = carry
            W, _, key, resets = sweep(X, W, T, key, resets, rk, M)
            return W, key, resets

        W, _, _ = jax.lax.fori_loop(0, REPS, body,
                                    (W, jax.random.PRNGKey(1), resets))
        return jnp.sum(W)

    s = float(run(jax.random.PRNGKey(0)))
    assert np.isfinite(s), label
    t0 = time.perf_counter()
    s = float(run(jax.random.PRNGKey(1)))
    dt = (time.perf_counter() - t0) / REPS
    print('%-44s %8.3f ms/sweep' % (label, dt * 1e3), flush=True)
    return dt * 1e3


if __name__ == '__main__':
    from rri_nmf_tpu.ops.sweep_pallas import (
        make_masked_sweep_pallas, supports_pallas)
    from rri_nmf_tpu.ops.sweep_xla import SweepConfig, make_sweep

    out = {'shape': [n, d, k], 'mask_density': 0.045,
           'sweeps_timed': REPS, 'results': {}}
    # the RS transform preset: fix_T, w-bounds, random resets
    # (reference sklearn_interface.py:144-156)
    cfg_r = SweepConfig(k=k, masked=True, fix_T=True,
                        reset_topic_method='random')
    # resets-off variant (inference without the reset heuristic)
    cfg_n = SweepConfig(k=k, masked=True, fix_T=True,
                        reset_topic_method=None)
    assert supports_pallas(cfg_r) and supports_pallas(cfg_n)
    for name, cfg, resets in [('transform_preset_resets', cfg_r, True),
                              ('no_resets', cfg_n, False)]:
        xla = timed('XLA fix_T masked (%s)' % name, make_sweep(cfg),
                    resets)
        pls = timed('Pallas fused fix_T (%s)' % name,
                    make_masked_sweep_pallas(cfg), resets)
        out['results'][name] = {'xla_ms': xla, 'pallas_ms': pls,
                                'speedup': xla / pls}
    print(json.dumps(out))
    Path('benchmarks/results_round3_masked_inference.json').write_text(
        json.dumps(out, indent=1))
