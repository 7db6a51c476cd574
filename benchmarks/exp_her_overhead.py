"""TPU: decompose HER's per-sweep overhead on the masked path.

results_round3_her_masked.json measured HER at 45.4 ms/sweep vs the
plain masked fit's 27.2 at 6144x4096 k=40 (1.67x). The HER step adds
only (a) one masked residual objective (one W@T GEMM + two n x d
streams, ~0.5 ms at this shape by back-of-envelope) and (b) O(nk+kd)
extrapolation arithmetic — so ~18 ms/sweep is unexplained. Time each
part in isolation under the grouped dispatch pattern the experiment
used:

  1. plain grouped sweep        (the 27.2 ms baseline)
  2. HER grouped                (the 45.4 ms composite)
  3. objective alone            (the restart check, dispatched grouped)
  4. HER with the objective stubbed to a constant (isolates the
     extrapolation + where() select cost from the obj)

Writes benchmarks/results_round3_her_overhead.json.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

n, d, k = 6144, 4096, 40
DENSITY = 0.045
G = 25          # sweeps per dispatch
REPS = 2        # timed dispatch rounds (min taken)


def timed(label, fn, *args):
    import jax.numpy as jnp
    out = fn(*args)
    _ = float(jnp.sum(out[0].ravel()[:1]))   # compile + sync
    best = np.inf
    for _r in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out[0].ravel()[:1]))
        best = min(best, (time.perf_counter() - t0))
    print('%-28s %8.3f ms/sweep' % (label, best / G * 1e3), flush=True)
    return best / G * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    assert jax.default_backend() != 'cpu', 'TPU probe'

    from rri_nmf_tpu.ops.accel import (_her_body, make_residual_obj)
    from rri_nmf_tpu.ops.sweep_pallas import (make_masked_sweep_pallas,
                                              supports_pallas)
    from rri_nmf_tpu.ops.sweep_xla import SweepConfig

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    Wt = jax.random.uniform(k1, (n, k), jnp.float32)
    Tt = jax.random.uniform(k2, (k, d), jnp.float32)
    X = Wt @ Tt
    M = (jax.random.uniform(k3, (n, d), jnp.float32) < DENSITY
         ).astype(jnp.float32)
    W0 = jax.random.uniform(k4, (n, k), jnp.float32)
    T0 = jax.random.uniform(k5, (k, d), jnp.float32)
    float(jnp.sum(X)); float(jnp.sum(M))

    cfg = SweepConfig(k=k, masked=True, reset_topic_method=None,
                      t_row_sum=1.0)
    assert supports_pallas(cfg)
    sweep = make_masked_sweep_pallas(cfg)
    obj = make_residual_obj(cfg)

    rk = jax.random.PRNGKey(7)
    resets = jnp.asarray(0, jnp.int32)
    res = {'n': n, 'd': d, 'k': k, 'density': DENSITY, 'group': G}

    # 1. plain grouped sweep
    @jax.jit
    def plain_multi(X, W, T, key, resets, rk, M):
        def body(i, c):
            W, T, key, resets = c
            return sweep(X, W, T, key, resets, rk, M)
        return lax.fori_loop(0, G, body, (W, T, key, resets))

    res['plain_ms'] = timed('plain grouped', plain_multi,
                            X, W0, T0, rk, resets, rk, M)

    # 2. HER grouped (the real composite)
    def her_multi_of(obj_fn):
        step = _her_body(sweep, obj_fn, 1.05, 0.9999)

        @jax.jit
        def multi(X, W, T, Wy, Ty, Wb, Tb, eb, beta, e, key, resets, rk, M):
            def body(i, c):
                W, T, Wy, Ty, Wb, Tb, eb, beta, e, key, resets = c
                return step(X, W, T, Wy, Ty, Wb, Tb, eb, beta, e, key,
                            resets, rk, M)
            return lax.fori_loop(
                0, G, body,
                (W, T, Wy, Ty, Wb, Tb, eb, beta, e, key, resets))
        return multi

    beta = jnp.asarray(0.5, jnp.float32)
    e0 = jnp.asarray(jnp.inf, jnp.float32)
    res['her_ms'] = timed('her grouped', her_multi_of(obj),
                          X, W0, T0, W0, T0, W0, T0, e0, beta, e0, rk,
                          resets, rk, M)

    # 3. objective alone, dispatched grouped (same pattern)
    @jax.jit
    def obj_multi(X, W, T, M):
        def body(i, s):
            return s + obj(X, W + s * 0, T, M)
        return (lax.fori_loop(0, G, body, jnp.asarray(0.0, jnp.float32))
                .reshape(1),)

    res['obj_ms'] = timed('objective alone', obj_multi, X, W0, T0, M)

    # 4. HER with the objective stubbed (isolates extrapolation/select)
    def obj_stub(X, W, T, *extras):
        return jnp.asarray(0.0, jnp.float32)

    res['her_stub_obj_ms'] = timed(
        'her, obj stubbed', her_multi_of(obj_stub),
        X, W0, T0, W0, T0, W0, T0, e0, beta, e0, rk, resets, rk, M)

    res['note'] = ('overhead decomposition: her_ms - plain_ms should '
                   '~= obj_ms + (her_stub_obj_ms - plain_ms); grouped '
                   'fori dispatch, scalar-readback sync, min of %d.'
                   % REPS)
    print(json.dumps(res, indent=1))
    with open('benchmarks/results_round3_her_overhead.json', 'w') as f:
        json.dump(res, f, indent=1)


if __name__ == '__main__':
    main()
