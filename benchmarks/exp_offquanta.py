"""TPU: what does the off-quanta repad actually cost per sweep?

ROADMAP 1b: mesh shapes that don't sit on the ``(BN*dp, BD*tp)`` quanta
pay an O(nd) X (+mask) zero-pad inside the jitted shard_map sweep.
Grouped dispatch hoists it (loop-invariant), so only per-iteration fits
(objective tracking / early stop) pay it per sweep. Before building the
invasive fix (driver-held padded factors + slicing awareness in the
objective computer, checkpoints, and final projections), measure the
real cost at MovieLens-1M class scale on one chip with a (1,1) mesh:

  1. aligned:    per-dispatch masked mesh sweep at the padded shape
  2. offquanta:  the same at the true 6040x3706 shape (repad inside)
  3. repad_only: just the jitted X+M pad at the off-quanta shape

Identical dispatch pattern (REPS sequential dispatches, one trailing
scalar readback) so tunnel fetch overhead cancels in the difference.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

n, d, k = 6040, 3706, 40
REPS = 20


def dispatch_timed(label, step, args):
    out = step(*args)
    _ = float(jnp.sum(out[0][:1, :1]))  # compile + sync
    best = np.inf
    for _rep in range(3):
        t0 = time.perf_counter()
        for _i in range(REPS):
            out = step(*args)
        _ = float(jnp.sum(out[0][:1, :1]))
        best = min(best, (time.perf_counter() - t0) / REPS)
    print('%-24s %8.3f ms/dispatch' % (label, best * 1e3), flush=True)
    return best * 1e3


def main():
    assert jax.default_backend() != 'cpu', (
        'refusing CPU fallback: this probe measures TPU HBM repad cost')
    from rri_nmf_tpu.ops.sweep_pallas import BN, BD, _round_up
    from rri_nmf_tpu.ops.sweep_xla import SweepConfig
    from rri_nmf_tpu.parallel.sharded_pallas import (
        make_sharded_masked_sweep_pallas)

    dev = jax.devices()[0]
    mesh = jax.sharding.Mesh(np.array([dev]).reshape(1, 1), ('dp', 'tp'))
    npad, dpad = _round_up(n, BN), _round_up(d, BD)
    print('backend:', jax.default_backend(), 'quanta:', BN, BD,
          'padded:', npad, dpad, flush=True)

    cfg = SweepConfig(k=k, masked=True, reset_topic_method=None,
                      t_row_sum=5.0)
    sweep = make_sharded_masked_sweep_pallas(cfg, mesh)

    kk = jax.random.split(jax.random.PRNGKey(0), 4)

    def gen(shape_n, shape_d):
        X = jax.random.uniform(kk[0], (shape_n, shape_d), jnp.float32)
        M = (jax.random.uniform(kk[1], (shape_n, shape_d), jnp.float32)
             < 0.045).astype(jnp.float32)
        W = jax.random.uniform(kk[2], (shape_n, k), jnp.float32)
        T = jax.random.uniform(kk[3], (k, shape_d), jnp.float32)
        return X, M, W, T

    res = {'n': n, 'd': d, 'npad': npad, 'dpad': dpad, 'k': k}
    rk = jax.random.PRNGKey(7)
    resets = jnp.asarray(0, jnp.int32)

    # 1. aligned shape — no repad branch taken
    Xa, Ma, Wa, Ta = jax.jit(gen, static_argnums=(0, 1))(npad, dpad)
    _ = float(jnp.sum(Xa[:1, :1]))
    res['aligned_ms'] = dispatch_timed(
        'aligned %dx%d' % (npad, dpad), sweep,
        (Xa, Wa, Ta, rk, resets, rk, Ma))

    # 2. true off-quanta shape — repad inside the jitted sweep
    Xo, Mo, Wo, To = jax.jit(gen, static_argnums=(0, 1))(n, d)
    _ = float(jnp.sum(Xo[:1, :1]))
    res['offquanta_ms'] = dispatch_timed(
        'offquanta %dx%d' % (n, d), sweep,
        (Xo, Wo, To, rk, resets, rk, Mo))

    # 3. the pad alone (X + M, the two O(nd) streams)
    @jax.jit
    def pad_only(X, M):
        Xp = jnp.zeros((npad, dpad), X.dtype).at[:n, :d].set(X)
        Mp = jnp.zeros((npad, dpad), M.dtype).at[:n, :d].set(M)
        return Xp, Mp

    res['repad_only_ms'] = dispatch_timed('repad only', pad_only, (Xo, Mo))

    res['delta_ms'] = res['offquanta_ms'] - res['aligned_ms']
    res['note'] = (
        'per-dispatch masked mesh sweep, (1,1) mesh on one chip. delta_ms '
        'is the off-quanta tax per PER-ITERATION sweep (grouped dispatch '
        'hoists the pad). If delta is a few %% of the sweep, the ROADMAP '
        '1b driver-side pre-padding is not worth its invasiveness.')
    print(json.dumps(res, indent=1))
    with open('benchmarks/results_round3_offquanta.json', 'w') as f:
        json.dump(res, f, indent=1)


if __name__ == '__main__':
    main()
