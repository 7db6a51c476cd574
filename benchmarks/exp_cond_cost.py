"""What does a per-topic lax.cond actually cost on the TPU?

results_round3_tm_interleaved.json attributes ~25 ms/sweep of the
reference-order TM preset to the reset CHECK: two lax.conds per topic
at ~92 us each, with the expensive branch never executing. Two
candidate explanations:

(a) fixed per-cond dispatch/serialization overhead -> nothing to do
    short of batching (changes semantics);
(b) operand traffic: the conds carry the full (W, T) matrices through
    the branch tuples, and XLA copies the carried buffers on branch
    entry/exit -> restructure the conds to carry only the small
    derived values (a row, a column, a scalar) at EXACT semantics.

This microbenchmark separates the two on the real chip: a fori_loop
over k=128 'topics' on (16384, 128) W / (128, 8192) T doing

  1. no_cond:        T row renormalize unconditionally (baseline)
  2. cond_full:      lax.cond carrying (W, T) through both branches
  3. cond_row:       the same predicate, but the cond computes only
                     the (d,) row; caller writes it back outside
  4. two_conds_full: 2x variant-2 conds per topic (the sweep's shape)

All predicates evaluate to the cheap branch every time, like the real
sweep. min-of-3 timings, scalar-readback sync.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
from jax import lax

n, d, k = 16384, 8192, 128
SWEEPS = 20


def timed(fn, *args):
    out = fn(*args)
    _ = float(jnp.sum(out[0][:1]))  # warm compile + sync
    best = np.inf
    for _rep in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out[0][:1]))
        best = min(best, (time.perf_counter() - t0) / SWEEPS)
    return best * 1e3


def make_no_cond():
    @jax.jit
    def run(W, T):
        def sweep(_, WT):
            W, T = WT

            def topic(t, WT):
                W, T = WT
                row = T[t] / jnp.sum(T[t])
                return W, T.at[t].set(row)

            return lax.fori_loop(0, k, topic, (W, T))

        return lax.fori_loop(0, SWEEPS, sweep, (W, T))

    return run


def make_cond_full(reps):
    @jax.jit
    def run(W, T):
        def sweep(_, WT):
            W, T = WT

            def topic(t, WT):
                W, T = WT
                for _r in range(reps):
                    def alive(ops):
                        W, T = ops
                        return W, T.at[t].set(T[t] / jnp.sum(T[t]))

                    def dead(ops):
                        W, T = ops
                        # the never-taken expensive branch: full reset
                        # O(nk + kd) never-taken work touching both
                        # operands (the original 'i,ij->j' einsum was
                        # dimensionally wrong: W[:, t] is (n,), T (k, d))
                        row = jnp.maximum(
                            jnp.einsum('n,nk,kj->j', W[:, t], W, T), 0.0)
                        return W.at[:, t].set(0.0), T.at[t].set(row)

                    W, T = lax.cond(jnp.sum(T[t]) > 1e-10, alive, dead,
                                    (W, T))
                return W, T

            return lax.fori_loop(0, k, topic, (W, T))

        return lax.fori_loop(0, SWEEPS, sweep, (W, T))

    return run


def make_cond_row():
    @jax.jit
    def run(W, T):
        def sweep(_, WT):
            W, T = WT

            def topic(t, WT):
                W, T = WT
                # cond computes ONLY the row; W/T are closed over
                # (read-only), nothing big is carried through the cond
                row = lax.cond(
                    jnp.sum(T[t]) > 1e-10,
                    lambda: T[t] / jnp.sum(T[t]),
                    lambda: jnp.maximum(
                        jnp.einsum('n,nk,kj->j', W[:, t], W, T), 0.0))
                return W, T.at[t].set(row)

            return lax.fori_loop(0, k, topic, (W, T))

        return lax.fori_loop(0, SWEEPS, sweep, (W, T))

    return run


def main():
    print('backend:', jax.default_backend())
    key = jax.random.PRNGKey(0)
    W = jax.random.uniform(key, (n, k), jnp.float32) + 0.1
    T = jax.random.uniform(key, (k, d), jnp.float32) + 0.1
    _ = float(jnp.sum(W))

    res = {}
    res['no_cond_ms'] = timed(make_no_cond(), W, T)
    print('no_cond:        %.3f ms/sweep' % res['no_cond_ms'])
    res['cond_full_ms'] = timed(make_cond_full(1), W, T)
    print('cond_full:      %.3f ms/sweep' % res['cond_full_ms'])
    res['cond_row_ms'] = timed(make_cond_row(), W, T)
    print('cond_row:       %.3f ms/sweep' % res['cond_row_ms'])
    res['two_conds_full_ms'] = timed(make_cond_full(2), W, T)
    print('two_conds_full: %.3f ms/sweep' % res['two_conds_full_ms'])

    res['per_cond_full_us'] = (res['cond_full_ms']
                               - res['no_cond_ms']) * 1e3 / k
    res['per_cond_row_us'] = (res['cond_row_ms']
                              - res['no_cond_ms']) * 1e3 / k
    res['note'] = ('per-topic lax.cond cost decomposition at the TM '
                   'headline shape; predicates always take the cheap '
                   'branch. If cond_row ~ no_cond, the 92 us/cond in '
                   'results_round3_tm_interleaved.json is OPERAND '
                   'traffic (carried W/T buffers), fixable at exact '
                   'semantics by carrying only derived rows/cols.')
    print(json.dumps(res, indent=1))
    with open('benchmarks/results_round3_cond_cost.json', 'w') as f:
        json.dump(res, f, indent=1)


if __name__ == '__main__':
    main()
