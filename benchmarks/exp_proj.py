"""TPU: per-topic simplex-projection cost inside the GS topic loop.

The phase-order TM preset (results_round3_tm_preset.json: 6.40 ms/sweep)
pays ~3.5 ms over the projection-free sweep for 128 SERIALIZED Duchi
projections (one jnp.sort of d=8192 per topic, inside the unrolled GS
loop). This times the candidates for that inner projection:

- duchi:    jnp.sort + cumsum (current `_proj_simplex_core`)
- michelot: active-set fixpoint (Michelot 1986) — no sort, ~5-10
  O(d) masked reductions in a lax.while_loop
- topk:     Duchi on the lax.top_k(m) prefix, lax.cond fallback to the
  full sort when the active set may exceed m

Each is timed as a fori_loop of 128 SEQUENTIAL projections (matching the
GS loop's serialization), one jitted program, scalar-readback sync.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

D = 8192
K = 128
REPS = 20


def proj_duchi(v, s):
    n = v.shape[0]
    u = jnp.sort(v)[::-1]
    cssv = jnp.cumsum(u)
    ar = jnp.arange(1, n + 1, dtype=v.dtype)
    cond = u * ar > (cssv - s)
    rho = jnp.max(jnp.where(cond, jnp.arange(n), -1))
    theta = (cssv[rho] - s) / (rho + 1.0)
    return jnp.clip(v - theta, 0.0, None)


def proj_michelot(v, s):
    n = v.shape[0]

    def cond(c):
        tau, cnt, it = c
        return jnp.logical_and(cnt > 0, it < n)

    def body(c):
        tau, cnt, it = c
        active = v > tau
        m = jnp.sum(active)
        ssum = jnp.sum(jnp.where(active, v, 0.0))
        tau2 = (ssum - s) / jnp.maximum(m, 1).astype(v.dtype)
        changed = m != cnt
        return (jnp.where(changed, tau2, tau),
                jnp.where(changed, m, 0), it + 1)

    tau0 = (jnp.sum(v) - s) / jnp.asarray(n, v.dtype)
    tau, _, _ = lax.while_loop(cond, body, (tau0, jnp.asarray(n + 1), 0))
    return jnp.clip(v - tau, 0.0, None)


def proj_topk(v, s, m=512):
    u, _ = lax.top_k(v, m)
    cssv = jnp.cumsum(u)
    ar = jnp.arange(1, m + 1, dtype=v.dtype)
    cond = u * ar > (cssv - s)
    rho = jnp.max(jnp.where(cond, jnp.arange(m), -1))
    theta = (cssv[rho] - s) / (rho + 1.0)

    def full(v):
        return proj_duchi(v, s)

    def quick(v):
        return jnp.clip(v - theta, 0.0, None)

    # exact iff the active set fits in the prefix
    return lax.cond(rho >= m - 1, full, quick, v)


def timed_loop(proj, V):
    # ONE jitted fori_loop over REPS*K projections + ONE scalar fetch:
    # per-dispatch tunnel latency (~15 ms) would otherwise dominate.
    @jax.jit
    def run(V):
        def body(i, acc):
            return acc + jnp.sum(proj(V[i % K], 1.0 + acc * 0.0))
        return lax.fori_loop(0, REPS * K, body, jnp.asarray(0.0, V.dtype))

    float(run(V))
    t0 = time.perf_counter()
    r = float(run(V))
    dt = (time.perf_counter() - t0) / (REPS * K)
    return dt, r


def main():
    key = jax.random.PRNGKey(0)
    # post-qf_min numerator-like rows: nonneg, heavy mass concentration
    V = jnp.abs(jax.random.normal(key, (K, D), jnp.float32)) ** 3
    float(jnp.sum(V))

    # correctness vs the sort algorithm
    Vn = np.asarray(V[:8], np.float64)
    for t in range(8):
        ref = np.asarray(proj_duchi(jnp.asarray(Vn[t]), 1.0))
        mic = np.asarray(proj_michelot(jnp.asarray(Vn[t]), 1.0))
        tk = np.asarray(proj_topk(jnp.asarray(Vn[t]), 1.0))
        assert abs(ref.sum() - 1) < 1e-12 and abs(mic.sum() - 1) < 1e-12
        assert np.max(np.abs(ref - mic)) < 1e-12, np.max(np.abs(ref - mic))
        assert np.max(np.abs(ref - tk)) < 1e-12
    print('correctness ok (f64, 8 rows)', flush=True)

    for name, fn in [('duchi_sort', proj_duchi),
                     ('michelot', proj_michelot),
                     ('topk512', proj_topk)]:
        dt, r = timed_loop(fn, V)
        print('%-12s %8.2f us/projection  (checksum %.6f)'
              % (name, dt * 1e6, r), flush=True)


if __name__ == '__main__':
    main()
