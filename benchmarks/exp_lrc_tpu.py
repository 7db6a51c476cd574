"""Device-side NNSVD-LRC vs NNDSVD at the scaled north-star shape.

Two claims to measure on the real chip (32768 x 16384, k=256, rank-k
data — the results_round3_northstar.json config):

1. init cost: the LRC path computes a rank-(k/2+1) randomized SVD
   instead of rank-k (plus a cheap low-rank HALS correction) — the
   device NNDSVD init measured 2.7 s warm; LRC should cut the SVD work
   roughly in half.
2. init quality: initial relative Frobenius error (LRC starts 1.2-2.5x
   closer on CPU fixtures; results_round3_lrc_init_cpu.json).

Writes benchmarks/results_round3_lrc_init_tpu.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

N, D, KTRUE, K = 32768, 16384, 256, 256


def main():
    from rri_nmf_tpu.initialization import initialize_nmf

    print('backend:', jax.default_backend())
    key = jax.random.PRNGKey(0)
    kw, kt = jax.random.split(key)
    # generate on device (tunnel transfers are ~45 MB/s)
    Wt = jax.random.uniform(kw, (N, KTRUE), jnp.float32)
    Tt = jax.random.uniform(kt, (KTRUE, D), jnp.float32)
    X = Wt @ Tt
    xsq = float(jnp.sum(X.astype(jnp.float64) ** 2)
                if jax.config.jax_enable_x64 else jnp.sum(X * X))
    xn = np.sqrt(xsq)

    out = {'shape': [N, D], 'k': K}
    for init in ('nndsvd', 'nndsvd_lrc'):
        # warm (compile) then time
        W0, H0 = initialize_nmf(X, K, init, random_state=0,
                                svd_backend='jax')
        t0 = time.perf_counter()
        W0, H0 = initialize_nmf(X, K, init, random_state=0,
                                svd_backend='jax')
        t_init = time.perf_counter() - t0
        Wd, Hd = jnp.asarray(W0), jnp.asarray(H0)
        err = float(jnp.sqrt(jnp.maximum(
            xsq - 2 * jnp.sum((Wd.T @ X) * Hd)
            + jnp.sum((Wd.T @ Wd) * (Hd @ Hd.T)), 0.0))) / xn
        out[init] = {'init_seconds_warm': t_init, 'initial_rel_err': err}
        print(init, 'warm %.2fs err %.5f' % (t_init, err))

    out['note'] = ('device init comparison at the scaled north-star '
                   'shape; warm timings (compile excluded), error via '
                   'the factored Frobenius identity (no n x d residual).')
    with open('benchmarks/results_round3_lrc_init_tpu.json', 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
