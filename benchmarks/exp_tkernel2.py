"""TPU: full-width-accumulator T-phase kernel (1-D grid, contiguous X
row-block streaming, GS once over full rows) vs the 2-D tiled variant."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

n, d, k = 16384, 8192, 128
REPS = 16
EPS = float(np.spacing(10))


def make_kernel(BN):
    def kernel(G_ref, diag_ref, W_ref, X_ref, T_ref, Tout_ref, acc_ref):
        i = pl.program_id(0)
        gn = pl.num_programs(0)
        part = lax.dot_general(W_ref[:], X_ref[:],
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = part

        @pl.when(i > 0)
        def _():
            acc_ref[:] = acc_ref[:] + part

        @pl.when(i == gn - 1)
        def _():
            Tout_ref[:] = T_ref[:]

            def body(t, _):
                g = G_ref[pl.ds(t, 1), :]
                corr = lax.dot_general(g, Tout_ref[:],
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
                gtt = diag_ref[pl.ds(t, 1), :]
                told = Tout_ref[pl.ds(t, 1), :]
                numer = acc_ref[pl.ds(t, 1), :] - corr + gtt * told
                pos = jnp.maximum(numer, 0.0) / (gtt + EPS)
                neg = jnp.where(gtt - numer < 0, jnp.inf,
                                jnp.zeros_like(numer))
                Tout_ref[pl.ds(t, 1), :] = jnp.where(gtt > 0, pos, neg)
                return 0

            lax.fori_loop(0, k, body, 0)

    return kernel


def run_variant(label, BN, vmem_mb=100):
    gn = n // BN
    call = pl.pallas_call(
        make_kernel(BN),
        grid=(gn,),
        in_specs=[
            pl.BlockSpec((k, k), lambda i: (0, 0)),
            pl.BlockSpec((k, 1), lambda i: (0, 0)),
            pl.BlockSpec((BN, k), lambda i: (i, 0)),
            pl.BlockSpec((BN, d), lambda i: (i, 0)),
            pl.BlockSpec((k, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((k, d), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((k, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb << 20,
            dimension_semantics=('arbitrary',)),
    )

    @jax.jit
    def run(key):
        k1, k2, k3 = jax.random.split(key, 3)
        X = jax.random.uniform(k1, (n, d), jnp.float32)
        W = jax.random.uniform(k2, (n, k), jnp.float32)
        T = jax.random.uniform(k3, (k, d), jnp.float32)
        G = jnp.dot(W.T, W)
        diag = jnp.diagonal(G).reshape(k, 1)

        def body(i, T):
            return call(G, diag, W, X, T)

        T = lax.fori_loop(0, REPS, body, T)
        return jnp.sum(T)

    try:
        s = float(run(jax.random.PRNGKey(0)))
    except Exception as e:
        print('%-40s FAILED: %s' % (label, str(e)[:120]), flush=True)
        return
    t0 = time.perf_counter()
    float(run(jax.random.PRNGKey(1)))
    dt = (time.perf_counter() - t0) / REPS
    print('%-40s %7.3f ms (%5.0f GB/s of X)' %
          (label, dt * 1e3, n * d * 4 / dt / 1e9), flush=True)


if __name__ == '__main__':
    run_variant('fullwidth BN=64', 64)
    run_variant('fullwidth BN=128', 128)
    run_variant('fullwidth BN=256', 256)
    run_variant('fullwidth BN=512', 512)
