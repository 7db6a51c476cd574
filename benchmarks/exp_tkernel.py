"""TPU: decompose the dense T-phase kernel cost (GEMM accumulation vs the
in-kernel GS loop), across tile sizes."""
import sys
import time
from functools import partial
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


def make_kernel(gs, BN, BD, prec=None, cast_bf16=False):
    def kernel(G_ref, diag_ref, W_ref, X_ref, T_ref, Tout_ref, acc_ref):
        i = pl.program_id(1)
        gn = pl.num_programs(1)
        Wt_in, X_in = W_ref[:], X_ref[:]
        if cast_bf16:
            Wt_in = Wt_in.astype(jnp.bfloat16)
            X_in = X_in.astype(jnp.bfloat16)
        part = lax.dot_general(Wt_in, X_in,
                               dimension_numbers=(((0,), (0,)), ((), ())),
                               precision=prec,
                               preferred_element_type=jnp.float32)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = part

        @pl.when(i > 0)
        def _():
            acc_ref[:] = acc_ref[:] + part

        @pl.when(i == gn - 1)
        def _():
            if not gs:
                Tout_ref[:] = jnp.maximum(acc_ref[:], 0.0) * 1e-3 + T_ref[:]
                return
            Tout_ref[:] = T_ref[:]

            def body(t, _):
                g = G_ref[pl.ds(t, 1), :]
                corr = lax.dot_general(
                    g, Tout_ref[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                gtt = diag_ref[pl.ds(t, 1), :]
                told = Tout_ref[pl.ds(t, 1), :]
                numer = acc_ref[pl.ds(t, 1), :] - corr + gtt * told
                denom = gtt
                pos = jnp.maximum(numer, 0.0) / (denom + EPS)
                neg = jnp.where(denom - numer < 0, jnp.inf,
                                jnp.zeros_like(numer))
                Tout_ref[pl.ds(t, 1), :] = jnp.where(denom > 0, pos, neg)
                return 0

            lax.fori_loop(0, k, body, 0)

    return kernel


def run_variant(label, gs, BN, BD, dimsem=None, prec=None, cast_bf16=False):
    gn, gd = n // BN, d // BD
    kw = {}
    if dimsem:
        kw['compiler_params'] = pltpu.CompilerParams(
            dimension_semantics=dimsem)
    call = pl.pallas_call(
        make_kernel(gs, BN, BD, prec, cast_bf16),
        grid=(gd, gn),
        in_specs=[
            pl.BlockSpec((k, k), lambda j, i: (0, 0)),
            pl.BlockSpec((k, 1), lambda j, i: (0, 0)),
            pl.BlockSpec((BN, k), lambda j, i: (i, 0)),
            pl.BlockSpec((BN, BD), lambda j, i: (i, j)),
            pl.BlockSpec((k, BD), lambda j, i: (0, j)),
        ],
        out_specs=pl.BlockSpec((k, BD), lambda j, i: (0, j)),
        out_shape=jax.ShapeDtypeStruct((k, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, BD), jnp.float32)],
        **kw,
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

    s = float(run(jax.random.PRNGKey(0)))
    assert np.isfinite(s) or True
    t0 = time.perf_counter()
    float(run(jax.random.PRNGKey(1)))
    dt = (time.perf_counter() - t0) / REPS
    print('%-40s %7.3f ms' % (label, dt * 1e3), flush=True)


if __name__ == '__main__':
    run_variant('GS, prec=DEFAULT', True, 512, 1024,
                prec=jax.lax.Precision.DEFAULT)
    run_variant('GS, cast bf16 inputs', True, 512, 1024, cast_bf16=True)
    run_variant('GS, bf16 BN1024', True, 1024, 1024, cast_bf16=True)
    run_variant('no GS, cast bf16 (pure GEMM)', False, 512, 1024,
                cast_bf16=True)
