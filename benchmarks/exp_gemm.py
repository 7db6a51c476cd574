"""TPU: Pallas W^T X accumulation-GEMM tilings vs the XLA dot."""
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


def bench(label, fn):
    @jax.jit
    def run(key):
        k1, k2 = jax.random.split(key)
        X = jax.random.uniform(k1, (n, d), jnp.float32)
        W = jax.random.uniform(k2, (n, k), jnp.float32)

        def body(i, W):
            WX = fn(W, X)
            return W * (1.0 + 1e-9 * jnp.tanh(jnp.sum(WX[0])))

        W = lax.fori_loop(0, REPS, body, W)
        return jnp.sum(W)

    s = float(run(jax.random.PRNGKey(0)))
    assert np.isfinite(s)
    t0 = time.perf_counter()
    float(run(jax.random.PRNGKey(1)))
    dt = (time.perf_counter() - t0) / REPS
    print('%-42s %7.3f ms  (%5.0f GB/s of X)' %
          (label, dt * 1e3, n * d * 4 / dt / 1e9), flush=True)


def xla_dot(W, X):
    return lax.dot_general(W, X, (((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def make_pallas(BN, BD, vmem_mb=None, nsem='arbitrary'):
    gn, gd = n // BN, d // BD

    def kernel(W_ref, X_ref, out_ref, acc_ref):
        i = pl.program_id(1)
        part = lax.dot_general(W_ref[:], X_ref[:],
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = part

        @pl.when(i > 0)
        def _():
            acc_ref[:] = acc_ref[:] + part

        @pl.when(i == pl.num_programs(1) - 1)
        def _():
            out_ref[:] = acc_ref[:]

    kw = {}
    params = {}
    if vmem_mb:
        params['vmem_limit_bytes'] = vmem_mb << 20
    params['dimension_semantics'] = ('arbitrary', nsem)
    kw['compiler_params'] = pltpu.CompilerParams(**params)
    call = pl.pallas_call(
        kernel,
        grid=(gd, gn),
        in_specs=[pl.BlockSpec((BN, k), lambda j, i: (i, 0)),
                  pl.BlockSpec((BN, BD), lambda j, i: (i, j))],
        out_specs=pl.BlockSpec((k, BD), lambda j, i: (0, j)),
        out_shape=jax.ShapeDtypeStruct((k, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, BD), jnp.float32)],
        **kw)
    return lambda W, X: call(W, X)


if __name__ == '__main__':
    bench('XLA dot_general', xla_dot)
    bench('pallas BN512 BD1024', make_pallas(512, 1024))
    bench('pallas BN512 BD2048', make_pallas(512, 2048))
    bench('pallas BN256 BD4096 vmem32', make_pallas(256, 4096, 32))
    bench('pallas BN128 BD8192 vmem32 (contig rows)',
          make_pallas(128, 8192, 32))
    bench('pallas BN256 BD8192 vmem64 (contig rows)',
          make_pallas(256, 8192, 64))
    bench('pallas BN1024 BD2048 vmem32', make_pallas(1024, 2048, 32))
