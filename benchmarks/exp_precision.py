"""TPU experiment: f32 matmul precision ladder for the sweep's X GEMMs.

On TPU the MXU natively multiplies bf16 inputs with f32 accumulation; an
f32×f32 dot is emulated with 1/3/6 bf16 passes depending on the requested
precision. This measures what the default costs and what each rung buys at
the headline bench shape.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

n, d, k = 16384, 8192, 128
REPS = 16


def timed(label, prec=None, in_dtype=jnp.float32):
    def f(key):
        k1, k2 = jax.random.split(key)
        X = jax.random.uniform(k1, (n, d), in_dtype)
        W = jax.random.uniform(k2, (n, k), in_dtype)

        def body(i, W):
            WX = jax.lax.dot_general(
                W, X, (((0,), (0,)), ((), ())), precision=prec,
                preferred_element_type=jnp.float32)       # (k, d)
            Wn = jax.lax.dot_general(
                X, WX, (((1,), (1,)), ((), ())), precision=prec,
                preferred_element_type=jnp.float32)       # (n, k)
            return (W + 1e-6 * Wn.astype(in_dtype) /
                    (1.0 + jnp.abs(Wn.astype(in_dtype))))

        W = jax.lax.fori_loop(0, REPS, body, W)
        return jnp.sum(W.astype(jnp.float32))

    fn = jax.jit(f)
    s = float(fn(jax.random.PRNGKey(0)))
    assert np.isfinite(s)
    t0 = time.perf_counter()
    s = float(fn(jax.random.PRNGKey(1)))
    dt = (time.perf_counter() - t0) / REPS
    gf = 2 * (2.0 * n * d * k) / dt / 1e9
    print('%-34s %7.3f ms/iter  %8.1f GFLOP/s' % (label, dt * 1e3, gf),
          flush=True)


if __name__ == '__main__':
    timed('f32 default precision', None)
    timed("f32 precision='bfloat16' (1x)", 'bfloat16')
    timed("f32 'bfloat16_3x'", 'bfloat16_3x')
    timed("f32 'float32' (highest)", 'float32')
    timed('bf16 inputs, f32 accum', None, in_dtype=jnp.bfloat16)
