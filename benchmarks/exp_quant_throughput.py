"""Round 4: per-sweep cost of int16 quantized X vs f32 / bf16 storage.

The quantized design claims a sweep over the int16 code costs ~the same
X GEMM passes as the mixed-storage paths (the scale folds outside the
GEMMs at O(kd); the int16->f32 upcast fuses into the operand stream —
ops/quantized.py). This measures it: the fused dense phase sweep at the
headline 16384x8192 k=128 shape, identical data/settings, X stored
f32 / bf16 / int16. Timing per CLAUDE.md: data generated on device,
sync via scalar readback.

Writes benchmarks/results_round4_quant_throughput.json.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from rri_nmf_tpu.ops.dense_pallas import make_dense_phase_sweep_pallas
    from rri_nmf_tpu.ops.quantized import quantize_x
    from rri_nmf_tpu.ops.sweep_xla import SweepConfig

    n, d, k = 16384, 8192, 128
    reps, sweeps_per_rep = 5, 20
    cfg = SweepConfig(k=k, reset_topic_method=None, update_order='phase',
                      matmul_precision='float32')
    sweep = make_dense_phase_sweep_pallas(
        cfg, interpret=jax.default_backend() == 'cpu')

    @jax.jit
    def gen(key):
        k1, k2, k3 = jax.random.split(key, 3)
        Wg = jax.random.uniform(k1, (n, k), jnp.float32)
        Tg = jax.random.uniform(k2, (k, d), jnp.float32)
        with jax.default_matmul_precision('float32'):
            X = Wg @ Tg
        W0 = jax.random.uniform(k3, (n, k), jnp.float32)
        return X, W0, Tg * 0.9 + 0.01

    Xf, W0, T0 = gen(jax.random.PRNGKey(0))
    float(jnp.sum(W0))

    @jax.jit
    def multi(X, W, T, key, resets, rk):
        def body(i, c):
            W, T, key, resets = c
            return sweep(X, W, T, key, resets, rk)
        return jax.lax.fori_loop(0, sweeps_per_rep, body,
                                 (W, T, key, resets))

    out = {'shape': [n, d, k], 'sweeps_timed': reps * sweeps_per_rep,
           'flops_per_sweep': 4.0 * n * d * k, 'storage': {}}
    key = jax.random.PRNGKey(1)
    rk = jax.random.PRNGKey(2)
    rl = jnp.asarray(0, jnp.int32)

    for tag in ('float32', 'bfloat16', 'int16'):
        X = quantize_x(Xf) if tag == 'int16' else Xf.astype(tag)
        # compile + warm
        W, T, k2, r2 = multi(X, W0, T0, key, rl, rk)
        float(jnp.sum(W))
        t0 = time.perf_counter()
        W, T = W0, T0
        for _ in range(reps):
            W, T, k2, r2 = multi(X, W, T, key, rl, rk)
        float(jnp.sum(W))          # scalar-readback sync (CLAUDE.md)
        dt = time.perf_counter() - t0
        ms = dt / (reps * sweeps_per_rep) * 1e3
        gf = out['flops_per_sweep'] / (ms / 1e3) / 1e9
        out['storage'][tag] = {'ms_per_sweep': ms, 'gflops': gf}
        print('%-9s %.3f ms/sweep (%.0f GFLOP/s)' % (tag, ms, gf),
              flush=True)

    f32 = out['storage']['float32']['ms_per_sweep']
    out['int16_overhead_vs_f32'] = \
        out['storage']['int16']['ms_per_sweep'] / f32 - 1.0
    p = Path(__file__).parent / 'results_round4_quant_throughput.json'
    p.write_text(json.dumps(out, indent=1))
    print('wrote', p, flush=True)


if __name__ == '__main__':
    main()
