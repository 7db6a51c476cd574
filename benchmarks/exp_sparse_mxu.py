"""TPU: tile-bucketed one-hot MXU sparse contractions vs the BCOO path.

Measures at the recorded 50k×30k 0.5% k=128 config (round-2 baseline:
bcoo contractions 76 + 140 ms, full BCOO sweep ~216 ms/sweep; densified
dense hybrid 16 ms/sweep):

- plan build cost (host, one-off)
- mxu_contract per direction
- full sparse='mxu' sweep (MXU contractions + Pallas GS kernels)
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

n, d, k = 50000, 30000, 128
DENSITY = 0.005
REPS = 8


def main():
    import scipy.sparse as sp

    from rri_nmf_tpu.ops.sparse_mxu import (
        contract_wtx, contract_xtt, plan_sparse_matrix)
    from rri_nmf_tpu.ops.sweep_sparse import make_sparse_sweep
    from rri_nmf_tpu.ops.sweep_xla import SweepConfig

    rng = np.random.RandomState(0)
    nnz = int(n * d * DENSITY)
    # sample coordinates WITH replacement (duplicates sum in the plan and
    # in scipy; ~0.25% collisions at this density) — rng.choice without
    # replacement permutes all n*d = 1.5e9 cells and takes ~35 min
    rows = rng.randint(0, n, nnz).astype(np.int64)
    cols = rng.randint(0, d, nnz).astype(np.int64)
    vals = rng.rand(nnz).astype(np.float32)
    Xsp = sp.coo_matrix((vals, (rows, cols)), shape=(n, d)).tocsr()
    print('nnz = %.1fM' % (Xsp.nnz / 1e6), flush=True)

    t0 = time.perf_counter()
    plan = plan_sparse_matrix(Xsp, np.float32)
    jax.block_until_ready(plan.t_phase.vals)
    print('plan build (host+transfer)  %7.2f s  chunks %s/%s'
          % (time.perf_counter() - t0, plan.t_phase.ftile.shape[0],
             plan.w_phase.ftile.shape[0]), flush=True)

    W = jnp.asarray(np.abs(rng.rand(n, k)).astype(np.float32))
    T = jnp.asarray(np.abs(rng.rand(k, d)).astype(np.float32))

    @jax.jit
    def wtx_n(plan, W):
        def body(i, acc):
            r = contract_wtx(plan, W)
            return acc + r[0, 0]
        return lax.fori_loop(0, REPS, body, jnp.float32(0))

    @jax.jit
    def xtt_n(plan, T):
        def body(i, acc):
            r = contract_xtt(plan, T)
            return acc + r[0, 0]
        return lax.fori_loop(0, REPS, body, jnp.float32(0))

    for label, fn, arg in (('mxu WᵀX', wtx_n, W), ('mxu T Xᵀ', xtt_n, T)):
        s = float(fn(plan, arg))
        assert np.isfinite(s)
        t0 = time.perf_counter()
        s = float(fn(plan, arg))
        print('%-28s %8.3f ms' % (label,
                                  (time.perf_counter() - t0) / REPS * 1e3),
              flush=True)

    # ---- bf16 compute mode: bf16 plan + bf16 factors --------------------
    plan16 = plan_sparse_matrix(Xsp, np.dtype('bfloat16'))
    W16 = W.astype(jnp.bfloat16)
    T16 = T.astype(jnp.bfloat16)

    @jax.jit
    def wtx16_n(plan, W):
        def body(i, acc):
            r = contract_wtx(plan, W)
            return acc + r[0, 0]
        return lax.fori_loop(0, REPS, body, jnp.float32(0))

    s = float(wtx16_n(plan16, W16))
    assert np.isfinite(s)
    t0 = time.perf_counter()
    s = float(wtx16_n(plan16, W16))
    print('%-28s %8.3f ms' % ('mxu WᵀX bf16',
                              (time.perf_counter() - t0) / REPS * 1e3),
          flush=True)

    cfg = SweepConfig(k=k, reset_topic_method=None, update_order='phase')
    sweep = make_sparse_sweep(cfg, gs_kernels=True, mxu=True)
    key = jax.random.PRNGKey(0)
    rl = jnp.asarray(0, jnp.int32)

    @jax.jit
    def sweeps_n(plan, W, T):
        def body(i, carry):
            W, T, k2, r2 = carry
            return sweep(plan, W, T, k2, r2, k2)
        out = lax.fori_loop(0, REPS, body, (W, T, key, rl))
        return out[0]

    s = float(jnp.sum(sweeps_n(plan, W, T)[0]))
    assert np.isfinite(s)
    t0 = time.perf_counter()
    s = float(jnp.sum(sweeps_n(plan, W, T)[0]))
    print('%-28s %8.3f ms/sweep' % ('full mxu sweep',
                                    (time.perf_counter() - t0) / REPS * 1e3),
          flush=True)


if __name__ == '__main__':
    main()
