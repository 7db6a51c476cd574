"""TPU: manual-DMA sparse kernel vs the pipelined one-hot MXU kernel.

Stage 1 validates the Mosaic lowering at a small shape (numeric parity
vs a dense dot on device). Stage 2 times both kernels per direction at
the recorded 50k×30k 0.5% k=128 config, ABAB-interleaved with min-of-R
to control for the tunnel's ±40% run-to-run drift, for f32 and bf16
storage and several metadata block sizes. Stage 3 times the full sparse
sweep through each plan type.
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
ROUNDS = 3


def timed(fn, *args):
    s = float(fn(*args))
    assert np.isfinite(s), 'non-finite result'
    t0 = time.perf_counter()
    s = float(fn(*args))
    assert np.isfinite(s)
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
    import scipy.sparse as sp

    from rri_nmf_tpu.ops import sparse_dma, sparse_mxu
    from rri_nmf_tpu.ops.sweep_sparse import make_sparse_sweep
    from rri_nmf_tpu.ops.sweep_xla import SweepConfig

    rng = np.random.RandomState(0)

    # ---- stage 1: small-shape on-TPU parity ----------------------------
    ns, ds, ks = 1024, 768, 16
    Xs = sp.random(ns, ds, density=0.02, random_state=rng,
                   data_rvs=lambda s: rng.rand(s).astype(np.float32),
                   dtype=np.float32).tocsr()
    plan_s = sparse_dma.plan_sparse_matrix_dma(Xs, np.float32)
    Ws = jnp.asarray(rng.rand(ns, ks).astype(np.float32))
    Ts = jnp.asarray(rng.rand(ks, ds).astype(np.float32))
    Xd = jnp.asarray(Xs.toarray())
    wtx = sparse_dma.contract_wtx(plan_s, Ws)
    xtt = sparse_dma.contract_xtt(plan_s, Ts)
    e1 = float(jnp.abs(wtx - Ws.T @ Xd).max())
    e2 = float(jnp.abs(xtt - Ts @ Xd.T).max())
    print('stage1 parity errs %.3e %.3e' % (e1, e2), flush=True)
    assert e1 < 1e-3 and e2 < 1e-3, 'TPU lowering parity failure'

    # bf16 small parity
    plan_s16 = sparse_dma.plan_sparse_matrix_dma(Xs, np.dtype('bfloat16'))
    wtx16 = sparse_dma.contract_wtx(plan_s16, Ws.astype(jnp.bfloat16))
    rel = float(jnp.abs(wtx16 - Ws.T @ Xd).max() / jnp.abs(Ws.T @ Xd).max())
    print('stage1 bf16 rel %.3e' % rel, flush=True)
    assert rel < 0.02

    # ---- stage 2: big-shape per-direction timings -----------------------
    nnz = int(n * d * DENSITY)
    rows = rng.randint(0, n, nnz).astype(np.int64)
    cols = rng.randint(0, d, nnz).astype(np.int64)
    vals = rng.rand(nnz).astype(np.float32)
    Xsp = sp.coo_matrix((vals, (rows, cols)), shape=(n, d)).tocsr()
    print('nnz = %.1fM' % (Xsp.nnz / 1e6), flush=True)

    t0 = time.perf_counter()
    plan_hot = sparse_mxu.plan_sparse_matrix(Xsp, np.float32)
    jax.block_until_ready(plan_hot.t_phase.vals)
    t_hot = time.perf_counter() - t0
    t0 = time.perf_counter()
    plan_dma = sparse_dma.plan_sparse_matrix_dma(Xsp, np.float32)
    jax.block_until_ready(plan_dma.t_phase.vals)
    t_dma = time.perf_counter() - t0
    nch = plan_dma.t_phase.ftile.shape[0] - sparse_dma.MBLK_MAX
    print('plan build: onehot %.2f s, dma %.2f s (%d chunks t-phase)'
          % (t_hot, t_dma, nch), flush=True)

    W = jnp.asarray(np.abs(rng.rand(n, k)).astype(np.float32))
    T = jnp.asarray(np.abs(rng.rand(k, d)).astype(np.float32))

    def loopify(fn, plan, arg):
        @jax.jit
        def run(plan, arg):
            def body(i, acc):
                return acc + fn(plan, arg)[0, 0]
            return lax.fori_loop(0, REPS, body, jnp.float32(0))
        return lambda: run(plan, arg)

    cands = [
        ('onehot WtX', loopify(sparse_mxu.contract_wtx, plan_hot, W)),
        ('onehot XTt', loopify(sparse_mxu.contract_xtt, plan_hot, T)),
    ]
    for nbuf in (2, 4, 8):
        cands.append(('dmaN%-2d WtX' % nbuf, loopify(
            lambda p, a, nb=nbuf: sparse_dma.contract_wtx(p, a, nbuf=nb),
            plan_dma, W)))
        cands.append(('dmaN%-2d XTt' % nbuf, loopify(
            lambda p, a, nb=nbuf: sparse_dma.contract_xtt(p, a, nbuf=nb),
            plan_dma, T)))

    # bf16 variants
    plan_hot16 = sparse_mxu.plan_sparse_matrix(Xsp, np.dtype('bfloat16'))
    plan_dma16 = sparse_dma.plan_sparse_matrix_dma(Xsp,
                                                   np.dtype('bfloat16'))
    W16 = W.astype(jnp.bfloat16)
    cands.append(('onehot WtX bf16',
                  loopify(sparse_mxu.contract_wtx, plan_hot16, W16)))
    cands.append(('dmaN4  WtX bf16', loopify(
        lambda p, a: sparse_dma.contract_wtx(p, a, nbuf=4),
        plan_dma16, W16)))

    results = {name: [] for name, _ in cands}
    for name, fn in cands:          # compile + warm everything first
        results[name].append(timed(fn))
    for _ in range(ROUNDS - 1):     # interleaved rounds
        for name, fn in cands:
            results[name].append(timed(fn))
    for name, _ in cands:
        ts = results[name]
        print('%-18s min %8.3f ms   runs %s'
              % (name, min(ts), ' '.join('%.1f' % t for t in ts)),
              flush=True)

    # ---- stage 3: full sweep through each plan type ---------------------
    cfg = SweepConfig(k=k, reset_topic_method=None, update_order='phase')
    key = jax.random.PRNGKey(0)
    rl = jnp.asarray(0, jnp.int32)

    for label, plan in (('sweep onehot', plan_hot), ('sweep dma', plan_dma)):
        sweep = make_sparse_sweep(cfg, gs_kernels=True, mxu=True)

        @jax.jit
        def sweeps_n(plan, W, T):
            def body(i, carry):
                W, T, k2, r2 = carry
                return sweep(plan, W, T, k2, r2, k2)
            out = lax.fori_loop(0, REPS, body, (W, T, key, rl))
            return jnp.sum(out[0])

        s = float(sweeps_n(plan, W, T))
        assert np.isfinite(s)
        t0 = time.perf_counter()
        s = float(sweeps_n(plan, W, T))
        print('%-18s %8.3f ms/sweep'
              % (label, (time.perf_counter() - t0) / REPS * 1e3), flush=True)


if __name__ == '__main__':
    main()
