"""TPU: sparse contraction strategies for the sparse RRI sweep.

The round-1 sparse sweep (BCOO via jax.experimental.sparse) measured
236 ms/sweep at 50k×30k 0.5% — XLA lowers the BCOO contractions to
per-nnz gathers. Candidates measured here, per contraction and as a full
sweep:

- bcoo_dot_general (round-1 path)
- gather + segment_sum with row-sorted / col-sorted index copies
- dense GEMM on the densified matrix (floor; 6 GB at this size — only
  viable single-chip, for reference)
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import sparse as jsparse

n, d, k = 50000, 30000, 128
DENSITY = 0.005
REPS = 8


def make_data():
    rng = np.random.RandomState(0)
    nnz = int(n * d * DENSITY)
    # row-sorted (CSR order) coordinates
    flat = rng.choice(n * d, nnz, replace=False)
    flat.sort()
    rows = (flat // d).astype(np.int32)
    cols = (flat % d).astype(np.int32)
    vals = rng.rand(nnz).astype(np.float32)
    # col-sorted copy (CSC order)
    order = np.lexsort((rows, cols))
    return rows, cols, vals, order.astype(np.int32), nnz


def timed(label, fn, *args):
    r = fn(*args)
    s = float(jnp.sum(r[0]) if isinstance(r, tuple) else jnp.sum(r))
    assert np.isfinite(s), label
    t0 = time.perf_counter()
    r = fn(*args)
    s = float(jnp.sum(r[0]) if isinstance(r, tuple) else jnp.sum(r))
    dt = (time.perf_counter() - t0) / REPS
    print('%-40s %8.3f ms' % (label, dt * 1e3), flush=True)
    return dt


if __name__ == '__main__':
    rows, cols, vals, csc_order, nnz = make_data()
    print('nnz = %.1fM' % (nnz / 1e6), flush=True)
    rng = np.random.RandomState(1)

    dev = jax.device_put
    rows_d = dev(jnp.asarray(rows))
    cols_d = dev(jnp.asarray(cols))
    vals_d = dev(jnp.asarray(vals))
    rows_c = dev(jnp.asarray(rows[csc_order]))
    cols_c = dev(jnp.asarray(cols[csc_order]))
    vals_c = dev(jnp.asarray(vals[csc_order]))
    W = dev(jnp.asarray(np.abs(rng.rand(n, k)).astype(np.float32)))
    T = dev(jnp.asarray(np.abs(rng.rand(k, d)).astype(np.float32)))

    X_bcoo = jsparse.BCOO(
        (vals_d, jnp.stack([rows_d, cols_d], axis=1)), shape=(n, d))

    @jax.jit
    def bcoo_xt(W, T):
        def body(i, acc):
            XT = jsparse.bcoo_dot_general(
                X_bcoo, T.T, dimension_numbers=(((1,), (0,)), ((), ())))
            return acc + XT[0, 0]
        return lax.fori_loop(0, REPS, body, jnp.float32(0))

    @jax.jit
    def bcoo_wx(W, T):
        def body(i, acc):
            WX = jsparse.bcoo_dot_general(
                X_bcoo, W, dimension_numbers=(((0,), (0,)), ((), ())))
            return acc + WX[0, 0]
        return lax.fori_loop(0, REPS, body, jnp.float32(0))

    @jax.jit
    def seg_xt(W, T):
        # XT[i] = sum_j X_ij T[:,j] : gather T columns, segment-sum rows
        def body(i, acc):
            P = vals_d[:, None] * jnp.take(T.T, cols_d, axis=0)  # (nnz, k)
            XT = jax.ops.segment_sum(P, rows_d, num_segments=n,
                                     indices_are_sorted=True)
            return acc + XT[0, 0]
        return lax.fori_loop(0, REPS, body, jnp.float32(0))

    @jax.jit
    def seg_wx(W, T):
        def body(i, acc):
            P = vals_c[:, None] * jnp.take(W, rows_c, axis=0)    # (nnz, k)
            WXt = jax.ops.segment_sum(P, cols_c, num_segments=d,
                                      indices_are_sorted=True)   # (d, k)
            return acc + WXt[0, 0]
        return lax.fori_loop(0, REPS, body, jnp.float32(0))

    @jax.jit
    def dense_both(Xd, W, T):
        def body(i, acc):
            XT = Xd @ T.T
            WX = jnp.dot(W.T, Xd)
            return acc + XT[0, 0] + WX[0, 0]
        return lax.fori_loop(0, REPS, body, jnp.float32(0))

    # full sweeps: round-2 (bf16 contractions + Gram GS) and the
    # densified-on-device dense hybrid path
    import scipy.sparse as sp
    from rri_nmf_tpu.ops.sweep_xla import SweepConfig
    from rri_nmf_tpu.ops.sweep_sparse import make_sparse_sweep, to_bcoo
    Xsp = to_bcoo(sp.coo_matrix(
        (vals, (rows, cols)), shape=(n, d)).tocsr(), jnp.float32)
    cfg = SweepConfig(k=k, reset_topic_method=None, update_order='phase')
    key = jax.random.PRNGKey(0)
    rl = jnp.asarray(0, jnp.int32)

    def sweeps_fn(sweep, Xop):
        # X must be an ARGUMENT: a closed-over array becomes a jit
        # constant and is copied (via host!) into the executable
        @jax.jit
        def f(Xop, W, T):
            def body(i, carry):
                W, T, key2, rl2 = carry
                return sweep(Xop, W, T, key2, rl2, key2)
            out = lax.fori_loop(0, REPS, body, (W, T, key, rl))
            return out[0]
        return lambda W, T: f(Xop, W, T)

    # densified-on-device FIRST (clean HBM): one O(nnz) scatter, then
    # the dense hybrid sweep
    from rri_nmf_tpu.ops.dense_pallas import make_dense_phase_sweep_pallas
    @jax.jit
    def _densify(bc):
        return jnp.zeros(bc.shape, bc.data.dtype).at[
            bc.indices[:, 0], bc.indices[:, 1]].add(bc.data)

    t0 = time.perf_counter()
    Xd = _densify(Xsp)
    float(jnp.sum(Xd[0]))
    print('%-40s %8.3f ms (incl. compile)' % (
        'on-device densify (one-time)',
        (time.perf_counter() - t0) * 1e3), flush=True)
    del Xd                      # two 6 GB results would not fit HBM
    t0 = time.perf_counter()
    Xd = _densify(Xsp)
    float(jnp.sum(Xd[0]))
    print('%-40s %8.3f ms (compiled)' % (
        'on-device densify rerun',
        (time.perf_counter() - t0) * 1e3), flush=True)
    timed('densified dense hybrid sweep',
          sweeps_fn(make_dense_phase_sweep_pallas(cfg), Xd), W, T)
    from rri_nmf_tpu.ops.sweep_xla import make_sweep as _mk
    timed('densified dense XLA Gram sweep', sweeps_fn(_mk(cfg), Xd), W, T)
    del Xd

    # bf16 data PRE-materialized (the driver's fast path): the in-jit cast
    # variant loses the fast scatter path to cast/gather fusion
    Xsp16 = jsparse.BCOO((Xsp.data.astype(jnp.bfloat16), Xsp.indices),
                         shape=Xsp.shape, indices_sorted=True,
                         unique_indices=True)
    timed('r2 sparse sweep (bf16 DATA, XLA GS)',
          sweeps_fn(make_sparse_sweep(cfg, gemm_dtype=jnp.bfloat16),
                    Xsp16), W, T)
    timed('r2 sparse sweep (bf16 cast-in-jit)',
          sweeps_fn(make_sparse_sweep(cfg, gemm_dtype=jnp.bfloat16), Xsp),
          W, T)
    timed('r2 sparse sweep (bf16 gemm, Pallas GS)',
          sweeps_fn(make_sparse_sweep(cfg, gs_kernels=True,
                                      gemm_dtype=jnp.bfloat16), Xsp),
          W, T)
    timed('r2 sparse sweep (f32 gemm, XLA GS)',
          sweeps_fn(make_sparse_sweep(cfg), Xsp), W, T)
