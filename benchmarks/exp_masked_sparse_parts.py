"""Decompose the sparse-mask WRRI sweep's per-topic cost on the TPU.

Times each primitive the topic body is made of, at the beyond-HBM run's
observation count, DCE-proofed with loop-carried operands and synced by
scalar readback (block_until_ready lies on the axon tunnel — CLAUDE.md):

- gather      w[rows]                 (nnz scalars from an (n,) vector)
- seg_rows    segment_sum keyed by sorted row ids  -> (n,)
- seg_cols    segment_sum keyed by unsorted col ids -> (d,)
- axpy        r + m * (a * b)         (pure VPU streaming, the floor)
- full topic body (T+W phases) and one full k-topic sweep

Writes benchmarks/results_round4_masked_sparse_parts.json.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, iters=8, label=''):
    out = fn(*args)
    _sync = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    dt = (time.perf_counter() - t0) / iters
    print('%-28s %8.2f ms' % (label, 1e3 * dt), flush=True)
    del _sync
    return dt


def main():
    n, d, k = 100_000, 50_000, 32
    nnz = 25_000_000
    rng = np.random.RandomState(0)
    rows = np.sort(rng.randint(0, n, nnz)).astype(np.int32)
    cols = rng.randint(0, d, nnz).astype(np.int32)

    rows_d = jnp.asarray(rows)
    cols_d = jnp.asarray(cols)
    key = jax.random.PRNGKey(0)
    r = jax.random.uniform(key, (nnz,), jnp.float32)
    m = jnp.ones((nnz,), jnp.float32)
    w = jax.random.uniform(key, (n,), jnp.float32)
    t = jax.random.uniform(key, (d,), jnp.float32)
    float(jnp.sum(r))
    print('data on device', flush=True)

    res = {'config': 'masked_sparse_parts_nnz%d_n%d_d%d' % (nnz, n, d),
           'device': str(jax.devices()[0]), 'ms': {}}

    @jax.jit
    def f_gather_rows(w, r):
        return w[rows_d] * r                       # carried through r

    @jax.jit
    def f_gather_cols(t, r):
        return t[cols_d] * r

    @jax.jit
    def f_seg_rows(x):
        return jax.ops.segment_sum(x, rows_d, num_segments=n,
                                   indices_are_sorted=True)

    @jax.jit
    def f_seg_rows_unsorted(x):
        return jax.ops.segment_sum(x, rows_d, num_segments=n)

    @jax.jit
    def f_seg_cols(x):
        return jax.ops.segment_sum(x, cols_d, num_segments=d)

    @jax.jit
    def f_axpy(r, a, b):
        return r + m * (a * b)

    res['ms']['gather_rows'] = 1e3 * timed(f_gather_rows, (w, r),
                                           label='gather w[rows]*r')
    res['ms']['gather_cols'] = 1e3 * timed(f_gather_cols, (t, r),
                                           label='gather t[cols]*r')
    a = f_gather_rows(w, r)
    b = f_gather_cols(t, r)
    res['ms']['seg_rows_sorted'] = 1e3 * timed(
        f_seg_rows, (a,), label='segsum rows (sorted)')
    res['ms']['seg_rows_unsorted'] = 1e3 * timed(
        f_seg_rows_unsorted, (a,), label='segsum rows (unsorted flag)')
    res['ms']['seg_cols'] = 1e3 * timed(f_seg_cols, (a,),
                                        label='segsum cols (unsorted)')
    res['ms']['axpy'] = 1e3 * timed(f_axpy, (r, a, b),
                                    label='r + m*(a*b) stream')

    @jax.jit
    def f_cumsum(x):
        return jnp.cumsum(x)

    res['ms']['cumsum'] = 1e3 * timed(f_cumsum, (a,),
                                      label='cumsum over nnz')

    # one full T+W topic body as the sweep runs it
    from rri_nmf_tpu.ops.sweep_masked_sparse import (MaskedCOOPlan,
        make_masked_sparse_sweep)
    from rri_nmf_tpu.ops.sweep_xla import SweepConfig
    plan = MaskedCOOPlan(rows=rows_d, cols=cols_d, x_vals=r, m_vals=m,
                         shape=(n, d), nnz=nnz)
    cfg = SweepConfig(k=k, masked=True, masked_sparse=True,
                      reset_topic_method=None, t_row_sum=5.0)
    sweep = make_masked_sparse_sweep(cfg)
    W = jax.random.uniform(key, (n, k), jnp.float32)
    T = jax.random.uniform(key, (k, d), jnp.float32)
    rl = jnp.asarray(0, jnp.int32)

    def f_sweep(W, T):
        W, T, _, _ = sweep(plan, W, T, key, rl, key)
        return W, T

    t0 = time.perf_counter()
    W1, T1 = f_sweep(W, T)
    float(jnp.sum(W1))
    res['ms']['sweep_first_incl_compile'] = 1e3 * (time.perf_counter() - t0)
    print('first sweep (incl compile): %.1f s'
          % (res['ms']['sweep_first_incl_compile'] / 1e3), flush=True)
    dt = timed(f_sweep, (W, T), iters=3, label='full %d-topic sweep' % k)
    res['ms']['sweep'] = 1e3 * dt
    res['ms_per_topic'] = 1e3 * dt / k
    res['effective_GBps_per_topic_pass'] = (
        6 * nnz * 4 / (dt / k) / 1e9)

    p = Path(__file__).parent / 'results_round4_masked_sparse_parts.json'
    p.write_text(json.dumps(res, indent=1))
    print('wrote', p, flush=True)


if __name__ == '__main__':
    main()
