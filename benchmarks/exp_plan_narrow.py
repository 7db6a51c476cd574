"""Measure the narrow (uint8) sparse-plan transfer vs the old int32 form.

The chunk plans' gloc/sloc arrays are ``% 128`` local indices; since the
narrow-plan change the host builders emit them uint8 and the device
widens to int32 on arrival (``sparse_mxu._widen_i32``). Over the ~45
MB/s tunnel the transfer is the dominant non-build cost of
``plan_sparse_matrix`` at production nnz, so this times, at the
round-3 sparse benchmark shape (50k x 30k, 0.5%, 7.5M nnz):

- host plan build (counting-sort C++ path) wall-clock,
- device placement of the real uint8 arrays vs int32 copies of the
  same arrays (what the old code transferred),
- end-to-end ``plan_sparse_matrix`` and a 3-sweep MXU fit preflight
  (same numbers as results_round3_sparse_dma.json's setup).

Writes benchmarks/results_round3_plan_narrow.json.
"""
import json
import os
import sys
import time

import numpy as np
import scipy.sparse

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp


def sync(x):
    # tunnel-safe sync: scalar readback, not block_until_ready
    return float(jnp.sum(x.astype(jnp.float32) if x.dtype == jnp.uint8
                         else x))


def time_put(arrs, widen):
    # the narrow path is exactly what plan placement runs in production:
    # the shared jitted widen (sparse_mxu._widen_i32), compiled once and
    # warmed OUTSIDE the timed window so only transfer + on-device cast
    # are measured
    from rri_nmf_tpu.ops.sparse_mxu import _widen_i32
    if widen:
        # warm the jit cache per distinct input shape (jit keys on avals)
        for shp in sorted({a.shape for a in arrs}):
            sync(_widen_i32(np.zeros(shp, np.uint8)))
    t0 = time.perf_counter()
    devs = []
    for a in arrs:
        d = jnp.asarray(a)
        if widen:
            d = _widen_i32(d)
        devs.append(d)
    for d in devs:
        sync(d)
    return time.perf_counter() - t0, devs


def main():
    import rri_nmf_tpu.ops.sparse_mxu as sm

    print('backend:', jax.default_backend())
    rng = np.random.RandomState(0)
    n, d, dens = 50000, 30000, 0.005
    nnz = int(n * d * dens)
    # sample with replacement (RandomState.choice without replacement
    # permutes all n*d — CLAUDE.md gotcha); duplicates are summed by COO
    ii = rng.randint(0, n, nnz)
    jj = rng.randint(0, d, nnz)
    vv = rng.rand(nnz).astype(np.float32)
    X = scipy.sparse.coo_matrix((vv, (ii, jj)), shape=(n, d)).tocsr()
    print('nnz:', X.nnz)

    coo = X.tocoo()
    t0 = time.perf_counter()
    host_t = sm._plan_direction_np(coo.row, coo.col, coo.data,
                                   -(-n // 128), -(-d // 128),
                                   128, 8, np.float32)
    host_w = sm._plan_direction_np(coo.col, coo.row, coo.data,
                                   -(-d // 128), -(-n // 128),
                                   128, 8, np.float32)
    t_build = time.perf_counter() - t0
    print('host build (both directions): %.2f s' % t_build)

    narrow_arrs = [host_t[1], host_t[2], host_w[1], host_w[2]]
    nbytes_narrow = sum(a.nbytes for a in narrow_arrs)
    wide_arrs = [a.astype(np.int32) for a in narrow_arrs]
    nbytes_wide = sum(a.nbytes for a in wide_arrs)

    t_narrow, devs = time_put(narrow_arrs, widen=True)
    del devs
    t_wide, devs = time_put(wide_arrs, widen=False)
    del devs
    # second reps to absorb tunnel drift
    t_narrow2, devs = time_put(narrow_arrs, widen=True)
    del devs
    t_wide2, devs = time_put(wide_arrs, widen=False)
    del devs
    t_narrow = min(t_narrow, t_narrow2)
    t_wide = min(t_wide, t_wide2)
    print('gloc/sloc transfer+widen narrow: %.2f s (%.1f MB)'
          % (t_narrow, nbytes_narrow / 1e6))
    print('gloc/sloc transfer wide (old):  %.2f s (%.1f MB)'
          % (t_wide, nbytes_wide / 1e6))

    t0 = time.perf_counter()
    plan = sm.plan_sparse_matrix(X, np.float32, group=8)
    sync(plan.t_phase.vals)
    sync(plan.t_phase.gloc)
    sync(plan.w_phase.vals)
    sync(plan.w_phase.gloc)
    t_e2e = time.perf_counter() - t0
    print('plan_sparse_matrix end-to-end: %.2f s' % t_e2e)

    # 3-sweep preflight: the kernel runs identically on the widened plan
    from rri_nmf_tpu.nmf import nmf
    t0 = time.perf_counter()
    soln = nmf(X, 128, sparse='mxu', max_iter=3, random_state=0,
               update_order='phase', reset_topic_method=None,
               dtype='float32')
    t_fit = time.perf_counter() - t0
    ok = bool(np.isfinite(soln['W']).all())
    print('3-sweep mxu fit: %.2f s, finite: %s' % (t_fit, ok))

    out = {
        'shape': [n, d], 'density': dens, 'nnz': int(X.nnz),
        'note': 'narrow (uint8) plan-index transfer vs the old int32 '
                'form at the round-3 sparse shape; min-of-2, scalar-'
                'readback sync on the tunneled chip. The narrow form is '
                'what plan_sparse_matrix ships since the uint8 change; '
                'the wide timing transfers int32 copies of the same '
                'arrays (what the old code sent).',
        'host_build_seconds': t_build,
        'transfer_narrow_seconds': t_narrow,
        'transfer_narrow_mb': nbytes_narrow / 1e6,
        'transfer_wide_seconds': t_wide,
        'transfer_wide_mb': nbytes_wide / 1e6,
        'speedup': t_wide / t_narrow,
        'plan_end_to_end_seconds': t_e2e,
        'fit3_mxu_seconds': t_fit,
    }
    with open('benchmarks/results_round3_plan_narrow.json', 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
