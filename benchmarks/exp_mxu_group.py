"""TPU: sparse-MXU chunk grouping sweep (ROADMAP round-2 #1 headroom note).

``plan_sparse_matrix(group=G)`` packs G 8x128 chunks into one kernel grid
step (each group confined to one output tile, padded with v=0 dummies).
Larger G amortizes Mosaic's fixed per-grid-step cost over more MXU work
but adds padding waste when tile buckets are shallow. Round-2 shipped
G=8 untuned; this measures the contraction at G in {4, 8, 16, 32} on the
recorded 50k x 30k 0.5% k=128 config plus the padding overhead of each
plan (padded chunk slots / true nnz ceiling).

Writes benchmarks/results_round3_mxu_group.json.
"""
import json
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
GROUPS = (4, 8, 16, 32)


def main():
    import scipy.sparse as sp

    from rri_nmf_tpu.ops.sparse_mxu import (
        TILE, contract_wtx, plan_sparse_matrix)

    rng = np.random.RandomState(0)
    nnz = int(n * d * DENSITY)
    # with replacement: choice-without-replacement permutes n*d cells
    rows = rng.randint(0, n, nnz).astype(np.int64)
    cols = rng.randint(0, d, nnz).astype(np.int64)
    vals = rng.rand(nnz).astype(np.float32)
    Xsp = sp.coo_matrix((vals, (rows, cols)), shape=(n, d)).tocsr()
    print('nnz = %.1fM' % (Xsp.nnz / 1e6), flush=True)

    W = jnp.asarray(np.abs(rng.rand(n, k)).astype(np.float32))

    @jax.jit
    def wtx_n(plan, W):
        def body(i, acc):
            r = contract_wtx(plan, W)
            return acc + r[0, 0]
        return lax.fori_loop(0, REPS, body, jnp.float32(0))

    out = {'config': {'n': n, 'd': d, 'k': k, 'density': DENSITY,
                      'nnz': int(Xsp.nnz), 'reps': REPS},
           'groups': []}
    ref = None
    for G in GROUPS:
        t0 = time.perf_counter()
        plan = plan_sparse_matrix(Xsp, np.float32, group=G)
        jax.block_until_ready(plan.t_phase.vals)
        build_s = time.perf_counter() - t0
        nchunks = int(plan.t_phase.ftile.shape[0])
        slots = nchunks * TILE
        pad_ratio = slots / Xsp.nnz
        r = contract_wtx(plan, W)
        if ref is None:
            ref = np.asarray(r)
        else:
            err = float(np.max(np.abs(np.asarray(r) - ref))
                        / max(1e-30, float(np.max(np.abs(ref)))))
            assert err < 1e-5, 'group=%d diverges: %.2e' % (G, err)
        s = float(wtx_n(plan, W))     # compile + sync
        assert np.isfinite(s)
        t0 = time.perf_counter()
        float(wtx_n(plan, W))
        ms = (time.perf_counter() - t0) / REPS * 1e3
        ns_chunk = ms * 1e6 / nchunks
        print('group=%-3d chunks %8d  pad %.3fx  build %6.2f s  '
              'WᵀX %8.3f ms  (%.0f ns/chunk)'
              % (G, nchunks, pad_ratio, build_s, ms, ns_chunk), flush=True)
        out['groups'].append({'group': G, 'chunks': nchunks,
                              'pad_ratio': round(pad_ratio, 4),
                              'plan_build_s': round(build_s, 2),
                              'wtx_ms': round(ms, 3),
                              'ns_per_chunk': round(ns_chunk, 1)})

    path = Path(__file__).parent / 'results_round3_mxu_group.json'
    path.write_text(json.dumps(out, indent=1))
    print('wrote', path)


if __name__ == '__main__':
    main()
