"""Round-5 TPU records: mesh Gram-phase masked sweep + k-panel tiling.

Measures, at the round-4 record shape (100k x 50k, 25M observations):

1. the (1, 1)-mesh Gram-phase masked sweep (parallel/masked_gram_mesh,
   'mxu' backend) vs the single-device Gram sweep (the mesh path's
   per-device program is the thing that runs on every chip of a real
   (dp, 1) pod; on one chip its absolute time also bounds the pod's
   per-sweep time from below, since the T-phase psum only adds ICI
   time) and vs the interleaved O(nnz) mesh sweep it replaces;
2. the k-panel Gram sweep at k=128 — a rank the full-tensor path cannot
   hold (k^2(n+d)*4B = 98 GB) — vs the interleaved fallback it
   previously got (VERDICT r5 item 3's done-criterion);
3. an HBM-bandwidth probe (device copy of an X-sized array) for the
   BASELINE.md roofline note.

Writes benchmarks/results_round5_masked.json. Run on the real TPU:
    python benchmarks/exp_round5_masked.py [--nnz 25000000]
"""

import argparse
import json
import time
from pathlib import Path

import numpy as np


def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x).astype(jnp.float32))


def build_problem(n, d, nnz, seed=0):
    """Host COO observed set (sampled with replacement; duplicates sum,
    matching scipy semantics)."""
    import scipy.sparse as sp
    rng = np.random.RandomState(seed)
    rows = rng.randint(0, n, nnz).astype(np.int64)
    cols = rng.randint(0, d, nnz).astype(np.int64)
    vals = rng.rand(nnz).astype(np.float32) + 0.5
    X = sp.coo_matrix((vals, (rows, cols)), shape=(n, d)).tocsr()
    M = X.copy()
    M.data = np.ones_like(M.data)
    return X, M


def time_sweeps(sweep, plan, W, T, key, reps=3, sweeps_per_rep=2):
    import jax
    import jax.numpy as jnp
    rl = jnp.asarray(0, jnp.int32)
    rk = jax.random.PRNGKey(1)
    # warm compile + one execution
    W1, T1, key, rl = sweep(plan, W, T, key, rl, rk)
    sync(W1)
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        Wc, Tc = W, T
        for _ in range(sweeps_per_rep):
            Wc, Tc, key, rl = sweep(plan, Wc, Tc, key, rl, rk)
        sync(Wc)
        best = min(best, (time.perf_counter() - t0) / sweeps_per_rep)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=100_000)
    ap.add_argument('--d', type=int, default=50_000)
    ap.add_argument('--nnz', type=int, default=25_000_000)
    ap.add_argument('--k', type=int, default=32)
    ap.add_argument('--k-panel', type=int, default=128)
    ap.add_argument('--skip-interleaved', action='store_true')
    ap.add_argument('--resume', action='store_true',
                    help='load the existing results JSON and skip '
                         'sections whose keys are already present')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rri_nmf_tpu.ops.sweep_masked_gram import (auto_panel,
        make_masked_gram_sweep, plan_masked_gram)
    from rri_nmf_tpu.ops.sweep_xla import SweepConfig
    from rri_nmf_tpu.parallel.masked_gram_mesh import (
        make_sharded_masked_gram_sweep, partition_masked_gram)
    from rri_nmf_tpu.parallel.masked_sparse_mesh import (
        make_sharded_masked_sparse_sweep, partition_masked_coo)
    from rri_nmf_tpu.parallel.mesh import make_mesh

    assert jax.default_backend() == 'tpu', jax.default_backend()
    n, d, k = args.n, args.d, args.k
    results = {'shape': [n, d], 'nnz': args.nnz, 'k': k,
               'k_panel': args.k_panel}
    out = Path(__file__).parent / 'results_round5_masked.json'
    if args.resume and out.exists():
        prev = json.loads(out.read_text())
        if (prev.get('shape') == [n, d] and prev.get('nnz') == args.nnz
                and prev.get('k') == args.k
                and prev.get('k_panel') == args.k_panel):
            results.update(prev)
        else:
            print('resume: existing results are for a different '
                  'config; measuring everything fresh', flush=True)

    # ---- HBM bandwidth probe (roofline denominator) ---------------------
    # ONE jitted fori_loop of streaming passes + one scalar readback: a
    # per-dispatch loop pays the axon tunnel's dispatch latency on every
    # pass and reported ~130 GB/s on a ~819 GB/s part. XLA does not
    # unroll/fold while-loops, so each pass really streams the array.
    if 'hbm_copy_gbs' not in results:
        from jax import lax
        big = jnp.ones((16384, 8192), jnp.float32)   # 512 MiB
        reps = 32

        @jax.jit
        def stream(x):
            return lax.fori_loop(0, reps,
                                 lambda i, a: a * 0.999999 + 1e-7, x)

        sync(stream(big))
        t0 = time.perf_counter()
        big = stream(big)
        sync(big)
        dt = (time.perf_counter() - t0) / reps
        results['hbm_copy_gbs'] = round(2 * big.nbytes / dt / 1e9, 1)
        print('HBM r+w stream:', results['hbm_copy_gbs'], 'GB/s',
              flush=True)
        del big

    print('building problem...', flush=True)
    t0 = time.perf_counter()
    X, M = build_problem(n, d, args.nnz)
    results['host_build_s'] = round(time.perf_counter() - t0, 1)

    rng = np.random.RandomState(7)
    W0 = rng.rand(n, k).astype(np.float32)
    T0 = rng.rand(k, d).astype(np.float32)
    key = jax.random.PRNGKey(0)
    cfg = SweepConfig(k=k, masked=True, masked_sparse=True,
                      update_order='phase', reset_topic_method=None)

    # ---- single-device Gram sweep (round-4 record config) ---------------
    W = jnp.asarray(W0)
    T = jnp.asarray(T0)
    if 'gram_single_s_per_sweep' not in results:
        t0 = time.perf_counter()
        plan1 = plan_masked_gram(X, M, np.float32, backend='mxu')
        results['plan_single_s'] = round(time.perf_counter() - t0, 1)
        sweep1 = make_masked_gram_sweep(cfg, backend='mxu')
        results['gram_single_s_per_sweep'] = round(
            time_sweeps(sweep1, plan1, W, T, key), 4)
        print('single-device gram:', results['gram_single_s_per_sweep'],
              's/sweep', flush=True)
        out.write_text(json.dumps(results, indent=1))
        del plan1

    # ---- (1, 1)-mesh Gram sweep (the distributed program) ---------------
    mesh = make_mesh(1, mesh_shape=(1, 1))
    if 'gram_mesh_s_per_sweep' not in results:
        t0 = time.perf_counter()
        plan_m = partition_masked_gram(X, M, mesh, np.float32,
                                       backend='mxu')
        results['plan_mesh_s'] = round(time.perf_counter() - t0, 1)
        sweep_m = make_sharded_masked_gram_sweep(cfg, mesh, backend='mxu',
                                                 group=plan_m.group,
                                                 interpret=False)
        results['gram_mesh_s_per_sweep'] = round(
            time_sweeps(sweep_m, plan_m, W, T, key), 4)
        print('(1,1)-mesh gram:', results['gram_mesh_s_per_sweep'],
              's/sweep', flush=True)
        out.write_text(json.dumps(results, indent=1))
        del plan_m

    # ---- interleaved O(nnz) mesh sweep (what the mesh path was) ---------
    # the interleaved sweeps run the reference update order; the phase
    # cfg above would fail their support gates. On one 16 GB chip the
    # interleaved program OOMs at this shape (23.9 GB HBM requirement:
    # its per-topic gathers materialize (nnz,)-sized temporaries the Gram
    # path never builds) — itself a result; record it and fall back to
    # the round-4 single-device interleaved measurement (54.9 s/sweep,
    # results_round4_masked_gram.json, same shape/algorithm) for the
    # headline ratio.
    cfg_i = SweepConfig(k=k, masked=True, masked_sparse=True,
                        update_order='interleaved', reset_topic_method=None)
    if not args.skip_interleaved and \
            'interleaved_mesh_s_per_sweep' not in results and \
            'interleaved_mesh_error' not in results:
        try:
            plan_i = partition_masked_coo(X, M, mesh, np.dtype(np.float32))
            sweep_i = make_sharded_masked_sparse_sweep(cfg_i, mesh)
            results['interleaved_mesh_s_per_sweep'] = round(
                time_sweeps(sweep_i, plan_i, W, T, key, reps=1,
                            sweeps_per_rep=1), 2)
            print('interleaved mesh:',
                  results['interleaved_mesh_s_per_sweep'],
                  's/sweep', flush=True)
            results['mesh_gram_vs_interleaved_x'] = round(
                results['interleaved_mesh_s_per_sweep']
                / results['gram_mesh_s_per_sweep'], 1)
            del plan_i
        except Exception as e:  # noqa: BLE001 - record OOM and continue
            results['interleaved_mesh_error'] = str(e)[:300]
            results['interleaved_round4_single_dev_s_per_sweep'] = 54.9
            results['mesh_gram_vs_round4_interleaved_x'] = round(
                54.9 / results['gram_mesh_s_per_sweep'], 1)
            print('interleaved mesh failed (%s...); using the round-4 '
                  'single-device interleaved record for the ratio'
                  % str(e)[:120], flush=True)
    out.write_text(json.dumps(results, indent=1))

    # ---- k = 128 panel record (full tensors cannot exist) ---------------
    kp = args.k_panel
    panel = auto_panel(kp, n, d, 4)
    assert panel is not None and panel >= 1, panel
    results['panel_size'] = panel
    cfg_p = SweepConfig(k=kp, masked=True, masked_sparse=True,
                        update_order='phase', reset_topic_method=None)
    Wp = jnp.asarray(rng.rand(n, kp).astype(np.float32))
    Tp = jnp.asarray(rng.rand(kp, d).astype(np.float32))
    if 'gram_k128_panel_s_per_sweep' not in results:
        plan_p = plan_masked_gram(X, M, np.float32, backend='mxu')
        sweep_p = make_masked_gram_sweep(cfg_p, backend='mxu', panel=panel)
        results['gram_k128_panel_s_per_sweep'] = round(
            time_sweeps(sweep_p, plan_p, Wp, Tp, key, reps=2,
                        sweeps_per_rep=1), 3)
        print('k=128 panel(%d) gram:' % panel,
              results['gram_k128_panel_s_per_sweep'], 's/sweep',
              flush=True)
        del plan_p
        out.write_text(json.dumps(results, indent=1))
    # the interleaved fallback at k=128 for comparison (single sweep,
    # single-device O(nnz) path it previously got)
    # ---- k = 128 panels ON THE MESH (the distributed large-k program) --
    if 'gram_mesh_k128_s_per_sweep' not in results and \
            'gram_mesh_k128_error' not in results:
        try:
            plan_mp = partition_masked_gram(X, M, mesh, np.float32,
                                            backend='mxu')
            sweep_mp = make_sharded_masked_gram_sweep(
                cfg_p, mesh, backend='mxu', group=plan_mp.group,
                interpret=False, panel=panel)
            results['gram_mesh_k128_s_per_sweep'] = round(
                time_sweeps(sweep_mp, plan_mp, Wp, Tp, key, reps=2,
                            sweeps_per_rep=1), 3)
            print('k=128 panel(%d) MESH gram:' % panel,
                  results['gram_mesh_k128_s_per_sweep'], 's/sweep',
                  flush=True)
            del plan_mp
        except Exception as e:  # noqa: BLE001 - record and continue
            results['gram_mesh_k128_error'] = str(e)[:300]
            print('mesh k=128 failed (%s...)' % str(e)[:120], flush=True)
        out.write_text(json.dumps(results, indent=1))

    if not args.skip_interleaved and \
            'interleaved_k128_s_per_sweep' not in results and \
            'interleaved_k128_error' not in results:
        try:
            from rri_nmf_tpu.ops.sweep_masked_sparse import (
                make_masked_sparse_sweep, plan_masked_coo)
            cfg_pi = SweepConfig(k=kp, masked=True, masked_sparse=True,
                                 update_order='interleaved',
                                 reset_topic_method=None)
            plan_ic = plan_masked_coo(X, M, np.dtype(np.float32))
            sweep_ic = make_masked_sparse_sweep(cfg_pi)
            results['interleaved_k128_s_per_sweep'] = round(
                time_sweeps(sweep_ic, plan_ic, Wp, Tp, key, reps=1,
                            sweeps_per_rep=1), 2)
            results['k128_panel_vs_interleaved_x'] = round(
                results['interleaved_k128_s_per_sweep']
                / results['gram_k128_panel_s_per_sweep'], 1)
            print('k=128 interleaved:',
                  results['interleaved_k128_s_per_sweep'], 's/sweep',
                  flush=True)
        except Exception as e:  # noqa: BLE001 - record OOM and continue
            results['interleaved_k128_error'] = str(e)[:300]
            print('k=128 interleaved failed (%s...)' % str(e)[:120],
                  flush=True)

    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == '__main__':
    main()
