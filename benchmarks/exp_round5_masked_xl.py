"""Round-5 XL masked records: k=256 and 100M observations on ONE chip.

Extends `exp_round5_masked.py`'s record shape along both axes the
recommender pillar scales on:

1. **k=256 at 100k x 50k / 25M obs** — panel-tiled Gram-phase sweep
   (full Γ/Θ would be 393 GB; the VMEM row cap picks 5-topic panels).
   The reference's dense masked sweep at this shape/rank would be
   O(ndk²) with n*d = 5e9 dense doubles — unrepresentable, let alone
   runnable (`/root/reference/src/rri_nmf/nmf.py:687-746`).
2. **k=32 at 100k x 50k / 100M obs** (8% dense observed set) — the
   O(nnz) plan is ~2.4 GB on device where the dense problem is 20 GB.

Writes benchmarks/results_round5_masked_xl.json. Run on the real TPU:
    python benchmarks/exp_round5_masked_xl.py
"""

import json
import time
from pathlib import Path

import numpy as np

from exp_round5_masked import build_problem, time_sweeps


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument('--retry-errors', action='store_true',
                    help='re-attempt sections whose previous run '
                         'recorded an error (default: skip them — an '
                         'OOM retry can crash the TPU worker)')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rri_nmf_tpu.ops.sweep_masked_gram import (auto_panel,
        make_masked_gram_sweep, plan_masked_gram)
    from rri_nmf_tpu.ops.sweep_xla import SweepConfig

    assert jax.default_backend() == 'tpu', jax.default_backend()
    n, d = 100_000, 50_000
    out = Path(__file__).parent / 'results_round5_masked_xl.json'
    results = {'shape': [n, d]}
    if out.exists():
        prev = json.loads(out.read_text())
        if prev.get('shape') == [n, d]:
            results.update(prev)

    key = jax.random.PRNGKey(0)
    # per-section RNG streams: resumed runs would otherwise hand later
    # sections different draws than fresh runs did
    rng = np.random.RandomState(7)
    rng100 = np.random.RandomState(8)

    # ---- k = 256 --------------------------------------------------------
    def k256_attempt(tag, kn, kd, nnz):
        # a recorded error skips the section by default (an OOM retry
        # can crash the TPU worker); pass --retry-errors after fixing
        # the underlying bug to re-attempt
        if ('%s_s_per_sweep' % tag) in results:
            return True
        if ('%s_error' % tag) in results:
            if not args.retry_errors:
                return False
            results.pop('%s_error' % tag)
        kp = 256
        try:
            X, M = build_problem(kn, kd, nnz)
            panel = auto_panel(kp, kn, kd, 4, mxu=True)
            assert panel and panel >= 1, panel
            results['%s_panel_size' % tag] = panel
            cfg = SweepConfig(k=kp, masked=True, masked_sparse=True,
                              update_order='phase',
                              reset_topic_method=None)
            t0 = time.perf_counter()
            plan = plan_masked_gram(X, M, np.float32, backend='mxu')
            results['%s_plan_s' % tag] = round(
                time.perf_counter() - t0, 1)
            sweep = make_masked_gram_sweep(cfg, backend='mxu',
                                           panel=panel)
            W = jnp.asarray(rng.rand(kn, kp).astype(np.float32))
            T = jnp.asarray(rng.rand(kp, kd).astype(np.float32))
            results['%s_s_per_sweep' % tag] = round(
                time_sweeps(sweep, plan, W, T, key, reps=2,
                            sweeps_per_rep=1), 3)
            print('%s: k=256 panel(%d) gram: %s s/sweep'
                  % (tag, panel, results['%s_s_per_sweep' % tag]),
                  flush=True)
            ok = True
        except Exception as e:  # noqa: BLE001 - record and continue
            results['%s_error' % tag] = str(e)[:300]
            print('%s failed (%s...)' % (tag, str(e)[:120]), flush=True)
            ok = False
        out.write_text(json.dumps(results, indent=1))
        return ok

    # full record shape first; the 52 unrolled panel steps currently
    # cost ~18.8 GB of live buffers there (recorded), so fall back to
    # the half shape for a one-chip k=256 record
    if not k256_attempt('k256', n, d, 25_000_000):
        k256_attempt('k256_half', n // 2, d // 2, 12_500_000)

    # ---- k = 32 at 100M obs --------------------------------------------
    if 'nnz100m_gram_s_per_sweep' not in results:
        t0 = time.perf_counter()
        X, M = build_problem(n, d, 100_000_000, seed=1)
        results['nnz100m_host_build_s'] = round(
            time.perf_counter() - t0, 1)
        results['nnz100m_true_nnz'] = int(X.nnz)
        k = 32
        cfg = SweepConfig(k=k, masked=True, masked_sparse=True,
                          update_order='phase', reset_topic_method=None)
        t0 = time.perf_counter()
        plan = plan_masked_gram(X, M, np.float32, backend='mxu')
        results['nnz100m_plan_s'] = round(time.perf_counter() - t0, 1)
        sweep = make_masked_gram_sweep(cfg, backend='mxu')
        W = jnp.asarray(rng100.rand(n, k).astype(np.float32))
        T = jnp.asarray(rng100.rand(k, d).astype(np.float32))
        results['nnz100m_gram_s_per_sweep'] = round(
            time_sweeps(sweep, plan, W, T, key, reps=2,
                        sweeps_per_rep=1), 3)
        print('100M-obs k=32 gram: %s s/sweep'
              % results['nnz100m_gram_s_per_sweep'], flush=True)
        out.write_text(json.dumps(results, indent=1))

    print(json.dumps(results, indent=1))


if __name__ == '__main__':
    main()
