"""TPU: HER extrapolation on the masked WRRI path (recommender class).

Measures at the MovieLens-1M-class shape used by
results_round3_masked_inference.json (6144 x 4096, k=40, low-rank truth,
~4.5%-dense mask):

1. ms/sweep, plain vs HER (grouped dispatch, no objective tracking) —
   HER's overhead is the per-sweep masked-objective restart check
   (one W@T GEMM + masked reduction);
2. masked relative error on observed entries vs sweep count (objective
   histories from a tracked run) — the rate win;
3. the combination: wall-clock to each error target = ms/sweep x
   sweeps-to-target, drift-robust (per-sweep cost and rate are measured
   separately so tunnel-chip timing drift cannot fake a rate win).

Writes benchmarks/results_round3_her_masked.json.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

n, d, k = 6144, 4096, 40
DENSITY = 0.045
TIMED_SWEEPS = 50
TRACKED_SWEEPS = 400
TARGETS = (0.10, 0.03, 0.01, 0.003)
# soft wall-clock budget: exit cleanly (partials already written) well
# before the queue's hard `timeout 3600` — a SIGTERM mid-TPU-operation
# wedges the tunnel for ~15 min (CLAUDE.md)
DEADLINE = time.time() + 2700


def main():
    import jax
    import jax.numpy as jnp

    from rri_nmf_tpu.nmf import nmf

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    # generate ON DEVICE (tunnel transfers ~45 MB/s); mean-dominated
    # U[0,1] factors — the class HER exists for. X and M stay DEVICE
    # arrays through every nmf() call (the driver's jnp.asarray is a
    # no-op and X_host is lazy) — no host round-trips.
    Wt = jax.random.uniform(k1, (n, k), jnp.float32)
    Tt = jax.random.uniform(k2, (k, d), jnp.float32)
    X = Wt @ Tt
    M = (jax.random.uniform(k3, (n, d), jnp.float32) < DENSITY
         ).astype(jnp.float32)
    float(jnp.sum(X)); float(jnp.sum(M))   # sync

    base = dict(k=k, random_state=0, early_stop=False,
                reset_topic_method=None, eps_stop=0.0, W_mat=M)
    Xh = X

    out = {'config': {'n': n, 'd': d, 'k': k, 'density': DENSITY},
           'solvers': {}}
    path = Path(__file__).parent / 'results_round3_her_masked.json'
    denom = None
    for name, extra in (('plain', {}), ('her', {'accel': 'her'})):
        if time.time() > DEADLINE:
            print('soft deadline hit; partial results stand', flush=True)
            break
        # --- per-sweep cost: grouped dispatch, no per-iter host work.
        # Each nmf() call pays a fixed setup (X/M cross the ~45 MB/s
        # tunnel, init); DIFFERENCE two sweep counts to cancel it.
        def _run(nsweeps):
            t0 = time.perf_counter()
            s = nmf(Xh, max_iter=nsweeps, sweeps_per_dispatch=nsweeps,
                    **base, **extra)
            float(np.sum(s['W']))
            return time.perf_counter() - t0

        _run(5)                      # compile both group sizes
        _run(5 + TIMED_SWEEPS)
        diffs = [(_run(5 + TIMED_SWEEPS) - _run(5)) / TIMED_SWEEPS * 1e3
                 for _ in range(2)]
        pos = [x for x in diffs if x > 0]
        ms_sweep = min(pos) if pos else float('nan')

        # --- rate: tracked objective history -------------------------
        tr = nmf(Xh, max_iter=TRACKED_SWEEPS, compute_obj_each_iter=True,
                 **base, **extra)
        oh = np.asarray(tr['obj_history'], float)
        if denom is None:
            denom = 0.5 * float(jnp.sum(M * X * X))
        rel = np.sqrt(np.maximum(oh, 0.0) / denom)   # masked rel. Frob err
        sweeps_to = {}
        for t in TARGETS:
            hit = np.nonzero(rel <= t)[0]
            sweeps_to[str(t)] = (int(hit[0]) + 1) if hit.size else None
        ms_ok = np.isfinite(ms_sweep)
        out['solvers'][name] = {
            'ms_per_sweep': round(ms_sweep, 3) if ms_ok else None,
            'final_rel_err': float(rel[-1]),
            'sweeps_to_target': sweeps_to,
            'ms_to_target': {
                t: (round(sw * ms_sweep, 1) if (sw and ms_ok) else None)
                for t, sw in sweeps_to.items()},
        }
        print('%-6s %7.2f ms/sweep  final rel err %.3e  to-target %s'
              % (name, ms_sweep, rel[-1], sweeps_to), flush=True)
        # write after EACH solver: a timeout mid-run keeps partials
        path.write_text(json.dumps(out, indent=1))
    print('wrote', path)


if __name__ == '__main__':
    main()
