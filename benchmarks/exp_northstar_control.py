"""North-star control (round-3 VERDICT item 1b): does the REFERENCE
algorithm, in float64 NumPy, stall at the same ~2e-3 relative Frobenius
error on U[0,1]-factor data that the TPU runs stall at?

BASELINE #4's criterion is wall-clock to 1e-4 relative error. Round 2
recorded 2.11e-3 after 3,000 sweeps at the scaled TPU config
(results_round2_northstar.json) without establishing whether the plateau
is (i) an implementation/precision defect of this library or (ii) a
property of RRI/HALS on that data class. This experiment decides it:

- same data class (X = Wg @ Tg, Wg/Tg ~ U[0,1] entries, exactly rank k)
  at a CPU-tractable shape with the same k/d ratio as the TPU config
  (4096x2048 k=32 vs 32768x16384 k=256 — both k/d = 1/64);
- the reference's own per-topic update loop (bench.numpy_reference_sweep
  — per-topic GEMVs, Gauss-Seidel, scale transfer, reference
  nmf.py:415-478) in float64 end to end;
- our jitted sweep on CPU float64 (phase order + inner_reps, the TPU
  measurement config) on the SAME data and init.

If both stall at the same error, the plateau is algorithmic
(conditioning of U[0,1] factors: the tail singular values of X are tiny
relative to the mean-dominated top one, and HALS' linear rate degrades
with that conditioning) — not a defect of the TPU implementation.

Writes benchmarks/results_round3_control.json.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

# pin the platform BEFORE any backend init: the ambient axon TPU plugin
# overrides the JAX_PLATFORMS env var (CLAUDE.md)
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import numpy as np

N, D, K = 4096, 2048, 32
MAX_SWEEPS = 4000
CHECK = 20


def gen_data(seed=0):
    rng = np.random.RandomState(seed)
    Wg = rng.rand(N, K)
    Tg = rng.rand(K, D)
    return Wg @ Tg


def run_numpy_reference(X, W0, T0, max_sweeps=MAX_SWEEPS, tol=1e-4):
    from bench import numpy_reference_sweep
    xnorm = np.linalg.norm(X)
    W, T = W0.copy(), T0.copy()
    traj = []
    t0 = time.perf_counter()
    for s in range(1, max_sweeps + 1):
        W, T = numpy_reference_sweep(X, W, T)
        if s % CHECK == 0:
            rel = float(np.linalg.norm(X - W @ T) / xnorm)
            traj.append([s, rel])
            if s % 200 == 0:
                print('  numpy f64 sweeps=%4d rel=%.3e (%.0fs)'
                      % (s, rel, time.perf_counter() - t0), flush=True)
            if rel <= tol:
                break
            # plateau cut: < 1% relative improvement over the last
            # 600 sweeps
            if len(traj) > 600 // CHECK and \
                    traj[-600 // CHECK][1] * 0.99 < rel:
                break
    wall = time.perf_counter() - t0
    return {'impl': 'reference_numpy_float64',
            'sweeps': traj[-1][0], 'rel_frob_err': traj[-1][1],
            'wall_clock_seconds': wall, 'trajectory': traj}


def run_jax_cpu_f64(X, W0, T0, max_sweeps=MAX_SWEEPS, tol=1e-4,
                    inner_reps=4):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    import jax.numpy as jnp
    from rri_nmf_tpu.ops.sweep_xla import SweepConfig, make_sweep

    cfg = SweepConfig(k=K, reset_topic_method=None, update_order='phase',
                      inner_reps=inner_reps)
    sweep = make_sweep(cfg)
    rk = jax.random.PRNGKey(0)

    @jax.jit
    def block(X, W, T, key, resets):
        def body(i, c):
            W, T, key, resets = c
            return sweep(X, W, T, key, resets, rk)
        return jax.lax.fori_loop(0, CHECK, body, (W, T, key, resets))

    Xd = jnp.asarray(X)
    xnorm = float(jnp.linalg.norm(Xd))
    W = jnp.asarray(W0)
    T = jnp.asarray(T0)
    key = jax.random.PRNGKey(1)
    resets = jnp.asarray(0, jnp.int32)
    traj = []
    t0 = time.perf_counter()
    s = 0
    while s < max_sweeps:
        W, T, key, resets = block(Xd, W, T, key, resets)
        s += CHECK
        rel = float(jnp.linalg.norm(Xd - W @ T) / xnorm)
        traj.append([s, rel])
        if s % 200 == 0:
            print('  jax f64 reps=%d sweeps=%4d rel=%.3e (%.0fs)'
                  % (inner_reps, s, rel, time.perf_counter() - t0),
                  flush=True)
        if rel <= tol:
            break
        if len(traj) > 600 // CHECK and traj[-600 // CHECK][1] * 0.99 < rel:
            break
    wall = time.perf_counter() - t0
    return {'impl': 'rri_nmf_tpu_jax_cpu_float64_phase_reps%d' % inner_reps,
            'sweeps': traj[-1][0], 'rel_frob_err': traj[-1][1],
            'wall_clock_seconds': wall, 'trajectory': traj}


def main():
    X = gen_data()
    from rri_nmf_tpu.initialization import initialize_nmf
    W0, T0 = initialize_nmf(X, K, 'nndsvd', random_state=0)
    W0 = np.asarray(W0, np.float64)
    T0 = np.asarray(T0, np.float64)

    out = {
        'config': 'northstar_control_%dx%d_k%d_uniform_factors' % (N, D, K),
        'note': ('f64 control for the 1e-4 criterion: U[0,1]-factor data '
                 '(exactly rank k), NNDSVD init, same k/d ratio as the '
                 'TPU north-star config. Decides whether the ~2e-3 '
                 'plateau is algorithmic or an implementation defect.'),
        'target': 1e-4,
        'runs': []}

    print('jax CPU f64 (phase, inner_reps=4) ...', flush=True)
    out['runs'].append(run_jax_cpu_f64(X, W0, T0))
    print('reference NumPy f64 (per-topic GEMV loop) ...', flush=True)
    out['runs'].append(run_numpy_reference(X, W0, T0))

    for r in out['runs']:
        r['trajectory'] = r['trajectory'][::5]  # thin for the record
        print('%s: sweeps=%d rel=%.3e wall=%.0fs'
              % (r['impl'], r['sweeps'], r['rel_frob_err'],
                 r['wall_clock_seconds']))
    p = Path(__file__).parent / 'results_round3_control.json'
    p.write_text(json.dumps(out, indent=1))
    print('wrote', p)


if __name__ == '__main__':
    main()
