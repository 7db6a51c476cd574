"""TPU probe for the 1e-4 north-star criterion: conditioning sweep +
HER extrapolation (the library's ``nmf(accel='her')`` path, per-sweep
objective-checked restarts — ops/accel.py builders used directly).

Round-2 recorded 2.11e-3 after 3,000 sweeps at the scaled north-star
config. The f64 control (exp_northstar_control.py) proves the plateau is
the algorithm's conditioning-limited rate on U[0,1]-factor data, not
precision. This probes (a) whether HER breaks it, and (b) on what data
conditioning (factor sparsity) plain RRI/HALS reaches 1e-4 at all.

Usage: python benchmarks/exp_her.py [sparsity ...]   (default 0.0)
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

N, D, K = 8192, 4096, 64
CHECK = 50     # sweeps per dispatch (extrapolation + restart run PER SWEEP)


def make_problem(sparsity, seed=0):
    @jax.jit
    def gen(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        Wg = jax.random.uniform(k1, (N, K), jnp.float32)
        Tg = jax.random.uniform(k2, (K, D), jnp.float32)
        if sparsity > 0:
            Wg = Wg * (jax.random.uniform(k3, (N, K)) > sparsity)
            Tg = Tg * (jax.random.uniform(k4, (K, D)) > sparsity)
        with jax.default_matmul_precision('float32'):
            X = Wg @ Tg
        return X

    X = gen(jax.random.PRNGKey(seed))
    print('  [gen done]', float(jnp.sum(X[0, :8])), flush=True)
    from rri_nmf_tpu.initialization import initialize_nmf
    with jax.default_matmul_precision('float32'):
        W0, T0 = initialize_nmf(X, K, 'nndsvd', random_state=0,
                                svd_backend='jax')
    print('  [init done]', flush=True)
    rowsq = jnp.sum(X.astype(jnp.float32) ** 2, axis=1)
    xnorm = float(np.sqrt(np.sum(np.asarray(rowsq, np.float64))))
    return X, jnp.asarray(W0, jnp.float32), jnp.asarray(T0, jnp.float32), \
        xnorm


def run(X, W0, T0, xnorm, inner_reps=4, her=True, max_sweeps=20000,
        tol=1e-4, label='', plateau_window=2000, plateau_frac=0.995):
    """The library path: ops.accel.make_her_multi around the dense
    Pallas phase sweep (per-sweep extrapolation + restart), or the plain
    sweep in one fori_loop. Error read from the HER objective itself
    (0.5·||R||², blockwise residual, forward-stable)."""
    from rri_nmf_tpu.ops.sweep_xla import SweepConfig
    from rri_nmf_tpu.ops.dense_pallas import make_dense_phase_sweep_pallas
    from rri_nmf_tpu.ops.accel import make_her_multi, make_residual_obj

    cfg = SweepConfig(k=K, reset_topic_method=None, update_order='phase',
                      matmul_precision='float32', inner_reps=inner_reps)
    sweep = make_dense_phase_sweep_pallas(
        cfg, interpret=jax.default_backend() == 'cpu')
    obj_fn = make_residual_obj(cfg)
    rk = jax.random.PRNGKey(0)

    if her:
        multi = make_her_multi(sweep, obj_fn, CHECK)
    else:
        @jax.jit
        def multi(X, W, T, Wy, Ty, Wb, Tb, eb, beta, e_prev, key, resets,
                  reset_key):
            def body(i, c):
                W, T, key, resets = c
                return sweep(X, W, T, key, resets, reset_key)
            W, T, key, resets = jax.lax.fori_loop(
                0, CHECK, body, (W, T, key, resets))
            e = obj_fn(X, W, T)
            return W, T, W, T, W, T, e, beta, e, key, resets

    W = Wy = W0
    T = Ty = T0
    beta = jnp.float32(0.5 if her else 0.0)
    e_prev = jnp.float32(np.inf)
    key = jax.random.PRNGKey(1)
    resets = jnp.asarray(0, jnp.int32)
    print('  [compiling her=%s]' % her, flush=True)
    Wb, Tb = W, T
    eb = jnp.float32(np.inf)
    out = multi(X, W, T, Wy, Ty, Wb, Tb, eb, beta, e_prev, key,
                resets, rk)
    float(out[8])
    print('  [compile done]', flush=True)

    t0 = time.perf_counter()
    sweeps = 0
    rel = np.inf
    hist = []
    while rel > tol and sweeps < max_sweeps:
        W, T, Wy, Ty, Wb, Tb, eb, beta, e_prev, key, resets = multi(
            X, W, T, Wy, Ty, Wb, Tb, eb, beta, e_prev, key, resets, rk)
        e = float(e_prev)
        rel = float(np.sqrt(max(2.0 * e, 0.0))) / xnorm
        sweeps += CHECK
        hist.append((sweeps, rel))
        if sweeps % 1000 == 0:
            print('  %s sweeps=%5d rel=%.3e beta=%.3f (%.0fs)'
                  % (label, sweeps, rel, float(beta),
                     time.perf_counter() - t0), flush=True)
        if len(hist) > plateau_window // CHECK and \
                hist[-(plateau_window // CHECK)][1] * plateau_frac < rel:
            break
    wall = time.perf_counter() - t0
    print('%s FINAL rel=%.3e sweeps=%d wall=%.1fs reached=%s'
          % (label, rel, sweeps, wall, rel <= tol), flush=True)
    return {'label': label, 'her': her, 'inner_reps': inner_reps,
            'rel_frob_err': rel, 'sweeps': sweeps,
            'wall_clock_seconds': wall, 'reached_target': bool(rel <= tol),
            'trajectory': hist[:: max(1, len(hist) // 100)]}


if __name__ == '__main__':
    import json
    sparsities = [float(a) for a in sys.argv[1:]] or [0.0]
    results = []
    for sp in sparsities:
        print('=== sparsity %.1f ===' % sp, flush=True)
        X, W0, T0, xnorm = make_problem(sp)
        results.append(dict(sparsity=sp, **run(
            X, W0, T0, xnorm, her=False, label='plain sp=%.1f' % sp)))
        results.append(dict(sparsity=sp, **run(
            X, W0, T0, xnorm, her=True, label='her   sp=%.1f' % sp)))
        Path('/tmp/exp_her_results.json').write_text(
            json.dumps(results, indent=1))
    print('wrote /tmp/exp_her_results.json')
