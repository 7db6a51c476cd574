"""Round 4: drive the TRUE north-star shape to its floor (VERDICT r3
item 2 / weak #1).

(a) TRUE BASELINE #4 shape, 100k×50k k=256, ONE chip: X must be bf16
    (10 GB; the f32 form is 20 GB against 16 GB HBM), factors f32,
    f32 matmul precision, rank-k data at the realistic conditioning
    class (factor sparsity 0.5 — the class whose scaled run met 1e-4 in
    round 3). Plain and HER, run until the objective flattens; records
    best rel-err, the trajectory, and wall-clock-to-2e-3 if reached.
(b) The quantization-floor control at HALF scale (50k×25k k=256), where
    the f32 X (5 GB) fits the chip: identical recipe with f32 X vs bf16
    X. The f32 run dropping below the bf16 run's floor demonstrates on
    real hardware that the true-shape floor is bf16-X quantization —
    i.e. reaching 1e-4 at 100k×50k needs the f32 X held across chips
    (BASELINE #4 names v5p-8), not more sweeps.

Writes benchmarks/results_round4_northstar_full.json incrementally.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

CHECK = 20


def make_problem(n, d, k, x_dtype, seed=0, sparsity=0.5, block=2500):
    """Rank-k X = Wg·Tg generated ON DEVICE blockwise (never a second
    full-precision copy in HBM), NNDSVD init, f64-accumulated ||X||.

    ``x_dtype='int16'`` produces a per-column-scaled :class:`QuantizedX`
    (ops/quantized.py): pass 1 accumulates the column maxima blockwise,
    pass 2 encodes each block against the global scale."""
    from rri_nmf_tpu.ops.quantized import QuantizedX
    nb = n // block
    quant = (x_dtype == 'int16')

    @jax.jit
    def gen(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        Wg = jax.random.uniform(k1, (n, k), jnp.float32)
        Tg = jax.random.uniform(k2, (k, d), jnp.float32)
        Wg = Wg * (jax.random.uniform(k3, (n, k)) > sparsity)
        Tg = Tg * (jax.random.uniform(k4, (k, d)) > sparsity)

        def fblock(i):
            Wb = jax.lax.dynamic_slice(Wg, (i * block, 0), (block, k))
            with jax.default_matmul_precision('float32'):
                return Wb @ Tg

        if quant:
            def cm(i, m):
                return jnp.maximum(m, jnp.max(fblock(i), axis=0))

            colmax = jax.lax.fori_loop(0, nb, cm,
                                       jnp.zeros((d,), jnp.float32))
            s = jnp.where(colmax > 0, colmax, 1.0) / jnp.float32(32767)

            def enc(i, c):
                q, xsq = c
                Xb = fblock(i)
                qb = jnp.clip(jnp.round(Xb / s[None, :]), 0,
                              32767).astype(jnp.int16)
                Db = qb.astype(jnp.float32) * s[None, :]
                q = jax.lax.dynamic_update_slice(q, qb, (i * block, 0))
                return q, xsq.at[i].set(jnp.sum(Db * Db))

            q, xsq = jax.lax.fori_loop(
                0, nb, enc, (jnp.zeros((n, d), jnp.int16),
                             jnp.zeros((nb,), jnp.float32)))
            return QuantizedX(q, s), xsq

        def xb(i, X):
            Xb = fblock(i).astype(x_dtype)
            return jax.lax.dynamic_update_slice(X, Xb, (i * block, 0))

        X = jax.lax.fori_loop(0, nb, xb, jnp.zeros((n, d), x_dtype))
        xsq = jnp.zeros((nb,), jnp.float32)

        def xq(i, xsq):
            Xb = jax.lax.dynamic_slice(X, (i * block, 0),
                                       (block, d)).astype(jnp.float32)
            return xsq.at[i].set(jnp.sum(jnp.sum(Xb * Xb, axis=1)))

        return X, jax.lax.fori_loop(0, nb, xq, xsq)

    X, xsq = gen(jax.random.PRNGKey(seed))
    print('[gen done]',
          float(jnp.sum((X.q if quant else X)[:2, :8].astype(jnp.float32))),
          flush=True)
    from rri_nmf_tpu.initialization import initialize_nmf
    with jax.default_matmul_precision('float32'):
        W0, T0 = initialize_nmf(X, k, 'nndsvd', random_state=0,
                                svd_backend='jax')
    print('[init done]', flush=True)
    xnorm = float(np.sqrt(np.sum(np.asarray(xsq, np.float64))))
    return X, jnp.asarray(W0, jnp.float32), jnp.asarray(T0, jnp.float32), \
        xnorm


def run(X, W0, T0, xnorm, k, her, label, inner_reps=4, max_sweeps=8000,
        tol=1e-4, mark=2e-3, plateau_window=600, plateau_frac=0.998,
        precision='float32'):
    from rri_nmf_tpu.ops.accel import make_her_multi, make_residual_obj
    from rri_nmf_tpu.ops.dense_pallas import make_dense_phase_sweep_pallas
    from rri_nmf_tpu.ops.sweep_xla import SweepConfig

    cfg = SweepConfig(k=k, reset_topic_method=None, update_order='phase',
                      matmul_precision=precision, inner_reps=inner_reps)
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

    W = Wy = Wb = W0
    T = Ty = Tb = T0
    beta = jnp.float32(0.5 if her else 0.0)
    e_prev = eb = jnp.float32(np.inf)
    key = jax.random.PRNGKey(1)
    resets = jnp.asarray(0, jnp.int32)
    out = multi(X, W, T, Wy, Ty, Wb, Tb, eb, beta, e_prev, key, resets, rk)
    float(out[8])
    print('[%s compiled]' % label, flush=True)

    t0 = time.perf_counter()
    sweeps = 0
    rel = best = np.inf
    best_at = 0
    wall_to_mark = None
    hist = []
    while rel > tol and sweeps < max_sweeps:
        W, T, Wy, Ty, Wb, Tb, eb, beta, e_prev, key, resets = multi(
            X, W, T, Wy, Ty, Wb, Tb, eb, beta, e_prev, key, resets, rk)
        rel = float(np.sqrt(max(2.0 * float(e_prev), 0.0))) / xnorm
        sweeps += CHECK
        hist.append((sweeps, rel))
        if rel <= mark and wall_to_mark is None:
            wall_to_mark = time.perf_counter() - t0
        if rel < best * plateau_frac:
            best, best_at = min(best, rel), sweeps
        elif sweeps - best_at >= plateau_window:
            break
        if sweeps % 500 == 0:
            print('  %s sweeps=%5d rel=%.3e (%.0fs)'
                  % (label, sweeps, rel, time.perf_counter() - t0),
                  flush=True)
    wall = time.perf_counter() - t0
    best = min(best, rel)
    floor_reached = sweeps < max_sweeps and rel > tol
    print('%s FINAL rel=%.3e best=%.3e sweeps=%d wall=%.1fs floor=%s'
          % (label, rel, best, sweeps, wall, floor_reached), flush=True)
    return {'label': label, 'accel': 'her' if her else None,
            'inner_reps': inner_reps,
            'final_rel_frob_err': rel, 'best_rel_frob_err': best,
            'sweeps': sweeps, 'wall_clock_seconds': wall,
            'seconds_per_sweep': wall / max(sweeps, 1),
            'reached_1e-4': bool(rel <= tol),
            'wall_clock_to_2e-3_seconds': wall_to_mark,
            'floor_reached': bool(floor_reached),
            'trajectory': hist[:: max(1, len(hist) // 80)] + hist[-1:]}


def main():
    parts = sys.argv[1] if len(sys.argv) > 1 else 'ab'
    p = Path(__file__).parent / 'results_round4_northstar_full.json'
    out = {
        'note': ('TRUE BASELINE #4 shape driven to its floor on one '
                 'chip (VERDICT r3 item 2), plus the half-scale '
                 'f32-vs-bf16 quantization-floor control.'),
        'hbm_arithmetic': (
            'f32 X at 100000x50000 is 20.0 GB; the v5e chip has 16 GB '
            'HBM, and the sweep additionally holds the (n,k)+(k,d) f32 '
            'factors (~150 MB) and the per-phase numerator panels. '
            'Holding X in f32 therefore requires >= 2 chips; one chip '
            'forces 2-byte X storage. bf16 storage quantizes X at RMS '
            '~1.1e-3 relative and exact RRI converges to ~the storage '
            'noise floor (results_round4_quant_floor.json), so bf16 '
            'caps the run near 2e-3; the per-column int16 code '
            '(x_dtype=int16, ops/quantized.py) stores the same 2 '
            'bytes/entry at ~2e-5 noise, putting 1e-4 in reach on ONE '
            'chip. Convergence additionally requires the f32-computed '
            'NNDSVD init: the earlier all-bf16 init chain dead-topiced '
            '40/256 topics and stalled every bf16 run at ~4e-2 '
            '(results_round4_init_bf16.json; fixed in '
            'initialization.randomized_svd_jax).'),
        'runs': []}
    if p.exists():
        out['runs'] = json.loads(p.read_text()).get('runs', [])
    k = 256

    # (a) TRUE shape, bf16 X: plain then HER
    if 'a' in parts:
        n, d = 100_000, 50_000
        out['runs'] = [r for r in out['runs'] if 'true' not in r['label']]
        X, W0, T0, xnorm = make_problem(n, d, k, jnp.bfloat16)
        for her in (False, True):
            r = run(X, W0, T0, xnorm, k, her=her,
                    label='true_bf16_%s' % ('her' if her else 'plain'))
            r['config'] = 'north_star_full_%dx%d_k%d_bf16' % (n, d, k)
            out['runs'].append(r)
            p.write_text(json.dumps(out, indent=1))
        del X, W0, T0

    # (b) half-scale control: f32 X vs bf16 X, identical recipe
    if 'b' in parts:
        n2, d2 = 50_000, 25_000
        out['runs'] = [r for r in out['runs'] if 'half' not in r['label']]
        for xdt, tag in ((jnp.float32, 'f32'), (jnp.bfloat16, 'bf16')):
            X, W0, T0, xnorm = make_problem(n2, d2, k, xdt, seed=7)
            r = run(X, W0, T0, xnorm, k, her=False,
                    label='half_%s_plain' % tag, max_sweeps=6000)
            r['config'] = 'north_star_half_%dx%d_k%d_%s' % (n2, d2, k, tag)
            out['runs'].append(r)
            p.write_text(json.dumps(out, indent=1))
            del X, W0, T0

    # (c) TRUE shape, int16 column-scaled X (same 2 bytes/entry as bf16,
    # ~70x less storage noise): the single-chip 1e-4 attempt
    if 'c' in parts:
        n, d = 100_000, 50_000
        out['runs'] = [r for r in out['runs']
                       if 'int16' not in r['label']]
        X, W0, T0, xnorm = make_problem(n, d, k, 'int16')
        for her in (False, True):
            r = run(X, W0, T0, xnorm, k, her=her,
                    label='true_int16_%s' % ('her' if her else 'plain'),
                    plateau_window=1000)
            r['config'] = 'north_star_full_%dx%d_k%d_int16' % (n, d, k)
            out['runs'].append(r)
            p.write_text(json.dumps(out, indent=1))
            if r['reached_1e-4']:
                break          # headline met; skip the HER variant
        del X, W0, T0

    # NOTE: a part (d) probing matmul_precision='high' (3-pass bf16) was
    # removed: the Mosaic GS-kernel lowering on this toolchain rejects
    # HIGH ("Unsupported dot precision"), and the quantized X GEMMs pin
    # Precision.HIGHEST explicitly anyway (exactness of the scale-folded
    # reformulation) — there is no cheaper-dot variant to measure.

    print('wrote', p, flush=True)


if __name__ == '__main__':
    main()
