"""Dense interleaved sweep vs a naive per-topic numpy oracle.

The jitted sweep batches all T-phase numerators into one ``WᵀX`` GEMM
(valid because each W column is untouched until its own topic — see
ops/sweep_xla.py point 1). This oracle computes the reference's naive
per-topic GEMVs (reference ``nmf.py:633-747`` semantics, including the
scale transfer, per-topic simplex projections, and regularizers) and must
agree to float64 roundoff across configurations — any ordering mistake in
the batching breaks this at O(1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rri_nmf_tpu.ops.sweep_xla import SweepConfig, make_sweep

EPS = float(np.spacing(10))


def _proj_simplex(v, s):
    u = np.sort(v)[::-1]
    css = np.cumsum(u)
    rho = np.nonzero(u * np.arange(1, v.size + 1) > (css - s))[0][-1]
    theta = (css[rho] - s) / (rho + 1.0)
    w = np.clip(v - theta, 0, None)
    if v.sum() == s and np.all(v >= 0):
        return v
    return w


def _qf_scalar(w, c, s, ub):
    if c > 0:
        x = np.maximum(-w, 0) / (c + EPS)
        nx = x.sum()
        if s is not None:
            x = _proj_simplex(x, s)
        return x, nx
    if s is None:
        bound = np.inf if ub is None else (min(ub, s) if s else ub)
        return np.where(w + c < 0, bound, 0.0), 1.0
    x = np.zeros_like(w)
    x[np.argmin(w)] = s
    return x, 1.0


def _numpy_dense_sweep(X, W, T, *, reg_w_l1=0.0, reg_w_l2=0.0,
                       reg_t_l1=0.0, reg_t_l2=0.0,
                       project_T_each_iter=False, t_row_sum=None,
                       w_row_sum=None, fix_T=False, fix_W=False):
    """Reference-semantics interleaved sweep with per-topic GEMVs.
    ``fix_T``/``fix_W`` skip that factor's whole branch (incl. the scale
    transfer, which belongs to the T update) — the estimators' transform
    paths (reference nmf.py:417,460)."""
    k = W.shape[1]
    scale_transfer = (abs(reg_w_l1) + abs(reg_w_l2) + abs(reg_t_l1) +
                      abs(reg_t_l2)) == 0
    s_t = t_row_sum if project_T_each_iter else None
    for t in range(k):
        if not fix_T:
            # T-phase: naive per-topic contraction (reference
            # nmf.py:670-676)
            w = W[:, t]
            wX = w @ X
            wW = w @ W
            wW[t] = 0.0
            wR = wX - wW @ T
            nw = w @ w
            x, nt1 = _qf_scalar(-(wR - reg_t_l1), nw + reg_t_l2, s_t,
                                t_row_sum)
            if scale_transfer:
                W[:, t] = W[:, t] * nt1
            T[t, :] = x
            if t_row_sum and project_T_each_iter and \
                    abs(T[t].sum() - t_row_sum) > 1e-15:
                T[t, :] = _proj_simplex(T[t], t_row_sum)
        if not fix_W:
            # W-phase (reference nmf.py:729-734)
            trow = T[t]
            Xt = X @ trow
            Tt = T @ trow
            Tt[t] = 0.0
            Rt = Xt - W @ Tt
            nt = trow @ trow
            x, _ = _qf_scalar(-(Rt - reg_w_l1), nt + reg_w_l2, None,
                              w_row_sum)
            W[:, t] = x
    return W, T


CONFIGS = [
    dict(),
    dict(project_T_each_iter=True, t_row_sum=1.0),
    dict(reg_t_l2=0.1, reg_w_l2=0.05),
    dict(reg_t_l1=0.02, reg_w_l1=0.01),
    dict(project_T_each_iter=True, t_row_sum=2.0, reg_w_l2=0.1),
]


@pytest.mark.parametrize('kw', CONFIGS)
def test_dense_sweep_matches_naive_oracle(kw):
    rng = np.random.RandomState(0)
    n, d, k = 45, 35, 5
    X = np.abs(rng.rand(n, k) @ rng.rand(k, d) + 0.01 * rng.rand(n, d))
    W0 = np.abs(rng.rand(n, k))
    T0 = np.abs(rng.rand(k, d))

    cfg = SweepConfig(k=k, reset_topic_method=None,
                      project_T_each_iter=kw.get('project_T_each_iter',
                                                 False),
                      t_row_sum=kw.get('t_row_sum'),
                      w_row_sum=kw.get('w_row_sum'),
                      reg_w_l1=kw.get('reg_w_l1', 0.0),
                      reg_w_l2=kw.get('reg_w_l2', 0.0),
                      reg_t_l1=kw.get('reg_t_l1', 0.0),
                      reg_t_l2=kw.get('reg_t_l2', 0.0))
    sweep = make_sweep(cfg)
    key = jax.random.PRNGKey(0)
    r = jnp.asarray(0, jnp.int32)

    Wj, Tj = jnp.asarray(W0), jnp.asarray(T0)
    Wn, Tn = W0.copy(), T0.copy()
    for it in range(4):
        Wj, Tj, key, r = sweep(jnp.asarray(X), Wj, Tj, key, r, key)
        Wn, Tn = _numpy_dense_sweep(X, Wn, Tn, **kw)
        assert np.allclose(np.array(Wj), Wn, atol=1e-11), 'sweep %d' % it
        assert np.allclose(np.array(Tj), Tn, atol=1e-11), 'sweep %d' % it


def test_k1_and_k_equals_d_edges():
    rng = np.random.RandomState(1)
    X = np.abs(rng.rand(12, 6))
    from rri_nmf_tpu.nmf import nmf
    for k in (1, 6):
        soln = nmf(X, k, max_iter=4, random_state=0, early_stop=False,
                   compute_obj_each_iter=True, reset_topic_method=None)
        assert np.all(np.isfinite(soln['W']))
        assert np.all(np.diff(soln['obj_history']) <= 0)


@pytest.mark.parametrize('seed', range(8))
def test_dense_sweep_matches_oracle_randomized(seed):
    """Randomized differential test: random shapes + random config draws
    against the naive per-topic oracle (the fixed CONFIGS list covers 5
    points; this sweeps the cross-product space — reg signs, projection,
    sum targets, bounds — at f64 roundoff parity)."""
    rng = np.random.RandomState(100 + seed)
    n = int(rng.randint(20, 60))
    d = int(rng.randint(15, 50))
    k = int(rng.randint(2, 7))
    X = np.abs(rng.rand(n, k) @ rng.rand(k, d) + 0.01 * rng.rand(n, d))
    W0 = np.abs(rng.rand(n, k))
    T0 = np.abs(rng.rand(k, d))

    kw = {}
    if rng.rand() < 0.6:
        kw['project_T_each_iter'] = True
        kw['t_row_sum'] = float(rng.choice([1.0, 2.0, 5.0]))
    elif rng.rand() < 0.3:
        kw['t_row_sum'] = 1.0      # qf upper bound without projection
    if rng.rand() < 0.4:
        kw['w_row_sum'] = float(rng.choice([1.0, 3.0]))
    for r in ('reg_w_l1', 'reg_w_l2', 'reg_t_l1', 'reg_t_l2'):
        if rng.rand() < 0.4:
            kw[r] = float(rng.choice([0.01, 0.1]))
    # a negative L2 is bounded when the matching factor is box/sum
    # constrained; exercise the concave branch there
    if kw.get('t_row_sum') and rng.rand() < 0.3:
        kw['reg_t_l2'] = -0.05
    # fixed-factor inference paths (fix_T = the TM estimator's transform)
    # — drawn LAST so earlier seeds' configs are unchanged
    _r = rng.rand()
    kw['fix_T'] = bool(_r < 0.25)
    kw['fix_W'] = bool(0.25 <= _r < 0.4)

    cfg = SweepConfig(k=k, reset_topic_method=None,
                      project_T_each_iter=kw.get('project_T_each_iter',
                                                 False),
                      t_row_sum=kw.get('t_row_sum'),
                      w_row_sum=kw.get('w_row_sum'),
                      fix_T=kw['fix_T'], fix_W=kw['fix_W'],
                      reg_w_l1=kw.get('reg_w_l1', 0.0),
                      reg_w_l2=kw.get('reg_w_l2', 0.0),
                      reg_t_l1=kw.get('reg_t_l1', 0.0),
                      reg_t_l2=kw.get('reg_t_l2', 0.0))
    sweep = make_sweep(cfg)
    key = jax.random.PRNGKey(0)
    r = jnp.asarray(0, jnp.int32)
    Wj, Tj = jnp.asarray(W0), jnp.asarray(T0)
    Wn, Tn = W0.copy(), T0.copy()
    for it in range(3):
        Wj, Tj, key, r = sweep(jnp.asarray(X), Wj, Tj, key, r, key)
        Wn, Tn = _numpy_dense_sweep(X, Wn, Tn, **kw)
        assert np.allclose(np.array(Wj), Wn, atol=1e-10), (kw, it)
        assert np.allclose(np.array(Tj), Tn, atol=1e-10), (kw, it)
