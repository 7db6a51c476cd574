"""Gram-blocked phase sweep == naive per-topic phase sweep.

The phase-order sweep precomputes the frozen factor's Gram matrix once per
phase and processes topics in blocks (ops/sweep_xla.py, t_phase_blocked /
w_phase_blocked); this must be EXACTLY the same Gauss-Seidel math as a
per-topic loop that re-reads the factors (the reference's contraction
pattern, nmf.py:672-676,729-734, reordered into phases). Pinned here
against an independent NumPy implementation at f64 tolerances, across
block-size regimes (k prime -> B=1, k<=16 -> B=k, k=32 -> B=16), with
simplex projections and with topic resets firing mid-phase.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rri_nmf_tpu.matrixops import euclidean_proj_simplex
from rri_nmf_tpu.ops.sweep_xla import (
    SweepConfig, _gram_block_size, make_sweep,
)

EPS = float(np.spacing(10))


def numpy_phase_sweep(X, W, T, k, t_row_sum=None, project_T=False,
                      w_row_sum=None, reg_t_l2=0.0, reg_w_l1=0.0,
                      reset=False, resets_left=10**9):
    """Per-topic phase-order sweep, straight from the update equations."""
    W = W.copy()
    T = T.copy()
    # ---- T-phase
    for t in range(k):
        w = W[:, t]
        wW = w @ W
        wW[t] = 0.0
        wR = w @ X - wW @ T
        nw = w @ w
        numer = wR - 0.0
        denom = nw + reg_t_l2
        s = t_row_sum if project_T else None
        if denom > 0:
            x = np.maximum(numer, 0.0) / (denom + EPS)
            if s is not None:
                x = np.asarray(euclidean_proj_simplex(x, s))
        elif s is not None:
            # concave/flat curvature: vertex of the simplex (qf_min's
            # scalar c <= 0 branch)
            x = np.zeros_like(numer)
            x[int(np.argmin(-numer))] = s
        else:
            bound = np.inf if t_row_sum is None else t_row_sum
            x = np.where(-numer + denom < 0, bound, 0.0)
        T[t] = x
        if reset:
            if T[t].sum() > 1e-10:
                if (project_T and t_row_sum is not None
                        and abs(T[t].sum() - t_row_sum) > 1e-15):
                    T[t] = np.asarray(
                        euclidean_proj_simplex(T[t], t_row_sum))
            elif resets_left > 0:
                Rt = np.maximum(X - W @ T, 0.0)
                mi = int(np.argmax((Rt * Rt).sum(axis=1)))
                T[t] = Rt[mi]
                W[:, t] = 0.0
                W[mi, t] = 1.0
                resets_left -= 1
        elif project_T and t_row_sum is not None and \
                abs(T[t].sum() - t_row_sum) > 1e-15:
            T[t] = np.asarray(euclidean_proj_simplex(T[t], t_row_sum))
    # ---- W-phase
    for t in range(k):
        trow = T[t]
        Tt = T @ trow
        Tt[t] = 0.0
        Rt = X @ trow - W @ Tt
        nt = trow @ trow
        numer = Rt - reg_w_l1
        denom = nt
        if denom > 0:
            x = np.maximum(numer, 0.0) / (denom + EPS)
            if w_row_sum is not None:
                pass  # ub not enforced on the scalar-c branch (reference)
        else:
            x = np.where(-numer + denom < 0,
                         np.inf if w_row_sum is None else w_row_sum, 0.0)
        W[:, t] = x
        if reset and W[:, t].sum() <= 1e-10 and resets_left > 0:
            Rt = np.maximum(X - W @ T, 0.0)
            mi = int(np.argmax((Rt * Rt).sum(axis=1)))
            T[t] = Rt[mi]
            W[:, t] = 0.0
            W[mi, t] = 1.0
            resets_left -= 1
    return W, T, resets_left


def _run_sweep(cfg, X, W, T, iters=2, resets_left=0):
    sweep = make_sweep(cfg)
    key = jax.random.PRNGKey(0)
    rl = jnp.asarray(resets_left, jnp.int32)
    W, T = jnp.asarray(W), jnp.asarray(T)
    for _ in range(iters):
        W, T, key, rl = sweep(jnp.asarray(X), W, T, key, rl, key)
    return np.array(W), np.array(T), int(rl)


@pytest.mark.parametrize('k', [3, 7, 12, 25, 32])
def test_blocked_phase_matches_naive(k):
    """Plain phase sweep (no constraints): blocked == per-topic to 1e-12.
    k spans B=k, B=1 (prime), and B=16 (multi-block) regimes."""
    assert _gram_block_size(32) == 16 and _gram_block_size(7) == 7
    rng = np.random.RandomState(k)
    n, d = 50, 37
    X = np.abs(rng.rand(n, k) @ rng.rand(k, d) + 0.01 * rng.rand(n, d))
    W0 = np.abs(rng.rand(n, k))
    T0 = np.abs(rng.rand(k, d))
    cfg = SweepConfig(k=k, reset_topic_method=None, update_order='phase')
    Wj, Tj, _ = _run_sweep(cfg, X, W0, T0, iters=3)
    Wn, Tn = W0.copy(), T0.copy()
    for _ in range(3):
        Wn, Tn, _ = numpy_phase_sweep(X, Wn, Tn, k)
    assert np.allclose(Tj, Tn, atol=1e-12), np.abs(Tj - Tn).max()
    assert np.allclose(Wj, Wn, atol=1e-12), np.abs(Wj - Wn).max()


def test_blocked_phase_with_projection_matches_naive():
    """Simplex-projected T rows (TM preset) through the blocked path.

    Single-sweep parity across seeds: multi-sweep bitwise comparison is not
    meaningful for this config — a 1e-15 rounding difference can flip the
    simplex projection's active support a few sweeps in (verified to happen
    between the library's own two internally-exact phase paths too), which
    is sensitivity of the iteration, not an implementation gap.
    """
    k, n, d = 10, 40, 23
    for seed in range(4):
        rng = np.random.RandomState(seed)
        X = np.abs(rng.rand(n, k) @ rng.rand(k, d))
        X = X / X.sum(axis=1, keepdims=True)
        W0 = np.abs(rng.rand(n, k))
        T0 = np.abs(rng.rand(k, d))
        T0 = T0 / T0.sum(axis=1, keepdims=True)
        cfg = SweepConfig(k=k, reset_topic_method=None,
                          update_order='phase',
                          project_T_each_iter=True, t_row_sum=1.0)
        Wj, Tj, _ = _run_sweep(cfg, X, W0, T0, iters=1)
        Wn, Tn, _ = numpy_phase_sweep(X, W0.copy(), T0.copy(), k,
                                      t_row_sum=1.0, project_T=True)
        assert np.allclose(Tj, Tn, atol=1e-12), seed
        assert np.allclose(Wj, Wn, atol=1e-12), seed


@pytest.mark.parametrize('k,budget', [(6, 10), (6, 1), (25, 3)])
def test_blocked_phase_resets_match_naive(k, budget):
    """Topic resets fire mid-phase: the Gram/block-cache rank-one patches
    must keep later topics exact. Dead warm-start topics force resets in
    the T-phase; the budget is decremented identically."""
    rng = np.random.RandomState(3)
    n, d = 30, 21
    X = np.abs(rng.rand(n, k) @ rng.rand(k, d))
    W0 = np.abs(rng.rand(n, k))
    T0 = np.abs(rng.rand(k, d))
    # kill two topics in the middle of a block and at a block boundary
    for t in (1, k - 2):
        W0[:, t] = 0.0
        T0[t] = 0.0
    cfg = SweepConfig(k=k, reset_topic_method='max_resid_document',
                      update_order='phase')
    Wj, Tj, rl_j = _run_sweep(cfg, X, W0, T0, iters=2, resets_left=budget)
    Wn, Tn, rl_n = W0.copy(), T0.copy(), budget
    for _ in range(2):
        Wn, Tn, rl_n = numpy_phase_sweep(X, Wn, Tn, k, reset=True,
                                         resets_left=rl_n)
    assert rl_j == rl_n
    assert np.allclose(Tj, Tn, atol=1e-12), np.abs(Tj - Tn).max()
    assert np.allclose(Wj, Wn, atol=1e-12), np.abs(Wj - Wn).max()
