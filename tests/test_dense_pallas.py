"""Fused dense phase-sweep Pallas kernels vs the XLA Gram-blocked phase
sweep (SURVEY.md §4: "Pallas-kernel vs jax.numpy reference equivalence").
Runs in interpreter mode on CPU at f64; the same kernels compile for TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rri_nmf_tpu.ops.dense_pallas import (
    make_dense_phase_sweep_pallas, supports_dense_pallas,
)
from rri_nmf_tpu.ops.sweep_xla import SweepConfig, make_sweep


def _problem(n, d, k, seed=0):
    rng = np.random.RandomState(seed)
    X = np.abs(rng.rand(n, k) @ rng.rand(k, d) + 0.01 * rng.rand(n, d))
    W0 = np.abs(rng.rand(n, k))
    T0 = np.abs(rng.rand(k, d))
    return X, W0, T0


def _run(sweep, X, W, T, iters=3, extras=()):
    key = jax.random.PRNGKey(0)
    resets = jnp.asarray(0, jnp.int32)
    W, T = jnp.asarray(W), jnp.asarray(T)
    for _ in range(iters):
        W, T, key, resets = sweep(jnp.asarray(X), W, T, key, resets, key,
                                  *extras)
    return np.array(W), np.array(T)


@pytest.mark.parametrize('shape', [(40, 30, 3),     # heavy padding
                                   (300, 1100, 5),  # multi-block d
                                   (600, 130, 16)])  # multi-block n
def test_dense_pallas_matches_xla(shape):
    n, d, k = shape
    X, W0, T0 = _problem(n, d, k)
    cfg = SweepConfig(k=k, reset_topic_method=None, update_order='phase')
    assert supports_dense_pallas(cfg)
    Wx, Tx = _run(make_sweep(cfg), X, W0, T0)
    Wp, Tp = _run(make_dense_phase_sweep_pallas(cfg, interpret=True),
                  X, W0, T0)
    assert np.allclose(Tx, Tp, atol=1e-9), np.abs(Tx - Tp).max()
    assert np.allclose(Wx, Wp, atol=1e-9), np.abs(Wx - Wp).max()


def test_dense_pallas_regularized_and_negative_l1():
    """Regularizers flow into the in-kernel subproblem; negative L1 grows
    padded columns, which must not leak into the W-phase Gram."""
    n, d, k = 70, 50, 4
    X, W0, T0 = _problem(n, d, k, seed=2)
    cfg = SweepConfig(k=k, reset_topic_method=None, update_order='phase',
                      reg_t_l1=-0.05, reg_w_l2=0.1, t_row_sum=1.0)
    Wx, Tx = _run(make_sweep(cfg), X, W0, T0)
    Wp, Tp = _run(make_dense_phase_sweep_pallas(cfg, interpret=True),
                  X, W0, T0)
    assert np.allclose(Tx, Tp, atol=1e-9)
    assert np.allclose(Wx, Wp, atol=1e-9)


def test_dense_pallas_dead_topic_vertex_branch():
    """A dead warm-start topic exercises the concave (denom == 0) qf
    branch in-kernel; values must match the XLA lax.cond branch."""
    n, d, k = 50, 40, 4
    X, W0, T0 = _problem(n, d, k, seed=3)
    W0[:, 2] = 0.0
    T0[2] = 0.0
    cfg = SweepConfig(k=k, reset_topic_method=None, update_order='phase',
                      t_row_sum=1.0, w_row_sum=1.0)
    Wx, Tx = _run(make_sweep(cfg), X, W0, T0, iters=2)
    Wp, Tp = _run(make_dense_phase_sweep_pallas(cfg, interpret=True),
                  X, W0, T0, iters=2)
    assert np.allclose(Tx, Tp, atol=1e-9)
    assert np.allclose(Wx, Wp, atol=1e-9)


def test_dense_pallas_fix_T_and_project_W():
    """fix_T (transform path) runs only the W kernel; project_W_each_iter
    runs as the XLA tail."""
    n, d, k = 60, 45, 4
    X, W0, T0 = _problem(n, d, k, seed=4)
    cfg = SweepConfig(k=k, reset_topic_method=None, update_order='phase',
                      fix_T=True, project_W_each_iter=True, w_row_sum=1.0)
    Wx, _ = _run(make_sweep(cfg), X, W0, T0)
    Wp, _ = _run(make_dense_phase_sweep_pallas(cfg, interpret=True),
                 X, W0, T0)
    assert np.allclose(Wx, Wp, atol=1e-9)
    assert np.max(np.abs(Wp.sum(axis=1) - 1.0)) < 1e-12


def test_dense_pallas_vector_w_bound():
    """Per-row W upper bounds (vector w_row_sum) stream into the W kernel."""
    n, d, k = 45, 35, 3
    X, W0, T0 = _problem(n, d, k, seed=5)
    wrs = np.abs(np.random.RandomState(6).rand(n)) + 0.5
    cfg = SweepConfig(k=k, reset_topic_method=None, update_order='phase',
                      w_row_sum_is_vector=True, project_W_each_iter=True)
    extras = (jnp.asarray(wrs),)
    Wx, Tx = _run(make_sweep(cfg), X, W0, T0, extras=extras)
    Wp, Tp = _run(make_dense_phase_sweep_pallas(cfg, interpret=True),
                  X, W0, T0, extras=extras)
    assert np.allclose(Tx, Tp, atol=1e-9)
    assert np.allclose(Wx, Wp, atol=1e-9)


@pytest.mark.parametrize('shape', [(60, 40, 8),     # heavy padding
                                   (50, 1100, 5),   # d beyond one block
                                   (40, 37, 5)])
def test_tm_proj_kernel_matches_xla(shape):
    """The fused projected T-phase kernel (in-kernel Michelot simplex
    projections) equals the XLA phase sweep's per-topic Duchi path on the
    full TM preset (project_T_each_iter + t_row_sum + w_row_sum)."""
    n, d, k = shape
    X, W0, T0 = _problem(n, d, k, seed=8)
    T0 = T0 / T0.sum(axis=1, keepdims=True)
    cfg = SweepConfig(k=k, reset_topic_method=None, update_order='phase',
                      project_T_each_iter=True, t_row_sum=1.0,
                      w_row_sum=1.0, project_W_each_iter=True)
    assert supports_dense_pallas(cfg, d=d)
    assert not supports_dense_pallas(cfg)           # shape-blind: no
    assert not supports_dense_pallas(cfg, d=10**8)  # beyond VMEM: no
    Wx, Tx = _run(make_sweep(cfg), X, W0, T0)
    Wp, Tp = _run(make_dense_phase_sweep_pallas(cfg, interpret=True),
                  X, W0, T0)
    assert np.allclose(Tx, Tp, atol=1e-11), np.abs(Tx - Tp).max()
    assert np.allclose(Wx, Wp, atol=1e-11), np.abs(Wx - Wp).max()
    assert np.max(np.abs(Tp.sum(axis=1) - 1.0)) < 1e-12


def test_tm_proj_kernel_mass_spreading_respects_padding():
    """When the numerator row is mostly non-positive the projection must
    SPREAD mass (negative threshold) — onto real columns only, never the
    zero-padded tail of the (k, dpad) panel."""
    n, d, k = 50, 30, 4   # dpad = 1024 >> d
    X, W0, T0 = _problem(n, d, k, seed=9)
    X = 1e-3 * X          # tiny data + large L1 => mostly-negative numer
    T0 = T0 / T0.sum(axis=1, keepdims=True)
    cfg = SweepConfig(k=k, reset_topic_method=None, update_order='phase',
                      project_T_each_iter=True, t_row_sum=1.0,
                      reg_t_l1=0.5)
    Wx, Tx = _run(make_sweep(cfg), X, W0, T0, iters=2)
    Wp, Tp = _run(make_dense_phase_sweep_pallas(cfg, interpret=True),
                  X, W0, T0, iters=2)
    assert np.allclose(Tx, Tp, atol=1e-11), np.abs(Tx - Tp).max()
    assert np.allclose(Wx, Wp, atol=1e-11)
    # mass stayed on the d real columns
    assert np.max(np.abs(Tp.sum(axis=1) - 1.0)) < 1e-12


def test_tm_proj_kernel_dead_topic_vertex_branch():
    """denom == 0 (dead W column, no L2) takes the concave vertex branch:
    all mass on the first least-cost coordinate, same as the XLA path."""
    n, d, k = 50, 40, 4
    X, W0, T0 = _problem(n, d, k, seed=10)
    W0[:, 1] = 0.0
    T0 = T0 / T0.sum(axis=1, keepdims=True)
    cfg = SweepConfig(k=k, reset_topic_method=None, update_order='phase',
                      project_T_each_iter=True, t_row_sum=1.0,
                      w_row_sum=1.0)
    Wx, Tx = _run(make_sweep(cfg), X, W0, T0, iters=2)
    Wp, Tp = _run(make_dense_phase_sweep_pallas(cfg, interpret=True),
                  X, W0, T0, iters=2)
    assert np.allclose(Tx, Tp, atol=1e-11)
    assert np.allclose(Wx, Wp, atol=1e-11)


def test_tm_proj_kernel_inner_reps():
    """inner_reps > 1 re-runs the projected topic loop in-kernel; each
    pass is exact cyclic BCD, matching the XLA blocked path."""
    n, d, k = 60, 45, 6
    X, W0, T0 = _problem(n, d, k, seed=11)
    T0 = T0 / T0.sum(axis=1, keepdims=True)
    cfg = SweepConfig(k=k, reset_topic_method=None, update_order='phase',
                      project_T_each_iter=True, t_row_sum=1.0,
                      inner_reps=3)
    Wx, Tx = _run(make_sweep(cfg), X, W0, T0, iters=2)
    Wp, Tp = _run(make_dense_phase_sweep_pallas(cfg, interpret=True),
                  X, W0, T0, iters=2)
    assert np.allclose(Tx, Tp, atol=1e-11)
    assert np.allclose(Wx, Wp, atol=1e-11)


def test_tm_preset_driver_monotone():
    """End-to-end nmf() on the TM preset via the projected kernel stays
    monotone and matches the XLA path (the driver now routes
    project_T_each_iter configs to the fused kernel when the panel
    fits)."""
    from rri_nmf_tpu.nmf import nmf
    X, _, _ = _problem(70, 50, 5, seed=12)
    kw = dict(k=5, max_iter=8, random_state=0, early_stop=False,
              compute_obj_each_iter=True, reset_topic_method=None,
              update_order='phase', project_T_each_iter=True,
              t_row_sum=1.0, w_row_sum=1.0)
    pa = nmf(X, use_pallas='interpret', **kw)
    xl = nmf(X, use_pallas=False, **kw)
    assert np.all(np.diff(pa['obj_history']) <= 1e-12)
    assert np.allclose(pa['W'], xl['W'], atol=1e-9)
    assert np.allclose(pa['T'], xl['T'], atol=1e-9)


def test_dense_pallas_driver_auto_monotone():
    """End-to-end: the nmf() driver on the dense Pallas path (forced via
    use_pallas='interpret') keeps the objective monotone and matches the
    XLA path."""
    from rri_nmf_tpu.nmf import nmf
    X, _, _ = _problem(80, 60, 5, seed=7)
    kw = dict(k=5, max_iter=8, random_state=0, early_stop=False,
              compute_obj_each_iter=True, reset_topic_method=None,
              update_order='phase')
    pa = nmf(X, use_pallas='interpret', **kw)
    xl = nmf(X, use_pallas=False, **kw)
    assert np.all(np.diff(pa['obj_history']) <= 0)
    assert np.allclose(pa['W'], xl['W'], atol=1e-9)
    assert np.allclose(pa['T'], xl['T'], atol=1e-9)
