"""Fused Pallas masked-sweep kernels vs the XLA masked sweep (SURVEY.md §4:
"Pallas-kernel vs jax.numpy reference equivalence"). Runs in interpreter
mode on CPU; the same kernels compile for TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rri_nmf_tpu.ops.sweep_xla import SweepConfig, make_sweep
from rri_nmf_tpu.ops.sweep_pallas import (
    make_masked_sweep_pallas, supports_pallas,
)


def _problem(n, d, k, seed=0, density=0.5):
    rng = np.random.RandomState(seed)
    X = np.abs(rng.rand(n, k) @ rng.rand(k, d) + 0.01 * rng.rand(n, d))
    M = (rng.rand(n, d) < density).astype(float)
    W0 = np.abs(rng.rand(n, k))
    T0 = np.abs(rng.rand(k, d))
    return X, M, W0, T0


def _run(sweep, X, M, W, T, iters=3):
    key = jax.random.PRNGKey(0)
    resets = jnp.asarray(0, jnp.int32)
    W, T = jnp.asarray(W), jnp.asarray(T)
    for _ in range(iters):
        W, T, key, resets = sweep(jnp.asarray(X), W, T, key, resets, key,
                                  jnp.asarray(M))
    return np.array(W), np.array(T)


@pytest.mark.parametrize('shape', [(30, 20, 3),      # heavy padding
                                   (300, 600, 5),    # multi-block d
                                   (520, 130, 4)])   # uneven both axes
def test_pallas_masked_sweep_matches_xla(shape):
    n, d, k = shape
    X, M, W0, T0 = _problem(n, d, k)
    cfg = SweepConfig(k=k, masked=True, reset_topic_method=None,
                      t_row_sum=1.0)
    assert supports_pallas(cfg)
    xla = make_sweep(cfg)
    pls = make_masked_sweep_pallas(cfg, interpret=True)
    Wx, Tx = _run(xla, X, M, W0, T0)
    Wp, Tp = _run(pls, X, M, W0, T0)
    assert np.allclose(Wx, Wp, atol=1e-9)
    assert np.allclose(Tx, Tp, atol=1e-9)


def test_pallas_with_regularization():
    n, d, k = 70, 40, 3
    X, M, W0, T0 = _problem(n, d, k, seed=2)
    cfg = SweepConfig(k=k, masked=True, reset_topic_method=None,
                      t_row_sum=1.0, reg_w_l1=0.1, reg_t_l1=0.05)
    xla = make_sweep(cfg)
    pls = make_masked_sweep_pallas(cfg, interpret=True)
    Wx, Tx = _run(xla, X, M, W0, T0)
    Wp, Tp = _run(pls, X, M, W0, T0)
    assert np.allclose(Wx, Wp, atol=1e-9)
    assert np.allclose(Tx, Tp, atol=1e-9)


def test_supports_pallas_gates():
    ok = SweepConfig(k=3, masked=True, reset_topic_method=None)
    assert supports_pallas(ok)
    assert not supports_pallas(SweepConfig(k=3, masked=False,
                                           reset_topic_method=None))
    assert not supports_pallas(SweepConfig(
        k=3, masked=True, reset_topic_method='max_resid_document'))
    assert not supports_pallas(SweepConfig(
        k=3, masked=True, reset_topic_method=None, dp_sigma=1.0))
    assert not supports_pallas(SweepConfig(
        k=3, masked=True, reset_topic_method=None, store_gradients=True))


def test_nmf_driver_pallas_path_monotone(recsys_train):
    """End-to-end: the nmf() driver on the Pallas path keeps the masked
    objective monotone on the reference recsys fixture."""
    from rri_nmf_tpu.nmf import nmf
    X = recsys_train
    Wm = np.zeros(X.shape)
    I, J = X.nonzero()
    Wm[I, J] = 1.0
    soln = nmf(X, k=7, W_mat=Wm, max_iter=10, random_state=0,
               reset_topic_method=None, compute_obj_each_iter=True,
               early_stop=False, t_row_sum=1.0,
               use_pallas='interpret')
    oh = soln['obj_history']
    assert np.all(np.diff(oh) <= 0)


def test_pallas_project_W_each_iter_matches_xla():
    """project_W_each_iter must be applied by the fused sweep too (the
    driver auto-selects Pallas on TPU, so skipping the projection there
    would silently diverge from the reference, nmf.py:481-484)."""
    n, d, k = 60, 45, 3
    X, M, W0, T0 = _problem(n, d, k, seed=4)
    cfg = SweepConfig(k=k, masked=True, reset_topic_method=None,
                      project_W_each_iter=True, w_row_sum=1.0,
                      t_row_sum=1.0)
    assert supports_pallas(cfg)
    xla = make_sweep(cfg)
    pls = make_masked_sweep_pallas(cfg, interpret=True)
    Wx, Tx = _run(xla, X, M, W0, T0)
    Wp, Tp = _run(pls, X, M, W0, T0)
    assert np.allclose(Wx, Wp, atol=1e-9)
    assert np.allclose(Tx, Tp, atol=1e-9)
    assert np.max(np.abs(Wp.sum(axis=1) - 1.0)) < 1e-12  # rows on simplex


def test_pallas_t_drift_reprojection_matches_xla():
    """With project_T_each_iter + t_row_sum and no resets, a drifted T row
    is re-projected (reference nmf.py:758-761) on the Pallas path exactly
    like the XLA sweep — including with column padding in play."""
    n, d, k = 40, 130, 3   # d=130 forces padding to the tile multiple
    X, M, W0, T0 = _problem(n, d, k, seed=5)
    cfg = SweepConfig(k=k, masked=True, reset_topic_method=None,
                      project_T_each_iter=True, t_row_sum=1.0)
    assert supports_pallas(cfg)
    xla = make_sweep(cfg)
    pls = make_masked_sweep_pallas(cfg, interpret=True)
    Wx, Tx = _run(xla, X, M, W0, T0, iters=4)
    Wp, Tp = _run(pls, X, M, W0, T0, iters=4)
    assert np.allclose(Wx, Wp, atol=1e-9)
    assert np.allclose(Tx, Tp, atol=1e-9)
    assert np.max(np.abs(Tp.sum(axis=1) - 1.0)) < 1e-12
