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


@pytest.mark.parametrize('shape', [(30, 20, 3), (300, 600, 5),
                                   (520, 130, 4)])
def test_pallas_masked_fix_T_matches_xla(shape):
    """fix_T masked sweeps — the RS estimator's transform path (reference
    sklearn_interface.py:144-156) — through the W-phase-only fused
    variant (round-2 VERDICT item 8)."""
    n, d, k = shape
    X, M, W0, T0 = _problem(n, d, k, seed=5)
    cfg = SweepConfig(k=k, masked=True, fix_T=True,
                      reset_topic_method=None, t_row_sum=1.0)
    assert supports_pallas(cfg)
    xla = make_sweep(cfg)
    pls = make_masked_sweep_pallas(cfg, interpret=True)
    Wx, Tx = _run(xla, X, M, W0, T0, iters=4)
    Wp, Tp = _run(pls, X, M, W0, T0, iters=4)
    assert np.allclose(Tx, T0)          # T truly fixed
    assert np.allclose(Tp, T0)
    assert np.allclose(Wx, Wp, atol=1e-9)


def test_pallas_masked_fix_T_with_regs_and_row_bounds():
    n, d, k = 140, 90, 4
    X, M, W0, T0 = _problem(n, d, k, seed=6)
    cfg = SweepConfig(k=k, masked=True, fix_T=True,
                      reset_topic_method=None, reg_w_l1=0.05,
                      reg_w_l2=0.02, w_row_sum=1.0,
                      project_W_each_iter=True)
    xla = make_sweep(cfg)
    pls = make_masked_sweep_pallas(cfg, interpret=True)
    Wx, _ = _run(xla, X, M, W0, T0, iters=3)
    Wp, _ = _run(pls, X, M, W0, T0, iters=3)
    assert np.allclose(Wx, Wp, atol=1e-9)
    assert np.allclose(Wp.sum(1), 1.0, atol=1e-10)


def test_rs_estimator_transform_via_fused_kernel(recsys_train,
                                                 recsys_test):
    """Estimator-level: NMF_RS_Estimator.transform through the fused
    fix_T masked kernel equals the XLA path."""
    from rri_nmf_tpu.sklearn_interface import NMF_RS_Estimator

    n, d = recsys_train.shape
    est = NMF_RS_Estimator(n, d, 4, random_state=0, max_iter=6)
    est.fit_from_Xtr(recsys_train)
    est.nmf_kwargs = {'use_pallas': False}
    W_xla = est.transform(recsys_test)
    est.nmf_kwargs = {'use_pallas': 'interpret'}
    W_pls = est.transform(recsys_test)
    assert np.allclose(W_xla, W_pls, atol=1e-9)


def test_pallas_masked_fix_T_reset_parity():
    """A dead topic (zero T row with T fixed -> zero W update) must
    trigger the 'random' reset identically in both paths (the RS
    transform preset uses reset_topic_method='random')."""
    n, d, k = 70, 50, 3
    X, M, W0, T0 = _problem(n, d, k, seed=7)
    T0 = T0.copy()
    T0[1] = 0.0                             # dead topic
    cfg = SweepConfig(k=k, masked=True, fix_T=True,
                      reset_topic_method='random', t_row_sum=1.0)
    assert supports_pallas(cfg)
    xla = make_sweep(cfg)
    pls = make_masked_sweep_pallas(cfg, interpret=True)

    def run_budget(sweep):
        key = jax.random.PRNGKey(0)
        resets = jnp.asarray(23, jnp.int32)
        W, T = jnp.asarray(W0), jnp.asarray(T0)
        for _ in range(2):
            W, T, key, resets = sweep(jnp.asarray(X), W, T, key, resets,
                                      jax.random.PRNGKey(0),
                                      jnp.asarray(M))
        return np.array(W), np.array(T), int(resets)

    Wx, Tx, rx = run_budget(xla)
    Wp, Tp, rp = run_budget(pls)
    assert not np.allclose(Tx[1], 0.0)      # reset actually fired
    assert rx < 23 and rp == rx             # same budget spent
    assert np.allclose(Wx, Wp, atol=1e-9)
    assert np.allclose(Tx, Tp, atol=1e-9)


def test_pallas_tiles_override_parity():
    """Adaptive tile sizes (_pick_tiles) and explicit overrides are pure
    performance knobs: identical results for any legal (bn, bd)."""
    n, d, k = 520, 130, 4
    X, M, W0, T0 = _problem(n, d, k, seed=3)
    cfg = SweepConfig(k=k, masked=True, reset_topic_method=None,
                      t_row_sum=1.0)
    ref = make_masked_sweep_pallas(cfg, interpret=True)
    Wr, Tr = _run(ref, X, M, W0, T0)
    for tiles in [(1024, 1024), (512, 2048)]:
        alt = make_masked_sweep_pallas(cfg, interpret=True, tiles=tiles)
        Wa, Ta = _run(alt, X, M, W0, T0)
        assert np.allclose(Wr, Wa, atol=1e-12), tiles
        assert np.allclose(Tr, Ta, atol=1e-12), tiles


def test_pick_tiles_policy():
    from rri_nmf_tpu.ops.sweep_pallas import _pick_tiles
    npad, bn, dpad, bd = _pick_tiles(100, 80)
    assert (npad, dpad) == (512, 1024) and (bn, bd) == (512, 1024)
    npad, bn, dpad, bd = _pick_tiles(6144, 4096)
    assert npad % bn == 0 and dpad % bd == 0
    assert 6 * bn * bd * 4 <= 48 * 2**20
    assert bn * bd >= 512 * 1024  # never smaller than the old fixed tiles


def test_pallas_negative_l1_padding_no_phantom_mass():
    """Negative L1 regularizers must not leak mass into the zero-padded
    tails: a padded coordinate's subproblem sees numer = -reg_l1 > 0 and
    denom = reg_l2 > 0, so an unmasked solve would give it
    max(-reg_l1, 0)/reg_l2 phantom mass that corrupts the sum-to-s
    rescale (T-phase) and the returned factors (W-phase). Pinned against
    the XLA sweep on heavily padded shapes."""
    n, d, k = 6, 5, 3      # pads to (512, 1024): ~99% padding
    X, M, W0, T0 = _problem(n, d, k, seed=3)
    cfg = SweepConfig(k=k, masked=True, reset_topic_method=None,
                      project_T_each_iter=True, t_row_sum=1.0,
                      reg_t_l1=-0.1, reg_t_l2=0.5,
                      reg_w_l1=-0.05, reg_w_l2=0.5)
    assert supports_pallas(cfg)
    xla = make_sweep(cfg)
    pls = make_masked_sweep_pallas(cfg, interpret=True)
    Wx, Tx = _run(xla, X, M, W0, T0, iters=2)
    Wp, Tp = _run(pls, X, M, W0, T0, iters=2)
    assert np.allclose(Wx, Wp, atol=1e-9), np.abs(Wx - Wp).max()
    assert np.allclose(Tx, Tp, atol=1e-9), np.abs(Tx - Tp).max()


def test_pallas_fix_t_reset_fires_despite_negative_l1_padding():
    """The fix_T reset aliveness check must ignore padded rows: with
    reg_w_l1 < 0 phantom pad mass once made dead topics look alive and
    suppressed resets (XLA fired them). Reset budgets must match."""
    n, d, k = 6, 5, 3
    rng = np.random.RandomState(4)
    X = np.zeros((n, d))                   # all-zero data: dead topics
    M = np.ones((n, d))
    W0 = np.abs(rng.rand(n, k)) + 0.1
    T0 = np.abs(rng.rand(k, d)) + 0.1
    cfg = SweepConfig(k=k, masked=True, fix_T=True,
                      reset_topic_method='random',
                      reg_w_l1=-1e-3, reg_w_l2=1.0)
    assert supports_pallas(cfg)
    xla = make_sweep(cfg)
    pls = make_masked_sweep_pallas(cfg, interpret=True)

    def run(sweep):
        key = jax.random.PRNGKey(0)
        resets = jnp.asarray(5, jnp.int32)
        W, T, key, resets = sweep(jnp.asarray(X), jnp.asarray(W0),
                                  jnp.asarray(T0), key, resets, key,
                                  jnp.asarray(M))
        return np.array(W), np.array(T), int(resets)

    Wx, Tx, rx = run(xla)
    Wp, Tp, rp = run(pls)
    assert rx < 5, 'sanity: XLA fires resets on dead topics'
    assert rp == rx, (rp, rx)
    assert np.allclose(Wx, Wp, atol=1e-9)
    assert np.allclose(Tx, Tp, atol=1e-9)


def test_dense_pallas_gs_vmem_gate():
    """supports_dense_pallas declines k too large for the GS kernels'
    VMEM (quantum-floored tiles + the resident (k,k) Gram) instead of
    failing at Mosaic compile time."""
    from rri_nmf_tpu.ops.dense_pallas import gs_fits, supports_dense_pallas
    ok = SweepConfig(k=256, reset_topic_method=None, update_order='phase')
    big = SweepConfig(k=4096, reset_topic_method=None, update_order='phase')
    assert gs_fits(256) and supports_dense_pallas(ok, d=512)
    assert not gs_fits(4096) and not supports_dense_pallas(big, d=512)


def test_pallas_masked_factor_dtype_follows_w():
    """Direct calls with a narrow X and f32 factors must not silently
    quantize the factors (the XLA masked sweep's resolve_mixed_dtypes
    rule: factor dtype follows W)."""
    n, d, k = 30, 20, 3
    X, M, W0, T0 = _problem(n, d, k, seed=5)
    cfg = SweepConfig(k=k, masked=True, reset_topic_method=None)
    pls = make_masked_sweep_pallas(cfg, interpret=True)
    key = jax.random.PRNGKey(0)
    W1, T1, _, _ = pls(jnp.asarray(X, jnp.bfloat16),
                       jnp.asarray(W0, jnp.float32),
                       jnp.asarray(T0, jnp.float32),
                       key, jnp.asarray(0, jnp.int32), key,
                       jnp.asarray(M, jnp.bfloat16))
    assert W1.dtype == jnp.float32 and T1.dtype == jnp.float32
