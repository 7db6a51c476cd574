"""Metrics + estimator score_all tests."""

import numpy as np

from rri_nmf_tpu.metrics import (
    frobenius_relative_error, r2_reconstruction, rmse_observed,
    umass_coherence,
)


def test_frobenius_relative_error_exact():
    rng = np.random.RandomState(0)
    W = np.abs(rng.rand(10, 3))
    T = np.abs(rng.rand(3, 8))
    assert frobenius_relative_error(W @ T, W, T) < 1e-12
    assert 0 < frobenius_relative_error(W @ T + 1.0, W, T)


def test_rmse_observed_clipping():
    X = np.zeros((3, 3))
    X[0, 0] = 5.0
    W = np.array([[2.0], [0.0], [0.0]])
    T = np.array([[4.0, 0.0, 0.0]])   # pred 8 -> clipped to 5
    assert rmse_observed(X, W, T, 1, 5) == 0.0
    assert rmse_observed(X, W, T) == 3.0


def test_r2_perfect():
    rng = np.random.RandomState(0)
    W = np.abs(rng.rand(10, 3))
    T = np.abs(rng.rand(3, 8))
    assert abs(r2_reconstruction(W @ T, W, T) - 1.0) < 1e-12


def test_umass_coherence_prefers_cooccurring_words():
    # corpus where words 0,1 always co-occur; words 2,3 never do
    X = np.zeros((40, 4))
    X[:20, 0] = X[:20, 1] = 1          # docs with {0,1}
    X[20:30, 2] = 1                     # docs with {2}
    X[30:, 3] = 1                       # docs with {3}
    T_good = np.array([[5.0, 4.0, 0.0, 0.0]])
    T_bad = np.array([[0.0, 0.0, 5.0, 4.0]])
    assert umass_coherence(X, T_good, top_n=2) > \
        umass_coherence(X, T_bad, top_n=2)


def test_tm_estimator_score_all(text_train):
    from rri_nmf_tpu.sklearn_interface import NMF_TM_Estimator
    X = text_train
    n, d = X.shape
    M = NMF_TM_Estimator(n, d, 4, random_state=0, max_iter=5).fit(X)
    scores = M.score_all(X, X_counts=(X > 0).astype(float))
    assert set(scores) == {'r2', 'rel_frobenius_error', 'umass_coherence'}
    assert 0 < scores['rel_frobenius_error'] < 1.0
    assert np.isfinite(scores['umass_coherence'])
