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


def test_metrics_accept_scipy_sparse():
    """The metrics take scipy-sparse X directly (the library's text path
    keeps counts sparse; np.asarray on a sparse matrix yields a 0-d
    object array and confusing errors)."""
    import scipy.sparse as sp
    rng = np.random.RandomState(0)
    Xd = np.abs(rng.rand(20, 5) @ rng.rand(5, 15))
    Xd[rng.rand(20, 15) < 0.5] = 0.0
    W = np.abs(rng.rand(20, 3))
    T = np.abs(rng.rand(3, 15))
    Xs = sp.csr_matrix(Xd)
    assert np.isclose(frobenius_relative_error(Xs, W, T),
                      frobenius_relative_error(Xd, W, T))
    assert np.isclose(rmse_observed(Xs, W, T), rmse_observed(Xd, W, T))
    assert np.isclose(r2_reconstruction(Xs, W, T),
                      r2_reconstruction(Xd, W, T))
    cs = umass_coherence(Xs, T, top_n=4)
    cd = umass_coherence(Xd, T, top_n=4)
    assert np.isclose(cs, cd)


def test_score_all_sparse_matches_dense(text_train):
    """score_all on scipy-sparse X (no densify, VERDICT r3 weak #4)
    matches the dense evaluation."""
    import scipy.sparse as sp
    from rri_nmf_tpu.sklearn_interface import NMF_TM_Estimator
    X = text_train
    n, d = X.shape
    M = NMF_TM_Estimator(n, d, 4, random_state=0, max_iter=5).fit(X)
    counts = (X > 0).astype(float)
    dense = M.score_all(X, X_counts=counts)
    sparse = M.score_all(sp.csr_matrix(X),
                         X_counts=sp.csr_matrix(counts))
    for key in dense:
        assert np.isclose(sparse[key], dense[key], rtol=1e-8), key
