"""Estimator behaviors beyond the reference suite: tfidf/normalization
preprocessing, warm starts, predict/score plumbing, sparsify/densify."""

import numpy as np
import scipy.sparse as sp

from rri_nmf_tpu.sklearn_interface import NMF_RS_Estimator, NMF_TM_Estimator


def test_tm_handle_tfidf_and_normalization(text_train):
    """handle_tfidf stores idf at fit and reapplies it at transform
    (reference ``sklearn_interface.py:263-267,322-325``)."""
    # text_train is already tfidf'd; use raw-ish counts instead
    X = (text_train > 0).astype(float) * 3.0
    n, d = X.shape
    M = NMF_TM_Estimator(n, d, 4, random_state=0, max_iter=5,
                         handle_tfidf=True, handle_normalization=True)
    M.fit(X)
    assert hasattr(M, 'idf') and np.asarray(M.idf).shape == (d,)
    W = M.transform(X)
    assert W.shape == (n, 4)
    assert np.all(np.asarray(W) >= -1e-12)


def test_tm_warm_start_continues():
    rng = np.random.RandomState(0)
    X = np.abs(rng.rand(30, 3) @ rng.rand(3, 20))
    M1 = NMF_TM_Estimator(30, 20, 3, random_state=0, max_iter=3,
                          do_final_project_W=False).fit(X)
    W1, T1 = M1.W.copy(), M1.T.copy()
    M1.max_iter = 2
    M1.fit(X)   # continues from held factors (W_in/T_in path)
    assert not np.allclose(M1.T, T1)  # it actually moved


def test_rs_estimator_transform_and_predict(recsys_train):
    X = recsys_train
    n, d = X.shape
    E = NMF_RS_Estimator(n, d, 4, random_state=0, max_iter=8)
    E.fit_from_Xtr(X)
    W_new = E.transform(X)
    assert np.asarray(W_new).shape == (n, 4)
    I, J = X.nonzero()
    preds = E.predict(np.stack([I, J], axis=1))
    assert preds.min() >= E.min_rating and preds.max() <= E.max_rating
    # score via explicit (X, y) form
    s = E.score(np.stack([I, J], axis=1), y=X[I, J].astype(float))
    assert s < 1.5


def test_rs_transform_dense_equals_sparse(recsys_train):
    """Dense Xnew routes through the same O(nnz) sparse-mask inference
    as scipy-sparse Xnew (round-5 transform-latency fix): identical W,
    and no dense (rows, d) mask is ever built."""
    X = recsys_train
    n, d = X.shape
    E = NMF_RS_Estimator(n, d, 4, random_state=0, max_iter=6)
    E.fit_from_Xtr(X)
    Xnew = X[:64]
    W_dense = np.asarray(E.transform(Xnew))
    W_sparse = np.asarray(E.transform(sp.csr_matrix(Xnew)))
    np.testing.assert_allclose(W_dense, W_sparse, atol=1e-12, rtol=0)
    # rows with no observations come back all-zero, not NaN
    empty = np.asarray(Xnew.sum(axis=1)).ravel() == 0
    assert np.isfinite(W_dense).all()
    assert np.all(W_dense[empty] == 0)


def test_rs_no_validation_early_stopping(recsys_train):
    X = recsys_train
    n, d = X.shape
    E = NMF_RS_Estimator(n, d, 3, random_state=0, max_iter=5,
                         use_validation_early_stopping=False)
    E.fit_from_Xtr(X)
    # without the validation split, all observations train; runs full iters
    assert len(E.nmf_outputs['obj_history']) == 5


def test_sparsify_densify_roundtrip(recsys_train):
    X = recsys_train
    n, d = X.shape
    E = NMF_RS_Estimator(n, d, 3, random_state=0, max_iter=3)
    E.fit_from_Xtr(X)
    W = np.asarray(E.W).copy()
    E.sparsify()
    assert sp.issparse(E.W) and sp.issparse(E.T)
    E.densify()
    assert np.allclose(E.W, W)


def test_tm_sparse_transform_and_score(text_train):
    """SciPy-sparse input threads through transform (idf multiply +
    normalize stay sparse) and score (no densification of X); results
    match the dense-input call exactly."""
    X = sp.csr_matrix((text_train > 0).astype(float) * 3.0)
    n, d = X.shape
    M = NMF_TM_Estimator(n, d, 4, random_state=0, max_iter=5,
                         handle_tfidf=True, handle_normalization=True)
    M.fit(X.toarray())
    W_sp = np.asarray(M.transform(X))
    W_de = np.asarray(M.transform(X.toarray()))
    assert np.allclose(W_sp, W_de, atol=1e-10)
    s_sp = M.score(X)
    s_de = M.score(X.toarray())
    assert abs(s_sp - s_de) < 1e-8
    out = M.score_all(X)
    assert np.isfinite(out['r2']) and np.isfinite(out['rel_frobenius_error'])


def test_nmf_kwargs_override_presets(recsys_train):
    """nmf_kwargs entries OVERRIDE the estimator presets instead of
    raising TypeError on collision, and fit-only kwargs (accel) are
    dropped from the fixed-T transform preset — so one nmf_kwargs dict
    serves fit (HER on) and transform (fix_T)."""
    Xtr = recsys_train
    n, d = Xtr.shape
    I, J = np.nonzero(Xtr)
    X = np.stack([I, J], axis=1)
    y = Xtr[I, J]
    E = NMF_RS_Estimator(n, d, 3, random_state=0, max_iter=6,
                         nmf_kwargs=dict(accel='her', early_stop=False,
                                         # collides with the fit preset:
                                         compute_obj_each_iter=True))
    E.fit(X, y)
    assert np.isfinite(E.W).all() and np.isfinite(E.T).all()
    # the override took effect (objective tracked under HER)
    oh = E.nmf_outputs['obj_history']
    assert len(oh) > 0 and oh[-1] <= oh[0]
    # transform runs fix_T sweeps: accel is dropped, not an error
    W = E.transform(Xtr)
    assert np.isfinite(np.asarray(W)).all()


def test_fitted_estimators_pickle_roundtrip(recsys_train):
    """sklearn's persistence contract: fitted estimators must survive
    pickle/joblib. The RS estimator's validation early-stop closure and
    the obj_calculator's jitted kernel are both unpicklable fit
    artifacts — __getstate__ drops/rebuilds them (the reference
    estimator, which stores the same closure, cannot be pickled at
    all)."""
    import pickle

    X = recsys_train
    n, d = X.shape
    E = NMF_RS_Estimator(n, d, 3, random_state=0, max_iter=4)
    E.fit_from_Xtr(X)          # sets the RMSE_val closure + obj_calculator
    E2 = pickle.loads(pickle.dumps(E))
    np.testing.assert_array_equal(E2.W, E.W)
    np.testing.assert_array_equal(E2.T, E.T)
    assert E2.early_stop is None           # ephemeral; fit() rebuilds it
    assert E2.nmf_outputs['obj_history'] == E.nmf_outputs['obj_history']
    # the restored obj calculator rebuilds its jitted kernel lazily and
    # reproduces the final tracked objective on the fitted factors
    obj = E2.nmf_outputs['obj_calculator'].true_objective()
    np.testing.assert_allclose(obj, E.nmf_outputs['obj_history'][-1],
                               rtol=1e-10)
    # predict/transform still work on the restored estimator
    W = E2.transform(X)
    assert np.isfinite(np.asarray(W)).all()
    E2.fit_from_Xtr(X)   # refit rebuilds the early-stop closure
    assert callable(E2.early_stop)

    rng = np.random.RandomState(0)
    Xd = np.abs(rng.rand(20, 3) @ rng.rand(3, 15))
    M = NMF_TM_Estimator(20, 15, 3, random_state=0, max_iter=3).fit(Xd)
    M2 = pickle.loads(pickle.dumps(M))
    np.testing.assert_array_equal(M2.W, M.W)
    np.testing.assert_array_equal(M2.T, M.T)


def test_sparse_obj_calculator_pickles():
    """TrueObjComputer from a sparse (BCOO) fit round-trips through a
    scipy COO and reproduces the tracked objective after restore."""
    import pickle

    from rri_nmf_tpu.nmf import nmf

    rng = np.random.RandomState(3)
    Xs = sp.csr_matrix(np.abs(rng.rand(24, 18)) * (rng.rand(24, 18) < 0.4))
    soln = nmf(Xs, 3, sparse=True, max_iter=3, random_state=0,
               compute_obj_each_iter=True, update_order='phase',
               reset_topic_method=None)
    calc = pickle.loads(pickle.dumps(soln['obj_calculator']))
    np.testing.assert_allclose(calc.true_objective(),
                               soln['obj_history'][-1], rtol=1e-10)


def test_predict_gather_matches_materialized(recsys_train):
    """predict() gathers per-pair scores in O(q*k); it must agree with
    the reference's full clip(W @ T) materialization — for dense AND
    sparsified factors — and score() must be unchanged."""
    X = recsys_train
    n, d = X.shape
    E = NMF_RS_Estimator(n, d, 3, random_state=0, max_iter=4)
    E.fit_from_Xtr(X)
    I, J = X.nonzero()
    pairs = np.stack([I, J], axis=1)

    gathered = E.predict(pairs)                      # Xpred cache empty
    full = np.clip(np.dot(E.W, E.T), E.min_rating, E.max_rating)[I, J]
    np.testing.assert_allclose(gathered, full, rtol=1e-12)
    s1 = E.score(pairs, X[I, J])

    E.sparsify()                                     # csr factors
    np.testing.assert_allclose(E.predict(pairs), full, rtol=1e-12)
    E.densify()

    E.make_Xpred()                                   # cache fast path
    assert E.Xpred.shape == (n, d)
    np.testing.assert_allclose(E.predict(pairs), full, rtol=0)
    np.testing.assert_allclose(E.score(pairs, X[I, J]), s1, rtol=1e-12)
