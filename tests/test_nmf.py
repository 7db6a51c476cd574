"""Reference-parity test suite.

Ports the assertions of the reference's ``tests/test_nmf.py`` (Python 2)
one-for-one: NNDSVD golden values, monotone objective descent across the
supported regularization/projection configurations, 1e-13 constraint
feasibility, estimator-level quality floors, and the stepped ≡ batch
incremental-fit equivalence.
"""

import numpy as np
import pytest

from rri_nmf_tpu.initialization import initialize_nmf
from rri_nmf_tpu.matrixops import proj_mat_to_simplex
from rri_nmf_tpu.nmf import nmf
from rri_nmf_tpu.sklearn_interface import NMF_RS_Estimator, NMF_TM_Estimator

constraint_violation_tolerance = 1e-13


def test_init(small_X_W_T):
    """NNDSVD(k=2, seed 0) must reproduce the reference's golden factors
    (reference ``tests/test_nmf.py:13-19``)."""
    X, Wt, Tt = small_X_W_T
    W, T = initialize_nmf(X, 2, init='nndsvd', random_state=0)
    assert np.allclose(Wt, W)
    assert np.allclose(Tt, T)


@pytest.mark.parametrize('nmf_params', [{'k': 25},
                                        {'k': 15, 'reg_t_l2': 0.1},
                                        {'k': 15, 'reg_t_l2': -0.1},
                                        {'k': 15, 'reg_w_l2': 0.1}])
def test_convergence_tm_setting(nmf_params, text_train):
    """Topic-modeling NMF converges monotonically and stays feasible
    (reference ``tests/test_nmf.py:22-42``)."""
    X = text_train
    tm_settings = {
        'max_iter': 15, 'w_row_sum': 1.0, 'random_state': 0,
        'eps_stop': 1e-4, 'project_T_each_iter': True,
        'project_W_each_iter': True, 'compute_obj_each_iter': True,
        't_row_sum': 1.0, 'early_stop': False,
    }
    nmf_params = dict(nmf_params)
    nmf_params.update(tm_settings)
    soln = nmf(X, **nmf_params)
    oh = soln['obj_history']
    assert np.all(np.diff(oh) <= 0)
    assert _constraint_violation_WT(
        soln['W'], soln['T']) <= constraint_violation_tolerance


def _constraint_violation_WT(W, T):
    assert np.all(W >= 0 - constraint_violation_tolerance), 'W>=0 doesnt hold'
    assert np.all(T >= 0 - constraint_violation_tolerance), 'T>=0 doesnt hold'
    cvW = np.sum(np.abs(np.asarray(W).sum(1) - 1))
    cvT = np.sum(np.abs(np.asarray(T).sum(1) - 1))
    return cvW + cvT


@pytest.mark.parametrize('nmf_params', [{},
                                        {'reg_w_l1': 0.1, 'reg_t_l1': 0.1},
                                        {'reg_w_l1': 0.1},
                                        {'reg_t_l1': 0.1}])
def test_convergence_rs_setting(nmf_params, recsys_train):
    """Masked WRRI NMF converges monotonically
    (reference ``tests/test_nmf.py:57-78``)."""
    X = recsys_train
    Wm = np.zeros(X.shape)
    Itr, Jtr = X.nonzero()
    Wm[Itr, Jtr] = 1.0

    rs_settings = {
        'max_iter': 15, 'random_state': 0, 'W_mat': Wm,
        'compute_obj_each_iter': True, 'reset_topic_method': None,
        'early_stop': False, 'k': 7, 'project_T_each_iter': False,
        't_row_sum': 1.0, 'project_W_each_iter': False,
        'w_row_sum': None,
    }
    nmf_params = dict(nmf_params)
    nmf_params.update(rs_settings)

    soln = nmf(X, **nmf_params)
    oh = soln['obj_history']
    assert np.all(np.diff(oh) <= 0)


def test_convergence_RS_Estimator(recsys_train):
    """End-to-end recommender estimator fit: train RMSE < 1.0
    (reference ``tests/test_nmf.py:81-88``)."""
    X = recsys_train
    n, d = X.shape
    E = NMF_RS_Estimator(n, d, 5, random_state=0, max_iter=20)
    E = E.fit_from_Xtr(X)
    score = E.score(X)
    assert score < 1.0


def test_convergence_TM_Estimator(text_train):
    """End-to-end TM fit quality + stepped ≡ batch incremental equivalence
    (reference ``tests/test_nmf.py:90-110``)."""
    X = text_train
    n, d = X.shape
    M = NMF_TM_Estimator(n, d, 5, random_state=0, max_iter=10)
    M = M.fit(X)
    assert np.linalg.norm(X - np.dot(M.W, M.T), 'fro') < \
        np.linalg.norm(X, 'fro')

    M2 = NMF_TM_Estimator(n, d, 5, random_state=0, max_iter=2,
                          do_final_project_W=False)
    M2 = M2.fit(X)
    M2.max_iter = 10
    for _ in range(7):
        M2 = M2.one_iter(X)
    M2 = M2.one_iter(X)
    M2.W = np.asarray(proj_mat_to_simplex(M2.W))

    assert np.allclose(M2.T, M.T)
    assert np.allclose(M2.W, M.W)
