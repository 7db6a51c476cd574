"""Unit tests for the leaf array-math layer."""

import numpy as np
import pytest
import scipy.sparse

from rri_nmf_tpu.matrixops import (
    col_vector, euclidean_proj_simplex, harden_distributions, labels_to_mat,
    normalize, normalize_l2, proj_mat_to_simplex, stack_matrices, tfidf,
)


def _proj_simplex_numpy(v, s=1.0):
    """Independent host oracle (Duchi et al. 2008)."""
    v = np.asarray(v, dtype=float).ravel()
    u = np.sort(v)[::-1]
    cssv = np.cumsum(u)
    rho = np.nonzero(u * np.arange(1, v.size + 1) > (cssv - s))[0][-1]
    theta = (cssv[rho] - s) / (rho + 1.0)
    return np.clip(v - theta, 0, None)


@pytest.mark.parametrize('seed', range(6))
def test_proj_simplex_matches_oracle(seed):
    rng = np.random.RandomState(seed)
    v = rng.randn(50) * (seed + 1)
    s = [1.0, 2.5, 0.3][seed % 3]
    w = np.asarray(euclidean_proj_simplex(v, s))
    assert np.allclose(w, _proj_simplex_numpy(v, s), atol=1e-12)
    assert abs(w.sum() - s) < 1e-12
    assert np.all(w >= 0)


def test_proj_simplex_identity_on_feasible():
    """Already-feasible vectors pass through bit-exact
    (reference ``matrixops.py:53-55``)."""
    v = np.array([0.25, 0.5, 0.25, 0.0])
    w = np.asarray(euclidean_proj_simplex(v, 1.0))
    assert np.array_equal(w, v)


def test_proj_mat_rows_and_cols():
    rng = np.random.RandomState(0)
    W = rng.randn(7, 5)
    Wr = np.asarray(proj_mat_to_simplex(W.copy(), 1.0, axis=1))
    assert np.allclose(Wr.sum(1), 1.0, atol=1e-12)
    Wc = np.asarray(proj_mat_to_simplex(W.copy(), 2.0, axis=0))
    assert np.allclose(Wc.sum(0), 2.0, atol=1e-12)
    # per-row radii
    s = np.arange(1, 8, dtype=float)
    Ws = np.asarray(proj_mat_to_simplex(W.copy(), s, axis=1))
    assert np.allclose(Ws.sum(1), s, atol=1e-12)


def test_normalize_rows_cols_and_zero_fix():
    X = np.array([[1.0, 3.0], [0.0, 0.0]])
    Xr = np.asarray(normalize(X, dim=1))
    assert np.allclose(Xr[0], [0.25, 0.75])
    assert np.allclose(Xr[1], [0.5, 0.5])  # zero row -> uniform
    Xc = np.asarray(normalize(X, dim=0))
    assert np.allclose(Xc.sum(0), 1.0)
    Xn = np.asarray(normalize(X, dim=1, zero_sum_fix=False))
    assert np.allclose(Xn[1], [0.0, 0.0])


def test_normalize_l2():
    X = np.array([[3.0, 4.0], [1.0, 0.0]])
    Xn = np.asarray(normalize_l2(X))
    assert np.allclose(np.linalg.norm(Xn, axis=1), 1.0, atol=1e-5)
    Xc = np.asarray(normalize_l2(X, dim=0))
    assert np.allclose(np.linalg.norm(Xc, axis=0), 1.0, atol=1e-5)


def test_tfidf_dense_and_sparse_agree():
    rng = np.random.RandomState(0)
    X = (rng.rand(10, 8) > 0.6) * rng.rand(10, 8)
    dense = np.asarray(tfidf(X))
    out_sp = tfidf(scipy.sparse.csr_matrix(X))
    assert scipy.sparse.issparse(out_sp)     # sparse stays sparse
    assert np.allclose(dense, out_sp.toarray())
    Xt, idf = tfidf(X, return_idf=True)
    assert np.allclose(np.asarray(Xt), X * np.asarray(idf))


def test_normalize_sparse_stays_sparse():
    rng = np.random.RandomState(1)
    X = (rng.rand(12, 9) > 0.5) * rng.rand(12, 9)
    Xs = scipy.sparse.csr_matrix(X)
    out = normalize(Xs)
    assert scipy.sparse.issparse(out)
    sums = np.asarray(out.sum(axis=1)).ravel()
    nz = np.asarray(Xs.sum(axis=1)).ravel() > 0
    assert np.allclose(sums[nz], 1.0)
    # zero rows remain zero on the sparse path (no uniform fill)
    assert np.allclose(sums[~nz], 0.0)
    outc = normalize(Xs, dim=0)
    csums = np.asarray(outc.sum(axis=0)).ravel()
    nzc = np.asarray(Xs.sum(axis=0)).ravel() > 0
    assert np.allclose(csums[nzc], 1.0)


def test_labels_and_hardening():
    y = np.array([0, 2, 1, 2])
    W = np.asarray(labels_to_mat(y))
    assert W.shape == (4, 3)
    assert np.allclose(W.sum(1), 1.0)
    H = np.asarray(harden_distributions(np.array([[0.2, 0.8], [0.9, 0.1]])))
    assert np.allclose(H, [[0, 1], [1, 0]])


def test_col_vector_and_stack():
    x = np.arange(3.0)
    assert col_vector(x).shape == (3, 1)
    A = np.ones((2, 3))
    B = np.zeros((1, 3))
    assert stack_matrices([A, B]).shape == (3, 3)
    assert stack_matrices([np.ones((2, 2)), np.zeros((2, 1))],
                          dim='fat').shape == (2, 3)
    assert stack_matrices([{'m': A}, {'m': B}], dict_key='m').shape == (3, 3)
    out = stack_matrices([x, x], transform=lambda r: r.reshape(1, r.size))
    assert out.shape == (2, 3)


def test_labels_to_mat_column_vector():
    """(n, 1) label columns one-hot exactly like (n,) vectors — the fancy
    index used to broadcast an (n,1) y into an (n,n) index set and return
    all-ones rows."""
    y = np.array([0, 2, 1, 2])
    a = np.asarray(labels_to_mat(y))
    b = np.asarray(labels_to_mat(y.reshape(-1, 1)))
    assert np.array_equal(a, b)
    assert np.array_equal(a.sum(axis=1), np.ones(4))
