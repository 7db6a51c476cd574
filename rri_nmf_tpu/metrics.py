"""Evaluation metrics for the BASELINE.md benchmark configs.

The reference computes RMSE (``sklearn_interface.py:172-182``) and R²
(``sklearn_interface.py:339-345``) inside its estimators; those are kept
there. This module adds the standalone metrics the benchmark harness
reports (BASELINE.md: "reconstruction + coherence scores", "recommender
RMSE") plus the relative Frobenius error that defines the north-star target
("wall-clock to 1e-4 rel. Frobenius err").
"""

import numpy as np


def _dense(X):
    """Accept scipy-sparse inputs: np.asarray on a sparse matrix wraps it
    in a 0-d object array (downstream ops then raise confusing truthiness
    errors), and the library's own text path deliberately keeps count
    matrices sparse."""
    return X.toarray() if hasattr(X, 'toarray') else np.asarray(X)


def frobenius_relative_error(X, W, T):
    """``||X - WT||_F / ||X||_F`` — the north-star convergence criterion."""
    X = _dense(X)
    return float(np.linalg.norm(X - np.asarray(W) @ np.asarray(T)) /
                 np.linalg.norm(X))


def rmse_observed(X, W, T, min_rating=None, max_rating=None):
    """RMSE over the nonzero (observed) entries of X, with optional rating
    clipping — the RS estimator's scoring rule
    (reference ``sklearn_interface.py:85-93,172-182``)."""
    X = _dense(X)
    I, J = X.nonzero()
    pred = (np.asarray(W) @ np.asarray(T))[I, J]
    if min_rating is not None or max_rating is not None:
        pred = np.clip(pred, min_rating, max_rating)
    return float(np.sqrt(np.mean((pred - X[I, J]) ** 2)))


def r2_reconstruction(X, W, T):
    """R² of reconstructing X (reference ``sklearn_interface.py:339-345``)."""
    X = _dense(X)
    SST = ((X - X.mean(axis=0)) ** 2).sum()
    SSE = ((X - np.asarray(W) @ np.asarray(T)) ** 2).sum()
    return float(1 - SSE / SST)


def umass_coherence(X_counts, T, top_n=10, eps=1.0):
    """Mean UMass topic coherence over topics.

    ``C(t) = mean over word pairs (i<j of the top_n words of topic t) of
    log((D(w_i, w_j) + eps) / D(w_j))`` where D counts documents containing
    the word(s). Standard topic-quality metric (Mimno et al. 2011); the
    BASELINE 20-Newsgroups config reports it alongside reconstruction.

    SciPy-sparse count matrices stay sparse: only the k·top_n occurrence
    COLUMNS the pair counts touch are materialized (length-n bool
    vectors), never the n×d matrix — corpus-scale coherence costs
    O(k·top_n·n), not O(nd).
    """
    T = np.asarray(T)
    k = T.shape[0]
    _sparse = hasattr(X_counts, 'tocsc')
    Xc = X_counts.tocsc() if _sparse else (_dense(X_counts) > 0)
    col_cache = {}

    def occ_col(j):
        if j not in col_cache:
            col_cache[j] = (np.asarray(
                Xc[:, j].todense()).ravel() > 0) if _sparse else Xc[:, j]
        return col_cache[j]

    scores = []
    for t in range(k):
        top = np.argsort(-T[t])[:top_n]
        pair_scores = []
        for a in range(1, len(top)):
            for b in range(a):
                wi, wj = occ_col(top[a]), occ_col(top[b])
                d_j = wj.sum()
                if d_j == 0:
                    continue
                d_ij = np.logical_and(wi, wj).sum()
                pair_scores.append(np.log((d_ij + eps) / d_j))
        if pair_scores:
            scores.append(np.mean(pair_scores))
    return float(np.mean(scores)) if scores else float('nan')
