"""Initialization tests: RNG parity, NNDSVD variants, masked SVD, coherence."""

import numpy as np
import pytest

from rri_nmf_tpu.initialization import (
    initialize_nmf, masked_svd_init, randomized_svd_jax,
)


def _data(n=30, d=20, k=4, seed=0):
    rng = np.random.RandomState(seed)
    return np.abs(rng.rand(n, k) @ rng.rand(k, d))


def test_random_init_rng_parity():
    """'random' must reproduce the NumPy RandomState stream the reference
    uses (reference ``initialization.py:80-87``: T drawn before W)."""
    W, T = initialize_nmf(np.ones((5, 7)), 3, init='random', random_state=42)
    rng = np.random.RandomState(42)
    T_exp = rng.rand(3, 7)
    W_exp = rng.rand(5, 3)
    assert np.allclose(T, T_exp)
    assert np.allclose(W, W_exp)


def test_smart_random_scaling():
    X = _data()
    W, T = initialize_nmf(X, 4, init='smart_random', random_state=0)
    avg = np.sqrt(X.mean() / 4)
    assert np.all(W >= 0) and np.all(T >= 0)
    # scaled |N(0,1)|: mean magnitude ~ avg * sqrt(2/pi)
    assert 0.3 * avg < W.mean() < 2.0 * avg


def test_default_init_dispatch():
    X = _data()
    W1, T1 = initialize_nmf(X, 4, init=None, random_state=0)   # -> nndsvd
    W2, T2 = initialize_nmf(X, 4, init='nndsvd', random_state=0)
    assert np.allclose(W1, W2) and np.allclose(T1, T2)


@pytest.mark.parametrize('variant', ['nndsvda', 'nndsvdar'])
def test_nndsvd_zero_filling(variant):
    X = _data()
    W0, T0 = initialize_nmf(X, 4, init='nndsvd', random_state=0)
    W, T = initialize_nmf(X, 4, init=variant, random_state=0)
    # zeros filled, nonzeros unchanged
    assert np.all(W > 0) and np.all(T > 0)
    nz = W0 > 0
    assert np.allclose(W[nz], W0[nz])


def test_invalid_init_raises():
    with pytest.raises(ValueError):
        initialize_nmf(_data(), 4, init='not_a_method')


def test_row_normalize():
    X = _data()
    _, T = initialize_nmf(X, 4, init='nndsvd', random_state=0,
                          row_normalize=True)
    assert np.allclose(np.asarray(T).sum(1), 1.0, atol=1e-12)


def test_jax_svd_backend_close_to_exact():
    """The jittable randomized SVD reconstructs as well as the host SVD."""
    X = _data(n=40, d=25, k=5)
    W1, T1 = initialize_nmf(X, 5, init='nndsvd', random_state=0,
                            svd_backend='sklearn')
    W2, T2 = initialize_nmf(X, 5, init='nndsvd', random_state=0,
                            svd_backend='jax')
    r1 = np.linalg.norm(X - np.asarray(W1) @ np.asarray(T1))
    r2 = np.linalg.norm(X - np.asarray(W2) @ np.asarray(T2))
    assert r2 < r1 * 1.05 + 1e-8


def test_randomized_svd_jax_accuracy():
    import jax
    X = _data(n=50, d=30, k=6)
    U, S, Vt = randomized_svd_jax(X, 6, jax.random.PRNGKey(0))
    Us, Ss, Vts = np.linalg.svd(X)
    assert np.allclose(np.asarray(S), Ss[:6], rtol=1e-6)
    recon = np.asarray(U) * np.asarray(S) @ np.asarray(Vt)
    exact = np.linalg.norm(X - (Us[:, :6] * Ss[:6]) @ Vts[:6])
    assert np.linalg.norm(X - recon) <= max(exact * (1 + 1e-6), 1e-10)


def test_masked_svd_init():
    """BIRSVD-style masked init recovers structure from observed entries
    only (the reference's unimplemented TODO, ``README.md:18``)."""
    rng = np.random.RandomState(0)
    Wg, Tg = np.abs(rng.rand(40, 3)), np.abs(rng.rand(3, 25))
    X_full = Wg @ Tg
    M = (rng.rand(40, 25) < 0.5).astype(float)
    W, T = masked_svd_init(X_full * M, M, 3, random_state=0)
    assert W.shape == (40, 3) and T.shape == (3, 25)
    assert np.all(W >= 0) and np.all(T >= 0)
    # reconstruction on observed entries beats the trivial mean baseline
    recon = W @ T
    obs = M > 0
    err = np.mean((recon[obs] - X_full[obs]) ** 2)
    base = np.mean((X_full[obs].mean() - X_full[obs]) ** 2)
    assert err < base


def test_coherence_pmi_reachable(text_train):
    """init='coherence_pmi' must dispatch (fixes reference dead code:
    documented at ``nmf.py:206-208`` but unreachable through
    ``initialization.py:154-157``)."""
    X = text_train
    W, T = initialize_nmf(X, 3, init='coherence_pmi', n_words_beam=5)
    W, T = np.asarray(W), np.asarray(T)
    assert W.shape == (X.shape[0], 3) and T.shape == (3, X.shape[1])
    assert np.allclose(T.sum(1), 1.0, atol=1e-12)
    # each topic selected 5 distinct words
    assert np.all((T > 0).sum(1) <= 5)


def test_jax_svd_backend_mean_dominated_no_dead_topics():
    """Regression: the Gram-eigh orthonormalization must FLOOR near-null
    eigenvalues, not hard-zero them. λ ratios are (σ/σmax)², so a clamp
    at c·ε kills every direction with σ < √(cε)·σmax — on mean-dominated
    matrices (uniform-factor products: σ2/σ1 ~ 1/400) an early 100ε cut
    dead-topiced 255/256 NNDSVD components. Pin: f32 exactly-rank-k
    mean-dominated X → zero dead topics, recon error matches the sklearn
    backend."""
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    n, d, k = 1024, 512, 32
    X = (rng.rand(n, k) @ rng.rand(k, d)).astype(np.float32)
    Wj, Tj = initialize_nmf(jnp.asarray(X), k, 'nndsvd', random_state=0,
                            svd_backend='jax')
    Ws, Ts = initialize_nmf(X.astype(np.float64), k, 'nndsvd',
                            random_state=0, svd_backend='sklearn')
    assert int((np.asarray(Wj).sum(0) == 0).sum()) == 0
    ej = np.linalg.norm(X - np.asarray(Wj) @ np.asarray(Tj)) \
        / np.linalg.norm(X)
    es = np.linalg.norm(X - Ws @ Ts) / np.linalg.norm(X)
    assert abs(ej - es) < 0.02, (ej, es)
