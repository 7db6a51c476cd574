"""NMF initialization: NNDSVD family, random, smart_random, PMI-coherence.

TPU-native equivalent of the reference's ``initialization.py``
(/root/reference/src/rri_nmf/initialization.py). The NNDSVD
positive/negative section split (Boutsidis & Gallopoulos 2008; reference
``initialization.py:104-157``) is re-derived here as a fully vectorized
computation over all components at once (the reference loops per component,
``initialization.py:113-138``).

Two SVD backends:

- ``svd_backend='sklearn'`` (default on host input): calls
  ``sklearn.utils.extmath.randomized_svd`` so the byte-exact NNDSVD goldens
  pinned by the reference test suite (``tests/conftest.py:12-18``,
  ``tests/test_nmf.py:13-19``) reproduce identically. Initialization runs
  once per fit; doing it host-side costs nothing at scale.
- ``svd_backend='jax'``: a jittable randomized range-finder SVD
  (Halko-Martinsson-Tropp) that runs on device and shards under GSPMD, for
  matrices that never touch the host.

Also provides ``masked_svd_init`` — the BIRSVD-style elementwise-weighted
SVD initialization the reference lists as TODO #1 for recommender systems
(reference ``README.md:18``) and never implemented — and ``nndsvd_lrc``
(NNSVD-LRC, Atif/Qazi/Gillis 2019, arXiv:1807.04020): a half-rank SVD
keeping BOTH positive and negative parts of each component as candidate
factors, followed by a few HALS corrections computed against the
low-rank form (never an n×d product). Measured on low-rank-plus-noise
fixtures it starts 1.2-2.5× closer in relative Frobenius error than
NNDSVD (tests/test_initialization.py); the device path fuses the
randomized SVD, split, and correction (via the shared Gram-blocked GS
topic loop) into one jitted program.
"""

from functools import lru_cache
from math import sqrt

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# randomized SVD backends
# ---------------------------------------------------------------------------

def _randomized_svd_sklearn(X, k, random_state):
    """Exact-parity host backend (the reference calls the same function at
    ``initialization.py:105``). SciPy sparse inputs pass through —
    ``randomized_svd`` handles them natively."""
    from sklearn.utils.extmath import randomized_svd
    if not hasattr(X, 'tocoo'):
        X = np.asarray(X)
    return randomized_svd(X, k, random_state=random_state)


def _ortho_eigh(Y):
    """Orthonormal basis of range(Y) via the (p, p) Gram eigendecomposition:
    ``Q = Y·V·diag(λ^{-1/2})``, two passes for orthogonality (the
    CholeskyQR2 regime: exact to working precision for κ(Y) ≲ ε^{-1/2}).

    TPU-first replacement for tall-skinny ``jnp.linalg.qr``: XLA lowers QR
    to a sequential Householder loop that measures ~100 s on a (32k, 266)
    panel, while this form is two GEMMs + one tiny eigh per pass (~ms).

    Rank-deficient Y (e.g. exactly low-rank X with oversampling) is safe:
    eigenvalues are FLOORED at the Gram's additive rounding level
    (ε·λmax) rather than hard-zeroed. λ ratios scale as (σ/σmax)², so any
    cut at c·ε silently kills every direction with σ < √(cε)·σmax — on a
    mean-dominated matrix (σ2/σ1 ~ 1/400 for uniform-factor products) an
    earlier 100ε hard-zero killed ALL of them, collapsing the basis to
    the Perron vector and dead-topicing the NNDSVD init (measured:
    255/256 dead at 32k×16k k=256). A floored direction yields a noisy
    but valid basis vector: the second pass re-orthonormalizes it and the
    final top-k cut drops true oversampling nulls, while a zeroed column
    stays zero forever."""
    for _ in range(2):
        G = Y.T @ Y
        lam, V = jnp.linalg.eigh(G)                     # ascending
        lmax = jnp.maximum(lam[-1], jnp.finfo(Y.dtype).tiny)
        inv = 1.0 / jnp.sqrt(
            jnp.maximum(lam, lmax * jnp.finfo(Y.dtype).eps))
        Y = Y @ (V * inv)
    return Y


def randomized_svd_jax(X, k, key, n_oversamples=10, n_iter=4):
    """Jittable randomized SVD (Halko et al. 2011) returning (U, S, Vt).

    Range-finder with power iterations; everything lowers to GEMMs plus
    (k+p)-sized symmetric eigendecompositions (see :func:`_ortho_eigh` —
    no tall-skinny QR and no wide SVD, both of which are sequential-loop
    slow paths on TPU), so the whole init runs at MXU speed and shards
    under GSPMD — the big GEMMs against X carry the sharding, the small
    panel factorizations replicate.

    A 16-bit X (``x_dtype='bfloat16'`` storage at beyond-HBM scale) keeps
    its STORAGE dtype but the computation runs in float32: sketches,
    Grams, and the small panels all carry tail-spectrum ratios
    ``(σ_i/σ_1)² ~ 1e-5`` that are pure noise at bf16 precision
    (``finfo(bf16).eps = 7.8e-3``) — an all-bf16 chain returns garbage
    tail components, whose degenerate topics then stall the whole fit
    ~36x above the bf16 quantization floor
    (``benchmarks/results_round4_init_bf16.json``). The mixed
    ``f32 x bf16`` dots below fuse the upcast into the GEMM operand
    stream (no f32 copy of X materializes — the same pattern as the
    mixed-storage sweeps, ``ops/dense_pallas.py``).
    """
    from rri_nmf_tpu.ops.quantized import QuantizedX, qx_lmul_t, qx_rmul
    qx = X if isinstance(X, QuantizedX) else None
    if qx is None:
        X = jnp.asarray(X)
    n, d = X.shape
    p = min(k + n_oversamples, min(n, d))
    comp = (jnp.dtype(jnp.float32)
            if X.dtype in (jnp.bfloat16, jnp.float16) else jnp.dtype(X.dtype))
    if qx is not None:
        # int16 column-scaled storage: scale folds outside each GEMM
        Omega = jax.random.normal(key, (d, p), dtype=comp)
        Q = _ortho_eigh(qx_rmul(qx, Omega, comp))
        for _ in range(n_iter):
            Q = _ortho_eigh(qx_rmul(qx, _ortho_eigh(
                qx_lmul_t(qx, Q, comp)), comp))
        B = qx_lmul_t(qx, Q, comp).T                     # (p, d)
    elif comp != X.dtype:
        hi = jax.lax.Precision.HIGHEST

        def _mm(A, C, dims):
            return jax.lax.dot_general(A, C, (dims, ((), ())),
                                       preferred_element_type=comp,
                                       precision=hi)

        Omega = jax.random.normal(key, (d, p), dtype=comp)
        Q = _ortho_eigh(_mm(X, Omega, ((1,), (0,))))     # (n, p) f32
        for _ in range(n_iter):
            Yd = _ortho_eigh(_mm(X, Q, ((0,), (0,))))    # (d, p)
            Q = _ortho_eigh(_mm(X, Yd, ((1,), (0,))))
        B = _mm(X, Q, ((0,), (0,))).T                    # (p, d)
    else:
        Omega = jax.random.normal(key, (d, p), dtype=X.dtype)
        Q = _ortho_eigh(X @ Omega)
        for _ in range(n_iter):
            Q = _ortho_eigh(X @ _ortho_eigh(X.T @ Q))
        B = Q.T @ X                  # (p, d)
    # SVD of the small panel via its (p, p) Gram: B = U_b S Vt with
    # U_b, S² from eigh(B Bᵀ) and Vt = S⁻¹ U_bᵀ B
    lam, Ub = jnp.linalg.eigh(B @ B.T)
    order = jnp.argsort(lam)[::-1]
    lam = jnp.maximum(lam[order], 0.0)
    Ub = Ub[:, order]
    S = jnp.sqrt(lam)
    safe = jnp.where(S > 0, S, 1.0)
    Vt = (Ub.T @ B) / safe[:, None]
    U = Q @ Ub
    return U[:, :k], S[:k], Vt[:k, :]


# ---------------------------------------------------------------------------
# NNDSVD (vectorized)
# ---------------------------------------------------------------------------

def _nndsvd_from_svd(U, S, Vt, eps):
    """Boutsidis-Gallopoulos NNDSVD section split, vectorized over all
    components (reference loops per component, ``initialization.py:110-141``).

    Works on NumPy or JAX arrays; returns arrays of the same family.
    """
    xp = jnp if isinstance(U, jnp.ndarray) else np
    k = S.shape[0]

    # leading singular triplet is already non-negative (Perron-Frobenius)
    W0 = xp.sqrt(S[0]) * xp.abs(U[:, 0])
    H0 = xp.sqrt(S[0]) * xp.abs(Vt[0, :])

    Xc = U[:, 1:]                    # (n, k-1)
    Yc = Vt[1:, :]                   # (k-1, d)
    x_p, y_p = xp.maximum(Xc, 0), xp.maximum(Yc, 0)
    x_n, y_n = xp.abs(xp.minimum(Xc, 0)), xp.abs(xp.minimum(Yc, 0))

    x_p_nrm = xp.sqrt(xp.sum(x_p ** 2, axis=0))      # (k-1,)
    y_p_nrm = xp.sqrt(xp.sum(y_p ** 2, axis=1))
    x_n_nrm = xp.sqrt(xp.sum(x_n ** 2, axis=0))
    y_n_nrm = xp.sqrt(xp.sum(y_n ** 2, axis=1))

    m_p = x_p_nrm * y_p_nrm
    m_n = x_n_nrm * y_n_nrm
    pick_p = m_p > m_n

    def _safe(nrm):
        return xp.where(nrm == 0, 1.0, nrm)

    u = xp.where(pick_p[None, :], x_p / _safe(x_p_nrm)[None, :],
                 x_n / _safe(x_n_nrm)[None, :])
    v = xp.where(pick_p[:, None], y_p / _safe(y_p_nrm)[:, None],
                 y_n / _safe(y_n_nrm)[:, None])
    sigma = xp.where(pick_p, m_p, m_n)
    lbd = xp.sqrt(S[1:] * sigma)

    if xp is jnp:
        W = jnp.concatenate([W0[:, None], lbd[None, :] * u], axis=1)
        H = jnp.concatenate([H0[None, :], lbd[:, None] * v], axis=0)
        W = jnp.where(W < eps, 0.0, W)
        H = jnp.where(H < eps, 0.0, H)
    else:
        W = np.concatenate([W0[:, None], lbd[None, :] * u], axis=1)
        H = np.concatenate([H0[None, :], lbd[:, None] * v], axis=0)
        W[W < eps] = 0
        H[H < eps] = 0
    return W, H


@lru_cache(maxsize=8)
def _nndsvd_device_jit(k, eps):
    """Jitted (X, key) -> (W, H): randomized SVD + NNDSVD section split as
    one device program, cached per (k, eps)."""
    def f(X, key):
        U, S, Vt = randomized_svd_jax(X, k, key)
        return _nndsvd_from_svd(U, S, Vt, eps)
    return jax.jit(f)


# ---------------------------------------------------------------------------
# NNSVD-LRC (low-rank corrected)
# ---------------------------------------------------------------------------

def _nndsvd_lrc_split(U, S, Vt, k, xp):
    """±-part candidate construction for NNSVD-LRC (Atif, Qazi & Gillis,
    Pattern Recognition Letters 2019, arXiv:1807.04020): unlike NNDSVD,
    which computes a rank-k SVD and DISCARDS the weaker of each
    component's positive/negative parts, both parts of each of the
    p ≈ k/2 leading components are kept as candidate factor pairs
    (``σ_j u_j v_jᵀ``'s expansion contributes ``u⁺v⁺ᵀ + u⁻v⁻ᵀ`` with
    positive sign), ranked by energy ``σ_j‖u±‖‖v±‖``, top k kept.
    Returns (W (n,k), H (k,d))."""
    # Perron triplet: already one-signed
    W_cols = [xp.sqrt(S[0]) * xp.abs(U[:, 0])]
    H_rows = [xp.sqrt(S[0]) * xp.abs(Vt[0, :])]

    Uc, Vc = U[:, 1:], Vt[1:, :]
    u_p, u_n = xp.maximum(Uc, 0), xp.maximum(-Uc, 0)
    v_p, v_n = xp.maximum(Vc, 0), xp.maximum(-Vc, 0)

    def _nrm_cols(A):
        return xp.sqrt(xp.sum(A ** 2, axis=0))

    def _nrm_rows(A):
        return xp.sqrt(xp.sum(A ** 2, axis=1))

    cand_u = xp.concatenate([u_p, u_n], axis=1)           # (n, 2(p-1))
    cand_v = xp.concatenate([v_p, v_n], axis=0)           # (2(p-1), d)
    un = xp.concatenate([_nrm_cols(u_p), _nrm_cols(u_n)])
    vn = xp.concatenate([_nrm_rows(v_p), _nrm_rows(v_n)])
    sig = xp.concatenate([S[1:], S[1:]])
    energy = sig * un * vn

    order = xp.argsort(-energy)[:k - 1]
    safe_u = xp.where(un == 0, 1.0, un)
    safe_v = xp.where(vn == 0, 1.0, vn)
    lbd = xp.sqrt(energy[order])
    W_rest = cand_u[:, order] / safe_u[order][None, :] * lbd[None, :]
    H_rest = cand_v[order, :] / safe_v[order][:, None] * lbd[:, None]

    W = xp.concatenate([W_cols[0][:, None], W_rest], axis=1)
    H = xp.concatenate([H_rows[0][None, :], H_rest], axis=0)
    return W, H


def _lrc_correct_np(Us, Vt, W, H, iters=2):
    """Low-rank HALS correction: a few exact cyclic Gauss-Seidel passes
    of ``min ‖X_p − WH‖²`` with ``X_p = Us Vtᵀ`` used IMPLICITLY — every
    contraction against X_p factors through the (·, p) panels, so a pass
    costs O((n+d)pk + (n+d)k²) instead of O(ndk)."""
    tiny = np.finfo(W.dtype).tiny
    k = W.shape[1]
    for _ in range(iters):
        G = W.T @ W                               # (k, k)
        N = (W.T @ Us) @ Vt                       # (k, d) — never n×d
        for t in range(k):
            corr = G[t] @ H - G[t, t] * H[t]
            H[t] = np.maximum(0.0, (N[t] - corr) / max(G[t, t], tiny))
        Gh = H @ H.T
        Nw = Us @ (Vt @ H.T)                      # (n, k)
        for t in range(k):
            corr = W @ Gh[:, t] - Gh[t, t] * W[:, t]
            W[:, t] = np.maximum(0.0,
                                 (Nw[:, t] - corr) / max(Gh[t, t], tiny))
    return W, H


def _lrc_rank(k, n, d):
    """NNSVD-LRC half-rank: ``(p, degenerate)`` — the SVD rank
    ``p ≈ k/2 + 1`` clipped to min(n, d), and whether the ±-part
    construction cannot yield k candidates (k near full rank; callers
    fall back to plain nndsvd). One shared rule — the dispatch gate and
    the host builder must agree or the fallback turns into an assert."""
    p = min(max(-(-k // 2) + 1, 2), min(n, d))
    return p, 2 * (p - 1) + 1 < k


def _nndsvd_lrc_host(X, k, random_state, eps, lrc_iters=2):
    n, d = np.shape(X)
    p, _degenerate = _lrc_rank(k, n, d)
    # callers gate the k-near-full-rank degenerate case (dispatch falls
    # back to nndsvd there); assert rather than silently misbehave
    assert not _degenerate, \
        'half-rank construction cannot yield k candidates'
    U, S, Vt = _randomized_svd_sklearn(X, p, random_state)
    W, H = _nndsvd_lrc_split(U, S, Vt, k, np)
    W, H = _lrc_correct_np((U * S), Vt, W, H, iters=lrc_iters)
    W[W < eps] = 0
    H[H < eps] = 0
    return W, H


@lru_cache(maxsize=8)
def _nndsvd_lrc_device_jit(k, p, eps, lrc_iters):
    """Jitted (X, key) -> (W, H): half-rank randomized SVD, ±-part split,
    and the low-rank HALS correction (via the shared Gram-blocked GS
    topic loop) as ONE device program."""
    from rri_nmf_tpu.ops.sweep_sparse import gs_topics_blocked
    from rri_nmf_tpu.ops.sweep_xla import _gram_block_size
    B = _gram_block_size(k)

    def f(X, key):
        U, S, Vt = randomized_svd_jax(X, p, key)
        W, H = _nndsvd_lrc_split(U, S, Vt, k, jnp)
        # accumulator follows the SVD's computation dtype, not a 16-bit
        # X storage dtype (randomized_svd_jax widens those — U carries it)
        acc = U.dtype
        Us = U * S
        for _ in range(lrc_iters):
            N = (W.T @ Us) @ Vt
            H = gs_topics_blocked(
                N, H, W.T @ W, k=k, B=B, reg_l1=0.0, reg_l2=0.0,
                qf_s=None, qf_ub=None, reproject_sum=None,
                acc=acc, dtype=H.dtype)
            Nw = (H @ Vt.T) @ (Us.T)               # (k, n)
            Wt = gs_topics_blocked(
                Nw, W.T, H @ H.T, k=k, B=B, reg_l1=0.0, reg_l2=0.0,
                qf_s=None, qf_ub=None, reproject_sum=None,
                acc=acc, dtype=W.dtype)
            W = Wt.T
        W = jnp.where(W < eps, 0.0, W)
        H = jnp.where(H < eps, 0.0, H)
        return W, H

    return jax.jit(f)


# ---------------------------------------------------------------------------
# public dispatch
# ---------------------------------------------------------------------------

def initialize_nmf(X, n_components, init=None, eps=1e-6, random_state=None,
                   row_normalize=False, n_words_beam=20, svd_backend='sklearn'):
    """Compute an initial (W, H) guess for ``X ≈ W H``.

    Mirrors the reference dispatch (``initialization.py:9-163``) including
    its default rule (``nndsvd`` when ``n_components < n_features`` else
    ``random``), the random/smart_random NumPy RNG streams (exact parity via
    ``np.random.RandomState``), the nndsvd/nndsvda/nndsvdar family, and
    row normalization of H. Additionally makes ``init='coherence_pmi'``
    actually reachable — the reference documents it (``nmf.py:206-208``) but
    its dispatcher raises ValueError for it (``initialization.py:154-157``).
    """
    from rri_nmf_tpu.matrixops import normalize

    if svd_backend not in ('sklearn', 'jax'):
        raise ValueError("svd_backend must be 'sklearn' or 'jax', got %r"
                         % (svd_backend,))
    n_samples, n_features = np.shape(X)

    if init is None:
        init = 'nndsvd' if n_components < n_features else 'random'

    if init == 'random':
        rng = np.random.RandomState(random_state) \
            if not isinstance(random_state, np.random.RandomState) \
            else random_state
        T = rng.rand(n_components, n_features)
        W = rng.rand(n_samples, n_components)
        if row_normalize:
            T = np.asarray(normalize(T))
        return W, T

    if init == 'smart_random':
        from rri_nmf_tpu.ops.quantized import QuantizedX, qx_mean
        if isinstance(X, QuantizedX):
            avg = np.sqrt(float(qx_mean(X)) / n_components)
        elif isinstance(X, jax.Array) and not X.is_fully_addressable:
            avg = np.sqrt(_global_mean(X) / n_components)
        elif hasattr(X, 'mean') and hasattr(X, 'tocoo'):
            # scipy-sparse: native all-entries mean, no densify
            avg = np.sqrt(float(X.mean()) / n_components)
        else:
            avg = np.sqrt(np.asarray(X).mean() / n_components)
        rng = np.random.RandomState(random_state) \
            if not isinstance(random_state, np.random.RandomState) \
            else random_state
        H = np.abs(avg * rng.randn(n_components, n_features))
        W = np.abs(avg * rng.randn(n_samples, n_components))
        if row_normalize:
            H = np.asarray(normalize(H))
        return W, H

    if init == 'coherence_pmi':
        return init_coherence_beam_search(X, n_components,
                                          n_words_beam=n_words_beam)

    if init == 'nndsvd_lrc':
        # NNSVD-LRC (arXiv:1807.04020): half-rank SVD + both ±-parts +
        # low-rank HALS correction — better initial error than NNDSVD at
        # roughly half the SVD cost. Net-new over the reference's family.
        k = n_components
        p, _degenerate = _lrc_rank(k, n_samples, n_features)
        if _degenerate:
            init = 'nndsvd'      # k near full rank: construction degenerate
        elif svd_backend == 'jax':
            from rri_nmf_tpu.ops.quantized import QuantizedX
            key = jax.random.PRNGKey(_seed_int(random_state))
            W, H = _nndsvd_lrc_device_jit(
                k, p, float(eps), 2)(
                X if isinstance(X, QuantizedX) else jnp.asarray(X), key)
            W, H = _fetch_init(W), _fetch_init(H)
            if row_normalize:
                H = np.asarray(normalize(H))
            return W, H
        else:
            W, H = _nndsvd_lrc_host(X, k, random_state, eps)
            if row_normalize:
                H = np.asarray(normalize(H))
            return W, H

    if init not in ('nndsvd', 'nndsvda', 'nndsvdar'):
        raise ValueError(
            'Invalid init parameter: got %r instead of one of %r' % (
                init, (None, 'random', 'smart_random', 'nndsvd', 'nndsvda',
                       'nndsvdar', 'nndsvd_lrc', 'coherence_pmi')))
    if n_components > min(n_samples, n_features):
        # the SVD has only min(n, d) components: both backends would
        # silently return truncated factors and the fit would fail later
        # with a confusing shape mismatch
        raise ValueError(
            "init=%r requires n_components <= min(n_samples, n_features) "
            "= %d, got %d; use init='random' for overcomplete "
            'factorizations' % (init, min(n_samples, n_features),
                                n_components))

    if svd_backend == 'jax':
        # ONE jitted program (SVD + NNDSVD split) and ONE W/H fetch: on the
        # tunnel-hosted backend an eager op-by-op SVD queues dozens of
        # dispatches with trailing fetches, which stalls for minutes
        # (CLAUDE.md); the fused form runs at GEMM speed.
        from rri_nmf_tpu.ops.quantized import QuantizedX
        key = jax.random.PRNGKey(_seed_int(random_state))
        W, H = _nndsvd_device_jit(n_components, float(eps))(
            X if isinstance(X, QuantizedX) else jnp.asarray(X), key)
        # writable host copies (nndsvda/ar mutate); multi-controller
        # gathers
        W, H = _fetch_init(W), _fetch_init(H)
    else:
        U, S, Vt = _randomized_svd_sklearn(X, n_components, random_state)
        W, H = _nndsvd_from_svd(U, S, Vt, eps)

    def _mean_x():
        from rri_nmf_tpu.ops.quantized import QuantizedX, qx_mean
        if isinstance(X, QuantizedX):
            return float(qx_mean(X))
        if isinstance(X, jax.Array) and not X.is_fully_addressable:
            return _global_mean(X)
        if hasattr(X, 'mean') and hasattr(X, 'tocoo'):
            return float(X.mean())  # scipy-sparse: no densify
        return np.asarray(X).mean()

    if init == 'nndsvda':
        avg = _mean_x()
        W[W == 0] = avg
        H[H == 0] = avg
    elif init == 'nndsvdar':
        rng = np.random.RandomState(random_state) \
            if not isinstance(random_state, np.random.RandomState) \
            else random_state
        avg = _mean_x()
        W[W == 0] = np.abs(avg * rng.randn(len(W[W == 0])) / 100)
        H[H == 0] = np.abs(avg * rng.randn(len(H[H == 0])) / 100)

    if row_normalize:
        H = np.asarray(normalize(H))

    return W, H


def _global_mean(X):
    """Mean of a possibly process-spanning device array without any host
    materialization (eager reductions on global arrays return a fully
    replicated scalar under multi-controller SPMD)."""
    import jax.numpy as _jnp
    return float(_jnp.mean(X))


def _fetch_init(a):
    """Host copy of a device init factor; multi-controller arrays (global
    X makes the jitted NNDSVD outputs process-spanning) gather via
    ``process_allgather`` — every host receives the full factor, matching
    the host backends' return contract."""
    if isinstance(a, jax.Array) and not a.is_fully_addressable:
        from jax.experimental import multihost_utils
        # np.array: writable copy (nndsvda/ar mutate the zeros in place)
        return np.array(multihost_utils.process_allgather(a, tiled=True))
    return np.array(a)


def _seed_int(random_state):
    """Integer seed for the jax PRNG from any accepted ``random_state``
    form (None, int, or a ``np.random.RandomState`` — every host branch
    accepts the latter, so the device branches must too)."""
    if random_state is None:
        return 0
    if isinstance(random_state, np.random.RandomState):
        return int(random_state.randint(2 ** 31))
    return int(random_state)


def _randomized_svd_numpy(X, k, rng, n_oversamples=10, n_iter=4):
    """Host randomized SVD (Halko et al.); NumPy/BLAS QR and panel SVD."""
    n, d = X.shape
    p = min(k + n_oversamples, min(n, d))
    Q, _ = np.linalg.qr(X @ rng.standard_normal((d, p)))
    for _ in range(n_iter):
        Z, _ = np.linalg.qr(X.T @ Q)
        Q, _ = np.linalg.qr(X @ Z)
    Ub, S, Vt = np.linalg.svd(Q.T @ X, full_matrices=False)
    return (Q @ Ub)[:, :k], S[:k], Vt[:k, :]


def masked_svd_init(X, W_mat, n_components, random_state=None, n_iter=10,
                    eps=1e-6, backend='numpy'):
    """Elementwise-weighted (masked) SVD initialization for WRRI.

    The BIRSVD-style init the reference lists as an unimplemented TODO
    (``README.md:18``): iterative SVD imputation — fill unobserved entries
    with the current low-rank reconstruction, re-factorize, repeat — then the
    NNDSVD section split of the final factorization.

    ``backend='numpy'`` (default) runs on the host: initialization is a
    one-off and XLA's tall-skinny QR/SVD lowering on TPU is far slower than
    host LAPACK at typical panel shapes. ``backend='jax'`` keeps everything
    on device (one jitted program) for inputs too large to host.
    """
    if backend == 'numpy':
        X = np.asarray(X, dtype=np.float64)
        M = np.asarray(W_mat, dtype=np.float64)
        rng = np.random.RandomState(0 if random_state is None
                                    else random_state)
        obs_mean = (M * X).sum() / max(M.sum(), 1.0)
        Xf = M * X + (1 - M) * obs_mean
        U = S = Vt = None
        for _ in range(n_iter):
            U, S, Vt = _randomized_svd_numpy(Xf, n_components, rng)
            Xf = M * X + (1 - M) * ((U * S) @ Vt)
        return _nndsvd_from_svd(U, S, Vt, eps)

    X = jnp.asarray(X, dtype=jnp.result_type(float))
    M = jnp.asarray(W_mat, dtype=X.dtype)
    key = jax.random.PRNGKey(0 if random_state is None else random_state)

    @jax.jit
    def _impute_and_factor(X, M, key):
        obs_mean = jnp.sum(M * X) / jnp.maximum(jnp.sum(M), 1.0)
        Xf = M * X + (1 - M) * obs_mean
        U = S = Vt = None
        for i in range(n_iter):
            key, sub = jax.random.split(key)
            U, S, Vt = randomized_svd_jax(Xf, n_components, sub)
            recon = (U * S) @ Vt
            Xf = M * X + (1 - M) * recon
        W, H = _nndsvd_from_svd(U, S, Vt, eps)
        return W, H

    W, H = _impute_and_factor(X, M, key)
    return np.asarray(W), np.asarray(H)


def init_coherence_beam_search(X, n_components, n_words_beam=20):
    """PMI-coherence greedy beam search topic initialization.

    Re-derivation of the reference's ``init_coherence_beam_search``
    (``initialization.py:166-208``) with the O(k · n_words · d · |topic|)
    inner scoring loop replaced by an incremental score accumulator
    (O(k · n_words · d) total): adding word ``c`` to a topic adds
    ``P_ij[:, c] - P_i - P_i[c]`` to every candidate's score.
    """
    from rri_nmf_tpu.matrixops import normalize, tfidf

    X = np.asarray(normalize(tfidf(np.asarray(
        X.toarray() if hasattr(X, 'toarray') else X))))
    C = X.T @ X
    k = n_components
    n, d = X.shape

    P_i = np.log(C.sum(1) + np.spacing(1))
    P_ij = np.log(C + np.spacing(1))

    xs = X.sum(0).astype(float).copy()
    topics = []
    for t in range(k):
        j = int(np.argmax(xs))
        xs[j] = 0
        tpc = [j]
        # incremental PMI score of each candidate vs the current topic
        scores = P_ij[:, j] - P_i - P_i[j]
        for _ in range(1, n_words_beam):
            avail = xs > 0
            masked_scores = np.where(avail, scores, -np.inf)
            best = int(np.argmax(masked_scores))
            tpc.append(best)
            xs[best] = 0
            scores = scores + P_ij[:, best] - P_i - P_i[best]
        topics.append(tpc)

    xs = X.sum(0)
    T = np.zeros((k, d))
    for t, tpc in enumerate(topics):
        # weight of a word in a topic proportional to its global importance
        T[t, tpc] = xs[tpc]

    T = np.asarray(normalize(T))
    W = np.asarray(normalize(np.maximum(X @ T.T, 0)))
    return W, T


def _norm(x):
    """Euclidean norm via dot product (reference ``initialization.py:211-215``)."""
    x = np.asarray(x).ravel()
    return sqrt(float(np.dot(x, x)))
