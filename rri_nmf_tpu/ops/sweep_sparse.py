"""Sparse-X RRI sweep: BCOO data matrix, dense factors.

The reference *densifies* sparse input (its RS estimator materializes COO
to dense, ``sklearn_interface.py:78-83``; SURVEY.md §5.7 flags this as the
missing scale answer). With the phase update order the dense sweep touches
X through exactly two contractions per sweep — ``WᵀX`` before the T-phase
and ``X Tᵀ`` before the W-phase — both of which ``jax.experimental.sparse``
lowers for BCOO operands. Everything else (the per-topic corrections,
qf_min solves, projections) involves only the small dense factors.

A 1M×100k TF-IDF corpus at 1% density is ~4 GB as BCOO vs 400 GB dense:
this path runs single-chip what the dense path cannot hold even sharded.

Restrictions (asserted): unweighted (no mask — the masked path maintains a
dense residual by construction), ``update_order='phase'``,
``reset_topic_method=None`` (resets scan residual rows, which would need
sparse row slicing), no gradient stores, no DP noise.

The sparse objective never materializes ``W T``::

    ||X - WT||_F² = ||X||² - 2·Σ_nnz X_ij·(W_i·T_j) + tr((WᵀW)(TTᵀ))

— the middle term gathers factor rows at the nnz coordinates (O(nnz·k)),
the last is O((n+d)k² + k³).
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import sparse as jsparse

from rri_nmf_tpu.ops.sweep_xla import SweepConfig
from rri_nmf_tpu.optimization import qf_min_scalar_c
from rri_nmf_tpu.matrixops import _proj_simplex_core


def to_bcoo(X, dtype=None):
    """SciPy sparse / dense array → jax BCOO."""
    if isinstance(X, jsparse.BCOO):
        return X if dtype is None else X.astype(dtype)
    if hasattr(X, 'tocoo'):  # scipy sparse
        coo = X.tocoo()
        indices = jnp.asarray(np.stack([coo.row, coo.col], axis=1),
                              dtype=jnp.int32)
        data = jnp.asarray(coo.data, dtype=dtype)
        return jsparse.BCOO((data, indices), shape=coo.shape)
    return jsparse.BCOO.fromdense(jnp.asarray(X, dtype=dtype))


def supports_sparse(cfg: SweepConfig) -> bool:
    return (not cfg.masked and cfg.update_order == 'phase'
            and cfg.reset_topic_method is None
            and not cfg.store_gradients and cfg.dp_sigma is None)


@lru_cache(maxsize=16)
def make_sparse_sweep(cfg: SweepConfig):
    """Phase-order sweep over a BCOO X. Same call signature as
    ``make_sweep`` (without mask extras)::

        sweep(X_bcoo, W, T, key, resets_left, reset_key[, w_row_sum_vec])
    """
    assert supports_sparse(cfg), 'config not supported by the sparse sweep'
    k = cfg.k

    def sweep(X, W, T, key, resets_left, reset_key, *extras):
        w_row_sum_vec = (extras[0].reshape(-1)
                         if cfg.w_row_sum_is_vector else None)
        dtype = W.dtype
        acc = jnp.float32 if dtype in (jnp.bfloat16, jnp.float16) else dtype

        def t_body(t, carry):
            W, T, WX = carry
            w = W[:, t]
            wW = jnp.dot(w, W, preferred_element_type=acc)
            wW = wW.at[t].set(0.0)
            wR = WX[t] - jnp.dot(wW, T.astype(acc))
            nw = jnp.sum(w.astype(acc) ** 2)
            numer = wR - cfg.reg_t_l1
            denom = nw + cfg.reg_t_l2
            t_new, _ = qf_min_scalar_c(-numer, denom, s=cfg.t_update_s,
                                       ub=cfg.t_row_sum)
            T = T.at[t].set(t_new.astype(dtype))
            if cfg.t_row_sum and cfg.project_T_each_iter:
                trs = cfg.t_row_sum

                def _reproj(T):
                    return T.at[t].set(_proj_simplex_core(
                        T[t], jnp.asarray(trs, dtype=dtype)))
                T = lax.cond(jnp.abs(jnp.sum(T[t]) - trs) > 1e-15,
                             _reproj, lambda T: T, T)
            return W, T, WX

        def w_body(t, carry):
            W, T, XT = carry
            trow = T[t]
            Tt = jnp.dot(T, trow, preferred_element_type=acc)
            Tt = Tt.at[t].set(0.0)
            Rt = XT[:, t] - jnp.dot(W.astype(acc), Tt)
            nt = jnp.sum(trow.astype(acc) ** 2)
            numer = Rt - cfg.reg_w_l1
            denom = nt + cfg.reg_w_l2
            ub = w_row_sum_vec if cfg.w_row_sum_is_vector else cfg.w_row_sum
            w_new, _ = qf_min_scalar_c(-numer, denom, s=None, ub=ub)
            W = W.at[:, t].set(w_new.astype(dtype))
            return W, T, XT

        if not cfg.fix_T:
            # W^T X as one sparse contraction: (X^T (d,n)) @ W -> (d, k)
            WX = jsparse.bcoo_dot_general(
                X, W.astype(acc),
                dimension_numbers=(((0,), (0,)), ((), ()))).T  # (k, d)
            W, T, _ = lax.fori_loop(0, k, t_body, (W, T, WX))
        if not cfg.fix_W:
            XT = jsparse.bcoo_dot_general(
                X, T.T.astype(acc),
                dimension_numbers=(((1,), (0,)), ((), ())))    # (n, k)
            W, T, _ = lax.fori_loop(0, k, w_body, (W, T, XT))

        if (cfg.project_W_each_iter and not cfg.fix_W
                and (cfg.w_row_sum is not None or cfg.w_row_sum_is_vector)):
            if cfg.w_row_sum_is_vector:
                s_vec = w_row_sum_vec.astype(dtype)
            else:
                s_vec = jnp.full((W.shape[0],), cfg.w_row_sum, dtype=dtype)
            W = jax.vmap(_proj_simplex_core)(W, s_vec)

        return W, T, key, resets_left

    return jax.jit(sweep)


def make_sparse_objective(reg_w_l2=0.0, reg_t_l2=0.0,
                          reg_w_l1=0.0, reg_t_l1=0.0):
    """``0.5||X - WT||² + regs`` for BCOO X without materializing WT."""

    def objective(X, W, T):
        acc = jnp.float32 if W.dtype in (jnp.bfloat16, jnp.float16) \
            else W.dtype
        W = W.astype(acc)
        T = T.astype(acc)
        x2 = jnp.sum(X.data.astype(acc) ** 2)
        rows = X.indices[:, 0]
        cols = X.indices[:, 1]
        # Σ_nnz X_ij (W_i · T_j): O(nnz · k)
        cross = jnp.sum(X.data.astype(acc) *
                        jnp.sum(W[rows] * T[:, cols].T, axis=1))
        wtw = W.T @ W
        ttt = T @ T.T
        wt2 = jnp.sum(wtw * ttt)        # tr((W^T W)(T T^T)) = ||WT||²
        obj = 0.5 * (x2 - 2.0 * cross + wt2)
        obj = obj + 0.5 * reg_w_l2 * jnp.sum(W ** 2)
        obj = obj + 0.5 * reg_t_l2 * jnp.sum(T ** 2)
        obj = obj + reg_t_l1 * jnp.sum(jnp.abs(T))
        obj = obj + reg_w_l1 * jnp.sum(jnp.abs(W))
        return obj

    return jax.jit(objective)
