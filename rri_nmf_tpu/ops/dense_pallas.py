"""Fused dense phase-sweep Pallas kernels: one X pass per phase.

The XLA Gram-blocked phase sweep (ops/sweep_xla.py) is already within ~30%
of its GEMM floor at the headline shape, but the floor itself hides waste:
the ``WᵀX`` GEMM, the Gram, and the k-step Gauss-Seidel topic loop run as
hundreds of separately dispatched XLA ops (~10 µs of dispatch latency per
topic). These kernels fuse EVERYTHING per phase into one ``pallas_call``:

- **T-phase kernel** (grid ``(d_blocks, n_blocks)``, n innermost): streams
  X through VMEM once, accumulating ``WX = WᵀX`` tiles on the MXU; at the
  last n-step it runs the complete Gauss-Seidel topic loop on the
  VMEM-resident ``(k, BD)`` T tile against the precomputed Gram ``G = WᵀW``.
  T columns are INDEPENDENT in the T-phase (each column's update reads only
  its own column of T through the Gram row), so tile-local Gauss-Seidel
  equals global Gauss-Seidel exactly.
- **W-phase kernel** (grid ``(n_blocks, d_blocks)``, d innermost): same
  with roles swapped — accumulates ``XTᵀ`` tiles, then updates all k
  columns of the VMEM-resident W tile against ``G = TTᵀ``. W rows are
  independent in the W-phase. W is passed TRANSPOSED ``(k, n)`` so the
  per-topic row read/write is a sublane (not lane) dynamic slice.

Per sweep the only HBM traffic is: X twice (once per phase, the
information-theoretic minimum for exact RRI), the factors a handful of
times, and the k×k Grams. The per-topic subproblem is branch-free: both
``qf_min`` scalar-curvature branches (positive: ``[numer]₊/denom``;
concave: the bounded-vertex ``where`` form — reference
``optimization.py:51-74`` with ``s=None``) are computed and selected with
``jnp.where``.

Coverage (the driver falls back to the XLA sweep otherwise): unweighted
phase-order configs with ``reset_topic_method=None`` and no per-topic T
simplex projection (the projection's sort is cross-column; those configs
keep the XLA Gram-blocked path), no gradient stores, no DP noise. The
per-iteration W row projection runs as an XLA tail after the kernels, like
the XLA sweep. Replaces the reference's per-topic GEMV loop
(``nmf.py:415-478,672-676,729-734``) for the production dense fit.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rri_nmf_tpu.matrixops import EPS_DIV_BY_ZERO, _proj_simplex_core

BN = 512    # row-tile (n) — X tiles (BN, BD) stream through VMEM
BD = 1024   # column-tile (d)


def _round_up(x, m):
    return (x + m - 1) // m * m


def supports_dense_pallas(cfg) -> bool:
    """Whether the fused dense phase kernels cover this config."""
    return (not cfg.masked
            and cfg.update_order == 'phase'
            and cfg.reset_topic_method is None
            and not cfg.project_T_each_iter
            and not cfg.store_gradients
            and cfg.dp_sigma is None)


def _qf_rows(numer, denom, bound, dtype):
    """Branch-free qf_min (scalar curvature, no sum constraint) on a
    ``(1, B)`` row: positive-curvature ``[numer]₊/denom`` vs the concave
    bounded-vertex solution, selected elementwise (same values as
    ``optimization.qf_min_scalar_c``)."""
    pos = jnp.maximum(numer, 0.0) / (denom + EPS_DIV_BY_ZERO)
    neg = jnp.where(denom - numer < 0, bound, jnp.zeros_like(numer))
    return jnp.where(denom > 0, pos, neg).astype(dtype)


def _make_t_kernel(k, reg_t_l1, reg_t_l2, bound, acc_dt):
    def kernel(G_ref, diag_ref, W_ref, X_ref, T_ref, Tout_ref, acc_ref):
        i = pl.program_id(1)
        gn = pl.num_programs(1)
        part = lax.dot_general(
            W_ref[:].astype(acc_dt), X_ref[:].astype(acc_dt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=acc_dt)               # (k, BD)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = part

        @pl.when(i > 0)
        def _():
            acc_ref[:] = acc_ref[:] + part

        @pl.when(i == gn - 1)
        def _():
            Tout_ref[:] = T_ref[:]
            dtype = Tout_ref.dtype

            def body(t, _):
                g = G_ref[pl.ds(t, 1), :]                # (1, k)
                corr = lax.dot_general(
                    g, Tout_ref[:].astype(acc_dt),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dt)       # (1, BD)
                gtt = diag_ref[pl.ds(t, 1), :]           # (1, 1)
                told = Tout_ref[pl.ds(t, 1), :].astype(acc_dt)
                numer = (acc_ref[pl.ds(t, 1), :] - corr + gtt * told
                         - reg_t_l1)
                denom = gtt + reg_t_l2
                Tout_ref[pl.ds(t, 1), :] = _qf_rows(numer, denom, bound,
                                                    dtype)
                return 0

            lax.fori_loop(0, k, body, 0)

    return kernel


def _make_w_kernel(k, reg_w_l1, reg_w_l2, bound, ub_is_vector, acc_dt):
    def kernel(*refs):
        if ub_is_vector:
            (G_ref, diag_ref, T_ref, X_ref, Wt_ref, ub_ref,
             Wtout_ref, acc_ref) = refs
        else:
            G_ref, diag_ref, T_ref, X_ref, Wt_ref, Wtout_ref, acc_ref = refs
        j = pl.program_id(1)
        gd = pl.num_programs(1)
        part = lax.dot_general(
            T_ref[:].astype(acc_dt), X_ref[:].astype(acc_dt),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc_dt)               # (k, BN)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = part

        @pl.when(j > 0)
        def _():
            acc_ref[:] = acc_ref[:] + part

        @pl.when(j == gd - 1)
        def _():
            Wtout_ref[:] = Wt_ref[:]
            dtype = Wtout_ref.dtype
            ub = ub_ref[:].astype(acc_dt) if ub_is_vector else bound

            def body(t, _):
                # G is symmetric: row t == column t
                g = G_ref[pl.ds(t, 1), :]                # (1, k)
                corr = lax.dot_general(
                    g, Wtout_ref[:].astype(acc_dt),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dt)       # (1, BN)
                gtt = diag_ref[pl.ds(t, 1), :]           # (1, 1)
                wold = Wtout_ref[pl.ds(t, 1), :].astype(acc_dt)
                numer = (acc_ref[pl.ds(t, 1), :] - corr + gtt * wold
                         - reg_w_l1)
                denom = gtt + reg_w_l2
                Wtout_ref[pl.ds(t, 1), :] = _qf_rows(numer, denom, ub,
                                                     dtype)
                return 0

            lax.fori_loop(0, k, body, 0)

    return kernel


@lru_cache(maxsize=16)
def make_dense_phase_sweep_pallas(cfg, interpret=False):
    """Build the fused dense phase sweep. Same call signature as
    :func:`rri_nmf_tpu.ops.sweep_xla.make_sweep` for supported configs::

        sweep(X, W, T, key, resets_left, reset_key[, w_row_sum_vec])
            -> (W, T, key, resets_left)
    """
    assert supports_dense_pallas(cfg), \
        'config not supported by the dense phase kernels'
    k = cfg.k

    def sweep(X, W, T, key, resets_left, reset_key, *extras):
        w_row_sum_vec = (extras[0].reshape(-1)
                         if cfg.w_row_sum_is_vector else None)
        n, d = X.shape
        dtype = X.dtype
        acc_dt = jnp.float32 if dtype in (jnp.bfloat16, jnp.float16) \
            else dtype
        npad, dpad = _round_up(n, BN), _round_up(d, BD)
        gn, gd = npad // BN, dpad // BD

        if (npad, dpad) == (n, d):
            Xp, Wp, Tp = X, W, T
        else:
            Xp = jnp.zeros((npad, dpad), dtype).at[:n, :d].set(X)
            Wp = jnp.zeros((npad, k), dtype).at[:n].set(W)
            Tp = jnp.zeros((k, dpad), dtype).at[:, :d].set(T)

        # static upper bounds for the concave qf branch (reference
        # semantics: the positive branch does NOT enforce ub)
        t_bound = float(cfg.t_row_sum) if cfg.t_row_sum else float('inf')
        w_bound = (float(cfg.w_row_sum)
                   if (cfg.w_row_sum is not None
                       and not cfg.w_row_sum_is_vector) else float('inf'))

        # ---------------- T-phase --------------------------------------
        if not cfg.fix_T:
            G = jnp.dot(Wp.T, Wp, preferred_element_type=acc_dt)
            diag = jnp.diagonal(G).reshape(k, 1)
            Tp = pl.pallas_call(
                _make_t_kernel(k, cfg.reg_t_l1, cfg.reg_t_l2, t_bound,
                               acc_dt),
                grid=(gd, gn),
                in_specs=[
                    pl.BlockSpec((k, k), lambda j, i: (0, 0),
                                 memory_space=pltpu.VMEM),    # G
                    pl.BlockSpec((k, 1), lambda j, i: (0, 0),
                                 memory_space=pltpu.VMEM),    # diag
                    pl.BlockSpec((BN, k), lambda j, i: (i, 0),
                                 memory_space=pltpu.VMEM),    # W
                    pl.BlockSpec((BN, BD), lambda j, i: (i, j),
                                 memory_space=pltpu.VMEM),    # X
                    pl.BlockSpec((k, BD), lambda j, i: (0, j),
                                 memory_space=pltpu.VMEM),    # T in
                ],
                out_specs=pl.BlockSpec((k, BD), lambda j, i: (0, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((k, dpad), dtype),
                scratch_shapes=[pltpu.VMEM((k, BD), acc_dt)],
                interpret=interpret,
                cost_estimate=pl.CostEstimate(
                    flops=2 * npad * dpad * k + 2 * k * k * dpad,
                    bytes_accessed=npad * dpad * X.dtype.itemsize,
                    transcendentals=0),
            )(G, diag, Wp, Xp, Tp)
            if dpad != d and (cfg.reg_t_l1 < 0 or cfg.reg_t_l2 < 0):
                # negative regularization can grow the zero-padded columns;
                # re-zero them so the W-phase Gram stays exact
                Tp = Tp.at[:, d:].set(0.0)

        # ---------------- W-phase --------------------------------------
        if not cfg.fix_W:
            G2 = jnp.dot(Tp, Tp.T, preferred_element_type=acc_dt)
            diag2 = jnp.diagonal(G2).reshape(k, 1)
            Wt = Wp.T
            in_specs = [
                pl.BlockSpec((k, k), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),        # G (symm.)
                pl.BlockSpec((k, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),        # diag
                pl.BlockSpec((k, BD), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),        # T
                pl.BlockSpec((BN, BD), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),        # X
                pl.BlockSpec((k, BN), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),        # Wt in
            ]
            args = [G2, diag2, Tp, Xp, Wt]
            if cfg.w_row_sum_is_vector:
                ubp = jnp.zeros((1, npad), acc_dt).at[0, :n].set(
                    w_row_sum_vec.astype(acc_dt))
                in_specs.append(pl.BlockSpec((1, BN), lambda i, j: (0, i),
                                             memory_space=pltpu.VMEM))
                args.append(ubp)
            Wt = pl.pallas_call(
                _make_w_kernel(k, cfg.reg_w_l1, cfg.reg_w_l2, w_bound,
                               cfg.w_row_sum_is_vector, acc_dt),
                grid=(gn, gd),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((k, BN), lambda i, j: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((k, npad), dtype),
                scratch_shapes=[pltpu.VMEM((k, BN), acc_dt)],
                interpret=interpret,
                cost_estimate=pl.CostEstimate(
                    flops=2 * npad * dpad * k + 2 * k * k * npad,
                    bytes_accessed=npad * dpad * X.dtype.itemsize,
                    transcendentals=0),
            )(*args)
            Wp = Wt.T

        # per-iteration W row projection (reference nmf.py:481-484), same
        # XLA tail as the other sweeps
        if (cfg.project_W_each_iter and not cfg.fix_W
                and (cfg.w_row_sum is not None or cfg.w_row_sum_is_vector)):
            if cfg.w_row_sum_is_vector:
                s_vec = jnp.zeros((npad,), dtype).at[:n].set(
                    w_row_sum_vec.astype(dtype))
                s_vec = jnp.where(s_vec > 0, s_vec, 1.0)  # padded rows
            else:
                s_vec = jnp.full((npad,), cfg.w_row_sum, dtype=dtype)
            Wp = jax.vmap(_proj_simplex_core)(Wp, s_vec)

        return Wp[:n], Tp[:, :d], key, resets_left

    return jax.jit(sweep)
