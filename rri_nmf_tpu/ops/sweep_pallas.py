"""Fused Pallas TPU kernels for the masked WRRI sweep.

The north-star centerpiece (BASELINE.json): the reference's masked path
rebuilds the full ``n×d`` residual per topic with a GEMM and several
elementwise materializations (reference ``nmf.py:687-714,735-746`` — the
"k times slower" path, ``nmf.py:355-356``; its README wishes for a Cython
kernel, ``README.md:19``). The XLA redesign in :mod:`sweep_xla` already
fixes the asymptotics to O(ndk) by maintaining ``R = X - WT`` with rank-one
updates; these Pallas kernels additionally fuse the bookkeeping with the
reductions so each topic phase makes exactly ONE streaming pass over the
residual:

- **Kernel A′** (T-phase): for each VMEM tile of R it (a) applies the
  *pending* rank-one update left over from the previous topic's W-phase
  (``R += dw · t_prevᵀ``), writes the tile back (in-place via
  ``input_output_aliases``), and (b) accumulates both T-phase reductions
  ``wR0 = wᵀ(M ⊙ R)`` and ``nw = (w²)ᵀ M`` on the fly. One read + one write
  of R, one read of M — where the unfused path needs ~3× that.
- **Kernel B** (W-phase): applies the T-phase rank-one update
  (``R += w·t_oldᵀ − w_eff·t_newᵀ``) and accumulates the W-phase reductions
  ``(M ⊙ R) t_new`` and ``M t_new²`` in the same pass.

The W-phase's own rank-one update is *deferred* — it becomes the next
topic's "pending" update in kernel A′, so it costs no extra pass at all.
R is refreshed from (X, W, T) at the start of every sweep (one GEMM), so
the final pending update needs no flush and float drift is bounded to one
sweep.

Both reductions ride the MXU as (1×bn)·(bn×bd) / (bn×bd)·(bd×1) contractions
per tile. Inputs are zero-padded to tile multiples once per sweep; padded
mask entries are zero so they contribute nothing to any reduction.

Restrictions (the driver falls back to the XLA sweep otherwise): masked
configs with ``reset_topic_method=None`` (the recommender preset,
``sklearn_interface.py:116-123``), no store_gradients, no DP noise.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rri_nmf_tpu.matrixops import (_proj_simplex_core,
    reproject_row_if_drifted)
from rri_nmf_tpu.optimization import qf_min_vector_c
from rri_nmf_tpu.ops.dense_pallas import _round_up
from rri_nmf_tpu.ops.sweep_xla import (make_reset_rowcol,
                                       resolve_mixed_dtypes)


def _acc_of(dt):
    """Accumulator dtype: f32 for 16-bit storage, dtype-preserving
    otherwise (f64 under CPU interpret tests) — the one shared rule,
    same as ``resolve_mixed_dtypes``'s accumulator column."""
    return jnp.float32 if dt in (jnp.bfloat16, jnp.float16) else dt

# tile-size QUANTA: shapes are padded to (BN, BD) multiples, then
# :func:`_pick_tiles` grows the actual tile to the largest divisor block
# within the VMEM budget — fewer grid steps amortize Mosaic's per-step
# cost exactly as in the dense GS kernels (dense_pallas._pick_block).
BN = 512
BD = 1024
# Largest tile per axis and the VMEM budget for one (bn, bd) tile pair:
# R-in, M-in and the aliased R-out are streamed, so Mosaic double-buffers
# ~3 tile buffers; measured on v5e (benchmarks/exp_masked_tiles.py).
TILE_CAP = 4096
MASKED_VMEM_BUDGET = 48 * 2**20


def _pick_tiles(n, d, itemsize=4):
    """(npad, bn, dpad, bd): pad each axis to its quantum, then choose the
    largest divisor blocks whose R/M working set fits the VMEM budget
    (~3 double-buffered tile buffers of ``bn*bd``)."""
    npad, dpad = _round_up(n, BN), _round_up(d, BD)

    def divisors(mpad, quantum, cap):
        q = mpad // quantum
        return [quantum * f for f in range(min(cap // quantum, q), 0, -1)
                if q % f == 0]

    best = (BN, BD)
    for bn in divisors(npad, BN, TILE_CAP):
        for bd in divisors(dpad, BD, TILE_CAP):
            if 6 * bn * bd * itemsize <= MASKED_VMEM_BUDGET:
                if bn * bd > best[0] * best[1]:
                    best = (bn, bd)
                break  # bd list is descending: first fit is the largest
    return npad, best[0], dpad, best[1]


def _phase_a_kernel(R_ref, M_ref, dw_ref, tprev_ref, w_ref,
                    R_out_ref, wR0_ref, nw_ref):
    """Apply pending rank-one update; accumulate T-phase reductions.

    Grid: (d_blocks, n_blocks) — n innermost so the (1, BD) accumulator
    tiles stay resident while row tiles stream.
    """
    i = pl.program_id(1)  # row-block index (innermost)

    Rblk = R_ref[:] + dw_ref[:] * tprev_ref[:]          # (BN, BD) rank-one
    R_out_ref[:] = Rblk
    MR = M_ref[:] * Rblk

    w = w_ref[:]                                        # (BN, 1)
    # accumulate in float32 for low-precision storage; dtype-preserving
    # otherwise (float64 under CPU interpret tests)
    acc_t = _acc_of(MR.dtype)
    # cast dot inputs to the accumulator dtype explicitly: Mosaic cannot
    # lower mixed bf16-in / f32-out contractions
    part_wR0 = jax.lax.dot_general(
        w.astype(acc_t), MR.astype(acc_t),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=acc_t)                   # (1, BD)
    part_nw = jax.lax.dot_general(
        (w * w).astype(acc_t), M_ref[:].astype(acc_t),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=acc_t)

    @pl.when(i == 0)
    def _():
        wR0_ref[:] = part_wR0
        nw_ref[:] = part_nw

    @pl.when(i > 0)
    def _():
        wR0_ref[:] = wR0_ref[:] + part_wR0
        nw_ref[:] = nw_ref[:] + part_nw


def _phase_b_kernel(R_ref, M_ref, w_ref, weff_ref, told_ref, tnew_ref,
                    R_out_ref, Rt_ref, mt2_ref):
    """Apply the T-phase rank-one update; accumulate W-phase reductions.

    Grid: (n_blocks, d_blocks) — d innermost so the (BN, 1) accumulator
    tiles stay resident while column tiles stream.
    """
    j = pl.program_id(1)  # column-block index (innermost)

    Rblk = R_ref[:] + w_ref[:] * told_ref[:] - weff_ref[:] * tnew_ref[:]
    R_out_ref[:] = Rblk
    MR = M_ref[:] * Rblk

    tn = tnew_ref[:]                                    # (1, BD)
    acc_t = _acc_of(MR.dtype)
    part_Rt = jax.lax.dot_general(
        MR.astype(acc_t), tn.astype(acc_t),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=acc_t)                   # (BN, 1)
    part_mt2 = jax.lax.dot_general(
        M_ref[:].astype(acc_t), (tn * tn).astype(acc_t),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=acc_t)

    @pl.when(j == 0)
    def _():
        Rt_ref[:] = part_Rt
        mt2_ref[:] = part_mt2

    @pl.when(j > 0)
    def _():
        Rt_ref[:] = Rt_ref[:] + part_Rt
        mt2_ref[:] = mt2_ref[:] + part_mt2


def _phase_a(R, M, dw, t_prev, w, interpret, bn=BN, bd=BD):
    npad, dpad = R.shape
    gn, gd = npad // bn, dpad // bd
    dtype = R.dtype
    acc_dtype = _acc_of(dtype)
    return pl.pallas_call(
        _phase_a_kernel,
        grid=(gd, gn),
        in_specs=[
            pl.BlockSpec((bn, bd), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),       # R
            pl.BlockSpec((bn, bd), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),       # M
            pl.BlockSpec((bn, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),       # dw
            pl.BlockSpec((1, bd), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),       # t_prev
            pl.BlockSpec((bn, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),       # w
        ],
        out_specs=[
            pl.BlockSpec((bn, bd), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),       # R out (aliased)
            pl.BlockSpec((1, bd), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),       # wR0
            pl.BlockSpec((1, bd), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),       # nw
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad, dpad), dtype),
            jax.ShapeDtypeStruct((1, dpad), acc_dtype),
            jax.ShapeDtypeStruct((1, dpad), acc_dtype),
        ],
        input_output_aliases={0: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=6 * npad * dpad,
            bytes_accessed=3 * npad * dpad * R.dtype.itemsize,
            transcendentals=0),
    )(R, M, dw.reshape(-1, 1), t_prev.reshape(1, -1), w.reshape(-1, 1))


def _phase_b(R, M, w, w_eff, t_old, t_new, interpret, bn=BN, bd=BD):
    npad, dpad = R.shape
    gn, gd = npad // bn, dpad // bd
    dtype = R.dtype
    acc_dtype = _acc_of(dtype)
    return pl.pallas_call(
        _phase_b_kernel,
        grid=(gn, gd),
        in_specs=[
            pl.BlockSpec((bn, bd), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),       # R
            pl.BlockSpec((bn, bd), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),       # M
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),       # w (old col)
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),       # w_eff
            pl.BlockSpec((1, bd), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),       # t_old
            pl.BlockSpec((1, bd), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),       # t_new
        ],
        out_specs=[
            pl.BlockSpec((bn, bd), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),       # R out (aliased)
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),       # Rt
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),       # mt2
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad, dpad), dtype),
            jax.ShapeDtypeStruct((npad, 1), acc_dtype),
            jax.ShapeDtypeStruct((npad, 1), acc_dtype),
        ],
        input_output_aliases={0: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=8 * npad * dpad,
            bytes_accessed=3 * npad * dpad * R.dtype.itemsize,
            transcendentals=0),
    )(R, M, w.reshape(-1, 1), w_eff.reshape(-1, 1),
      t_old.reshape(1, -1), t_new.reshape(1, -1))


def supports_pallas(cfg) -> bool:
    """Whether the fused kernel covers this config (else: XLA sweep).

    ``fix_T`` masked sweeps (the RS estimator's ``transform`` — the
    production masked-inference path, reference
    ``sklearn_interface.py:144-156``) run a W-phase-only variant: one
    fused pass per topic instead of two, including that preset's
    ``reset_topic_method='random'`` (a reset rebuilds the residual —
    rare, and exactly the XLA sweep's semantics)."""
    return (cfg.masked
            and not cfg.masked_sparse  # dense-mask streaming kernel only
            and (cfg.reset_topic_method is None or cfg.fix_T)
            and not cfg.store_gradients
            and cfg.dp_sigma is None
            and not cfg.fix_W)


@lru_cache(maxsize=16)
def make_masked_sweep_pallas(cfg, interpret=False, tiles=None):
    """Build the fused Pallas masked sweep with the same call signature as
    :func:`rri_nmf_tpu.ops.sweep_xla.make_sweep` for masked configs::

        sweep(X, W, T, key, resets_left, reset_key, W_mat[, w_row_sum_vec])
            -> (W, T, key, resets_left)

    ``tiles``: optional ``(bn, bd)`` override of the adaptive
    :func:`_pick_tiles` choice (benchmarking/testing).
    """
    assert supports_pallas(cfg), 'config not supported by the Pallas sweep'
    k = cfg.k

    def sweep(X, W, T, key, resets_left, reset_key, *extras):
        W_mat = extras[0]
        w_row_sum_vec = (extras[1].reshape(-1)
                         if cfg.w_row_sum_is_vector else None)
        n, d = X.shape
        # factor dtype follows W, like the XLA masked sweep
        # (resolve_mixed_dtypes); a bf16 X with f32 factors is upcast into
        # the f32 buffers here — the driver routes bf16-masked configs to
        # the XLA sweep anyway (it measures faster), this only protects
        # direct callers from a silent factor downcast
        dtype, _, _ = resolve_mixed_dtypes(X.dtype, W.dtype,
                                           cfg.matmul_precision)
        if tiles is not None:
            bn, bd = tiles
            npad, dpad = _round_up(n, bn), _round_up(d, bd)
        else:
            npad, bn, dpad, bd = _pick_tiles(n, d, jnp.dtype(dtype).itemsize)

        # validity masks for the padded tails: the per-coordinate solves
        # must never see the pads — with a NEGATIVE L1 regularizer a
        # padded coordinate (numer = -reg_l1 > 0) would otherwise receive
        # phantom mass max(-reg_l1, 0)/reg_l2 that corrupts sum-to-s
        # rescales, aliveness checks, and the returned factors
        row_ok = jnp.arange(npad) < n
        col_ok = jnp.arange(dpad) < d

        Xp = jnp.zeros((npad, dpad), dtype).at[:n, :d].set(X)
        Mp = jnp.zeros((npad, dpad), dtype).at[:n, :d].set(W_mat)
        Wp = jnp.zeros((npad, k), dtype).at[:n].set(W)
        Tp = jnp.zeros((k, dpad), dtype).at[:, :d].set(T)
        if cfg.w_row_sum_is_vector:
            ubp = jnp.zeros((npad,), dtype).at[:n].set(
                w_row_sum_vec.astype(dtype))
        else:
            ubp = None

        R = Xp - Wp @ Tp   # fresh residual each sweep bounds float drift

        pend_dw = jnp.zeros((npad,), dtype)
        pend_t = jnp.zeros((dpad,), dtype)

        if cfg.fix_T:
            # masked-inference fast path (W-phase only): per topic, ONE
            # fused pass applies the previous topic's deferred W rank-one
            # update (w_eff=0 disables kernel B's T-side update) and
            # accumulates (M ⊙ R)·t_t and M·t_t² on the fly.
            zeros_n = jnp.zeros((npad,), dtype)
            reset_fn = (make_reset_rowcol(cfg)
                        if cfg.reset_topic_method is not None else None)

            def topic_body_fix_t(t, carry):
                Wp, Tp, R, pend_dw, pend_t, key, resets_left = carry
                w = Wp[:, t]
                t_t = Tp[t]
                R, Rt0, mt2 = _phase_b(R, Mp, pend_dw, zeros_n, pend_t,
                                       t_t, interpret, bn=bn, bd=bd)
                Rt0 = Rt0.reshape(-1)
                mt2 = mt2.reshape(-1)
                Rt = Rt0 + w * mt2          # rank-one restore

                numer_w = jnp.where(row_ok, Rt - cfg.reg_w_l1, -1.0)
                denom_w = jnp.where(row_ok, mt2 + cfg.reg_w_l2, 1.0)
                ub = ubp if cfg.w_row_sum_is_vector else cfg.w_row_sum
                w_new, _ = qf_min_vector_c(-numer_w, denom_w, s=None,
                                           ub=ub)
                Wp = Wp.at[:, t].set(w_new.astype(dtype))
                pend_dw = w - w_new.astype(dtype)
                pend_t = t_t

                if reset_fn is not None:
                    # dead-column reset, exactly the XLA sweep's
                    # _check_reset_W semantics (reference nmf.py:786-816):
                    # reset on the UNPADDED views (same key stream and
                    # draw shapes as the XLA path), rebuild R, clear the
                    # deferred update. The reset cond carries only the
                    # new (d,) row / (n,) column / key — carrying the
                    # whole (Wp, Tp, R, ...) state made XLA copy the
                    # factor panels AND the padded residual per topic on
                    # the never-taken branch (see
                    # sweep_xla.make_reset_rowcol).
                    alive = jnp.sum(Wp[:n, t]) > 1e-10
                    do_reset = jnp.logical_and(jnp.logical_not(alive),
                                               resets_left > 0)
                    row, col, key = lax.cond(
                        do_reset,
                        lambda: reset_fn(Xp[:n, :d], Wp[:n], Tp[:, :d],
                                         t, key, reset_key),
                        lambda: (Tp[t, :d], Wp[:n, t], key))
                    Wp = Wp.at[:n, t].set(col)
                    Tp = lax.dynamic_update_slice(
                        Tp, row.reshape(1, -1).astype(dtype), (t, 0))
                    resets_left = (resets_left
                                   - do_reset.astype(resets_left.dtype))
                    R = lax.cond(do_reset, lambda: Xp - Wp @ Tp,
                                 lambda: R)
                    pend_dw = jnp.where(do_reset,
                                        jnp.zeros((), dtype), pend_dw)
                    pend_t = jnp.where(do_reset,
                                       jnp.zeros((), dtype), pend_t)
                return Wp, Tp, R, pend_dw, pend_t, key, resets_left

            Wp, Tp, R, pend_dw, pend_t, key, resets_left = lax.fori_loop(
                0, k, topic_body_fix_t,
                (Wp, Tp, R, pend_dw, pend_t, key, resets_left))

            if (cfg.project_W_each_iter
                    and (cfg.w_row_sum is not None
                         or cfg.w_row_sum_is_vector)):
                if cfg.w_row_sum_is_vector:
                    s_vec = ubp.astype(dtype)
                else:
                    s_vec = jnp.full((npad,), cfg.w_row_sum, dtype=dtype)
                Wp = jax.vmap(_proj_simplex_core)(Wp, s_vec)

            return Wp[:n], Tp[:, :d], key, resets_left

        def topic_body(t, carry):
            Wp, Tp, R, pend_dw, pend_t = carry
            w = Wp[:, t]

            # ---- T-phase: one fused pass (pending update + reductions)
            R, wR0, nw = _phase_a(R, Mp, pend_dw, pend_t, w, interpret,
                                  bn=bn, bd=bd)
            wR0 = wR0.reshape(-1)
            nw = nw.reshape(-1)
            wR = wR0 + Tp[t] * nw      # rank-one restore, vector identity

            numer = jnp.where(col_ok, wR - cfg.reg_t_l1, -1.0)
            denom = jnp.where(col_ok, nw + cfg.reg_t_l2, 1.0)
            t_new, nt1 = qf_min_vector_c(-numer, denom,
                                         s=cfg.t_update_s, ub=cfg.t_row_sum)
            t_old = Tp[t]
            if cfg.scale_transfer:
                Wp = Wp.at[:, t].multiply(nt1.astype(dtype))
                w_eff = w * nt1.astype(dtype)
            else:
                w_eff = w
            Tp = Tp.at[t].set(t_new.astype(dtype))
            if cfg.project_T_each_iter and cfg.t_row_sum:
                # re-project a drifted T row, like the XLA sweep's
                # _maybe_reproject_t_row (reference nmf.py:758-761).
                # Project over the REAL d columns only — running Duchi over
                # the zero-padded tail would let padding absorb mass.
                row = reproject_row_if_drifted(Tp[t, :d], cfg.t_row_sum,
                                               dtype)
                Tp = lax.dynamic_update_slice(
                    Tp, row.reshape(1, -1), (t, 0))

            # ---- W-phase: one fused pass (T update + reductions); uses the
            # STORED (dtype) row so R tracks T exactly
            R, Rt0, mt2 = _phase_b(R, Mp, w, w_eff, t_old, Tp[t],
                                   interpret, bn=bn, bd=bd)
            Rt0 = Rt0.reshape(-1)
            mt2 = mt2.reshape(-1)
            Rt = Rt0 + w_eff * mt2     # rank-one restore on the W side

            numer_w = jnp.where(row_ok, Rt - cfg.reg_w_l1, -1.0)
            denom_w = jnp.where(row_ok, mt2 + cfg.reg_w_l2, 1.0)
            ub = ubp if cfg.w_row_sum_is_vector else cfg.w_row_sum
            w_new, _ = qf_min_vector_c(-numer_w, denom_w, s=None, ub=ub)
            Wp = Wp.at[:, t].set(w_new.astype(dtype))

            # defer this topic's W rank-one update into the next A' pass
            pend_dw = w_eff - w_new.astype(dtype)
            pend_t = Tp[t]   # stored (dtype) row
            return Wp, Tp, R, pend_dw, pend_t

        Wp, Tp, R, pend_dw, pend_t = lax.fori_loop(
            0, k, topic_body, (Wp, Tp, R, pend_dw, pend_t))
        # no flush needed: R is rebuilt from (X, W, T) next sweep

        # per-iteration W row projection (reference nmf.py:481-484), same
        # as the XLA sweep's tail. Padded rows project to garbage but are
        # sliced away below (vector bounds: padded s=0 keeps them zero).
        if (cfg.project_W_each_iter
                and (cfg.w_row_sum is not None or cfg.w_row_sum_is_vector)):
            if cfg.w_row_sum_is_vector:
                s_vec = ubp.astype(dtype)
            else:
                s_vec = jnp.full((npad,), cfg.w_row_sum, dtype=dtype)
            Wp = jax.vmap(_proj_simplex_core)(Wp, s_vec)

        return Wp[:n], Tp[:, :d], key, resets_left

    return jax.jit(sweep)
