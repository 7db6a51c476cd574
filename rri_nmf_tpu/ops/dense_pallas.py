"""Dense phase sweep: XLA GEMMs + fused Gauss-Seidel Pallas kernels.

Measured decomposition of the dense phase sweep at the headline shape
(16384×8192, k=128, f32, single chip — benchmarks/exp_*.py):

- the two X contractions (``WᵀX`` and ``T Xᵀ``) run fastest as plain XLA
  GEMMs (~335 GB/s of X; hand-written Pallas accumulation GEMMs plateau
  ~45% slower across tilings);
- the per-topic Gauss-Seidel loop costs ~1 ms as XLA ops (≈2560 small
  HLOs × dispatch overhead) but is FREE inside a Pallas kernel
  (+0.007 ms measured).

So this module keeps XLA for the GEMMs and fuses only the topic loops:

- **T-phase GS kernel** (grid over d-blocks): given the precomputed Gram
  ``G = WᵀW``, its diagonal, and ``WX = WᵀX``, updates all k rows of the
  VMEM-resident ``(k, BD)`` T tile sequentially. T columns are independent
  in the T-phase, so tile-local Gauss-Seidel equals global Gauss-Seidel
  exactly.
- **W-phase GS kernel** (grid over n-blocks): same with ``G = TTᵀ`` and
  ``XTᵀ = T Xᵀ`` (produced directly in ``(k, n)`` layout by the GEMM — no
  transpose), updating the W tile held as ``(k, BN)``. W rows are
  independent in the W-phase.

The per-topic subproblem is branch-free: both ``qf_min`` scalar-curvature
branches (positive: ``[numer]₊/denom``; concave: the bounded-vertex
``where`` form — reference ``optimization.py:51-74`` with ``s=None``) are
computed and selected with ``jnp.where``.

Coverage (the driver falls back to the XLA Gram-blocked sweep otherwise):
unweighted phase-order configs with ``reset_topic_method=None`` and no
per-topic T simplex projection (the projection's sort is cross-column),
no gradient stores, no DP noise. The per-iteration W row projection runs
as an XLA tail, like the XLA sweep. Replaces the reference's per-topic
GEMV loop (``nmf.py:415-478,672-676,729-734``) for the production dense
fit.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rri_nmf_tpu.matrixops import EPS_DIV_BY_ZERO, _proj_simplex_core
from rri_nmf_tpu.ops.sweep_xla import resolve_mixed_dtypes

BN = 512    # pad quantum (rows) of the W-phase GS kernel
BD = 1024   # pad quantum (columns) of the T-phase GS kernel
BLOCK_CAP = 4096  # largest GS tile (on-device sweep: 512→4096 block is
#                   2.29→1.90 ms/sweep at 16384×8192 k=128 — fewer grid
#                   steps; 8192 exceeds VMEM. benchmarks/exp_gs_tiles.py)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _pick_block(m, quantum, k=128, narrow=False, cap=BLOCK_CAP):
    """(padded_size, block): pad ``m`` to the ``quantum`` then choose the
    largest block ≤ the VMEM-budgeted cap that divides the padded size
    exactly — big tiles amortize Mosaic's per-grid-step cost without
    extra padding.

    The cap scales with ``k`` and the scratch: the kernel holds N, F, and
    the output tile (plus an f32 scratch when the storage is 16-bit,
    ``narrow=True``) in VMEM simultaneously; budget ~12 MB of the 16."""
    buffers = 4 if narrow else 3
    cap = min(cap, max(quantum,
                       (12 * 2**20 // (4 * k * buffers))
                       // quantum * quantum))
    mpad = _round_up(m, quantum)
    q = mpad // quantum
    for f in range(min(cap // quantum, q), 0, -1):
        if q % f == 0:
            return mpad, quantum * f
    return mpad, quantum


# VMEM budget for the projected T-phase kernel: it holds the WHOLE
# (k, dpad) numerator + factor panels (+ f32 scratch for 16-bit storage)
# resident at once — no column blocking, because the simplex threshold
# couples all d columns of a row. 64 MB: measured on v5e at the scaled
# north-star TM shape (32768×16384 k=256 = 48 MB of resident panels),
# where the kernel compiles under the 100 MB scoped-vmem limit and runs
# 10.1 ms/sweep vs the XLA fallback's 16.0
# (benchmarks/results_round3_tm_k256.json).
TM_PROJ_VMEM_BUDGET = 64 * 2**20


def tm_proj_fits(k, d, narrow=False, dpad=None) -> bool:
    """Whether the fused projected T-phase panels fit the VMEM budget.

    ``dpad`` overrides the single-chip padding — the SHARDED variant's
    all-gathered panel is ``round_up(d, BD·tp)`` wide, which can be far
    larger than ``round_up(d, BD)`` (the budget must reflect the panel
    Mosaic actually holds resident)."""
    dpad = _round_up(d, BD) if dpad is None else int(dpad)
    bufs = 4 if narrow else 3      # N, F, out (+ f32 scratch when narrow)
    return bufs * k * dpad * 4 + k * (k + 1) * 4 <= TM_PROJ_VMEM_BUDGET


def gs_fits(k, narrow=False) -> bool:
    """Whether the GS topic-loop kernels fit VMEM at this ``k``.

    :func:`_pick_block` floors the tile at the quantum, so feasibility
    requires the 12 MB tile budget to admit one QUANTUM-sized block
    (worst axis: BD columns) and the VMEM-resident (k, k) Gram to stay
    small next to the double-buffered tiles — at e.g. k=4096 the floored
    quantum tiles alone are 48 MB and the Gram 64 MB, past the ~100 MB
    scoped-vmem limit, and Mosaic fails at compile time. Declining here
    routes such configs to the XLA Gram-blocked sweep instead."""
    bufs = 4 if narrow else 3
    block_ok = 4 * k * bufs * BD <= 12 * 2**20
    gram_ok = 4 * k * k <= 32 * 2**20
    return block_ok and gram_ok


def _supports_base(cfg) -> bool:
    return (not cfg.masked
            and cfg.update_order == 'phase'
            and cfg.reset_topic_method is None
            and not cfg.store_gradients
            and cfg.dp_sigma is None)


def _tm_proj_active(cfg) -> bool:
    """Whether the T-phase needs the whole-row projected kernel."""
    return bool(cfg.project_T_each_iter and cfg.t_row_sum
                and not cfg.fix_T)


def supports_dense_pallas(cfg, d=None, narrow=False) -> bool:
    """Whether the fused dense GS kernels cover this config.

    ``project_T_each_iter`` with a sum constraint is covered by the fused
    projected T-phase kernel (in-kernel Michelot simplex projections) —
    but only when the caller supplies the column count ``d`` and the
    whole (k, d) panel fits VMEM (:func:`tm_proj_fits`); shape-blind
    callers (e.g. the sharded dense sweep) keep the conservative answer.
    """
    if not _supports_base(cfg) or not gs_fits(cfg.k, narrow):
        return False
    if _tm_proj_active(cfg):
        return d is not None and tm_proj_fits(cfg.k, int(d), narrow)
    return True


def _make_gs_kernel(k, reg_l1, reg_l2, bound, ub_is_vector, acc_dt,
                    reps=1):
    """Gauss-Seidel topic loop over the k rows of a VMEM-resident factor
    tile. Shared by both phases (the W-phase passes W transposed).

    ``reps`` repeats the whole k-topic loop in-kernel
    (``SweepConfig.inner_reps``): the tile stays VMEM-resident, so extra
    exact-BCD passes cost only VPU/MXU time, no HBM traffic. (The whole
    serialized topic loop measures ~0.15 ms/sweep across both phases at
    the headline shape — the sweep's cost is the X GEMMs, see
    benchmarks/exp_hybrid_parts.py.)"""

    def kernel(*refs):
        if ub_is_vector:
            G_ref, diag_ref, N_ref, F_ref, ub_ref, out_ref = refs[:6]
        else:
            G_ref, diag_ref, N_ref, F_ref, out_ref = refs[:5]
        # 16-bit storage: Mosaic cannot dynamic-slice single (1, B) rows
        # of a 16-bit tile (sublane granularity is 16); run the loop on an
        # f32 VMEM scratch and cast once at the edges
        narrow = refs[-1] if out_ref.dtype != acc_dt else None
        work = narrow if narrow is not None else out_ref
        work[:] = F_ref[:].astype(work.dtype)
        dtype = work.dtype
        ub = ub_ref[:].astype(acc_dt) if ub_is_vector else bound

        def body(t, _):
            g = G_ref[pl.ds(t, 1), :]                    # (1, k)
            corr = lax.dot_general(
                g, work[:].astype(acc_dt),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc_dt)           # (1, B)
            gtt = diag_ref[pl.ds(t, 1), :]               # (1, 1)
            fold = work[pl.ds(t, 1), :].astype(acc_dt)
            numer = N_ref[pl.ds(t, 1), :] - corr + gtt * fold - reg_l1
            denom = gtt + reg_l2
            pos = jnp.maximum(numer, 0.0) / (denom + EPS_DIV_BY_ZERO)
            neg = jnp.where(denom - numer < 0, ub, jnp.zeros_like(numer))
            work[pl.ds(t, 1), :] = jnp.where(denom > 0, pos,
                                             neg).astype(dtype)
            return 0

        def rep(r, _):
            lax.fori_loop(0, k, body, 0)
            return 0

        lax.fori_loop(0, reps, rep, 0)
        if narrow is not None:
            out_ref[:] = work[:].astype(out_ref.dtype)

    return kernel


def _gs_call(k, B, nblk, reg_l1, reg_l2, bound, acc_dt, dtype,
             G, diag, N, F, ub=None, interpret=False, reps=1):
    """Run the GS kernel over ``nblk`` column-blocks of width ``B``."""
    in_specs = [
        pl.BlockSpec((k, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, B), lambda j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, B), lambda j: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [G, diag, N, F]
    if ub is not None:
        in_specs.append(pl.BlockSpec((1, B), lambda j: (0, j),
                                     memory_space=pltpu.VMEM))
        args.append(ub)
    scratch = []
    if jnp.dtype(dtype) != jnp.dtype(acc_dt):
        # 16-bit tiles: the GS loop runs on an f32 scratch (see kernel)
        scratch = [pltpu.VMEM((k, B), acc_dt)]
    # Mosaic double-buffers the streamed N/F/out tiles, so the working
    # set is ~2x the resident tiles; the default 16 MB scoped-vmem limit
    # rejects the k=256 B=4096 configuration (24 MB) that the hardware
    # (128 MB VMEM on v5e/v5p) runs fine. Budget explicitly instead.
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)
    return pl.pallas_call(
        _make_gs_kernel(k, reg_l1, reg_l2, bound, ub is not None, acc_dt,
                        reps=reps),
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((k, B), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, B * nblk), dtype),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=params,
        cost_estimate=pl.CostEstimate(
            flops=2 * k * k * B * nblk * reps,
            # deliberately NOT scaled by reps: the inner passes re-read the
            # VMEM-resident tile; each tile crosses HBM once in and once
            # out regardless of reps (plus one N read)
            bytes_accessed=3 * k * B * nblk * jnp.dtype(dtype).itemsize,
            transcendentals=0),
    )(*args)


def _make_tm_proj_kernel(k, d, dpad, reg_l1, reg_l2, s, acc_dt, reps):
    """Projected Gauss-Seidel T-phase over the whole VMEM-resident (k, dpad)
    panel: per topic, the Gram-corrected numerator row, the ``qf_min``
    scalar-curvature solve (reference ``optimization.py:51-74`` with the
    sum constraint ``s``), and an EXACT in-kernel simplex projection.

    The projection is Michelot's (1986) active-set fixpoint instead of the
    Duchi sort: iterate ``tau <- (sum_{v>tau} v - s) / |{v>tau}|`` from the
    full-support threshold; the active set shrinks monotonically and the
    fixpoint is exactly the sort-based threshold, so the result equals
    ``matrixops._proj_simplex_core`` up to summation rounding. Each
    iteration is two masked VPU reductions over a VMEM row — no sort, no
    per-topic kernel dispatch. (The XLA phase sweep pays ~27 us *per
    serialized projection* at d=8192 on TPU — sort, top-k, or Michelot
    alike, it's the per-step dispatch floor, benchmarks/exp_proj.py; in
    here the loop is free.)

    Padded columns (``col >= d``) are masked out of every reduction and
    never receive mass — the thresholds match the unpadded d-vector's.
    """

    def kernel(*refs):
        G_ref, diag_ref, N_ref, F_ref, out_ref = refs[:5]
        narrow = refs[-1] if out_ref.dtype != acc_dt else None
        work = narrow if narrow is not None else out_ref
        work[:] = F_ref[:].astype(work.dtype)
        col = lax.broadcasted_iota(jnp.int32, (1, dpad), 1)
        valid = col < d
        s_c = jnp.asarray(s, acc_dt)
        zero = jnp.zeros((1, dpad), acc_dt)

        def proj(v):
            """Exact simplex projection of a nonneg (1, dpad) row, zero on
            padding; includes `_proj_simplex_core`'s already-feasible
            shortcut."""
            sv = jnp.sum(v)
            on = jnp.logical_and(sv == s_c, jnp.min(v) >= 0)

            def cond_f(st):
                _tau, _m, changed, it = st
                return jnp.logical_and(changed, it < d + 2)

            def body_f(st):
                tau, m_prev, _ch, it = st
                active = jnp.logical_and(valid, v > tau)
                m = jnp.sum(active, dtype=jnp.int32)
                ssum = jnp.sum(jnp.where(active, v, zero))
                tau2 = (ssum - s_c) / jnp.maximum(m, 1).astype(acc_dt)
                return tau2, m, m != m_prev, it + 1

            tau0 = (sv - s_c) / jnp.asarray(d, acc_dt)
            tau, _, _, _ = lax.while_loop(
                cond_f, body_f,
                (tau0, jnp.asarray(d + 1, jnp.int32),
                 jnp.asarray(True), jnp.asarray(0, jnp.int32)))
            x = jnp.where(jnp.logical_and(valid, v > tau), v - tau, zero)
            return jnp.where(on, v, x)

        def body(t, _):
            g = G_ref[pl.ds(t, 1), :]                    # (1, k)
            corr = lax.dot_general(
                g, work[:].astype(acc_dt),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc_dt)           # (1, dpad)
            gtt = diag_ref[pl.ds(t, 1), :]               # (1, 1)
            fold = work[pl.ds(t, 1), :].astype(acc_dt)
            numer = N_ref[pl.ds(t, 1), :] - corr + gtt * fold - reg_l1
            denom = gtt + reg_l2
            # positive-curvature branch: [numer]+ / denom, then project
            v = jnp.where(valid,
                          jnp.maximum(numer, 0.0)
                          / (denom + EPS_DIV_BY_ZERO), zero)
            x_pos = proj(v)
            # concave/flat branch: all mass on the first least-cost
            # coordinate (argmin of -numer, first-index tie-break)
            wneg = jnp.where(valid, -numer,
                             jnp.asarray(jnp.inf, acc_dt))
            mn = jnp.min(wneg)
            idx = jnp.min(jnp.where(wneg == mn, col, dpad))
            x_vert = jnp.where(col == idx, s_c, zero)
            row = jnp.where(denom > 0, x_pos, x_vert)
            # drift re-projection (sweep_xla._maybe_reproject_t_row,
            # reference nmf.py:759-761): re-project unless the stored row
            # sums to s within 1e-15
            row2 = proj(row)
            drift = jnp.abs(jnp.sum(row) - s_c) > 1e-15
            row = jnp.where(drift, row2, row)
            work[pl.ds(t, 1), :] = row.astype(work.dtype)
            return 0

        def rep(r, _):
            lax.fori_loop(0, k, body, 0)
            return 0

        lax.fori_loop(0, reps, rep, 0)
        if narrow is not None:
            out_ref[:] = work[:].astype(out_ref.dtype)

    return kernel


def _tm_proj_call(k, d, dpad, reg_l1, reg_l2, s, acc_dt, dtype,
                  G, diag, N, F, interpret=False, reps=1):
    """Run the projected T-phase kernel on whole VMEM-resident panels."""
    narrow = jnp.dtype(dtype) != jnp.dtype(acc_dt)
    assert tm_proj_fits(k, d, narrow, dpad=dpad), \
        'projected T-phase panels exceed the VMEM budget'
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((k, dpad), acc_dt)] if narrow else []
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)
    return pl.pallas_call(
        _make_tm_proj_kernel(k, d, dpad, reg_l1, reg_l2, s, acc_dt,
                             reps),
        in_specs=[spec] * 4,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((k, dpad), dtype),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=params,
        cost_estimate=pl.CostEstimate(
            flops=2 * k * k * dpad * reps,
            bytes_accessed=3 * k * dpad * jnp.dtype(dtype).itemsize,
            transcendentals=0),
    )(G, diag, N, F)


@lru_cache(maxsize=16)
def make_dense_phase_sweep_pallas(cfg, interpret=False):
    """Build the dense phase sweep (XLA GEMMs + fused GS kernels). Same
    call signature as :func:`rri_nmf_tpu.ops.sweep_xla.make_sweep` for
    supported configs::

        sweep(X, W, T, key, resets_left, reset_key[, w_row_sum_vec])
            -> (W, T, key, resets_left)
    """
    assert _supports_base(cfg), \
        'config not supported by the dense GS kernels'
    k = cfg.k

    def sweep(X, W, T, key, resets_left, reset_key, *extras):
        from rri_nmf_tpu.ops.quantized import (
            QuantizedX, qx_t_numerator, qx_w_numerator)
        qx = X if isinstance(X, QuantizedX) else None
        w_row_sum_vec = (extras[0].reshape(-1)
                         if cfg.w_row_sum_is_vector else None)
        n, d = X.shape
        # Mixed storage: the factor dtype follows W/T, not X. With
        # ``x_dtype='bfloat16'`` (nmf driver) X is stored bf16 while the
        # factors stay f32 — the two X GEMMs read half the bytes and run
        # one native bf16 MXU pass, while the GS topic loops keep full
        # f32 tiles (round 2 measured the all-bf16 mode SLOWER because
        # the narrow factor tiles force an f32 scratch + casts in the
        # kernels). See resolve_mixed_dtypes for the x_narrow rules.
        dtype, acc_dt, x_narrow = resolve_mixed_dtypes(
            X.dtype, W.dtype, cfg.matmul_precision)
        narrow = jnp.dtype(dtype) != jnp.dtype(acc_dt)
        npad, bn = _pick_block(n, BN, k=k, narrow=narrow)
        dpad, bd = _pick_block(d, BD, k=k, narrow=narrow)

        # static upper bounds for the concave qf branch (reference
        # semantics: the positive branch does NOT enforce ub)
        t_bound = float(cfg.t_row_sum) if cfg.t_row_sum else float('inf')
        w_bound = (float(cfg.w_row_sum)
                   if (cfg.w_row_sum is not None
                       and not cfg.w_row_sum_is_vector) else float('inf'))

        # ---------------- T-phase --------------------------------------
        if not cfg.fix_T:
            G = jnp.dot(W.T, W, preferred_element_type=acc_dt)
            diag = jnp.diagonal(G).reshape(k, 1)
            # cast the small factor operand down to X's storage dtype so a
            # narrow X runs one native bf16 MXU pass (f32 default precision
            # rounds the operands to bf16 on the MXU anyway)
            if qx is not None:
                WX = qx_t_numerator(W, qx, acc_dt)           # (k, d)
            else:
                Wx = W.astype(X.dtype) if x_narrow else W
                WX = lax.dot_general(Wx, X, (((0,), (0,)), ((), ())),
                                     preferred_element_type=acc_dt)
            if dpad != d:
                WX = jnp.zeros((k, dpad), acc_dt).at[:, :d].set(WX)
                Tk = jnp.zeros((k, dpad), dtype).at[:, :d].set(T)
            else:
                Tk = T
            if _tm_proj_active(cfg):
                # per-topic simplex projection: whole-row kernel (the
                # threshold couples all d columns, so no column blocking)
                Tk = _tm_proj_call(k, d, dpad, cfg.reg_t_l1,
                                   cfg.reg_t_l2, float(cfg.t_row_sum),
                                   acc_dt, dtype, G, diag, WX, Tk,
                                   interpret=interpret,
                                   reps=cfg.inner_reps)
            else:
                Tk = _gs_call(k, bd, dpad // bd, cfg.reg_t_l1,
                              cfg.reg_t_l2, t_bound, acc_dt, dtype, G,
                              diag, WX, Tk, interpret=interpret,
                              reps=cfg.inner_reps)
            # negative L1 can grow the zero-padded columns; slice exactly
            T = Tk[:, :d]

        # ---------------- W-phase --------------------------------------
        if not cfg.fix_W:
            G2 = jnp.dot(T, T.T, preferred_element_type=acc_dt)
            diag2 = jnp.diagonal(G2).reshape(k, 1)
            # (k, n) directly — no transpose of the GEMM output needed
            if qx is not None:
                XTt = qx_w_numerator(T, qx, acc_dt)
            else:
                Tx = T.astype(X.dtype) if x_narrow else T
                XTt = lax.dot_general(Tx, X, (((1,), (1,)), ((), ())),
                                      preferred_element_type=acc_dt)
            Wt = W.T
            if npad != n:
                XTt = jnp.zeros((k, npad), acc_dt).at[:, :n].set(XTt)
                Wt = jnp.zeros((k, npad), dtype).at[:, :n].set(Wt)
            ub = None
            if cfg.w_row_sum_is_vector:
                ub = jnp.zeros((1, npad), acc_dt).at[0, :n].set(
                    w_row_sum_vec.astype(acc_dt))
            Wt = _gs_call(k, bn, npad // bn, cfg.reg_w_l1, cfg.reg_w_l2,
                          w_bound, acc_dt, dtype, G2, diag2, XTt, Wt,
                          ub=ub, interpret=interpret,
                          reps=cfg.inner_reps)
            W = Wt[:, :n].T

        # per-iteration W row projection (reference nmf.py:481-484), same
        # XLA tail as the other sweeps
        if (cfg.project_W_each_iter and not cfg.fix_W
                and (cfg.w_row_sum is not None or cfg.w_row_sum_is_vector)):
            if cfg.w_row_sum_is_vector:
                s_vec = w_row_sum_vec.astype(dtype)
            else:
                s_vec = jnp.full((n,), cfg.w_row_sum, dtype=dtype)
            W = jax.vmap(_proj_simplex_core)(W, s_vec)

        return W, T, key, resets_left

    if cfg.matmul_precision is not None:
        _sweep_body = sweep

        def sweep(*args):
            with jax.default_matmul_precision(cfg.matmul_precision):
                return _sweep_body(*args)

    return jax.jit(sweep)
