"""Multi-chip masked WRRI sweep: per-device fused Pallas kernels + ICI psum.

Combines the two scale mechanisms of this framework:

- within a chip, the fused streaming kernels of
  :mod:`rri_nmf_tpu.ops.sweep_pallas` (one pass over the local residual
  tile per topic phase, rank-one bookkeeping deferred and fused);
- across chips, a ``shard_map`` over a ``(dp, tp)`` mesh where the ONLY
  communication per topic is four ``psum``s of the reduction vectors —
  two ``(d_local,)`` vectors over ``dp`` for the T-phase
  (``wᵀ(M⊙R)`` and ``(w²)ᵀM``) and two ``(n_local,)`` vectors over ``tp``
  for the W-phase (``(M⊙R)·t`` and ``M·t²``). The rank-one residual
  updates are entirely local: the pending ``dw`` lives on the ``dp`` axis
  and ``t_new`` on the ``tp`` axis, so their outer product is
  shard-diagonal. This is exactly the north-star communication pattern
  (BASELINE.json: "per-topic inner products reduce via psum over ICI").

Layouts (matching :mod:`rri_nmf_tpu.parallel.mesh`):
``X, M: P(dp, tp)``; ``W: P(dp, None)``; ``T: P(None, tp)``.

Global shapes are zero-padded to ``(BN·|dp|, BD·|tp|)`` multiples once per
sweep; padded mask entries are zero and vanish from every reduction.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

try:
    from jax import shard_map              # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from rri_nmf_tpu.matrixops import EPS_DIV_BY_ZERO, _proj_simplex_core
from rri_nmf_tpu.ops.sweep_pallas import BN, BD, _phase_a, _phase_b, \
    _round_up, supports_pallas


def supports_sharded_pallas(cfg) -> bool:
    """Config coverage of the shard_map'd fused sweep. Beyond the
    single-device kernel's restrictions it excludes per-row W bounds (the
    bound vector would need dp-aligned padding), the T-row drift
    re-projection (a cross-shard sort; the XLA mesh path handles that
    config instead), and topic resets under ``fix_T`` (the single-device
    W-only variant supports the transform preset's 'random' resets, but a
    mesh reset draws a global (n,) column stream — the XLA mesh sweep
    keeps that config)."""
    return (supports_pallas(cfg) and not cfg.w_row_sum_is_vector
            and (not cfg.fix_T or cfg.reset_topic_method is None)
            and not (cfg.project_T_each_iter and cfg.t_row_sum))


def _qf_min_vector_psum(w, c, s, ub, axis):
    """qf_min's vector-curvature branch with the l1 norm psum'd over the
    mesh axis the solution vector is sharded on (semantics of
    ``optimization.qf_min_vector_c``)."""
    if s:
        ub_eff = min(ub, s) if ub else s
    else:
        ub_eff = ub
    denom_safe = jnp.where(c > 0, c, 1.0) + EPS_DIV_BY_ZERO
    x = jnp.where(c > 0, jnp.maximum(-w, 0.0) / denom_safe, 0.0)
    if ub_eff is not None:
        x = jnp.minimum(x, ub_eff)
    nx = lax.psum(jnp.sum(x), axis)
    if s is not None:
        x = jnp.where(nx > 0, s * x / jnp.where(nx > 0, nx, 1.0), x)
    return x, nx


@lru_cache(maxsize=16)
def make_sharded_masked_sweep_pallas(cfg, mesh, interpret=False):
    """Build the mesh-sharded fused masked sweep.

    Same call signature as the single-device sweeps::

        sweep(X, W, T, key, resets_left, reset_key, W_mat)
            -> (W, T, key, resets_left)

    Inputs may be given with any sharding; they are zero-padded to device
    tile multiples and ``device_put`` to the canonical layouts inside.
    """
    assert supports_sharded_pallas(cfg), \
        'config not supported by the sharded Pallas sweep'
    k = cfg.k
    dp, tp = mesh.axis_names
    dp_size, tp_size = mesh.devices.shape

    def local_sweep(X, W, T, key, resets_left, W_mat, n_true, d_true):
        # everything here is per-device code on local tiles
        R = X - W @ T                       # (n_loc, d_loc): local GEMM of
        # row-sharded W against col-sharded T — no communication
        n_loc = X.shape[0]
        d_loc = X.shape[1]
        dtype = X.dtype

        # validity of this device's coordinates against the TRUE global
        # shape: the per-coordinate solves must never see the zero-padded
        # tails — with a negative L1 regularizer a padded coordinate
        # (numer = -reg_l1 > 0) would pick up phantom mass that corrupts
        # the psum'd sum-to-s rescale and the scale transfer (same root
        # cause as the single-device masked kernel fix)
        row_ok = (lax.axis_index(dp) * n_loc + jnp.arange(n_loc)) < n_true
        col_ok = (lax.axis_index(tp) * d_loc + jnp.arange(d_loc)) < d_true

        pend_dw = jnp.zeros((n_loc,), dtype)
        pend_t = jnp.zeros((d_loc,), dtype)

        if cfg.fix_T:
            # masked-inference fast path (W-phase only; the sharded form
            # of ops/sweep_pallas.py's fix_T variant — reference
            # sklearn_interface.py:144-156): per topic ONE fused local
            # pass (w_eff = 0 disables kernel B's T-side update) and two
            # (n_loc,) psums over tp.
            zeros_n = jnp.zeros((n_loc,), dtype)

            def topic_body_fix_t(t, carry):
                W, T, R, pend_dw, pend_t = carry
                w = W[:, t]
                t_t = T[t]
                R, Rt0, mt2 = _phase_b(R, W_mat, pend_dw, zeros_n,
                                       pend_t, t_t, interpret)
                Rt0 = lax.psum(Rt0.reshape(-1), tp)
                mt2 = lax.psum(mt2.reshape(-1), tp)
                Rt = Rt0 + w.astype(Rt0.dtype) * mt2

                numer_w = jnp.where(row_ok, Rt - cfg.reg_w_l1, -1.0)
                denom_w = jnp.where(row_ok, mt2 + cfg.reg_w_l2, 1.0)
                w_new, _ = _qf_min_vector_psum(
                    -numer_w, denom_w, s=None, ub=cfg.w_row_sum, axis=dp)
                W = W.at[:, t].set(w_new.astype(dtype))
                return (W, T, R, w - w_new.astype(dtype), t_t)

            W, T, R, pend_dw, pend_t = lax.fori_loop(
                0, k, topic_body_fix_t, (W, T, R, pend_dw, pend_t))
            if cfg.project_W_each_iter and cfg.w_row_sum is not None:
                s_vec = jnp.full((n_loc,), cfg.w_row_sum, dtype=dtype)
                W = jax.vmap(_proj_simplex_core)(W, s_vec)
            return W, T

        def topic_body(t, carry):
            W, T, R, pend_dw, pend_t = carry
            w = W[:, t]

            R, wR0, nw = _phase_a(R, W_mat, pend_dw, pend_t, w, interpret)
            wR0 = lax.psum(wR0.reshape(-1), dp)
            nw = lax.psum(nw.reshape(-1), dp)
            wR = wR0 + T[t] * nw

            numer = jnp.where(col_ok, wR - cfg.reg_t_l1, -1.0)
            denom = jnp.where(col_ok, nw + cfg.reg_t_l2, 1.0)
            t_new, nt1 = _qf_min_vector_psum(
                -numer, denom, s=cfg.t_update_s, ub=cfg.t_row_sum, axis=tp)
            t_old = T[t]
            if cfg.scale_transfer:
                W = W.at[:, t].multiply(nt1.astype(dtype))
                w_eff = w * nt1.astype(dtype)
            else:
                w_eff = w
            T = T.at[t].set(t_new.astype(dtype))

            R, Rt0, mt2 = _phase_b(R, W_mat, w, w_eff, t_old, T[t],
                                   interpret)
            Rt0 = lax.psum(Rt0.reshape(-1), tp)
            mt2 = lax.psum(mt2.reshape(-1), tp)
            Rt = Rt0 + w_eff.astype(Rt0.dtype) * mt2

            numer_w = jnp.where(row_ok, Rt - cfg.reg_w_l1, -1.0)
            denom_w = jnp.where(row_ok, mt2 + cfg.reg_w_l2, 1.0)
            w_new, _ = _qf_min_vector_psum(
                -numer_w, denom_w, s=None, ub=cfg.w_row_sum, axis=dp)
            W = W.at[:, t].set(w_new.astype(dtype))

            pend_dw = w_eff - w_new.astype(dtype)
            pend_t = T[t]
            return W, T, R, pend_dw, pend_t

        W, T, R, pend_dw, pend_t = lax.fori_loop(
            0, k, topic_body, (W, T, R, pend_dw, pend_t))

        # per-iteration W row projection (reference nmf.py:481-484): W rows
        # are dp-local, so each device projects its own rows with no
        # communication. Padded rows project to garbage but are sliced away
        # by the caller.
        if cfg.project_W_each_iter and cfg.w_row_sum is not None:
            s_vec = jnp.full((n_loc,), cfg.w_row_sum, dtype=dtype)
            W = jax.vmap(_proj_simplex_core)(W, s_vec)
        return W, T

    sharded = shard_map(
        local_sweep, mesh=mesh,
        in_specs=(P(dp, tp), P(dp, None), P(None, tp), P(), P(), P(dp, tp),
                  P(), P()),
        out_specs=(P(dp, None), P(None, tp)),
        check_vma=False)  # pallas_call outputs carry no varying-axis info

    def sweep(X, W, T, key, resets_left, reset_key, *extras):
        W_mat = extras[0]
        n, d = X.shape
        dtype = X.dtype
        npad = _round_up(n, BN * dp_size)
        dpad = _round_up(d, BD * tp_size)

        # skip the O(nd) repad when the shapes already sit on the mesh
        # quanta (same policy as sharded_dense; the pad is loop-invariant
        # under grouped dispatch but per-iteration fits pay it per sweep)
        aligned = (npad == n and dpad == d)
        Xp = X if aligned else \
            jnp.zeros((npad, dpad), dtype).at[:n, :d].set(X)
        Mp = W_mat if aligned else \
            jnp.zeros((npad, dpad), dtype).at[:n, :d].set(W_mat)
        Wp = W if npad == n else jnp.zeros((npad, k), dtype).at[:n].set(W)
        Tp = T if dpad == d else jnp.zeros((k, dpad), dtype).at[:, :d].set(T)

        Xp = lax.with_sharding_constraint(Xp, NamedSharding(mesh, P(dp, tp)))
        Mp = lax.with_sharding_constraint(Mp, NamedSharding(mesh, P(dp, tp)))
        Wp = lax.with_sharding_constraint(Wp, NamedSharding(mesh,
                                                            P(dp, None)))
        Tp = lax.with_sharding_constraint(Tp, NamedSharding(mesh,
                                                            P(None, tp)))

        Wp, Tp = sharded(Xp, Wp, Tp, key, resets_left, Mp,
                         jnp.asarray(n, jnp.int32), jnp.asarray(d, jnp.int32))
        return Wp[:n], Tp[:, :d], key, resets_left

    return jax.jit(sweep)
