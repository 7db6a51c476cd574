"""Mesh-sharded Gram-phase masked (WRRI) sweep.

Distribution of :mod:`rri_nmf_tpu.ops.sweep_masked_gram` (see that module
for the Gram-tensor algebra and the measured ~85x-vs-interleaved record
that motivates it). Round 4 left the Gram path single-device: a
distributed recommender fit fell back to the interleaved O(nnz) mesh
sweep (``parallel/masked_sparse_mesh.py``), whose per-topic
gather/segment-sum streams measure ~0.4 GB/s effective on TPU — i.e. the
mesh path was ~85x slower per sweep than ONE chip's Gram path at the
round-4 record shape. This module closes that gap (round-5 VERDICT
item 2).

Layout — identical to the interleaved masked mesh sweep:

- observations partitioned by ROW block: device ``i`` owns the entries
  with ``row // n_loc == i``, stored with LOCAL row indices and global
  column indices (mask/value padding entries carry ``m = x = 0`` and
  vanish from every contraction);
- ``W`` row-sharded ``P(dp, None)``, ``T`` replicated; the mesh must be
  ``(n_devices, 1)``.

Communication — ONE psum per T-phase, NOTHING in the W-phase:

- The T-phase tensors ``A = Wᵀ(M⊙X)`` (k, d) and
  ``Γ[t,s] = (w_t ⊙ w_s)ᵀ M`` (k(k+1)/2 unique pairs, d) are
  column-keyed sums over observations, so each device contracts its row
  block against its local W rows and ONE ``psum`` of the stacked
  ``(k + k(k+1)/2, d)`` partials replicates them; the whole T-phase
  Gauss-Seidel loop then runs replicated (pure dense vector math,
  identical on every device — the same pattern as the interleaved mesh
  sweep's T rows, but ONE collective per PHASE instead of one per
  TOPIC).
- The W-phase tensors ``C = (M⊙X)Tᵀ`` and ``Θ[t,s] = M (t_t ⊙ t_s)``
  are row-keyed: fully device-local under row partitioning. The W-phase
  moves ZERO bytes over ICI.

So a sweep's ICI traffic is ``(k + k(k+1)/2) · d`` accumulator words,
independent of nnz and of n — the Γ/Θ chunk contractions themselves are
embarrassingly row-parallel (they are plan-partitioned chunk sums).

Backends per device (same two as the single-device module): ``'mxu'``
runs the tile-bucketed one-hot chunk kernel on per-device
:class:`~rri_nmf_tpu.ops.sparse_mxu.ContractPlan` segments under
``shard_map`` (plans are padded to a common chunk count across devices —
padding groups replicate the last real group's output tile with zero
values, so they accumulate exact zeros); ``'segsum'`` is the f64-exact
XLA segment-sum oracle for the CPU suite.

Restrictions beyond the single-device Gram sweep: no per-row
``w_row_sum`` vector (it would need dp-aligned padding), matching the
interleaved masked mesh sweep's contract. Parity with the single-device
Gram sweep is pinned at 1e-12 f64 on the 8-device virtual mesh in
``tests/test_masked_gram_mesh.py``.

Reference anchor: the reference's masked path is a single-process
interleaved loop (``/root/reference/src/rri_nmf/nmf.py:687-746``); it
has no distributed form — this layer is blueprint mandate (SURVEY §2.2),
not reference parity.
"""

from functools import lru_cache
from typing import Any, Optional, Tuple

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

try:
    from jax import shard_map              # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from rri_nmf_tpu.matrixops import (_proj_simplex_core,
    reproject_row_if_drifted)
from rri_nmf_tpu.optimization import qf_min_vector_c
from rri_nmf_tpu.ops.sparse_mxu import ContractPlan, _widen_i32
from rri_nmf_tpu.ops.sweep_masked_gram import (
    MAX_PREFETCH_CHUNKS, TILE, _interpret_default, _round8, _sym_pairs)
from rri_nmf_tpu.ops.sweep_masked_sparse import _PAD_TO
from rri_nmf_tpu.ops.sweep_xla import SweepConfig, resolve_mixed_dtypes
from rri_nmf_tpu.parallel.masked_sparse_mesh import ShardedMaskedCOO

# observation-chunk size for the segsum backend's (chunk, k²) temporaries
_SEG_CHUNK = 1 << 16


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ShardedMaskedGramPlan:
    """Row-block partitioned observed set + per-device contraction plans.

    ``coo`` is the :class:`ShardedMaskedCOO` block grid (the segsum
    backend's input and the objective fallback). With ``backend='mxu'``,
    ``m_t``/``m_w`` are tuples of per-SEGMENT stacked
    :class:`ContractPlan`s whose every field carries a leading ``dp``
    axis (sharded ``P(dp, None)``); ``mx_t_vals``/``mx_w_vals`` are
    matching tuples of ``(dp, ·)`` value arrays (mask ⊙ X) in the same
    chunk-slot layout. ``sum_mx2`` is the replicated ``Σ m x²`` scalar.
    """
    coo: ShardedMaskedCOO
    m_t: Optional[Any]
    m_w: Optional[Any]
    mx_t_vals: Optional[Any]
    mx_w_vals: Optional[Any]
    sum_mx2: jnp.ndarray
    shape: Tuple[int, int]
    n_loc: int
    nnz: int
    group: int
    backend: str

    def tree_flatten(self):
        return ((self.coo, self.m_t, self.m_w, self.mx_t_vals,
                 self.mx_w_vals, self.sum_mx2),
                (self.shape, self.n_loc, self.nnz, self.group,
                 self.backend))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, shape=aux[0], n_loc=aux[1], nnz=aux[2],
                   group=aux[3], backend=aux[4])


def _pad_plan_np(arrays, ngroups_to, group, C):
    """Pad a host plan (``_plan_direction_np`` output) to ``ngroups_to``
    groups by replicating the LAST group's output tile with zero values
    (``ftile = 0``). A zero-valued revisit of an already-visited tile
    accumulates an exact zero — unlike padding with tile 0, which would
    RE-INITIALIZE tile 0's partial if the padding group's ``is_first``
    fired after real groups wrote it."""
    vals, glo, slo, ftile, otile, mask = arrays
    ngroups = otile.shape[0]
    extra = ngroups_to - ngroups
    if extra == 0:
        return arrays
    gc = group * C
    vals = np.concatenate(
        [vals, np.zeros((1, extra * gc), vals.dtype)], axis=1)
    glo = np.concatenate(
        [glo, np.zeros((1, extra * gc), glo.dtype)], axis=1)
    slo = np.concatenate(
        [slo, np.zeros((1, extra * gc), slo.dtype)], axis=1)
    ftile = np.concatenate(
        [ftile, np.zeros(extra * group, ftile.dtype)])
    otile = np.concatenate(
        [otile, np.full(extra, otile[-1], otile.dtype)])
    return vals, glo, slo, ftile, otile, mask


def _stack_segments(per_dev, group, C, n_stiles, mesh, dtype,
                    ngroups_to=None, put=None):
    """Per-device host plans → tuple of per-segment stacked
    :class:`ContractPlan`s (every field (dp, ·), sharded ``P(dp, None)``)
    plus the matching tuple layout offsets. All devices are padded to a
    common group count, then split at identical
    :data:`MAX_PREFETCH_CHUNKS` boundaries so each segment is one
    uniformly-shaped ``pallas_call`` under shard_map. Each segment's
    touched-tile mask is recomputed per device from its own otile slice
    (padding groups revisit a real tile with zero values — marking it
    costs nothing).

    ``ngroups_to``/``put`` support the multi-controller assembly
    (``parallel.multihost.distribute_masked_coo``): a GLOBAL padded
    group count (allgathered max) and a local-slab→global-array
    placement function; defaults are the single-controller local max and
    ``jax.device_put``."""
    dp_ax = mesh.axis_names[0]
    s2 = NamedSharding(mesh, P(dp_ax, None))
    if put is None:
        def put(local):
            return jax.device_put(local, s2)
    if ngroups_to is None:
        ngroups_to = max(a[4].shape[0] for a in per_dev)
    max_g = MAX_PREFETCH_CHUNKS // group
    padded = [_pad_plan_np(a, ngroups_to, group, C) for a in per_dev]
    spad = n_stiles * TILE
    segs = []
    for g0 in range(0, ngroups_to, max_g):
        g1 = min(g0 + max_g, ngroups_to)
        gc0, gc1 = g0 * group * C, g1 * group * C
        vals = np.stack([a[0][0, gc0:gc1] for a in padded])
        glo = np.stack([a[1][0, gc0:gc1] for a in padded])
        slo = np.stack([a[2][0, gc0:gc1] for a in padded])
        ftile = np.stack([a[3][g0 * group:g1 * group] for a in padded])
        otile = np.stack([a[4][g0:g1] for a in padded])
        masks = []
        for a in padded:
            mk = np.zeros((n_stiles, 1), dtype)
            mk[np.unique(a[4][g0:g1])] = 1.0
            masks.append(np.ascontiguousarray(np.broadcast_to(
                mk, (n_stiles, TILE)).reshape(-1)))
        mask = np.stack(masks)
        segs.append(ContractPlan(
            put(vals), _widen_i32(put(glo)), _widen_i32(put(slo)),
            put(ftile), put(otile), put(mask)))
    return tuple(segs)


def partition_masked_gram(X, W_mat, mesh, dtype, backend=None, group=8):
    """Host-side: (X, scipy-sparse W_mat) → :class:`ShardedMaskedGramPlan`
    on ``mesh`` (which must be (dp, 1)). Row-block partition identical to
    :func:`rri_nmf_tpu.parallel.masked_sparse_mesh.partition_masked_coo`;
    with ``backend='mxu'`` (TPU default) per-device chunk plans for the
    four Gram contractions ride along."""
    from rri_nmf_tpu.ops.sparse_mxu import _plan_direction_np
    from rri_nmf_tpu.ops.sweep_masked_sparse import masked_coo_host_arrays
    if backend is None:
        backend = 'mxu' if jax.default_backend() == 'tpu' else 'segsum'
    dp_size, tp_size = mesh.devices.shape
    assert tp_size == 1, 'masked Gram mesh sweeps are row-partitioned'
    rows_a, cols_a, x_a, m_a, (n, d), nnz = \
        masked_coo_host_arrays(X, W_mat, dtype)
    rows = rows_a[:nnz].astype(np.int64)
    cols = cols_a[:nnz]
    x = x_a[:nnz]
    m = m_a[:nnz]

    n_loc = -(-n // dp_size)
    # rows arrive CSR-sorted → contiguous per-device slices
    blk = rows // n_loc
    counts = np.bincount(blk, minlength=dp_size)
    starts = np.concatenate([[0], np.cumsum(counts)])
    mmax = max(int(counts.max()), 1)
    mmax += (-mmax) % _PAD_TO

    r_b = np.zeros((dp_size, mmax), dtype=np.int32)
    c_b = np.full((dp_size, mmax), max(d - 1, 0), dtype=np.int32)
    x_b = np.zeros((dp_size, mmax), dtype=dtype)
    m_b = np.zeros((dp_size, mmax), dtype=dtype)
    for b in range(dp_size):
        lo, hi = starts[b], starts[b + 1]
        cnt = hi - lo
        r_b[b, :cnt] = (rows[lo:hi] % n_loc).astype(np.int32)
        c_b[b, :cnt] = cols[lo:hi]
        x_b[b, :cnt] = x[lo:hi]
        m_b[b, :cnt] = m[lo:hi]
        if cnt:
            # sorted-pad (see partition_masked_coo): keep the local row
            # stream non-decreasing for sorted-scatter lowerings
            r_b[b, cnt:] = r_b[b, cnt - 1]

    dp_ax, _tp = mesh.axis_names
    s = NamedSharding(mesh, P(dp_ax, None))
    coo = ShardedMaskedCOO(
        jax.device_put(r_b, s), jax.device_put(c_b, s),
        jax.device_put(x_b, s), jax.device_put(m_b, s),
        shape=(n, d), n_loc=n_loc, nnz=int(rows.shape[0]))
    sum_mx2 = jax.device_put(
        jnp.asarray(np.float64(m).dot(np.float64(x) ** 2),
                    dtype=jnp.promote_types(dtype, jnp.float32)),
        NamedSharding(mesh, P()))
    if backend == 'segsum':
        return ShardedMaskedGramPlan(
            coo=coo, m_t=None, m_w=None, mx_t_vals=None, mx_w_vals=None,
            sum_mx2=sum_mx2, shape=(n, d), n_loc=n_loc, nnz=int(nnz),
            group=group, backend='segsum')
    if backend != 'mxu':
        raise ValueError("backend must be 'mxu' or 'segsum', got %r"
                         % (backend,))

    n_rt_loc = -(-n_loc // TILE)
    n_ct = -(-d // TILE)
    ndt = np.dtype(dtype)
    mx = (m * x).astype(ndt, copy=False)
    mv = m.astype(ndt, copy=False)

    def _per_dev(vals_src, g_rows, g_cols, ngt, nst):
        out = []
        for b in range(dp_size):
            lo, hi = starts[b], starts[b + 1]
            out.append(_plan_direction_np(
                g_rows[lo:hi], g_cols[lo:hi], vals_src[lo:hi],
                ngt, nst, TILE, group, ndt))
        return out

    rloc = (rows % n_loc).astype(np.int64)
    # t-direction: gather from local row tiles, scatter into column tiles
    m_t = _stack_segments(_per_dev(mv, rloc, cols, n_rt_loc, n_ct),
                          group, TILE, n_ct, mesh, ndt)
    mxt = _stack_segments(_per_dev(mx, rloc, cols, n_rt_loc, n_ct),
                          group, TILE, n_ct, mesh, ndt)
    # w-direction: gather from column tiles, scatter into local row tiles
    m_w = _stack_segments(_per_dev(mv, cols, rloc, n_ct, n_rt_loc),
                          group, TILE, n_rt_loc, mesh, ndt)
    mxw = _stack_segments(_per_dev(mx, cols, rloc, n_ct, n_rt_loc),
                          group, TILE, n_rt_loc, mesh, ndt)
    # the bucketing is deterministic in (g, s): the mask-valued and
    # (mask⊙X)-valued plans land in identical slot layouts, so only the
    # vals arrays need to ride along for A/C
    mx_t_vals = tuple(p.vals for p in mxt)
    mx_w_vals = tuple(p.vals for p in mxw)
    return ShardedMaskedGramPlan(
        coo=coo, m_t=m_t, m_w=m_w, mx_t_vals=mx_t_vals,
        mx_w_vals=mx_w_vals, sum_mx2=sum_mx2, shape=(n, d), n_loc=n_loc,
        nnz=int(nnz), group=group, backend='mxu')


def supports_sharded_masked_gram(cfg: SweepConfig, mesh) -> bool:
    from rri_nmf_tpu.ops.sweep_masked_gram import supports_masked_gram
    return (supports_masked_gram(cfg)
            and not cfg.w_row_sum_is_vector
            and mesh.devices.shape[1] == 1)


# ---------------------------------------------------------------------------
# per-device contraction backends (local blocks)
# ---------------------------------------------------------------------------

def _seg_local(rows, cols, x, m, P_of, out_dim, width, seg_local, acc):
    """Chunked local segment-sum: ``P_of(slice) -> (chunk, width)``
    contributions summed into ``(out_dim, width)`` over the observation
    ids ``seg_local`` (bounds the temporary to ``_SEG_CHUNK`` rows)."""
    mloc = int(rows.shape[0])
    chunk = min(_SEG_CHUNK, mloc)
    full = mloc // chunk

    def blk(i, out):
        sl = (i * chunk,)
        vals = P_of(lax.dynamic_slice(rows, sl, (chunk,)),
                    lax.dynamic_slice(cols, sl, (chunk,)),
                    lax.dynamic_slice(m, sl, (chunk,)),
                    lax.dynamic_slice(x, sl, (chunk,)))
        ids = lax.dynamic_slice(seg_local, sl, (chunk,))
        return out.at[ids].add(vals)

    out = lax.fori_loop(0, full, blk, jnp.zeros((out_dim, width), acc))
    rem = mloc - full * chunk
    if rem:
        vals = P_of(rows[full * chunk:], cols[full * chunk:],
                    m[full * chunk:], x[full * chunk:])
        out = out.at[seg_local[full * chunk:]].add(vals)
    return out


def _seg_gram_t_local(rows, cols, x, m, W_l, d, acc):
    """Local (A_part, Γp_part): column-keyed sums over this device's
    observations against its local W rows. Returns the stacked
    ``(k + k(k+1)/2, d)`` partial (psum'd by the caller)."""
    k = W_l.shape[1]
    it, is_, _ = _sym_pairs(k)
    it = jnp.asarray(it)
    is_ = jnp.asarray(is_)
    kp = int(it.shape[0])
    Wa = W_l.astype(acc)

    def vals(r, c, mm, xx):
        Prow = Wa[r]                                  # (chunk, k)
        kr = Prow[:, it] * Prow[:, is_]               # (chunk, kp)
        a = Prow * (mm.astype(acc) * xx.astype(acc))[:, None]
        return jnp.concatenate([a, kr * mm.astype(acc)[:, None]], axis=1)

    out = _seg_local(rows, cols, x, m, vals, d, k + kp, cols, acc)
    return out.T                                       # (k + kp, d)


def _seg_gram_w_local(rows, cols, x, m, T, n_loc, acc):
    """Local (C_l, Θp_l): row-keyed sums — fully device-local."""
    k = T.shape[0]
    it, is_, _ = _sym_pairs(k)
    it = jnp.asarray(it)
    is_ = jnp.asarray(is_)
    kp = int(it.shape[0])
    Ta = T.astype(acc)

    def vals(r, c, mm, xx):
        Prow = Ta[:, c].T                             # (chunk, k)
        kr = Prow[:, it] * Prow[:, is_]
        cpart = Prow * (mm.astype(acc) * xx.astype(acc))[:, None]
        return jnp.concatenate(
            [cpart, kr * mm.astype(acc)[:, None]], axis=1)

    out = _seg_local(rows, cols, x, m, vals, n_loc, k + kp, rows, acc)
    return out.T                                       # (k + kp, n_loc)


def _seg_gram_t_A_local(rows, cols, x, m, W_l, d, acc):
    """Local A partial (k, d) alone (panel mode)."""
    Wa = W_l.astype(acc)

    def vals(r, c, mm, xx):
        return Wa[r] * (mm.astype(acc) * xx.astype(acc))[:, None]

    return _seg_local(rows, cols, x, m, vals, d, W_l.shape[1], cols,
                      acc).T


def _seg_gram_t_panel_local(rows, cols, x, m, W_l, d, t0, p, acc):
    """Local Γ[t0:t0+p] partial (p, k, d) — psum'd by the caller."""
    k = W_l.shape[1]
    Wa = W_l.astype(acc)

    def vals(r, c, mm, xx):
        P = Wa[r]
        KR = (P[:, t0:t0 + p, None] * P[:, None, :]).reshape(-1, p * k)
        return KR * mm.astype(acc)[:, None]

    out = _seg_local(rows, cols, x, m, vals, d, p * k, cols, acc)
    return out.T.reshape(p, k, d)


def _seg_gram_w_C_local(rows, cols, x, m, T, n_loc, acc):
    """Local C (k, n_loc) alone — row-keyed, stays local."""
    Ta = T.astype(acc)

    def vals(r, c, mm, xx):
        return Ta[:, c].T * (mm.astype(acc) * xx.astype(acc))[:, None]

    return _seg_local(rows, cols, x, m, vals, n_loc, T.shape[0], rows,
                      acc).T


def _seg_gram_w_panel_local(rows, cols, x, m, T, n_loc, t0, p, acc):
    """Local Θ[t0:t0+p] (p, k, n_loc) — row-keyed, stays local."""
    k = T.shape[0]
    Ta = T.astype(acc)

    def vals(r, c, mm, xx):
        P = Ta[:, c].T
        KR = (P[:, t0:t0 + p, None] * P[:, None, :]).reshape(-1, p * k)
        return KR * mm.astype(acc)[:, None]

    out = _seg_local(rows, cols, x, m, vals, n_loc, p * k, rows, acc)
    return out.T.reshape(p, k, n_loc)


def _mxu_contract_local(segs, vals_override, F, acc, interpret, group):
    """Sum the local chunk contraction over the per-segment plans; each
    plan field arrives as this device's (1, ·) slice of the stacked
    array."""
    from rri_nmf_tpu.ops.sparse_mxu import mxu_contract
    out = None
    for i, p in enumerate(segs):
        local = ContractPlan(
            vals=(vals_override[i] if vals_override is not None
                  else p.vals),
            gloc=p.gloc, sloc=p.sloc,
            ftile=p.ftile[0], otile=p.otile[0], mask=p.mask)
        part = mxu_contract(local, F, acc_dt=acc, interpret=interpret,
                            group=group)
        out = part if out is None else out + part
    return out


def _mxu_gram_t_local(plan_segs, mx_vals, W_l, d, acc, interpret, group):
    k = W_l.shape[1]
    n_loc = W_l.shape[0]
    npad = -(-n_loc // TILE) * TILE
    Wa = W_l.astype(acc)
    Wt = jnp.zeros((_round8(k), npad), acc).at[:k, :n_loc].set(Wa.T)
    A = _mxu_contract_local(plan_segs, mx_vals, Wt, acc, interpret,
                            group)[:k]
    it, is_, _ = _sym_pairs(k)
    kp = it.shape[0]
    WW = Wa[:, it] * Wa[:, is_]
    F = jnp.zeros((_round8(kp), npad), acc).at[:kp, :n_loc].set(WW.T)
    Gp = _mxu_contract_local(plan_segs, None, F, acc, interpret,
                             group)[:kp]
    return jnp.concatenate([A, Gp], axis=0)[:, :d]     # (k + kp, d)


def _mxu_gram_t_A_local(plan_segs, mx_vals, W_l, d, acc, interpret,
                        group):
    k = W_l.shape[1]
    n_loc = W_l.shape[0]
    npad = -(-n_loc // TILE) * TILE
    Wt = jnp.zeros((_round8(k), npad), acc).at[:k, :n_loc].set(
        W_l.astype(acc).T)
    return _mxu_contract_local(plan_segs, mx_vals, Wt, acc, interpret,
                               group)[:k, :d]


def _mxu_gram_t_panel_local(plan_segs, W_l, d, t0, p, acc, interpret,
                            group):
    k = W_l.shape[1]
    n_loc = W_l.shape[0]
    npad = -(-n_loc // TILE) * TILE
    Wa = W_l.astype(acc)
    KR = (Wa[:, t0:t0 + p, None] * Wa[:, None, :]).reshape(n_loc, p * k)
    F = jnp.zeros((_round8(p * k), npad), acc).at[:p * k, :n_loc].set(
        KR.T)
    out = _mxu_contract_local(plan_segs, None, F, acc, interpret,
                              group)[:p * k, :d]
    return out.reshape(p, k, d)


def _mxu_gram_w_C_local(plan_segs, mx_vals, T, n_loc, acc, interpret,
                        group):
    k, d = T.shape
    dpad = -(-d // TILE) * TILE
    Tp = jnp.zeros((_round8(k), dpad), acc).at[:k, :d].set(T.astype(acc))
    return _mxu_contract_local(plan_segs, mx_vals, Tp, acc, interpret,
                               group)[:k, :n_loc]


def _mxu_gram_w_panel_local(plan_segs, T, n_loc, t0, p, acc, interpret,
                            group):
    k, d = T.shape
    dpad = -(-d // TILE) * TILE
    Ta = T.astype(acc)
    KR = (Ta[t0:t0 + p, None, :] * Ta[None, :, :]).reshape(p * k, d)
    F = jnp.zeros((_round8(p * k), dpad), acc).at[:p * k, :d].set(KR)
    out = _mxu_contract_local(plan_segs, None, F, acc, interpret,
                              group)[:p * k, :n_loc]
    return out.reshape(p, k, n_loc)


def _mxu_gram_w_local(plan_segs, mx_vals, T, n_loc, acc, interpret,
                      group):
    k = T.shape[0]
    d = T.shape[1]
    dpad = -(-d // TILE) * TILE
    Ta = T.astype(acc)
    Tp = jnp.zeros((_round8(k), dpad), acc).at[:k, :d].set(Ta)
    C = _mxu_contract_local(plan_segs, mx_vals, Tp, acc, interpret,
                            group)[:k]
    it, is_, _ = _sym_pairs(k)
    kp = it.shape[0]
    TT = Ta[it] * Ta[is_]
    F = jnp.zeros((_round8(kp), dpad), acc).at[:kp, :d].set(TT)
    Hp = _mxu_contract_local(plan_segs, None, F, acc, interpret,
                             group)[:kp]
    return jnp.concatenate([C, Hp], axis=0)[:, :n_loc]  # (k + kp, n_loc)


# ---------------------------------------------------------------------------
# the sweep
# ---------------------------------------------------------------------------

@lru_cache(maxsize=16)
def make_sharded_masked_gram_sweep(cfg: SweepConfig, mesh,
                                   backend: str = 'segsum',
                                   group: int = 8,
                                   interpret: Optional[bool] = None,
                                   panel: Optional[int] = None):
    """shard_map'd Gram-phase masked sweep. Driver call signature::

        sweep(plan, W, T, key, resets_left, reset_key) ->
            (W, T, key, resets_left)

    Exactly the single-device Gram sweep's Gauss-Seidel updates (same
    topic order, same qf_min subproblems) — parity at f64 roundoff.

    ``panel``: build Γ/Θ in (panel, k, ·) tiles past the full-tensor
    budget, exactly like the single-device panel sweep
    (``ops.sweep_masked_gram._make_panel_sweep``) — each Γ panel costs
    one psum of (panel·k, d) partials (same total bytes per phase as
    the full-tensor psum), Θ panels stay device-local.
    """
    assert supports_sharded_masked_gram(cfg, mesh), \
        'config not supported by the masked Gram mesh sweep'
    k = cfg.k
    if interpret is None:
        interpret = _interpret_default()
    if panel is not None and not (1 <= panel < k):
        raise ValueError('panel must satisfy 1 <= panel < k')
    dp_ax, _tp = mesh.axis_names
    dp_size = mesh.devices.shape[0]
    _, _, unpack = _sym_pairs(k)
    unpack_mat = unpack.reshape(k, k)                  # host np, static

    def _local_panel(rows, cols, x, m, W_l, T, key, m_t, m_w, mx_t,
                     mx_w):
        rows = rows[0]
        cols = cols[0]
        x = x[0]
        m = m[0]
        dtype, acc, _ = resolve_mixed_dtypes(W_l.dtype, W_l.dtype,
                                             cfg.matmul_precision)
        n_loc = W_l.shape[0]
        d = T.shape[1]

        if not cfg.fix_T:
            if backend == 'mxu':
                A = _mxu_gram_t_A_local(m_t, mx_t, W_l, d, acc,
                                        interpret, group)
            else:
                A = _seg_gram_t_A_local(rows, cols, x, m, W_l, d, acc)
            A = lax.psum(A, dp_ax)
            for _rep in range(cfg.inner_reps):
                for t0 in range(0, k, panel):
                    p = min(panel, k - t0)
                    # sequencing barrier (see _make_panel_sweep): the
                    # contraction reads only the frozen W_l, so without
                    # a dependency on the previous panel's topic loop
                    # the scheduler hoists every Γ panel live at once
                    (T, key), W_seq = lax.optimization_barrier(
                        ((T, key), W_l))
                    if backend == 'mxu':
                        Gpan = _mxu_gram_t_panel_local(
                            m_t, W_seq, d, t0, p, acc, interpret, group)
                    else:
                        Gpan = _seg_gram_t_panel_local(
                            rows, cols, x, m, W_seq, d, t0, p, acc)
                    Gpan = lax.psum(Gpan, dp_ax)

                    def t_topic(j, carry, t0=t0, Gpan=Gpan):
                        T, key = carry
                        t = t0 + j
                        Gt = lax.dynamic_slice(
                            Gpan, (j, 0, 0), (1, k, Gpan.shape[2]))[0]
                        corr = jnp.sum(Gt * T.astype(acc), axis=0) \
                            - Gt[t] * T[t].astype(acc)
                        wR = A[t] - corr
                        nw = Gt[t]
                        if cfg.dp_sigma is not None:
                            key, k1, k2 = jax.random.split(key, 3)
                            wR = wR + cfg.dp_sigma * jax.random.normal(
                                k1, wR.shape, wR.dtype)
                            nw = jnp.maximum(
                                nw + cfg.dp_sigma * jax.random.normal(
                                    k2, nw.shape, wR.dtype), 0.0)
                        numer = wR - cfg.reg_t_l1
                        denom = nw + cfg.reg_t_l2
                        t_new, _nt1 = qf_min_vector_c(
                            -numer, denom, s=cfg.t_update_s,
                            ub=cfg.t_row_sum)
                        t_stored = t_new.astype(dtype)
                        if cfg.t_row_sum and cfg.project_T_each_iter:
                            t_stored = reproject_row_if_drifted(
                                t_stored, cfg.t_row_sum, dtype)
                        return T.at[t].set(t_stored), key

                    T, key = lax.fori_loop(0, p, t_topic, (T, key))

        if not cfg.fix_W:
            if backend == 'mxu':
                C = _mxu_gram_w_C_local(m_w, mx_w, T, n_loc, acc,
                                        interpret, group)
            else:
                C = _seg_gram_w_C_local(rows, cols, x, m, T, n_loc, acc)
            for _rep in range(cfg.inner_reps):
                for t0 in range(0, k, panel):
                    p = min(panel, k - t0)
                    # same sequencing barrier (Θ panels read only the
                    # frozen T)
                    (W_l, key), T_seq = lax.optimization_barrier(
                        ((W_l, key), T))
                    if backend == 'mxu':
                        Hpan = _mxu_gram_w_panel_local(
                            m_w, T_seq, n_loc, t0, p, acc, interpret,
                            group)
                    else:
                        Hpan = _seg_gram_w_panel_local(
                            rows, cols, x, m, T_seq, n_loc, t0, p, acc)

                    def w_topic(j, carry, t0=t0, Hpan=Hpan):
                        W_l, key = carry
                        t = t0 + j
                        Ht = lax.dynamic_slice(
                            Hpan, (j, 0, 0), (1, k, Hpan.shape[2]))[0]
                        corr = jnp.sum(Ht * W_l.T.astype(acc), axis=0) \
                            - Ht[t] * W_l[:, t].astype(acc)
                        Rt = C[t] - corr
                        nt = Ht[t]
                        numer = Rt - cfg.reg_w_l1
                        denom = nt + cfg.reg_w_l2
                        w_new, _nw1 = qf_min_vector_c(
                            -numer, denom, s=None, ub=cfg.w_row_sum)
                        return W_l.at[:, t].set(w_new.astype(dtype)), key

                    W_l, key = lax.fori_loop(0, p, w_topic, (W_l, key))

        if (cfg.project_W_each_iter and not cfg.fix_W
                and cfg.w_row_sum is not None):
            s_vec = jnp.full((n_loc,), cfg.w_row_sum, dtype=W_l.dtype)
            W_l = jax.vmap(_proj_simplex_core)(W_l, s_vec)

        return W_l, T, key

    def _local(rows, cols, x, m, W_l, T, key, m_t, m_w, mx_t, mx_w):
        rows = rows[0]
        cols = cols[0]
        x = x[0]
        m = m[0]
        dtype, acc, _ = resolve_mixed_dtypes(W_l.dtype, W_l.dtype,
                                             cfg.matmul_precision)
        n_loc = W_l.shape[0]
        d = T.shape[1]
        upk = jnp.asarray(unpack_mat)

        # ---- T-phase: W frozen → local (A, Γ) partials, ONE psum ------
        if not cfg.fix_T:
            if backend == 'mxu':
                part = _mxu_gram_t_local(m_t, mx_t, W_l, d, acc,
                                         interpret, group)
            else:
                part = _seg_gram_t_local(rows, cols, x, m, W_l, d, acc)
            AG = lax.psum(part, dp_ax)
            A = AG[:k]
            Gp = AG[k:]                                # (kp, d)

            def t_topic(i, carry):
                T, key = carry
                t = i % k
                # Γ[t, :] = Gp[unpack[t]]: gather k pair-rows — never
                # materializes the full (k, k, d) tensor
                idx = lax.dynamic_slice(upk, (t, 0), (1, k))[0]
                Gt = Gp[idx]                           # (k, d)
                corr = jnp.sum(Gt * T.astype(acc), axis=0) \
                    - Gt[t] * T[t].astype(acc)
                wR = A[t] - corr
                nw = Gt[t]
                if cfg.dp_sigma is not None:
                    # replicated key → identical draws on every device
                    key, k1, k2 = jax.random.split(key, 3)
                    wR = wR + cfg.dp_sigma * jax.random.normal(
                        k1, wR.shape, wR.dtype)
                    nw = jnp.maximum(
                        nw + cfg.dp_sigma * jax.random.normal(
                            k2, nw.shape, wR.dtype), 0.0)
                numer = wR - cfg.reg_t_l1
                denom = nw + cfg.reg_t_l2
                t_new, _nt1 = qf_min_vector_c(
                    -numer, denom, s=cfg.t_update_s, ub=cfg.t_row_sum)
                t_stored = t_new.astype(dtype)
                if cfg.t_row_sum and cfg.project_T_each_iter:
                    t_stored = reproject_row_if_drifted(
                        t_stored, cfg.t_row_sum, dtype)
                return T.at[t].set(t_stored), key

            T, key = lax.fori_loop(0, cfg.inner_reps * k, t_topic,
                                   (T, key))

        # ---- W-phase: T frozen → (C, Θ) row-keyed, fully local --------
        if not cfg.fix_W:
            if backend == 'mxu':
                CH = _mxu_gram_w_local(m_w, mx_w, T, n_loc, acc,
                                       interpret, group)
            else:
                CH = _seg_gram_w_local(rows, cols, x, m, T, n_loc, acc)
            C = CH[:k]
            Hp = CH[k:]                                # (kp, n_loc)

            def w_topic(i, carry):
                W_l, key = carry
                t = i % k
                idx = lax.dynamic_slice(upk, (t, 0), (1, k))[0]
                Ht = Hp[idx]                           # (k, n_loc)
                corr = jnp.sum(Ht * W_l.T.astype(acc), axis=0) \
                    - Ht[t] * W_l[:, t].astype(acc)
                Rt = C[t] - corr
                nt = Ht[t]
                numer = Rt - cfg.reg_w_l1
                denom = nt + cfg.reg_w_l2
                w_new, _nw1 = qf_min_vector_c(-numer, denom, s=None,
                                              ub=cfg.w_row_sum)
                return W_l.at[:, t].set(w_new.astype(dtype)), key

            W_l, key = lax.fori_loop(0, cfg.inner_reps * k, w_topic,
                                     (W_l, key))

        if (cfg.project_W_each_iter and not cfg.fix_W
                and cfg.w_row_sum is not None):
            # ghost rows (no observations) are projected too but sliced
            # off by the caller before they feed anything
            s_vec = jnp.full((n_loc,), cfg.w_row_sum, dtype=W_l.dtype)
            W_l = jax.vmap(_proj_simplex_core)(W_l, s_vec)

        return W_l, T, key

    # mxu plan segments ride through shard_map as stacked (dp, ·) arrays
    def _plan_specs(plan):
        sharded = P(dp_ax, None)
        return (jax.tree_util.tree_map(lambda _: sharded, plan.m_t),
                jax.tree_util.tree_map(lambda _: sharded, plan.m_w),
                jax.tree_util.tree_map(lambda _: sharded,
                                       plan.mx_t_vals),
                jax.tree_util.tree_map(lambda _: sharded,
                                       plan.mx_w_vals))

    def sweep(plan, W, T, key, resets_left, reset_key, *extras):
        n, d = plan.shape
        n_pad = plan.n_loc * dp_size
        if n_pad != n:
            W = jnp.zeros((n_pad, W.shape[1]), W.dtype).at[:n].set(W)
        coo = plan.coo
        mt_spec, mw_spec, mxt_spec, mxw_spec = _plan_specs(plan)
        W_out, T_out, key = shard_map(
            _local if panel is None else _local_panel, mesh=mesh,
            in_specs=(P(dp_ax, None), P(dp_ax, None), P(dp_ax, None),
                      P(dp_ax, None), P(dp_ax, None), P(None, None),
                      P(), mt_spec, mw_spec, mxt_spec, mxw_spec),
            out_specs=(P(dp_ax, None), P(None, None), P()),
            check_vma=False)(
            coo.rows, coo.cols, coo.x_vals, coo.m_vals, W, T, key,
            plan.m_t, plan.m_w, plan.mx_t_vals, plan.mx_w_vals)
        if n_pad != n:
            W_out = W_out[:n]
        return W_out, T_out, key, resets_left

    if cfg.matmul_precision is not None:
        _sweep_body = sweep

        def sweep(*args):
            with jax.default_matmul_precision(cfg.matmul_precision):
                return _sweep_body(*args)

    return jax.jit(sweep)


def make_sharded_masked_gram_objective(mesh, backend='segsum', group=8,
                                       interpret=None,
                                       reg_w_l2=0.0, reg_t_l2=0.0,
                                       reg_w_l1=0.0, reg_t_l1=0.0,
                                       panel=None):
    """Masked objective over a :class:`ShardedMaskedGramPlan` through the
    Gram identity (one local C/Θ contraction + one scalar psum)::

        ‖√M ⊙ (X − WT)‖² = Σ m x² − 2 Σ_t w_tᵀ C[t]
                           + Σ_{t,s} w_tᵀ Θ[t,s] w_s

    ``panel``: accumulate the quadratic form in (panel, k, n_loc) Θ
    tiles (the mesh analog of the single-device panel objective).
    """
    if interpret is None:
        interpret = _interpret_default()
    dp_ax, _tp = mesh.axis_names
    dp_size = mesh.devices.shape[0]

    def _local(rows, cols, x, m, W_l, T, m_w, mx_w):
        _, acc, _ = resolve_mixed_dtypes(W_l.dtype, W_l.dtype)
        k = T.shape[0]
        n_loc = W_l.shape[0]
        Wa = W_l.astype(acc)
        if panel is not None:
            if backend == 'mxu':
                C = _mxu_gram_w_C_local(m_w, mx_w, T, n_loc, acc,
                                        interpret, group)
            else:
                C = _seg_gram_w_C_local(rows[0], cols[0], x[0], m[0],
                                        T, n_loc, acc)
            cross = jnp.sum(C * Wa.T)
            quad = jnp.zeros((), acc)
            for t0 in range(0, k, panel):
                p = min(panel, k - t0)
                # sequencing barrier (see the single-device objective)
                quad, T_seq = lax.optimization_barrier((quad, T))
                if backend == 'mxu':
                    Hpan = _mxu_gram_w_panel_local(
                        m_w, T_seq, n_loc, t0, p, acc, interpret,
                        group)
                else:
                    Hpan = _seg_gram_w_panel_local(
                        rows[0], cols[0], x[0], m[0], T_seq, n_loc,
                        t0, p, acc)
                quad = quad + jnp.einsum(
                    'tsi,it,is->', Hpan, Wa[:, t0:t0 + p], Wa)
        else:
            if backend == 'mxu':
                CH = _mxu_gram_w_local(m_w, mx_w, T, n_loc, acc,
                                       interpret, group)
            else:
                CH = _seg_gram_w_local(rows[0], cols[0], x[0], m[0], T,
                                       n_loc, acc)
            C = CH[:k]
            Hp = CH[k:]
            it, is_, _ = _sym_pairs(k)
            cross = jnp.sum(C * Wa.T)
            # Σ_{t,s} w_tᵀ Θ[t,s] w_s from the kp unique pairs:
            # off-diagonal pairs count twice
            pw = jnp.sum(Hp.T * (Wa[:, it] * Wa[:, is_]), axis=0)
            wgt = jnp.where(jnp.asarray(it) == jnp.asarray(is_),
                            1.0, 2.0).astype(acc)
            quad = jnp.sum(pw * wgt)
        part = (-2.0 * cross + quad) * 0.5 \
            + 0.5 * reg_w_l2 * jnp.sum(Wa ** 2) \
            + reg_w_l1 * jnp.sum(jnp.abs(Wa))
        return lax.psum(part, dp_ax).reshape(1)

    def objective(plan, W, T):
        n, d = plan.shape
        n_pad = plan.n_loc * dp_size
        if n_pad != n:
            W = jnp.zeros((n_pad, W.shape[1]), W.dtype).at[:n].set(W)
        sharded = P(dp_ax, None)
        mw_spec = jax.tree_util.tree_map(lambda _: sharded, plan.m_w)
        mxw_spec = jax.tree_util.tree_map(lambda _: sharded,
                                          plan.mx_w_vals)
        coo = plan.coo
        part = shard_map(
            _local, mesh=mesh,
            in_specs=(sharded, sharded, sharded, sharded, sharded,
                      P(None, None), mw_spec, mxw_spec),
            out_specs=P(None),
            check_vma=False)(
            coo.rows, coo.cols, coo.x_vals, coo.m_vals, W, T,
            plan.m_w, plan.mx_w_vals)[0]
        _, acc, _ = resolve_mixed_dtypes(W.dtype, W.dtype)
        Ta = T.astype(acc)
        return (0.5 * plan.sum_mx2 + part
                + 0.5 * reg_t_l2 * jnp.sum(Ta ** 2)
                + reg_t_l1 * jnp.sum(jnp.abs(Ta)))

    return jax.jit(objective)
