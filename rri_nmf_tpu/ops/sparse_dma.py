"""Manual-DMA (megablocks-style) sparse MXU contraction kernel.

Second-generation kernel for the beyond-HBM sparse contractions (see
``ops/sparse_mxu.py`` for the problem statement and the tile-bucketed
chunk layout both kernels share). The first-generation kernel drives the
Mosaic *pipeline* over chunk groups — one grid step per G chunks, factor
tiles fetched by scalar-prefetched ``BlockSpec`` index maps. Measured
cost was ~300-350 ns/chunk with a fixed per-grid-step overhead that
grouping only amortizes (ROADMAP round-3 note); the arithmetic itself
(2·C·128² one-hot build + 2·k·128² accumulate) bounds at ~270 ns/chunk
on this chip.

**Measured outcome (v5e, 50k×30k 0.5% k=128 — ROADMAP item closed):**
the hypothesis was WRONG. This kernel runs ~703 ns/chunk vs the one-hot
kernel's ~348 (64.5 vs 32.0 ms/direction;
``benchmarks/results_round3_sparse_dma.json``), invariant to factor
buffer depth 2/4/8 — so it is not DMA-latency-bound. The per-chunk cost
is the in-kernel ``fori``'s scalar work (semaphore wait, dynamic-slice
addressing, DMA issue) serializing with the ~300 ns of MXU compute,
exactly the work Mosaic's grid pipeline overlaps across grid steps for
the one-hot kernel. The one-hot kernel remains the default beyond-HBM
path; this module stays as a tested, exact alternative
(``nmf(sparse='dma')``) and as the reference implementation of the
manual-DMA pattern.

This kernel removes the per-step machinery instead of amortizing it:

1. **One grid step per used output tile** (not per chunk group). The
   (k, 128) output tile lives in registers/VMEM for the whole step and
   is written back exactly once — no first-visit/revisit predication.
2. **A ``fori_loop`` over the tile's chunks** with manually
   double-buffered ``pltpu.make_async_copy`` fetches: the (k, 128)
   factor tile for chunk ``c+1`` streams from HBM while chunk ``c``
   computes, and chunk metadata (values + local gather/scatter indices)
   streams in blocks of ``MBLK`` chunks on a second pair of buffers.
   Factor tiles are stored pre-tiled ``(n_gtiles, k, 128)`` so every
   fetch is one contiguous slab.
3. The per-chunk compute is identical to the one-hot kernel: the dense
   128×128 X-tile is rebuilt with two one-hot MXU contractions and
   accumulated as ``F_tile @ Xt`` (bf16 operands at bf16 storage, f32
   accumulation — ``preferred_element_type`` everywhere).

Host-side planning reuses ``sparse_mxu._plan_direction_np`` (same
output-tile-major chunk bucketing) and re-lays the chunk metadata for
DMA: values ``(1, nchunks·C)``, locals ``(2, nchunks·C)`` int32, plus
per-output-tile chunk offsets (CSR-like) for the in-kernel loop bounds.

Reference context: the reference has no sparse compute path at all (its
RS estimator densifies COO on the host, ``sklearn_interface.py:78-83``);
both kernels here are the TPU answer to SURVEY §5.7's scale axis.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rri_nmf_tpu.ops.sparse_mxu import (TILE, _plan_direction_np,
                                         _round_up, _run_starts)

# Chunk-metadata block size (chunks per metadata DMA). Plans are padded
# so a trailing metadata block may safely over-read; kernels may use any
# MBLK <= MBLK_MAX.
MBLK_MAX = 16


class DMAContractPlan(NamedTuple):
    """One contraction direction, laid out for manual DMA.

    vals:   (1, nchunks_pad·C) values, chunk-contiguous (C slots each).
    idx:    (2, nchunks_pad·C) int32 — row 0 the local gather index
            (position along the contracted axis within its 128-tile),
            row 1 the local scatter index.
    ftile:  (nchunks_pad,) int32 — factor tile to fetch per chunk.
    uotile: (n_used,) int32 — the used output tiles, ascending.
    ostart: (n_used+1,) int32 — CSR-like chunk offsets per used output
            tile: chunks for ``uotile[i]`` occupy ``ostart[i]:ostart[i+1]``.
    mask:   (1, n_otiles·128) — 1 where the output tile is used (unused
            tiles are undefined; caller selects them to 0).
    """
    vals: jnp.ndarray
    idx: jnp.ndarray
    ftile: jnp.ndarray
    uotile: jnp.ndarray
    ostart: jnp.ndarray
    mask: jnp.ndarray


class SparseDMAPlan:
    """Both directions + shape metadata; ``n``/``d`` static aux data
    (same contract as :class:`sparse_mxu.SparseMXUPlan`)."""

    def __init__(self, t_phase, w_phase, n, d):
        self.t_phase = t_phase    # out = WᵀX   (k, dpad)
        self.w_phase = w_phase    # out = T Xᵀ  (k, npad)
        self.n = int(n)
        self.d = int(d)


jax.tree_util.register_pytree_node(
    SparseDMAPlan,
    lambda p: ((p.t_phase, p.w_phase), (p.n, p.d)),
    lambda aux, ch: SparseDMAPlan(ch[0], ch[1], *aux))


def _plan_direction_dma(g, s, v, n_gtiles, n_stiles, C, dtype):
    # values are stored in the 32-bit+ accumulation dtype: the kernel
    # casts per chunk anyway, and Mosaic cannot DMA-slice a 1-row bf16
    # HBM array (16-bit tiling packs 2 sublanes per 32-bit word, so the
    # (1, ·) slice is sub-tile — measured lowering failure on v5e)
    vdt = np.float32 if np.dtype(dtype).itemsize < 4 else np.dtype(dtype)
    vals, glo, slo, ftile, otile, mask = _plan_direction_np(
        g, s, v, n_gtiles, n_stiles, C, 1, vdt)
    nchunks = ftile.shape[0]
    # CSR-like offsets over the (already output-tile-major) chunk order
    # (sorted runs — boundary flags, not np.unique's re-sort)
    onew = _run_starts(otile)
    ofirst = np.flatnonzero(onew)
    uo = otile[ofirst]
    ostart = np.concatenate([ofirst, [nchunks]]).astype(np.int32)
    # pad so the kernel's trailing MBLK-chunk metadata DMA may over-read
    npad = nchunks + MBLK_MAX
    vp = np.zeros((1, npad * C), vdt)
    vp[:, :nchunks * C] = vals
    # host form is uint8 (local indices are % 128); the transfer crosses
    # the link narrow and _widen_i32 casts to the kernel's int32 on device
    ip = np.zeros((2, npad * C), np.uint8)
    ip[0, :nchunks * C] = glo[0]
    ip[1, :nchunks * C] = slo[0]
    fp = np.zeros((npad,), np.int32)
    fp[:nchunks] = ftile
    from rri_nmf_tpu.ops.sparse_mxu import _widen_i32
    return DMAContractPlan(
        vals=jnp.asarray(vp), idx=_widen_i32(ip), ftile=jnp.asarray(fp),
        uotile=jnp.asarray(uo.astype(np.int32)),
        ostart=jnp.asarray(ostart), mask=jnp.asarray(mask))


def plan_sparse_matrix_dma(X, dtype=None, C=TILE):
    """SciPy sparse (n, d) matrix → :class:`SparseDMAPlan` (host-side,
    one-off). Drop-in alternative to ``sparse_mxu.plan_sparse_matrix``
    (no ``group``: the manual-DMA kernel loops chunks in-kernel, so
    there is nothing to amortize by grouping)."""
    coo = X.tocoo()
    n, d = coo.shape
    if dtype is None:
        dtype = coo.data.dtype
    dtype = np.dtype(dtype)
    n_rt = -(-n // TILE)
    n_ct = -(-d // TILE)
    rows = coo.row                    # any int dtype; fused key is int64
    cols = coo.col
    vals = np.asarray(coo.data, dtype=dtype)
    return SparseDMAPlan(
        t_phase=_plan_direction_dma(rows, cols, vals, n_rt, n_ct, C, dtype),
        w_phase=_plan_direction_dma(cols, rows, vals, n_ct, n_rt, C, dtype),
        n=n, d=d)


def _make_dma_kernel(C, MBLK, NBUF, acc_dt, cmp_dt):
    """Kernel body: one grid step per used output tile; fori over its
    chunks with NBUF-deep factor-tile buffering (prefetch distance
    NBUF-1) and double-buffered metadata-block DMA. The output tile is
    accumulated in ``out_ref`` directly (a loop-carried (k, 128) value
    would be copied every iteration)."""

    def kernel(uo_ref, os_ref, ft_ref, vals_hbm, idx_hbm, f_hbm, out_ref,
               vals_buf, idx_buf, fbuf, vsem, isem, fsem):
        i = pl.program_id(0)
        start = os_ref[i]
        cnt = os_ref[i + 1] - start
        nblk = (cnt + MBLK - 1) // MBLK

        def f_copy(slot, c):
            return pltpu.make_async_copy(
                f_hbm.at[ft_ref[c]], fbuf.at[slot], fsem.at[slot])

        def m_copies(slot, b):
            sl = pl.ds((start + b * MBLK) * C, MBLK * C)
            return (pltpu.make_async_copy(vals_hbm.at[:, sl],
                                          vals_buf.at[slot], vsem.at[slot]),
                    pltpu.make_async_copy(idx_hbm.at[:, sl],
                                          idx_buf.at[slot], isem.at[slot]))

        # warm-up: first metadata block + the first NBUF-1 factor tiles
        for dma in m_copies(0, 0):
            dma.start()
        for j in range(NBUF - 1):
            @pl.when(j < cnt)
            def _(j=j):
                f_copy(j % NBUF, start + j).start()

        lane = lax.broadcasted_iota(jnp.int32, (C, TILE), 1)
        out_ref[:] = jnp.zeros(out_ref.shape, acc_dt)

        def body(r, _):
            c = start + r
            fslot = r % NBUF
            b = r // MBLK
            mslot = b % 2

            # keep the factor pipeline NBUF-1 chunks ahead
            @pl.when(r + NBUF - 1 < cnt)
            def _():
                f_copy((r + NBUF - 1) % NBUF, c + NBUF - 1).start()

            # at a metadata block boundary: start block b+1, wait block b
            @pl.when(r % MBLK == 0)
            def _():
                @pl.when(b + 1 < nblk)
                def _():
                    for dma in m_copies(1 - mslot, b + 1):
                        dma.start()
                v_dma, i_dma = m_copies(mslot, b)
                v_dma.wait()
                i_dma.wait()

            f_copy(fslot, c).wait()

            off = (r % MBLK) * C
            v = vals_buf[mslot, 0, pl.ds(off, C)].astype(acc_dt)
            g = idx_buf[mslot, 0, pl.ds(off, C)]
            s = idx_buf[mslot, 1, pl.ds(off, C)]
            # value-scaled gather one-hot + scatter one-hot; padding slots
            # carry v = 0 and vanish, duplicates sum (two slots, same g/s)
            OG = jnp.where(g[:, None] == lane, v[:, None],
                           jnp.zeros((), acc_dt)).astype(cmp_dt)
            OS = (s[:, None] == lane).astype(cmp_dt)            # (C, 128)
            Xt = lax.dot_general(OG, OS, (((0,), (0,)), ((), ())),
                                 preferred_element_type=acc_dt)
            contrib = jnp.dot(fbuf[fslot].astype(cmp_dt),
                              Xt.astype(cmp_dt),
                              preferred_element_type=acc_dt)    # (k, 128)
            out_ref[:] = out_ref[:] + contrib
            return 0

        lax.fori_loop(0, cnt, body, 0)

    return kernel


def dma_contract(plan: DMAContractPlan, F3, acc_dt=None, interpret=False,
                 mblk=8, nbuf=4):
    """``out[k, spad] = Σ_nnz v · F[:, g] e_sᵀ`` for the direction this
    plan encodes. ``F3`` is the factor pre-tiled ``(n_gtiles, k, 128)``
    (tile t = ``F[:, t·128:(t+1)·128]``) so each per-chunk fetch is one
    contiguous HBM slab. ``nbuf``: factor-tile buffer depth (prefetch
    distance nbuf-1 chunks — hides per-fetch HBM latency behind more
    than one chunk's compute)."""
    assert 1 <= mblk <= MBLK_MAX
    assert nbuf >= 2
    k = F3.shape[1]
    nchunks_pad = plan.ftile.shape[0]
    nchunks = nchunks_pad - MBLK_MAX
    C = plan.vals.shape[1] // nchunks_pad
    nu = plan.uotile.shape[0]
    spad = plan.mask.shape[1]
    if acc_dt is None:
        acc_dt = jnp.float32 if F3.dtype in (jnp.bfloat16, jnp.float16) \
            else F3.dtype
    cmp_dt = F3.dtype if F3.dtype in (jnp.bfloat16, jnp.float16) else acc_dt
    vdt = plan.vals.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nu,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # vals (1, nchunks_pad*C)
            pl.BlockSpec(memory_space=pl.ANY),    # idx  (2, nchunks_pad*C)
            pl.BlockSpec(memory_space=pl.ANY),    # F3   (n_gtiles, k, 128)
        ],
        out_specs=pl.BlockSpec((k, TILE), lambda i, uo, os, ft: (0, uo[i])),
        scratch_shapes=[
            pltpu.VMEM((2, 1, mblk * C), vdt),
            pltpu.VMEM((2, 2, mblk * C), jnp.int32),
            pltpu.VMEM((nbuf, k, TILE), F3.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )
    out = pl.pallas_call(
        _make_dma_kernel(C, mblk, nbuf, acc_dt, cmp_dt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, spad), acc_dt),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        cost_estimate=pl.CostEstimate(
            flops=2 * nchunks * (C + k) * TILE * TILE,
            bytes_accessed=nchunks
            * (k * TILE * F3.dtype.itemsize
               + C * (vdt.itemsize + 8)),
            transcendentals=0),
    )(plan.uotile, plan.ostart, plan.ftile,
      plan.vals, plan.idx, F3)
    # never-visited output tiles are undefined — select, don't multiply
    return jnp.where(plan.mask > 0, out, jnp.zeros((), acc_dt))


def _tile_cols(F, m, dtype=None):
    """(k, m) factor → (n_tiles, k, 128) contiguous tile slabs."""
    k = F.shape[0]
    mpad = _round_up(m, TILE)
    Fp = jnp.zeros((k, mpad), F.dtype if dtype is None else dtype)
    Fp = Fp.at[:, :m].set(F)
    return Fp.reshape(k, mpad // TILE, TILE).transpose(1, 0, 2)


def contract_wtx(plan: SparseDMAPlan, W, acc_dt=None, interpret=False,
                 mblk=8, nbuf=4):
    """``WᵀX`` → (k, d): gather W rows, scatter into columns."""
    out = dma_contract(plan.t_phase, _tile_cols(W.T, plan.n), acc_dt,
                       interpret, mblk, nbuf)
    return out[:, :plan.d]


def contract_xtt(plan: SparseDMAPlan, T, acc_dt=None, interpret=False,
                 mblk=8, nbuf=4):
    """``T Xᵀ`` → (k, n): gather T columns, scatter into rows."""
    out = dma_contract(plan.w_phase, _tile_cols(T, plan.d), acc_dt,
                       interpret, mblk, nbuf)
    return out[:, :plan.n]
