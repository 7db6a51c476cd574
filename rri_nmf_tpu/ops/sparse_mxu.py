"""Tile-bucketed one-hot MXU kernel for the sparse sweep's contractions.

The beyond-HBM sparse path needs two contractions per sweep — ``WᵀX``
(k×d) before the T-phase and ``T Xᵀ`` (k×n) before the W-phase — and
XLA's BCOO lowering runs them as gather/scatter at ~30-50 GB/s (measured
~216 ms/sweep at 50k×30k 0.5%, ``benchmarks/exp_sparse.py``): TPU has no
hardware sparse path. This module reformulates the contraction so ALL
flops run on the MXU:

1. Nonzeros are bucketed by their (128, 128) tile of X and packed into
   fixed-size chunks of ``C`` slots, output-tile-major (host-side, once
   per matrix — like building a CSR). Padding slots carry ``v = 0`` and
   vanish from every product. Duplicate coordinates accumulate (scipy
   COO semantics).
2. Per chunk, the kernel reconstructs the dense 128×128 X-tile with two
   one-hot matmuls — ``Xt = (1[g_i = a]·v_i)ᵀ (1[s_i = b])``, a (C,128)ᵀ
   × (C,128) MXU contraction — then accumulates ``F_tile @ Xt`` into the
   VMEM-resident output tile. Grid order is output-tile-major, so each
   (k, 128) output tile is revisited across consecutive steps and written
   back once.
3. The factor tile to gather from (``Wᵀ`` or ``T``, laid out (k, m)) is
   DMA'd per chunk via a scalar-prefetched tile index
   (``PrefetchScalarGridSpec``), double-buffered by the Mosaic pipeline.

Cost per chunk: ``2·C·128² + 2·k·128²`` MXU flops + one (k, 128) factor
tile DMA. At 0.5% density a 128-tile holds ~80 nnz, so the arithmetic is
~dense-tile cost — but only O(nnz) bytes of X ever exist, which is the
point: this is the path for corpora whose dense form exceeds HBM
(the driver densifies on device below that; reference densifies on the
HOST unconditionally, ``sklearn_interface.py:78-83``).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _run_starts(a):
    """First-of-run boolean flags for a SORTED array (boundary flags,
    not np.unique — every caller's array holds sorted runs by
    construction). Shared by both plan builders and the DMA planner."""
    new = np.empty(a.shape[0], np.bool_)
    if new.size:
        new[0] = True
        np.not_equal(a[1:], a[:-1], out=new[1:])
    return new



class ContractPlan(NamedTuple):
    """One contraction direction: chunked nonzeros, output-tile-major.

    vals/gloc/sloc: (1, nchunks·C) — values, local gather index (position
    along the contracted axis within its 128-tile), local scatter index;
    flat (1, ·) layout because Mosaic block shapes must tile the array
    ((1, C) blocks over (nchunks, C) are rejected: 1 ∤ 8). gloc/sloc are
    int32 on device (Mosaic 1-row slicing needs ≥32-bit); the HOST
    builder emits them uint8 (``% 128`` always fits) so the one-off
    plan transfer crosses the link at a quarter the width, and
    :func:`_widen_i32` casts on arrival.
    ftile/otile: (nchunks,) int32 — which (k, 128) factor tile to gather
    from / output tile to accumulate into.
    mask: (1, n_otiles*128) — 1 where the output column's tile contains
    any nonzero (untouched output tiles are undefined; their true value
    is 0, so the caller selects against this).
    """
    vals: jnp.ndarray
    gloc: jnp.ndarray
    sloc: jnp.ndarray
    ftile: jnp.ndarray
    otile: jnp.ndarray
    mask: jnp.ndarray


class SparseMXUPlan:
    """Both directions + shape metadata for one sparse matrix. A pytree
    whose ``n``/``d`` are STATIC aux data (they size the jitted program;
    as leaves they would be traced and break shape computation)."""

    def __init__(self, t_phase, w_phase, n, d, group=1):
        self.t_phase = t_phase    # out = WᵀX   (k, dpad)
        self.w_phase = w_phase    # out = T Xᵀ  (k, npad)
        self.n = int(n)
        self.d = int(d)
        self.group = int(group)   # chunks per kernel grid step


jax.tree_util.register_pytree_node(
    SparseMXUPlan,
    lambda p: ((p.t_phase, p.w_phase), (p.n, p.d, p.group)),
    lambda aux, ch: SparseMXUPlan(ch[0], ch[1], *aux))


def _plan_direction_np(g, s, v, n_gtiles, n_stiles, C, G, dtype):
    """Bucket nonzeros by (scatter-tile, gather-tile), output-tile-major,
    padded to C-slot chunks; chunks grouped G per grid step (each group
    stays within ONE output tile — groups are padded with dummy chunks,
    v = 0, so the kernel's output-revisit logic works at group level).
    Returns host (NumPy) arrays in ContractPlan field order.

    Tile buckets are dense integers, so the default path is a two-pass
    C++ counting sort (``native.plan_hist``/``plan_scatter``) with the
    per-bucket offset/grouping arithmetic on the ~nchunks-sized bucket
    level in NumPy; the O(nnz log nnz) argsort formulation below is the
    fallback (no compiler, or a pathological bucket count)."""
    if len(v) == 0:
        # degenerate: one all-padding group, all-zero mask → zeros out
        return (np.zeros((1, G * C), dtype), np.zeros((1, G * C), np.uint8),
                np.zeros((1, G * C), np.uint8),
                np.zeros((G,), np.int32), np.zeros((1,), np.int32),
                np.zeros((1, n_stiles * TILE), dtype))
    if n_gtiles * n_stiles <= 5e7:
        from rri_nmf_tpu import native
        counts = native.plan_hist(g, s, n_gtiles, n_stiles)
        if counts is not None:
            return _plan_direction_counting_np(
                g, s, v, counts, n_gtiles, n_stiles, C, G, dtype)
    # one argsort on the fused (scatter-tile, gather-tile) key replaces
    # lexsort + np.unique's internal re-sort, and only the surviving
    # per-slot arrays are permuted (this host pass was profiled at ~16
    # µs/nnz on the 1-core box with the naive multi-pass form)
    pair = (s // TILE).astype(np.int64) * n_gtiles + g // TILE
    order = np.argsort(pair)              # st-major, gt within
    pair = pair[order]
    g = g[order]
    s = s[order]
    v = v[order]
    gl = (g % TILE).astype(np.uint8)
    sl = (s % TILE).astype(np.uint8)
    newrun = _run_starts(pair)
    first = np.flatnonzero(newrun)
    counts = np.diff(np.append(first, len(pair)))
    gt_first = (pair[first] % n_gtiles).astype(np.int64)
    st_first = (pair[first] // n_gtiles).astype(np.int64)
    chunks_per = -(-counts // C)
    nchunks = int(chunks_per.sum())
    choff = np.zeros(len(first) + 1, np.int64)
    choff[1:] = np.cumsum(chunks_per)
    within = np.arange(len(v)) - np.repeat(first, counts)
    dst = np.repeat(choff[:-1], counts) * C + within

    vals = np.zeros(nchunks * C, dtype)
    vals[dst] = v
    glo = np.zeros(nchunks * C, np.uint8)
    glo[dst] = gl
    slo = np.zeros(nchunks * C, np.uint8)
    slo[dst] = sl
    ftile = np.repeat(gt_first.astype(np.int32), chunks_per)
    otile = np.repeat(st_first.astype(np.int32), chunks_per)

    if G > 1:
        # pad each otile's chunk run to a multiple of G (dummy chunks:
        # v = 0, ftile = 0) so no group straddles an output tile
        # (otile holds sorted runs — run boundaries, not np.unique)
        onew = _run_starts(otile)
        ofirst = np.flatnonzero(onew)
        uo = otile[ofirst]
        ocnt = np.diff(np.append(ofirst, nchunks))
        opad = -(-ocnt // G) * G
        tot = int(opad.sum())
        ooff = np.zeros(len(uo) + 1, np.int64)
        ooff[1:] = np.cumsum(opad)
        within_o = np.arange(nchunks) - np.repeat(ofirst, ocnt)
        dstc = np.repeat(ooff[:-1], ocnt) + within_o

        def scatter_chunks(a, width, dt):
            out = np.zeros((tot, width), dt)
            out[dstc] = a.reshape(nchunks, width)
            return out

        vals = scatter_chunks(vals, C, dtype)
        glo = scatter_chunks(glo, C, np.uint8)
        slo = scatter_chunks(slo, C, np.uint8)
        ft2 = np.zeros(tot, np.int32)
        ft2[dstc] = ftile
        ftile = ft2
        otile = np.repeat(uo, opad // G).astype(np.int32)  # per GROUP
        nchunks = tot
    # otile per group (G == 1: group == chunk)

    mask = np.zeros((n_stiles, 1), dtype)
    mask[st_first] = 1.0
    mask = np.broadcast_to(mask, (n_stiles, TILE)).reshape(1, -1)

    return (vals.reshape(1, nchunks * C), glo.reshape(1, nchunks * C),
            slo.reshape(1, nchunks * C), ftile, otile,
            np.ascontiguousarray(mask))


def _plan_direction_counting_np(g, s, v, counts, n_gtiles, n_stiles, C, G,
                                dtype):
    """Counting-sort bucketing (native pass A already done → ``counts``):
    compute the final padded chunk layout per bucket in NumPy (bucket
    level, ~nchunks elements), then one native O(nnz) scatter places
    every nonzero directly into its final slot. Same output contract and
    layout as the sort path."""
    from rri_nmf_tpu import native
    nb = np.flatnonzero(counts)              # nonempty buckets, st-major
    cnt = counts[nb]
    chunks_per = -(-cnt // C)
    gt_first = nb % n_gtiles
    st_first = nb // n_gtiles
    cum = np.cumsum(chunks_per)
    e = np.concatenate([[0], cum[:-1]])      # exclusive chunk offsets
    tot_real = int(cum[-1])
    if G > 1:
        onew = _run_starts(st_first)
        ofirst = np.flatnonzero(onew)        # bucket-run start per otile
        run_id = np.cumsum(onew) - 1         # otile run index per bucket
        tot_o = np.add.reduceat(chunks_per, ofirst)
        pad_o = -(-tot_o // G) * G
        ooff = np.concatenate([[0], np.cumsum(pad_o)])
        choff_b = ooff[:-1][run_id] + (e - e[ofirst][run_id])
        nchunks = int(ooff[-1])
        otile = np.repeat(st_first[ofirst].astype(np.int32),
                          pad_o // G)        # per GROUP, padding included
    else:
        choff_b = e
        nchunks = tot_real
        otile = np.repeat(st_first.astype(np.int32), chunks_per)

    ftile = np.zeros(nchunks, np.int32)
    pos = np.repeat(choff_b, chunks_per) \
        + (np.arange(tot_real) - np.repeat(e, chunks_per))
    ftile[pos] = np.repeat(gt_first.astype(np.int32), chunks_per)

    slot_base = np.zeros(len(counts), np.int64)
    slot_base[nb] = choff_b * C
    # native scatter works in 32/64-bit; narrow plan dtypes (bf16/f16)
    # round once afterwards — same values as a direct astype
    sdt = np.float64 if np.dtype(dtype).itemsize == 8 else np.float32
    vals = np.zeros(nchunks * C, sdt)
    glo = np.zeros(nchunks * C, np.uint8)
    slo = np.zeros(nchunks * C, np.uint8)
    native.plan_scatter(g, s, np.asarray(v, dtype=sdt), n_gtiles,
                        slot_base, vals, glo, slo)
    if vals.dtype != np.dtype(dtype):
        vals = vals.astype(dtype)

    mask = np.zeros((n_stiles, 1), dtype)
    mask[st_first] = 1.0
    mask = np.broadcast_to(mask, (n_stiles, TILE)).reshape(1, -1)
    return (vals.reshape(1, nchunks * C), glo.reshape(1, nchunks * C),
            slo.reshape(1, nchunks * C), ftile, otile,
            np.ascontiguousarray(mask))


@jax.jit
def _widen_i32(a):
    """Host→device placement of a narrow (uint8) plan-index array: the
    bytes cross the (slow) host↔device link narrow and are widened to
    int32 by one jitted cast ON DEVICE — Mosaic needs ≥32-bit operands
    for the kernel's 1-row slicing, but the transfer doesn't."""
    return a.astype(jnp.int32)


def _plan_direction(g, s, v, n_gtiles, n_stiles, C, G, dtype):
    vals, glo, slo, ftile, otile, mask = _plan_direction_np(
        g, s, v, n_gtiles, n_stiles, C, G, dtype)
    return ContractPlan(jnp.asarray(vals), _widen_i32(glo), _widen_i32(slo),
                        jnp.asarray(ftile), jnp.asarray(otile),
                        jnp.asarray(mask))


def plan_sparse_matrix(X, dtype=None, C=TILE, group=8):
    """SciPy sparse (n, d) matrix → :class:`SparseMXUPlan` (host-side,
    one-off — the sparse analog of ``to_bcoo``).

    ``group``: chunks per kernel grid step. Mosaic's fixed per-step cost
    (~0.5 µs) dominates a one-chunk step (~0.25 µs of DMA+MXU), so
    batching G chunks per step recovers most of it; padding waste is
    < G per output tile (<1% at production shapes)."""
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
    return SparseMXUPlan(
        t_phase=_plan_direction(rows, cols, vals, n_rt, n_ct, C, group,
                                dtype),
        w_phase=_plan_direction(cols, rows, vals, n_ct, n_rt, C, group,
                                dtype),
        n=n, d=d, group=group)


def _make_contract_kernel(C, G, acc_dt, cmp_dt):
    """``cmp_dt``: dot-operand dtype. Equal to ``acc_dt`` for exact f32;
    bfloat16 when the fit runs in bf16 storage — the MXU's native rate
    (all dots still accumulate via ``preferred_element_type=acc_dt``;
    the intermediate X tile is rounded to bf16, the same ~2⁻⁸ input
    rounding the bf16 BCOO gemm mode applies)."""
    def kernel(ft_ref, ot_ref, vals_ref, gloc_ref, sloc_ref, *rest):
        F_refs = rest[:G]
        out_ref = rest[G]
        c = pl.program_id(0)
        prev = ot_ref[jnp.maximum(c - 1, 0)]
        is_first = jnp.logical_or(c == 0, ot_ref[c] != prev)

        lane = lax.broadcasted_iota(jnp.int32, (C, TILE), 1)
        total = None
        for j in range(G):
            # v broadcast happens in 32-bit (Mosaic cannot insert a minor
            # dim on 16-bit vectors); the (C, 128) one-hot then casts down
            v = vals_ref[0, j * C:(j + 1) * C].astype(acc_dt)   # (C,)
            g = gloc_ref[0, j * C:(j + 1) * C]
            s = sloc_ref[0, j * C:(j + 1) * C]
            # value-scaled gather one-hot and scatter one-hot; padding
            # slots have v = 0 and vanish. Duplicates sum (two slots,
            # same (g, s)).
            OG = jnp.where(g[:, None] == lane, v[:, None],
                           jnp.zeros((), acc_dt)).astype(cmp_dt)
            OS = (s[:, None] == lane).astype(cmp_dt)            # (C, 128)
            Xt = lax.dot_general(OG, OS, (((0,), (0,)), ((), ())),
                                 preferred_element_type=acc_dt)
            contrib = jnp.dot(F_refs[j][:].astype(cmp_dt),
                              Xt.astype(cmp_dt),
                              preferred_element_type=acc_dt)    # (k, 128)
            total = contrib if total is None else total + contrib

        @pl.when(is_first)
        def _():
            out_ref[:] = total

        @pl.when(jnp.logical_not(is_first))
        def _():
            out_ref[:] = out_ref[:] + total

    return kernel


def mxu_contract(plan: ContractPlan, F, acc_dt=None, interpret=False,
                 group=1):
    """``out[k, spad] = Σ_nnz v · F[:, g] e_sᵀ`` — i.e. ``F @ X_dense``
    for the direction this plan encodes. ``F`` must be (k, gpad) with
    gpad a 128-multiple covering every ftile. ``group`` must match the
    plan's chunk grouping (G chunks per grid step; groups never straddle
    an output tile)."""
    k = F.shape[0]
    G = group
    nchunks = plan.ftile.shape[0]
    assert nchunks % G == 0, \
        'plan chunk count %d is not a multiple of group=%d (plan built ' \
        'with a different group?)' % (nchunks, G)
    # otile is stored per GROUP (one entry per grid step): its length
    # pins the grouping the plan was built with, so a mismatched
    # ``group`` argument is caught here instead of silently indexing the
    # scalar-prefetch array out of bounds (garbage SMEM on TPU)
    assert plan.otile.shape[0] * G == nchunks, \
        'group=%d does not match the plan (otile has %d groups for %d ' \
        'chunks -> group=%d)' % (G, plan.otile.shape[0], nchunks,
                                 nchunks // max(plan.otile.shape[0], 1))
    # normalize narrow (uint8 host-form) index arrays to the int32 the
    # kernel requires; a no-op for device plans built by _plan_direction
    gloc = plan.gloc if plan.gloc.dtype == jnp.int32 \
        else plan.gloc.astype(jnp.int32)
    sloc = plan.sloc if plan.sloc.dtype == jnp.int32 \
        else plan.sloc.astype(jnp.int32)
    ngroups = nchunks // G
    C = plan.vals.shape[1] // nchunks
    spad = plan.mask.shape[1]
    if acc_dt is None:
        acc_dt = jnp.float32 if F.dtype in (jnp.bfloat16, jnp.float16) \
            else F.dtype
    # bf16/f16 storage → dots run at the MXU's native reduced-precision
    # rate (f32 accumulation); otherwise operate in the accumulation dtype
    cmp_dt = F.dtype if F.dtype in (jnp.bfloat16, jnp.float16) else acc_dt

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ngroups,),
        in_specs=[
            pl.BlockSpec((1, G * C), lambda c, ft, ot: (0, c)),
            pl.BlockSpec((1, G * C), lambda c, ft, ot: (0, c)),
            pl.BlockSpec((1, G * C), lambda c, ft, ot: (0, c)),
        ] + [
            pl.BlockSpec((k, TILE),
                         lambda c, ft, ot, j=j: (0, ft[G * c + j]))
            for j in range(G)
        ],
        out_specs=pl.BlockSpec((k, TILE), lambda c, ft, ot: (0, ot[c])),
    )
    out = pl.pallas_call(
        _make_contract_kernel(C, G, acc_dt, cmp_dt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, spad), acc_dt),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        cost_estimate=pl.CostEstimate(
            flops=2 * nchunks * (C + k) * TILE * TILE,
            bytes_accessed=nchunks * (k * TILE + 3 * C)
            * jnp.dtype(acc_dt).itemsize,
            transcendentals=0),
    )(plan.ftile, plan.otile, plan.vals, gloc, sloc,
      *([F] * G))
    # never-visited output tiles are undefined (possibly NaN bits); their
    # true value is 0 — select, don't multiply (0·NaN = NaN)
    return jnp.where(plan.mask > 0, out, jnp.zeros((), acc_dt))


def _round_up(x, m):
    return (x + m - 1) // m * m


def contract_wtx(plan: SparseMXUPlan, W, acc_dt=None, interpret=False):
    """``WᵀX`` → (k, d): gather W rows, scatter into columns."""
    n, d = plan.n, plan.d
    k = W.shape[1]
    npad = _round_up(n, TILE)
    Wt = jnp.zeros((k, npad), W.dtype).at[:, :n].set(W.T)
    out = mxu_contract(plan.t_phase, Wt, acc_dt, interpret,
                       group=plan.group)
    return out[:, :d]


def contract_xtt(plan: SparseMXUPlan, T, acc_dt=None, interpret=False):
    """``T Xᵀ`` → (k, n): gather T columns, scatter into rows."""
    n, d = plan.n, plan.d
    k = T.shape[0]
    dpad = _round_up(d, TILE)
    Tp = jnp.zeros((k, dpad), T.dtype).at[:, :d].set(T)
    out = mxu_contract(plan.w_phase, Tp, acc_dt, interpret,
                       group=plan.group)
    return out[:, :n]
